from cleanlab_ray.state import confident  # noqa: F401
