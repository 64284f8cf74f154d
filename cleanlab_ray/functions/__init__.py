from cleanlab_ray.functions import numerics, rank  # noqa: F401
