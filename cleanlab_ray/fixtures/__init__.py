from cleanlab_ray.fixtures.transcripts import generate_transcripts, write_transcripts  # noqa: F401
