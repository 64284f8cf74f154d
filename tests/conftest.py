import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Deterministic transcript table (shuffled row order), session-cached."""
    from cleanlab_ray.fixtures.transcripts import generate_transcripts

    return generate_transcripts(n_convs=200, seed=42)


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory, small_corpus):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("transcripts")
    n = small_corpus.num_rows
    third = n // 3 + 1
    for i in range(3):
        pq.write_table(
            small_corpus.slice(i * third, third), str(d / f"part-{i:05d}.parquet")
        )
    return str(d)
