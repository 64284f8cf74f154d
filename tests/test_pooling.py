"""Per-conversation pooling: direct == salted == oracle (FIXTURES.md §6.5)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def scored_ds(ray_session, corpus_dir):
    import ray.data as rd

    from cleanlab_ray.pipelines.quality_filter import score_turns

    return (
        score_turns(rd.read_parquet(corpus_dir), concurrency=2, batch_size=2048)
        .select_columns(["conv_id", "turn_idx", "score_self_confidence"])
        .materialize()
    )


@pytest.fixture(scope="module")
def oracle_pools(scored_ds):
    from cleanlab_ray.fixtures.oracle import oracle_pool_conversations

    df = scored_ds.to_pandas()
    return oracle_pool_conversations(
        df["conv_id"].to_numpy(),
        df["turn_idx"].to_numpy(),
        df["score_self_confidence"].to_numpy(dtype=np.float64),
    )


def _check(pooled_df, oracle_pools):
    assert len(pooled_df) == len(oracle_pools)
    for row in pooled_df.itertuples():
        mn, mean, softmin = oracle_pools[row.conv_id]
        np.testing.assert_allclose(row.min_score, mn, atol=1e-9)
        np.testing.assert_allclose(row.mean_score, mean, atol=1e-9)
        np.testing.assert_allclose(row.softmin_score, softmin, atol=1e-7)


def test_pool_direct(scored_ds, oracle_pools):
    from cleanlab_ray.stages.pooling import pool_conversations

    _check(pool_conversations(scored_ds).to_pandas(), oracle_pools)


def test_pool_salted_matches_direct(scored_ds, oracle_pools):
    """Mega-conversation salting (two-level groupby) is exact."""
    from cleanlab_ray.stages.pooling import pool_conversations

    _check(pool_conversations(scored_ds, salt=16).to_pandas(), oracle_pools)


def test_pool_fast_matches_direct(scored_ds, oracle_pools):
    from cleanlab_ray.stages.pooling import pool_conversations_fast

    _check(pool_conversations_fast(scored_ds).to_pandas(), oracle_pools)


def test_pool_salted_integer_conv_ids(ray_session):
    """The salt path must preserve the key dtype (regression: it
    hard-cast conv ids to pa.string(), crashing on int64 keys that the
    direct path and the pre-rewrite map_groups path both accepted)."""
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.pooling import pool_conversations

    rng = np.random.default_rng(11)
    n = 400
    conv = rng.integers(0, 23, n).astype(np.int64)
    turn = np.arange(n, dtype=np.int64)
    score = rng.uniform(0, 1, n)
    t = pa.table({"conv_id": conv, "turn_idx": turn,
                  "score_self_confidence": score})
    direct = (
        pool_conversations(rd.from_arrow(t))
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    salted = (
        pool_conversations(rd.from_arrow(t), salt=8)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    assert direct["conv_id"].dtype == salted["conv_id"].dtype
    for c in direct.columns:
        if direct[c].dtype.kind == "f":
            np.testing.assert_allclose(direct[c], salted[c], atol=1e-9)
        else:
            assert list(direct[c]) == list(salted[c])
