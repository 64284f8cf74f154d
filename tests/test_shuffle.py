"""shuffled_shard_positions (deterministic training-export shuffle) vs a
numpy oracle: exact shard + gap-free position parity, stability across
partitioning (the "same seed == same shards on any cluster shape"
contract), and the boundary-block regression (a sorted block spanning a
shard boundary must not reorder the next shard's runs)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cleanlab_ray.stages.shuffle import shuffle_hash, shuffled_shard_positions


def oracle(ids, seed, n_shards):
    hv = shuffle_hash(np.asarray(ids, dtype=np.int64), seed)
    shard = (hv % n_shards).astype(np.int32)
    df = pd.DataFrame({"id": ids, "hv": hv, "shard": shard})
    df = df.sort_values(["shard", "hv", "id"], kind="mergesort")
    df["pos"] = df.groupby("shard", sort=False).cumcount()
    return df.sort_values("id").reset_index(drop=True)


def run(ids, seed, n_shards, parts):
    import ray.data as rd

    tbl = pa.table({"id": pa.array(ids, type=pa.int64())})
    ds = rd.from_arrow(tbl).repartition(parts)
    got = shuffled_shard_positions(ds, "id", seed=seed, n_shards=n_shards)
    return got.to_pandas().sort_values("id").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_matches_oracle_multiblock():
    rng = np.random.default_rng(5)
    ids = rng.permutation(3000).astype(np.int64)
    exp = oracle(ids, seed=42, n_shards=16)
    got = run(ids, seed=42, n_shards=16, parts=7)
    assert np.array_equal(got["shard"].to_numpy(), exp["shard"].to_numpy())
    assert np.array_equal(got["pos"].to_numpy(), exp["pos"].to_numpy())


@pytest.mark.usefixtures("ray_session")
def test_boundary_blocks_many_shards_few_blocks():
    # 64 shards across 3 blocks: every block spans ~20 shard boundaries,
    # so the run-first-key ordering (not block-first-key) is exercised
    # on every shard. Regression for the mis-ordered-runs bug.
    ids = np.arange(2000, dtype=np.int64)
    exp = oracle(ids, seed=7, n_shards=64)
    got = run(ids, seed=7, n_shards=64, parts=3)
    assert np.array_equal(got["shard"].to_numpy(), exp["shard"].to_numpy())
    assert np.array_equal(got["pos"].to_numpy(), exp["pos"].to_numpy())


@pytest.mark.usefixtures("ray_session")
def test_partitioning_independence_and_gap_free():
    ids = np.arange(1, 1501, dtype=np.int64) * 3  # non-contiguous ids
    a = run(ids, seed=99, n_shards=8, parts=2)
    b = run(ids, seed=99, n_shards=8, parts=11)
    assert a.equals(b)
    # positions within each shard are exactly 0..n_s-1
    for s, sub in a.groupby("shard"):
        assert sorted(sub["pos"]) == list(range(len(sub)))


def test_hash_decorrelated_from_split_hash():
    # The unsalted single-round Knuth hash drives stratified_split /
    # kfold membership; the export shuffle must not be a function of it
    # (ADVICE round 3: correlated hashes make compositions degenerate).
    ids = np.arange(20000, dtype=np.int64)
    split10 = ((ids.astype(np.uint64) * np.uint64(2654435761))
               & np.uint64(0xFFFFFFFF)) % np.uint64(10) == 0
    shard = shuffle_hash(ids, seed=20260818) % 16
    # within the 10% "val" rows, shard 0 frequency stays ~1/16
    frac = (shard[split10] == 0).mean()
    assert 0.04 < frac < 0.09
