"""SemDeDup semantic dedup: clone dropping, priority rule, chunking
and partitioning invariance."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    """Random cloud + planted duplicates: ids 400/401 are exact clones
    of id 0; id 402 is a near-copy of id 1 (cos ~ 0.99999)."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    base = rng.normal(size=(400, 16))
    extra = np.stack(
        [base[0], base[0], base[1] + rng.normal(scale=1e-3, size=16)]
    )
    mat = np.concatenate([base, extra]).astype(np.float64)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat)), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1)), 16
            ),
        }
    )
    return rd.from_arrow(t).repartition(5)


def _run(ds, **kw):
    from cleanlab_ray.stages.semdedup import semdedup

    df = semdedup(ds, k=4, n_iter=2, eps=0.99, **kw).to_pandas()
    return df.sort_values("vec_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def out(emb_ds):
    return _run(emb_ds)


def test_clones_dropped_bases_kept(out):
    flags = dict(zip(out["vec_id"], out["is_semdup"]))
    assert not flags[0]
    assert flags[400] and flags[401]  # exact clones of 0
    assert flags[402] != flags[1]  # near-copy pair: exactly one dropped


def test_priority_keeps_farthest_from_centroid(out):
    pair = out[out["vec_id"].isin([1, 402])]
    kept = pair[~pair["is_semdup"]]
    dropped = pair[pair["is_semdup"]]
    assert len(kept) == 1 and len(dropped) == 1
    # the kept one has the LOWER cosine-to-centroid (farther away)
    assert int(kept["cos_cent_e6"].iloc[0]) <= int(dropped["cos_cent_e6"].iloc[0])


def test_chunking_and_partitioning_invariant(emb_ds, out):
    b = _run(emb_ds.repartition(11), chunk=3)
    assert out.equals(b)


def test_no_false_positives_in_random_cloud(out):
    randoms = out[(out["vec_id"] >= 2) & (out["vec_id"] < 400)]
    assert not randoms["is_semdup"].any()
