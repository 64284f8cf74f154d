"""Distributed k-means vs a direct NumPy Lloyd oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from cleanlab_ray.stages.kmeans import kmeans_assign, kmeans_cluster, kmeans_fit


def _lloyd_oracle(mat: np.ndarray, k: int, n_iter: int):
    cents = mat[:k].copy()  # rows already sorted by key in the fixture
    for _ in range(n_iter):
        d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        new = cents.copy()
        for c in range(k):
            sel = a == c
            if sel.any():
                new[c] = mat[sel].mean(axis=0)
        cents = new
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1), cents


def _make_ds(n=400, d=8, seed=3, override_num_blocks=7):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d)) + np.repeat(
        rng.normal(scale=4.0, size=(5, d)), n // 5, axis=0
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1).astype(np.float64)), d
            ),
        }
    )
    return rd.from_arrow(tbl).repartition(override_num_blocks), mat


def test_kmeans_matches_numpy_lloyd(ray_session):
    ds, mat = _make_ds()
    assigned, cents = kmeans_cluster(ds, k=5, n_iter=3)
    got = assigned.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    want_a, want_c = _lloyd_oracle(mat, k=5, n_iter=3)
    np.testing.assert_allclose(cents, want_c, rtol=1e-9, atol=1e-12)
    assert (got == want_a).all()


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    # 3 tight clusters, k=4: the 4th seed row sits inside cluster 0's
    # mass, goes empty after the first update, and must keep its centroid
    rng = np.random.default_rng(0)
    base = np.array([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]])
    mat = np.concatenate(
        [base[i] + 0.01 * rng.normal(size=(30, 2)) for i in range(3)]
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1)), 2
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    cents = kmeans_fit(ds, k=4, n_iter=2)
    want_a, want_c = _lloyd_oracle(mat, k=4, n_iter=2)
    np.testing.assert_allclose(cents, want_c, rtol=1e-9, atol=1e-12)
    got = (
        kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    )
    assert (got == want_a).all()


def test_underperforming_auto(ray_session):
    ds, mat = _make_ds()
    rng = np.random.default_rng(1)
    score = rng.uniform(0.5, 1.0, size=len(mat))
    # depress the scores of the first true cluster far below threshold
    score[:80] = 0.001
    with_score = ds.map_batches(
        lambda b, s=score: b.append_column(
            "score_self_confidence",
            pa.array(s[b["vec_id"].to_numpy(zero_copy_only=False)]),
        ),
        batch_format="pyarrow",
    )
    from cleanlab_ray.stages.datalab_extras import underperforming_groups_auto

    out = underperforming_groups_auto(with_score, k=5, threshold=0.1).to_pandas()
    assert len(out) == 5
    assert out["is_underperforming"].sum() >= 1
    worst = out.loc[out["is_underperforming"], "mean_score"]
    assert (worst < 0.1 * out["mean_score"].mean() / 0.8).all()
