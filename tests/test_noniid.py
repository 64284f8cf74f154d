"""Non-IID kNN permutation test vs a direct NumPy port of the reference
noniid.py flow: sorted (leaky) data must be flagged, shuffled data not."""

import math

import numpy as np
import pytest


def _make_ds(mat, ray_session):
    import pandas as pd
    import ray.data as rd

    df = pd.DataFrame({"vec_id": np.arange(len(mat))})
    df["embedding"] = [row.astype(np.float32).tolist() for row in mat]
    return rd.from_pandas(df)


def _reference_port(mat, k=10, num_permutations=25, seed=0):
    """Direct NumPy port of noniid.py:180-299 (graph -> KS -> p-value)."""
    n = len(mat)
    d2 = (
        np.sum(mat * mat, 1)[:, None] + np.sum(mat * mat, 1)[None, :] - 2 * mat @ mat.T
    )
    np.maximum(d2, 0, out=d2)
    d = np.sqrt(d2)
    d[np.eye(n, dtype=bool)] = np.inf
    ids = np.arange(n)
    nbrs = np.lexsort((np.broadcast_to(ids, d.shape), d), axis=-1)[:, :k]

    def ks(dists_flat):
        s = np.sort(dists_flat)
        s = np.hstack([s, [n - 1]]).astype(int)
        bg = np.cumsum((n - np.arange(1, n)) / (n * (n - 1) / 2))
        fg = np.arange(s.shape[0]) / (s.shape[0] - 1)
        return np.max(np.abs(fg - bg[s - 1]))

    observed = ks(np.abs(ids[:, None] - nbrs).ravel())
    np.random.seed(seed)
    perms = np.stack([np.random.permutation(n) for _ in range(num_permutations)])
    perm_ks = np.array(
        [ks(np.abs(p[ids][:, None] - p[nbrs]).ravel()) for p in perms]
    )
    std = float(np.std(perm_ks, ddof=1))
    h = max(std * num_permutations ** (-0.2), 1e-12)

    def phi(z):
        return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))

    p = float(np.mean([phi((100 - x) / h) - phi((observed - x) / h) for x in perm_ks]))
    return observed, p


@pytest.fixture(scope="module")
def sorted_mat():
    rng = np.random.default_rng(77)
    # index-order leakage: features drift with the index
    n, dim = 150, 8
    drift = np.linspace(0, 6, n)[:, None]
    return (rng.standard_normal((n, dim)) * 0.5 + drift).astype(np.float32).astype(np.float64)


def test_noniid_matches_reference_port(ray_session, sorted_mat):
    from cleanlab_ray.stages.noniid import noniid_issues

    ds = _make_ds(sorted_mat, ray_session)
    out, info = noniid_issues(ds, k=10, num_permutations=25, seed=0)
    ks_ref, p_ref = _reference_port(sorted_mat, k=10, num_permutations=25, seed=0)
    assert info["ks"] == pytest.approx(ks_ref, rel=1e-12)
    assert info["p_value"] == pytest.approx(p_ref, rel=1e-9)
    df = out.to_pandas()
    assert len(df) == len(sorted_mat)
    # drifting data must be flagged as non-IID
    assert info["p_value"] < 0.05
    assert df["is_noniid_issue"].sum() == 1
    assert df["noniid_score"].between(0, 1).all()


def test_noniid_not_flagged_on_shuffled(ray_session, sorted_mat):
    from cleanlab_ray.stages.noniid import noniid_issues

    rng = np.random.default_rng(5)
    shuffled = sorted_mat[rng.permutation(len(sorted_mat))]
    ds = _make_ds(shuffled, ray_session)
    out, info = noniid_issues(ds, k=10, num_permutations=25, seed=0)
    assert info["p_value"] > 0.05
    assert out.to_pandas()["is_noniid_issue"].sum() == 0


def test_windowed_single_window_matches_exact(ray_session, sorted_mat):
    """One window covering the full key span must reproduce the exact
    path bit-for-bit (same graph, permutations, p-value, scores)."""
    from cleanlab_ray.stages.noniid import noniid_issues, noniid_issues_windowed

    ds = _make_ds(sorted_mat, ray_session)
    exact, info = noniid_issues(ds, k=10, num_permutations=25, seed=0)
    exact_df = exact.to_pandas().sort_values("vec_id").reset_index(drop=True)
    win = (
        noniid_issues_windowed(ds, k=10, num_permutations=25, seed=0, num_windows=1)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(win) == len(exact_df)
    assert (win["window_id"] == 0).all()
    np.testing.assert_allclose(
        win["noniid_score"].to_numpy(), exact_df["noniid_score"].to_numpy(),
        rtol=0, atol=0,
    )
    assert (win["is_noniid_issue"] == exact_df["is_noniid_issue"]).all()
    assert win["p_value"].iloc[0] == pytest.approx(info["p_value"], rel=1e-12)


def test_windowed_scale_path_no_broadcast(ray_session, sorted_mat):
    """Multi-window run: drifting data is flagged inside windows; the
    exact path refuses past max_rows with a clear error."""
    from cleanlab_ray.stages.noniid import knn_index_graph, noniid_issues_windowed

    ds = _make_ds(sorted_mat, ray_session)
    out = noniid_issues_windowed(
        ds, k=5, num_permutations=25, seed=0, num_windows=3
    ).to_pandas()
    assert len(out) == len(sorted_mat)
    assert out["window_id"].nunique() == 3
    assert out["noniid_score"].between(0, 1).all()
    # within each window the drift persists -> significant p-values
    per_w = out.groupby("window_id")["p_value"].first()
    assert (per_w < 0.05).sum() >= 2
    assert out.groupby("window_id")["is_noniid_issue"].sum().max() <= 1

    with pytest.raises(ValueError, match="windowed"):
        knn_index_graph(ds, max_rows=10)


def test_noniid_auto_delegates_to_windowed(ray_session, monkeypatch):
    """Above MAX_EXACT_ROWS noniid_issues returns the windowed path's
    result with a mode-tagged info dict (no driver embedding pull)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import cleanlab_ray.stages.noniid as noniid_mod

    rng = np.random.default_rng(2)
    n = 400
    emb = rng.normal(size=(n, 8)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1)), 8),
    }))
    monkeypatch.setattr(noniid_mod, "MAX_EXACT_ROWS", 100)
    out, info = noniid_mod.noniid_issues(ds, k=5, num_permutations=5, seed=0)
    assert info["mode"] == "windowed"
    assert info["num_windows"] == 4
    df = out.to_pandas()
    assert len(df) == n
    assert {"noniid_score", "p_value", "is_noniid_issue"} <= set(df.columns)


def test_exact_path_clamps_k_to_n_minus_1(ray_session):
    """n <= k used to crash FixedSizeListArray.from_arrays (or silently
    build a wrong-width graph); k is clamped to n-1 like the reference's
    features_to_knn."""
    import numpy as np
    import ray.data as rd

    from cleanlab_ray.stages.noniid import knn_index_graph, noniid_issues

    rng = np.random.default_rng(5)
    rows = [{"vec_id": i, "embedding": rng.standard_normal(4).tolist()}
            for i in range(7)]
    ds = rd.from_items(rows)
    graph, n, k_eff = knn_index_graph(ds, k=10)
    assert (n, k_eff) == (7, 6)
    g = graph.to_pandas()
    assert all(len(v) == 6 for v in g["neighbor_indices"])

    out, info = noniid_issues(ds, k=10, num_permutations=5, seed=0)
    assert len(out.to_pandas()) == 7
    assert info["k"] == 6  # info reports the EFFECTIVE (clamped) k


def test_flag_is_single_row_under_score_ties(ray_session):
    """Two rows with identical embeddings tie at the minimum score; the
    reference argmin flags exactly ONE (the smaller dataset index)."""
    import numpy as np
    import ray.data as rd

    from cleanlab_ray.stages.noniid import noniid_issues

    rng = np.random.default_rng(2)
    # strongly index-correlated embeddings so p < 0.05 (drifting mean),
    # with rows 0 and 1 identical -> tied minimum
    emb = [(np.array([0.0, 0.0]) if i < 2
            else np.array([i * 1.0, i * 1.0]) + rng.standard_normal(2) * .01)
           for i in range(60)]
    rows = [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(60)]
    out, info = noniid_issues(rd.from_items(rows), k=5,
                              num_permutations=25, seed=0)
    df = out.to_pandas()
    if info["p_value"] < 0.05:
        flagged = df.loc[df["is_noniid_issue"]]
        assert len(flagged) == 1
