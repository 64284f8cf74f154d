"""Regression CleanLearning: distributed ridge CV vs a NumPy oracle,
and planted-noise recovery."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def reg_ds(ray_session):
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(11)
    n, d = 400, 6
    X = rng.standard_normal((n, d))
    w = np.array([2.0, -1.0, 0.5, 0.0, 1.5, -0.25])
    y = X @ w + 0.3 + 0.05 * rng.standard_normal(n)
    corrupted = rng.choice(n, size=20, replace=False)
    y[corrupted] += rng.choice([-6.0, 6.0], size=20)
    df = pd.DataFrame({"vec_id": np.arange(n), "y": y})
    df["embedding"] = [row.astype(np.float32).tolist() for row in X]
    return rd.from_pandas(df), X, y, set(corrupted.tolist())


def test_oof_predictions_match_numpy(reg_ds):
    from cleanlab_ray.pipelines.regression import (
        RegressionCleanLearning,
        _design,
        _fold_of,
    )

    ds, X, y, _ = reg_ds
    cl = RegressionCleanLearning(n_folds=5, l2=1e-6)
    scored, weights = cl._oof_predictions(ds, "embedding", "y", "vec_id", X.shape[1])
    out = scored.to_pandas().sort_values("vec_id")

    folds = _fold_of(np.arange(len(y)), 5)
    Xd = _design(X.astype(np.float32).astype(np.float64))  # stored as float32
    expected = np.empty(len(y))
    for f in range(5):
        tr = folds != f
        reg = 1e-6 * np.eye(Xd.shape[1])
        reg[-1, -1] = 0.0
        wf = np.linalg.solve(Xd[tr].T @ Xd[tr] + reg, Xd[tr].T @ y[tr])
        expected[folds == f] = Xd[folds == f] @ wf
        np.testing.assert_allclose(weights[f], wf, rtol=1e-6)
    np.testing.assert_allclose(
        out["predicted_label"].to_numpy(), expected, rtol=1e-6
    )


def test_find_label_issues_recovers_planted_noise(reg_ds):
    from cleanlab_ray.pipelines.regression import RegressionCleanLearning

    ds, _, _, corrupted = reg_ds
    cl = RegressionCleanLearning(n_folds=5)
    out = cl.find_label_issues(ds).to_pandas()
    assert len(out) == 400
    assert set(out.columns) >= {
        "vec_id", "given_label", "predicted_label", "label_quality", "is_label_issue"
    }
    flagged = set(out[out["is_label_issue"]]["vec_id"].tolist())
    # k search is bounded by the coarse range (max 0.2 -> 80 rows) and
    # must catch the planted noise
    assert 10 <= len(flagged) <= 80
    assert len(flagged & corrupted) >= 15
    # quality scores of corrupted rows should rank at the bottom
    worst25 = set(out.nsmallest(25, "label_quality")["vec_id"].tolist())
    assert len(worst25 & corrupted) >= 15


def test_k_zero_on_clean_data(ray_session):
    import pandas as pd
    import ray.data as rd

    from cleanlab_ray.pipelines.regression import RegressionCleanLearning

    rng = np.random.default_rng(3)
    n, d = 300, 4
    X = rng.standard_normal((n, d))
    y = X @ np.array([1.0, 2.0, -1.0, 0.5]) + 0.01 * rng.standard_normal(n)
    df = pd.DataFrame({"vec_id": np.arange(n), "y": y})
    df["embedding"] = [row.astype(np.float32).tolist() for row in X]
    cl = RegressionCleanLearning(n_folds=5)
    out = cl.find_label_issues(rd.from_pandas(df)).to_pandas()
    # clean data: removing points cannot beat the full fit by much; few flags
    assert out["is_label_issue"].sum() <= 0.1 * n
