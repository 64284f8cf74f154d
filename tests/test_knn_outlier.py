"""kNN-distance outlier scores: exact path vs a NumPy oracle, and the
LSH-bucketed scale path's agreement on planted outliers."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def embed_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(42)
    mat = rng.standard_normal((200, 8)).astype(np.float32)
    mat[190:] += 8.0  # planted far-away cluster (outliers vs the bulk)
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(200)]
    return rd.from_items(rows), mat.astype(np.float64)


def _numpy_oracle(mat, k=10, t=1.0):
    n = len(mat)
    d2 = (
        np.sum(mat * mat, 1)[:, None]
        + np.sum(mat * mat, 1)[None, :]
        - 2 * (mat @ mat.T)
    )
    np.maximum(d2, 0, out=d2)
    d = np.sqrt(d2)
    d[np.eye(n, dtype=bool)] = np.inf
    ids = np.arange(n)
    order = np.lexsort((np.broadcast_to(ids, d.shape), d), axis=-1)[:, :k]
    avg = np.take_along_axis(d, order, axis=1).mean(1)
    sf = max(np.median(avg), 100 * np.finfo(np.float64).eps, 1e-6)
    score = np.exp(-t * avg / sf)
    score[avg < np.sqrt(100 * np.finfo(np.float64).eps)] = 1.0
    return avg, score


def test_exact_matches_numpy_oracle(embed_ds):
    from cleanlab_ray.stages.knn_outlier import knn_outlier_scores

    ds, mat = embed_ds
    out = knn_outlier_scores(ds).to_pandas().sort_values("vec_id")
    avg_ref, score_ref = _numpy_oracle(mat)
    np.testing.assert_allclose(out["avg_knn_distance"].to_numpy(), avg_ref, rtol=1e-10)
    np.testing.assert_allclose(out["ood_score_knn"].to_numpy(), score_ref, rtol=1e-10)


def test_exact_flags_planted_outliers(embed_ds):
    from cleanlab_ray.stages.knn_outlier import knn_outlier_scores

    ds, _ = embed_ds
    out = knn_outlier_scores(ds).to_pandas().sort_values("ood_score_knn")
    worst = set(out.head(10)["vec_id"])
    assert len(worst & set(range(190, 200))) >= 8


def test_bucketed_flags_planted_outliers(embed_ds):
    from cleanlab_ray.stages.knn_outlier import knn_outlier_scores_bucketed

    ds, _ = embed_ds
    out = knn_outlier_scores_bucketed(ds).to_pandas()
    assert len(out) == 200
    out = out.sort_values("ood_score_knn")
    # planted cluster members may pair with each other inside buckets but
    # still sit far from the bulk; most of the lowest scores should be theirs
    worst = set(out.head(15)["vec_id"])
    assert len(worst & set(range(190, 200))) >= 5


def test_exact_median_utility(ray_session):
    import ray.data as rd
    import pandas as pd

    from cleanlab_ray.functions.quantiles import exact_median

    rng = np.random.default_rng(7)
    for n in (11, 12, 500):
        vals = rng.standard_normal(n) * 3.7 + 1.2
        ds = rd.from_pandas(pd.DataFrame({"x": vals}))
        assert exact_median(ds, "x") == pytest.approx(np.median(vals), abs=1e-12)


def test_knn_vote_pred_probs_recovers_cluster_labels(ray_session):
    """Clustered embeddings labeled by cluster: the kNN vote must assign
    near-1 self-confidence to correctly-labeled rows and flag planted
    label flips with low knn_prob_given + the true cluster as knn_pred."""
    import ray.data as rd

    from cleanlab_ray.stages.knn_outlier import knn_vote_pred_probs

    rng = np.random.default_rng(11)
    n_per, n_cls = 60, 3
    mat = np.concatenate(
        [rng.standard_normal((n_per, 8)) * 0.3 + 6.0 * c for c in range(n_cls)]
    )
    labels = np.repeat(np.arange(n_cls), n_per)
    flipped = [0, 65, 130]
    for i in flipped:
        labels[i] = (labels[i] + 1) % n_cls
    rows = [
        {"vec_id": i, "embedding": mat[i].tolist(), "label": int(labels[i])}
        for i in range(len(mat))
    ]
    ds = rd.from_items(rows)
    out = (
        knn_vote_pred_probs(ds, num_classes=n_cls, k=10, num_planes=3, num_tables=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(mat)
    true_cluster = np.repeat(np.arange(n_cls), n_per)
    for i in flipped:
        row = out.iloc[i]
        assert row["knn_prob_given"] <= 0.2  # flipped label gets few votes
        assert row["knn_pred"] == true_cluster[i]
    clean = out.drop(index=flipped)
    assert (clean["knn_prob_given"] >= 0.8).mean() > 0.95


def test_exact_auto_delegates_to_bucketed(embed_ds):
    """Above exact_max_rows the entry point switches to the LSH-bucketed
    scale path (no driver materialization of the embedding table)."""
    from cleanlab_ray.stages.knn_outlier import (
        knn_outlier_scores, knn_outlier_scores_bucketed,
    )

    ds, _mat = embed_ds
    auto = knn_outlier_scores(ds, k=5, exact_max_rows=10).to_pandas()
    bucketed = knn_outlier_scores_bucketed(ds, k=5).to_pandas()
    auto = auto.sort_values("vec_id").reset_index(drop=True)
    bucketed = bucketed.sort_values("vec_id").reset_index(drop=True)
    import numpy as np

    np.testing.assert_allclose(
        auto["ood_score_knn"], bucketed["ood_score_knn"], atol=1e-12)
