"""KNN-Shapley data valuation: recursion semantics + mislabel detection."""

import numpy as np
import pytest


def test_recursion_matches_reference_form():
    """Hand-checkable 4-point case, k=2."""
    from cleanlab_ray.stages.valuation import knn_shapley_score

    y = np.array([0, 0, 1, 0])
    # neighbors sorted by distance (indices), leave-self-out
    idx = np.array([[1, 3], [0, 3], [0, 1], [1, 0]])
    vals = knn_shapley_score(idx, y, 2)
    # point 2 is the odd label out: it should have the lowest value
    assert vals[2] == vals.min()


def test_valuation_flags_mislabeled(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.valuation import data_valuation

    rng = np.random.default_rng(21)
    k, d, per = 2, 8, 200
    means = np.array([[4.0] * d, [-4.0] * d])
    x = np.vstack([rng.standard_normal((per, d)) + means[c] for c in range(k)])
    y = np.repeat([0, 1], per)
    flip = np.zeros(len(y), dtype=bool)
    flip[rng.choice(len(y), 30, replace=False)] = True
    noisy = np.where(flip, 1 - y, y)
    rows = [
        {"vec_id": i, "embedding": x[i].tolist(), "label": int(noisy[i])}
        for i in range(len(y))
    ]
    out = data_valuation(rd.from_items(rows)).to_pandas().sort_values("vec_id")
    scores = out["data_valuation_score"].to_numpy()
    # mislabeled rows receive lower values (the score scale concentrates
    # near 0.5 by construction — value magnitude is ~1/bucket_size)
    assert scores[flip].mean() < scores[~flip].mean()
    flagged = out["is_data_valuation_issue"].to_numpy()
    assert flagged.sum() > 0
    assert flip[flagged].mean() > 0.5  # flagged rows mostly actual flips


def test_singleton_bucket_uniform_threshold(ray_session):
    """A singleton bucket has no neighbors -> neutral score 0.5, and the
    issue flag applies the reference's UNIFORM ``score < threshold``
    rule (data_valuation.py issue manager line 142) — no special-cased
    False: flagged iff 0.5 < threshold."""
    import ray.data as rd

    from cleanlab_ray.stages.valuation import data_valuation

    rows = [{"vec_id": 0, "embedding": [1.0, 0.0, 0.0], "label": 1}]
    out = data_valuation(rd.from_items(rows)).to_pandas()
    assert float(out["data_valuation_score"].iloc[0]) == 0.5
    assert not bool(out["is_data_valuation_issue"].iloc[0])  # 0.5 < 0.5 is False

    out6 = data_valuation(rd.from_items(rows), threshold=0.6).to_pandas()
    assert bool(out6["is_data_valuation_issue"].iloc[0])  # 0.5 < 0.6
