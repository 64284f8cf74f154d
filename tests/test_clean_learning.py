"""CleanLearning: noisy-label recovery with the from-scratch classifier."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def noisy_blobs(ray_session):
    """Gaussian blobs + 15% label flips (the reference's make_data shape,
    tests/test_filter_count.py:23-99)."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    k, d, per = 3, 8, 300
    means = rng.standard_normal((k, d)) * 4
    x = np.vstack([rng.standard_normal((per, d)) + means[c] for c in range(k)])
    true = np.repeat(np.arange(k), per)
    flip = rng.random(len(true)) < 0.15
    noisy = np.where(flip, (true + 1 + rng.integers(0, k - 1, len(true))) % k, true)
    rows = [
        {"vec_id": i, "embedding": x[i].tolist(), "label": int(noisy[i])}
        for i in range(len(true))
    ]
    return rd.from_items(rows).materialize(), true, noisy, flip


def test_softmax_regression_learns():
    from cleanlab_ray.pipelines.clean_learning import SoftmaxRegression

    rng = np.random.default_rng(0)
    x = np.vstack([rng.standard_normal((200, 4)) + off for off in (-3, 0, 3)])
    y = np.repeat([0, 1, 2], 200)
    clf = SoftmaxRegression(3).fit(x, y)
    assert (clf.predict(x) == y).mean() > 0.95


def test_clean_learning_finds_flips(noisy_blobs):
    from cleanlab_ray.pipelines.clean_learning import CleanLearning

    ds, true, noisy, flip = noisy_blobs
    cl = CleanLearning(num_classes=3).fit(ds)
    issues = cl.label_issues_ds.to_pandas().sort_values("vec_id")
    found = issues["is_label_issue"].to_numpy()
    # flagged rows should be mostly actual flips (precision) and find most flips (recall)
    precision = flip[found].mean()
    recall = found[flip].mean()
    assert precision > 0.75, precision
    assert recall > 0.6, recall


def test_clean_learning_predicts_true_labels(noisy_blobs):
    from cleanlab_ray.pipelines.clean_learning import CleanLearning

    ds, true, noisy, flip = noisy_blobs
    cl = CleanLearning(num_classes=3).fit(ds)
    out = cl.predict_proba(ds).to_pandas().sort_values("vec_id")
    pred = np.stack(out["clean_pred_probs"].to_numpy()).argmax(1)
    acc_vs_true = (pred == true).mean()
    assert acc_vs_true > 0.9, acc_vs_true
