"""Multi-label one-vs-rest confident joint vs a direct oracle."""

import numpy as np
import pyarrow as pa
import pytest

from cleanlab_ray import CONFIDENT_THRESHOLDS_LOWER_BOUND, FLOATING_POINT_COMPARISON

K = 4


@pytest.fixture(scope="module")
def ml_data():
    rng = np.random.default_rng(13)
    n = 1000
    onehot = (rng.random((n, K)) < 0.3).astype(np.int8)
    probs = np.clip(onehot * 0.7 + rng.random((n, K)) * 0.3, 0, 1)
    labels_list = [list(np.nonzero(r)[0]) for r in onehot]
    return onehot, probs, labels_list


def _oracle_ml(onehot, probs):
    """Direct per-class binary computation (reference loop form)."""
    thresholds = np.zeros((K, 2))
    cj = np.zeros((K, 2, 2), dtype=np.int64)
    for c in range(K):
        p = np.stack([1 - probs[:, c], probs[:, c]], axis=1)
        y = onehot[:, c].astype(int)
        for j in (0, 1):
            rows = p[y == j, j]
            thresholds[c, j] = rows.mean() if len(rows) else 2.0
        thresholds[c] = np.clip(thresholds[c], CONFIDENT_THRESHOLDS_LOWER_BOUND, None)
        conf = p >= thresholds[c][None, :] - FLOATING_POINT_COMPARISON
        nconf = conf.sum(axis=1)
        guess = np.where(nconf > 1, p.argmax(axis=1), conf.argmax(axis=1))
        for i in range(len(y)):
            if nconf[i] > 0:
                cj[c, y[i], guess[i]] += 1
    return thresholds, cj


def test_onehot_roundtrip(ml_data):
    from cleanlab_ray.state.multilabel import int2onehot, onehot2int

    onehot, _, labels_list = ml_data
    np.testing.assert_array_equal(int2onehot(labels_list, K), onehot)
    assert onehot2int(onehot) == labels_list


def test_ml_stats_match_oracle(ray_session, ml_data):
    import ray.data as rd

    from cleanlab_ray.state.multilabel import compute_multilabel_stats

    onehot, probs, labels_list = ml_data
    t = pa.table(
        {
            "labels": pa.array(labels_list, type=pa.list_(pa.int32())),
            "pred_probs": pa.FixedSizeListArray.from_arrays(
                pa.array(probs.reshape(-1).astype(np.float32)), K
            ),
        }
    )
    ds = rd.from_arrow(t)
    thresholds, cj = compute_multilabel_stats(ds, K)
    exp_t, exp_cj = _oracle_ml(onehot, probs.astype(np.float32).astype(np.float64))
    np.testing.assert_allclose(thresholds, exp_t, atol=1e-6)
    np.testing.assert_array_equal(cj, exp_cj)
    # each class's 2x2 sums to N
    assert (cj.sum(axis=(1, 2)) <= len(onehot)).all()


def test_ml_quality_scores(ray_session, ml_data):
    import ray.data as rd

    from cleanlab_ray.state.multilabel import make_ml_score_kernel

    onehot, probs, labels_list = ml_data
    t = pa.table(
        {
            "labels": pa.array(labels_list, type=pa.list_(pa.int32())),
            "pred_probs": pa.FixedSizeListArray.from_arrays(
                pa.array(probs.reshape(-1).astype(np.float32)), K
            ),
        }
    )
    # corrupt the probs of the first 100 rows (flip every class prob)
    probs2 = probs.copy()
    probs2[:100] = 1.0 - probs2[:100]
    t = pa.table(
        {
            "labels": t["labels"],
            "pred_probs": pa.FixedSizeListArray.from_arrays(
                pa.array(probs2.reshape(-1).astype(np.float32)), K
            ),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(make_ml_score_kernel(K), batch_format="pyarrow")
        .to_pandas()
    )
    s = out["multilabel_quality"].to_numpy()
    assert ((0 <= s) & (s <= 1)).all()
    assert s[:100].mean() < s[100:].mean() - 0.2
