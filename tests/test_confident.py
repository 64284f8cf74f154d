"""Aggregate exactness: Ray-distributed confident-joint math == oracle.

Mirrors the reference's batched-vs-in-memory equivalence test
(tests/test_filter_count.py:906) and its calibration invariants
(tests/test_filter_count.py:266-359).
"""

import numpy as np
import pytest

from cleanlab_ray.fixtures.oracle import (
    oracle_calibrate,
    oracle_confident_joint,
    oracle_confident_thresholds,
    oracle_num_label_issues,
)
from cleanlab_ray.state.confident import (
    calibrate_confident_joint,
    cj_partials,
    compute_confident_stats,
    finalize_confident_joint,
    threshold_partials,
    thresholds_from_partials,
)

K = 3


@pytest.fixture(scope="module")
def label_probs(small_corpus):
    from cleanlab_ray.state.confident import labels_to_numpy, pred_probs_to_numpy

    labels = labels_to_numpy(small_corpus["label"]).astype(np.int64)
    probs = pred_probs_to_numpy(small_corpus["pred_probs"]).astype(np.float64)
    return labels, probs


def test_partials_match_oracle_single_block(label_probs):
    labels, probs = label_probs
    sums, counts = threshold_partials(labels, probs, K)
    t = thresholds_from_partials(sums, counts)
    np.testing.assert_allclose(t, oracle_confident_thresholds(labels, probs), atol=1e-12)

    cj, n_issues, label_counts = cj_partials(labels, probs, t, K)
    cj = finalize_confident_joint(cj)
    np.testing.assert_array_equal(cj, oracle_confident_joint(labels, probs))
    assert n_issues == oracle_num_label_issues(labels, probs)
    np.testing.assert_array_equal(label_counts, np.bincount(labels, minlength=K))


def test_partials_merge_associative(label_probs):
    """Many-block partial merge == single block (order independence)."""
    labels, probs = label_probs
    t_full = thresholds_from_partials(*threshold_partials(labels, probs, K))

    for n_blocks in (2, 7, 31):
        splits = np.array_split(np.arange(len(labels)), n_blocks)
        sums = np.zeros(K)
        counts = np.zeros(K, dtype=np.int64)
        for s in splits:
            ps, pc_ = threshold_partials(labels[s], probs[s], K)
            sums += ps
            counts += pc_
        np.testing.assert_allclose(
            thresholds_from_partials(sums, counts), t_full, atol=1e-9
        )

        cj = np.zeros((K, K), dtype=np.int64)
        n_issues = 0
        for s in splits:
            c, ni, _ = cj_partials(labels[s], probs[s], t_full, K)
            cj += c
            n_issues += ni
        np.testing.assert_array_equal(
            finalize_confident_joint(cj), oracle_confident_joint(labels, probs)
        )
        assert n_issues == oracle_num_label_issues(labels, probs)


def test_calibration_invariants(label_probs):
    labels, probs = label_probs
    cj = oracle_confident_joint(labels, probs)
    cal = calibrate_confident_joint(cj, np.bincount(labels, minlength=K))
    assert cal.sum() == len(labels)
    np.testing.assert_array_equal(cal.sum(axis=1), np.bincount(labels, minlength=K))
    np.testing.assert_array_equal(cal, oracle_calibrate(cj, labels))


def test_ray_aggregate_matches_oracle(ray_session, corpus_dir, label_probs):
    import ray.data as rd

    labels, probs = label_probs
    ds = rd.read_parquet(corpus_dir, columns=["label", "pred_probs"])
    stats = compute_confident_stats(ds, K)
    np.testing.assert_allclose(
        stats.thresholds, oracle_confident_thresholds(labels, probs), atol=1e-9
    )
    np.testing.assert_array_equal(
        stats.confident_joint, oracle_confident_joint(labels, probs)
    )
    assert stats.num_issues == oracle_num_label_issues(labels, probs)
    assert stats.calibrated_joint.sum() == stats.n
    # latent estimates are valid distributions
    np.testing.assert_allclose(stats.py.sum(), 1.0, atol=1e-6)
    np.testing.assert_allclose(stats.noise_matrix.sum(axis=0), 1.0, atol=1e-9)


def test_converge_estimates_consistency():
    """converge_estimates drives py / noise / inverse into mutual
    consistency (reference count.py:1331-1404 behavior at K=3), checked
    against an independent NumPy port of the latent-algebra loop."""
    import numpy as np

    from cleanlab_ray.state.confident import converge_estimates

    rng = np.random.default_rng(5)
    K = 3
    nm = rng.random((K, K)) + np.eye(K) * 3
    nm /= nm.sum(axis=0)
    inv = rng.random((K, K)) + np.eye(K) * 3
    inv /= inv.sum(axis=0)
    py0 = np.array([0.5, 0.3, 0.2])
    ps = nm @ py0

    py, nm_out, inv_out = converge_estimates(ps, py0.copy(), nm.copy(), inv.copy())

    # independent port of the reference loop
    def clip_cols(m):
        d = np.diagonal(m)
        m = np.clip(m, 0, 0.9999)
        np.fill_diagonal(m, d)
        return m / np.clip(m.sum(axis=0), 1e-30, None)

    def clip_vals(x, low, new_sum):
        x = np.clip(x, low, 1.0)
        return x / x.sum() * new_sum

    py_r, nm_r, inv_r = py0.copy(), nm.copy(), inv.copy()
    for _ in range(3):
        for _ in range(5):
            inv_r = clip_cols((nm_r * py_r).T / np.clip(ps, 1e-30, None))
            py_r = clip_vals(
                inv_r.diagonal() / np.clip(nm_r.diagonal(), 1e-30, None) * ps,
                1e-6, 1.0)
        nm_r = clip_cols((inv_r * ps).T / np.clip(py_r, 1e-30, None))

    np.testing.assert_allclose(py, py_r, rtol=1e-9)
    np.testing.assert_allclose(nm_out, nm_r, rtol=1e-9)
    np.testing.assert_allclose(inv_out, inv_r, rtol=1e-9)
    # converged state is self-consistent: ps ~= noise_matrix @ py
    np.testing.assert_allclose(nm_out @ py, ps, atol=0.05)
