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
