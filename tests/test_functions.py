"""Pure-function kernels: EMA, softmin, residual score, folds, numerics."""

import numpy as np

from cleanlab_ray.functions.aggregators import (
    exponential_moving_average,
    residual_score,
    softmin,
    stratified_hash_folds,
)
from cleanlab_ray.functions.numerics import (
    round_preserving_row_totals,
    round_preserving_sum,
    softmax,
)


def test_ema_reference_semantics():
    # EMA over sorted-descending scores, EMA_1 = max, alpha=2/(K+1)
    s = np.array([[0.1, 0.9, 0.5]])
    # sorted desc: .9, .5, .1 ; alpha=0.5 -> 0.5*0.5+0.5*0.9=0.7 ; 0.5*0.1+0.5*0.7=0.4
    np.testing.assert_allclose(exponential_moving_average(s), [0.4])
    # alpha=0 -> stays at the max; alpha=1 -> ends at the min
    np.testing.assert_allclose(exponential_moving_average(s, alpha=0.0), [0.9])
    np.testing.assert_allclose(exponential_moving_average(s, alpha=1.0), [0.1])


def test_softmin_limits():
    s = np.array([[0.9, 0.6], [0.8, 0.8]])
    out = softmin(s, temperature=0.001)  # ~min
    np.testing.assert_allclose(out, [0.6, 0.8], atol=1e-6)
    out_hi = softmin(s, temperature=1000.0)  # ~mean
    np.testing.assert_allclose(out_hi, [0.75, 0.8], atol=1e-3)
    # reference docstring example (token_classification/rank.py:257-260)
    vals = softmin(np.array([[0.9, 0.6]]), temperature=0.05)
    np.testing.assert_allclose(vals, [6.00741787e-01], atol=1e-8)


def test_residual_score():
    np.testing.assert_allclose(residual_score(np.array([1.0]), np.array([1.0])), [1.0])
    assert residual_score(np.array([0.0]), np.array([5.0]))[0] < 0.01


def test_folds_deterministic_and_balanced():
    ids = np.arange(100_000)
    f1 = stratified_hash_folds(ids, 5)
    f2 = stratified_hash_folds(ids, 5)
    np.testing.assert_array_equal(f1, f2)
    counts = np.bincount(f1, minlength=5)
    assert counts.min() > 15_000  # roughly balanced


def test_round_preserving():
    x = np.array([0.4, 0.4, 0.4, 0.4, 0.4])  # sum = 2
    r = round_preserving_sum(x)
    assert r.sum() == 2
    m = np.array([[1.6, 2.4], [0.5, 3.5]])
    rm = round_preserving_row_totals(m)
    np.testing.assert_array_equal(rm.sum(axis=1), [4, 4])


def test_softmax_shift_invariance():
    x = np.array([[1000.0, 1001.0]])
    out = softmax(x, axis=1, shift=True)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out.sum(), 1.0)
