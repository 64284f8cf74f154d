"""Pure-numpy numeric kernels shared by Ray stages and the test oracle.

These implement the reference's scalar/array math semantics
(cleanlab/internal/numerics.py, cleanlab/internal/util.py) from scratch;
all operate on ndarrays and are safe to call inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np

from cleanlab_ray import EPSILON, FLOATING_POINT_COMPARISON


def softmax(
    x: np.ndarray, temperature: float = 1.0, axis: int | None = None, shift: bool = False
) -> np.ndarray:
    """Temperature softmax with optional max-shift.

    Semantics of cleanlab/internal/numerics.py:7-40.
    """
    x = x / max(temperature, EPSILON)
    if shift:
        x = x - np.max(x, axis=axis, keepdims=True)
    exp_x = np.exp(x)
    return exp_x / np.sum(exp_x, axis=axis, keepdims=True)


def clip_values(x: np.ndarray, low: float, high: float, new_sum: float | None = None) -> np.ndarray:
    """Clip into [low, high]; optionally rescale to sum to ``new_sum``.

    Semantics of cleanlab/internal/util.py:49-78.
    """
    out = np.clip(x, low, high)
    if new_sum is not None:
        out = out * (new_sum / float(np.sum(out)))
    return out


def round_preserving_sum(x: np.ndarray) -> np.ndarray:
    """Round floats to ints while preserving the (rounded) total.

    Semantics of cleanlab/internal/util.py:194-227 (iteround-style
    largest-remainder adjustment).
    """
    floats = np.asarray(x, dtype=float)
    ints = floats.round()
    orig_sum = np.sum(floats).round()
    int_sum = np.sum(ints).round()
    while abs(int_sum - orig_sum) > FLOATING_POINT_COMPARISON:
        diff = np.round(orig_sum - int_sum)
        increment = -1 if diff < 0.0 else 1
        changes = min(int(abs(diff)), len(floats))
        indices = np.argsort(floats - ints)[::-increment][:changes]
        for i in indices:
            ints[i] = ints[i] + increment
        int_sum = np.sum(ints).round()
    return ints.astype(int)


def round_preserving_row_totals(m: np.ndarray) -> np.ndarray:
    """Row-wise `round_preserving_sum` (cleanlab/internal/util.py:229-249)."""
    return np.apply_along_axis(round_preserving_sum, axis=1, arr=m).astype(int)


def normalized_entropy(pred_probs: np.ndarray) -> np.ndarray:
    """Per-row entropy normalized by log(K) — in [0, 1].

    Semantics of cleanlab/internal/label_quality_utils.py:68-118
    (``-sum(p log p)/log K`` with x*log(x) -> 0 at 0).
    """
    k = pred_probs.shape[1]
    with np.errstate(divide="ignore", invalid="ignore"):
        xlogy = np.where(pred_probs > 0, pred_probs * np.log(pred_probs), 0.0)
    return -np.sum(xlogy, axis=1) / np.log(k)


def value_counts_fill_missing(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """bincount over 0..K-1 with zeros for missing classes
    (cleanlab/internal/util.py:113-178)."""
    return np.bincount(labels, minlength=num_classes).astype(np.int64)
