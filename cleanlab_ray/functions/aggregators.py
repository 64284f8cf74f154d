"""Within-row / per-example score aggregators and regression scores.

- ``exponential_moving_average``: the reference's per-row multilabel
  score pool (/root/reference/cleanlab/internal/multilabel_scorer.py:134-203)
  — scores sorted descending, EMA with forgetting factor alpha,
  EMA_1 = largest score; returns the final EMA value per row.
- ``softmin``: the generalized softmin pool
  (internal/multilabel_scorer.py:206-233 / token_classification/rank.py:231-274).
- ``residual_score``: regression label quality ``exp(-|pred - y|)``
  (/root/reference/cleanlab/regression/rank.py:90-120).

All operate on (B, K) / (B,) ndarrays — map_batches-kernel shaped.
"""

from __future__ import annotations

import numpy as np

from cleanlab_ray.functions.numerics import softmax


def exponential_moving_average(s: np.ndarray, alpha: float | None = None) -> np.ndarray:
    """(B, K) scores -> (B,) EMA of the descending-sorted scores."""
    s = np.asarray(s, dtype=np.float64)
    b, k = s.shape
    if alpha is None:
        alpha = 2.0 / (k + 1)
    if not 0 <= alpha <= 1:
        raise ValueError("alpha must be in [0, 1]")
    s_sorted = np.flip(np.sort(s, axis=1), axis=1)
    ema = s_sorted[:, 0]
    for t in range(1, k):
        ema = alpha * s_sorted[:, t] + (1 - alpha) * ema
    return ema


def softmin(s: np.ndarray, temperature: float = 0.1) -> np.ndarray:
    """(B, K) scores -> (B,) softmin pool <s, softmax((1-s)/T)> per row."""
    s = np.asarray(s, dtype=np.float64)
    w = softmax(1.0 - s, temperature=temperature, axis=1, shift=True)
    return np.einsum("ij,ij->i", s, w)


def residual_score(labels: np.ndarray, predictions: np.ndarray) -> np.ndarray:
    """Regression label quality: ``exp(-|pred - y|)`` in (0, 1]."""
    return np.exp(-np.abs(np.asarray(predictions, dtype=np.float64) - labels))


def stratified_hash_folds(ids: np.ndarray, n_folds: int = 5) -> np.ndarray:
    """Deterministic CV fold assignment by multiplicative hash — the
    engine's analogue of the reference's StratifiedKFold split
    (cleanlab/count.py:989-997); stratification comes from hashing
    uniformly WITHIN each class when callers hash per-class ids."""
    h = (np.asarray(ids, dtype=np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
    return (h % np.uint64(n_folds)).astype(np.int64)
