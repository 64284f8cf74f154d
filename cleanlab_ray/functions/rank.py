"""Per-example label-quality scores (vectorized numpy, batch-safe).

Reproduces the scoring semantics of cleanlab/rank.py:464-582 and the
threshold-adjustment of cleanlab/internal/label_quality_utils.py:11-65.
Each function maps a ``(B,)`` int label vector + ``(B, K)`` prob matrix
to a ``(B,)`` float score — exactly the shape of a Ray Data
``map_batches`` kernel (labels/pred_probs are columns of the batch).
Lower scores = more likely label issues.
"""

from __future__ import annotations

import numpy as np

from cleanlab_ray import CLIPPING_LOWER_BOUND
from cleanlab_ray.functions.numerics import normalized_entropy


def self_confidence(labels: np.ndarray, pred_probs: np.ndarray) -> np.ndarray:
    """``score_i = P[i, labels_i]`` (cleanlab/rank.py:464-496)."""
    return pred_probs[np.arange(labels.shape[0]), labels]


def normalized_margin(labels: np.ndarray, pred_probs: np.ndarray) -> np.ndarray:
    """``(p_label - max p_other + 1) / 2`` (cleanlab/rank.py:499-542)."""
    sc = self_confidence(labels, pred_probs)
    masked = pred_probs.copy()
    masked[np.arange(labels.shape[0]), labels] = -np.inf
    max_prob_not_label = masked.max(axis=1)
    return (sc - max_prob_not_label + 1.0) / 2.0


def confidence_weighted_entropy(labels: np.ndarray, pred_probs: np.ndarray) -> np.ndarray:
    """``entropy(P)/self_conf`` rescaled ``log(x+1)/x``
    (cleanlab/rank.py:545-582)."""
    sc = np.clip(self_confidence(labels, pred_probs), CLIPPING_LOWER_BOUND, None)
    scores = normalized_entropy(pred_probs) / sc
    clipped = np.clip(scores, CLIPPING_LOWER_BOUND, None)
    return np.log(scores + 1.0) / clipped


def subtract_confident_thresholds(
    pred_probs: np.ndarray, confident_thresholds: np.ndarray
) -> np.ndarray:
    """Class-imbalance adjustment: subtract per-class threshold, shift
    by the max threshold, renormalize rows
    (cleanlab/internal/label_quality_utils.py:11-65)."""
    adj = pred_probs - confident_thresholds
    adj += confident_thresholds.max()
    adj /= adj.sum(axis=1, keepdims=True)
    return adj


SCORERS = {
    "self_confidence": self_confidence,
    "normalized_margin": normalized_margin,
    "confidence_weighted_entropy": confidence_weighted_entropy,
}


def get_label_quality_scores(
    labels: np.ndarray,
    pred_probs: np.ndarray,
    *,
    method: str = "self_confidence",
    adjust_pred_probs: bool = False,
    confident_thresholds: np.ndarray | None = None,
) -> np.ndarray:
    """Dispatch mirroring cleanlab/rank.py:get_label_quality_scores.

    When ``adjust_pred_probs`` is set, ``confident_thresholds`` must be
    supplied (in the engine they come from the pass-1 aggregate and are
    broadcast into the batch closure)."""
    if adjust_pred_probs:
        if confident_thresholds is None:
            raise ValueError("adjust_pred_probs requires confident_thresholds")
        pred_probs = subtract_confident_thresholds(pred_probs, confident_thresholds)
    return SCORERS[method](labels, pred_probs)
