"""Out-of-distribution scoring API — parity with cleanlab's
``OutOfDistribution`` (/root/reference/cleanlab/outlier.py:26-370) for the
pred_probs-based methods, Dataset-shaped.

``fit`` runs the confident-threshold aggregate over a Dataset (when
``adjust_pred_probs``); ``score`` appends an ``ood_score`` column via a
stateless map_batches with the broadcast thresholds. Feature/kNN-based
scoring at engine scale goes through the LSH machinery instead
(cleanlab_ray.stages.ann / dedup.embedding_near_dup) — exact global kNN
is deliberately out of scope (SURVEY.md §4.3.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cleanlab_ray.functions.numerics import normalized_entropy, softmax
from cleanlab_ray.functions.rank import subtract_confident_thresholds
from cleanlab_ray.state.confident import labels_to_numpy, pred_probs_to_numpy


def ood_scores_from_pred_probs(
    pred_probs: np.ndarray,
    method: str = "entropy",
    confident_thresholds: np.ndarray | None = None,
    M: int = 100,
    gamma: float = 0.1,
) -> np.ndarray:
    """Per-row OOD scores (higher = more in-distribution), semantics of
    cleanlab/outlier.py:482-570 (entropy / least_confidence / gen)."""
    if confident_thresholds is not None:
        pred_probs = subtract_confident_thresholds(pred_probs, confident_thresholds)
    if method == "entropy":
        return 1.0 - normalized_entropy(pred_probs)
    if method == "least_confidence":
        return pred_probs.max(axis=1)
    if method == "gen":
        m = min(M, pred_probs.shape[1])
        probs = softmax(np.log(np.clip(pred_probs, 1e-300, None)), temperature=1.0, axis=1)
        top = np.sort(probs, axis=1)[:, -m:]
        neg_gen = np.sum(top**gamma * (1 - top) ** gamma, axis=1)
        return 1.0 - neg_gen / m
    raise ValueError(f"unknown method {method!r}")


class OutOfDistribution:
    """fit(ds) -> learn (K,) confident thresholds; score(ds) -> append
    ``ood_score`` (float32)."""

    def __init__(self, method: str = "entropy", adjust_pred_probs: bool = True):
        self.method = method
        self.adjust_pred_probs = adjust_pred_probs
        self.confident_thresholds: np.ndarray | None = None

    def fit(self, ds, num_classes: int, label_col: str = "label", probs_col: str = "pred_probs"):
        if self.adjust_pred_probs:
            from cleanlab_ray.state.confident import (
                make_threshold_aggfn,
                thresholds_from_partials,
            )

            acc = np.asarray(
                ds.aggregate(make_threshold_aggfn(num_classes, label_col, probs_col))[
                    "threshold_partials"
                ]
            )
            self.confident_thresholds = thresholds_from_partials(
                acc[:num_classes], acc[num_classes:].astype(np.int64)
            )
        return self

    def score(self, ds, probs_col: str = "pred_probs", out_col: str = "ood_score"):
        thresholds = self.confident_thresholds
        method = self.method

        def kernel(batch: pa.Table) -> pa.Table:
            probs = pred_probs_to_numpy(batch[probs_col]).astype(np.float64)
            s = ood_scores_from_pred_probs(probs, method, thresholds)
            return batch.append_column(out_col, pa.array(s.astype(np.float32)))

        return ds.map_batches(kernel, batch_format="pyarrow")


def estimate_pu_f1(labels: np.ndarray, prob_s_eq_1: np.ndarray) -> float:
    """PU-learning F1 estimate (cleanlab/internal/util.py:251-272):
    recall^2 / p(predicted positive) on positive-unlabeled data."""
    pred = prob_s_eq_1 >= 0.5
    true_positives = float(np.sum((pred == 1) & (labels == 1)))
    all_positives = float(np.sum(labels == 1))
    recall = true_positives / all_positives if all_positives else 0.0
    frac_positive = float(np.mean(pred))
    return recall**2 / frac_positive if frac_positive else np.nan
