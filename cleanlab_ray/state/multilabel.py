"""Multi-label confident-joint math (one-vs-rest), distributed.

Reference semantics: /root/reference/cleanlab/internal/multilabel_utils.py
(int2onehot :57-75, stack_complement :22-41),
count.py:_get_confident_thresholds_multilabel (:1461-1500) and
_compute_confident_joint_multi_label — per class k the problem reduces
to the binary pair (labels=onehot[:,k], probs=[1-p_k, p_k]) giving a
(K, 2, 2) one-vs-rest confident joint; per-row quality = per-class
binary self-confidences pooled with the EMA aggregator
(internal/multilabel_scorer.py).

The labels column is Arrow ``list<int>`` (ragged class lists); all
partials are flat float64 arrays so Ray ships them without pickling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cleanlab_ray.functions.aggregators import exponential_moving_average
from cleanlab_ray.state.confident import (
    BIG_VALUE,
    pred_probs_to_numpy,
)
from cleanlab_ray import CONFIDENT_THRESHOLDS_LOWER_BOUND, FLOATING_POINT_COMPARISON


def int2onehot(labels: list[list[int]], k: int) -> np.ndarray:
    """List-of-class-lists -> (N, K) multi-hot (multilabel_utils.py:57-75,
    sklearn-free)."""
    out = np.zeros((len(labels), k), dtype=np.int8)
    for i, row in enumerate(labels):
        for c in row:
            out[i, c] = 1
    return out


def onehot2int(onehot: np.ndarray) -> list[list[int]]:
    return [list(np.nonzero(r)[0]) for r in onehot]


def labels_col_to_onehot(col, k: int) -> np.ndarray:
    """Arrow list<int> column -> (B, K) multi-hot, vectorized via
    flatten + parent indices."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.int64)
    parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    out = np.zeros((len(col), k), dtype=np.int8)
    out[parents, flat] = 1
    return out


def ml_threshold_partials(onehot: np.ndarray, probs: np.ndarray):
    """(K, 2) sums and counts of the one-vs-rest self-confidences:
    class k, bin j: mean over rows with onehot=j of (p_k if j else 1-p_k)."""
    pos = onehot.astype(bool)
    sums = np.zeros((probs.shape[1], 2))
    counts = np.zeros((probs.shape[1], 2), dtype=np.int64)
    sums[:, 1] = np.where(pos, probs, 0).sum(axis=0)
    counts[:, 1] = pos.sum(axis=0)
    sums[:, 0] = np.where(~pos, 1.0 - probs, 0).sum(axis=0)
    counts[:, 0] = (~pos).sum(axis=0)
    return sums, counts


def ml_thresholds_from_partials(sums: np.ndarray, counts: np.ndarray) -> np.ndarray:
    with np.errstate(invalid="ignore"):
        t = np.where(counts > 0, sums / np.maximum(counts, 1), BIG_VALUE)
    return np.clip(t, CONFIDENT_THRESHOLDS_LOWER_BOUND, None)


def ml_cj_partials(onehot: np.ndarray, probs: np.ndarray, thresholds: np.ndarray) -> np.ndarray:
    """(K, 2, 2) one-vs-rest confident-joint counts. For class k the
    binary probs are [1-p_k, p_k]; the binary confident rule is the
    same as the multiclass one (count.py:577-614) with K=2."""
    n, k = probs.shape
    cj = np.zeros((k, 2, 2), dtype=np.int64)
    for c in range(k):
        p = np.stack([1.0 - probs[:, c], probs[:, c]], axis=1)
        conf = p >= thresholds[c][None, :] - FLOATING_POINT_COMPARISON
        num_conf = conf.sum(axis=1)
        at_least_one = num_conf > 0
        guess = np.where(num_conf > 1, p.argmax(axis=1), conf.argmax(axis=1))
        lab = onehot[:, c].astype(np.int64)
        sel = at_least_one
        np.add.at(cj[c], (lab[sel], guess[sel]), 1)
    return cj


def make_ml_threshold_aggfn(k: int, labels_col: str = "labels", probs_col: str = "pred_probs"):
    from ray.data.aggregate import AggregateFn

    def accumulate_block(acc, block: pa.Table):
        onehot = labels_col_to_onehot(block[labels_col], k)
        probs = pred_probs_to_numpy(block[probs_col]).astype(np.float64)
        sums, counts = ml_threshold_partials(onehot, probs)
        partial = np.concatenate([sums.reshape(-1), counts.reshape(-1)])
        return np.asarray(acc, dtype=np.float64) + partial

    return AggregateFn(
        init=lambda _: np.zeros(4 * k, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64),
        name="ml_threshold_partials",
    )


def make_ml_cj_aggfn(k: int, thresholds: np.ndarray, labels_col: str = "labels",
                     probs_col: str = "pred_probs"):
    from ray.data.aggregate import AggregateFn

    thresholds = np.asarray(thresholds, dtype=np.float64)

    def accumulate_block(acc, block: pa.Table):
        onehot = labels_col_to_onehot(block[labels_col], k)
        probs = pred_probs_to_numpy(block[probs_col]).astype(np.float64)
        cj = ml_cj_partials(onehot, probs, thresholds)
        return np.asarray(acc, dtype=np.float64) + cj.reshape(-1)

    return AggregateFn(
        init=lambda _: np.zeros(4 * k, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64),
        name="ml_cj_partials",
    )


def compute_multilabel_stats(ds, k: int, labels_col: str = "labels",
                             probs_col: str = "pred_probs"):
    """Two aggregate passes -> ((K,2) thresholds, (K,2,2) confident joint)."""
    acc1 = np.asarray(
        ds.aggregate(make_ml_threshold_aggfn(k, labels_col, probs_col))[
            "ml_threshold_partials"
        ],
        dtype=np.float64,
    )
    sums = acc1[: 2 * k].reshape(k, 2)
    counts = acc1[2 * k :].reshape(k, 2)
    thresholds = ml_thresholds_from_partials(sums, counts)
    acc2 = np.asarray(
        ds.aggregate(make_ml_cj_aggfn(k, thresholds, labels_col, probs_col))[
            "ml_cj_partials"
        ],
        dtype=np.float64,
    )
    return thresholds, acc2.astype(np.int64).reshape(k, 2, 2)


def make_ml_score_kernel(k: int, alpha: float | None = 0.8,
                         labels_col: str = "labels", probs_col: str = "pred_probs"):
    """map_batches kernel appending per-row multilabel quality score:
    per-class binary self-confidence pooled with EMA
    (internal/multilabel_scorer.py; default alpha 0.8 per the reference
    Aggregator default)."""

    def kernel(batch: pa.Table) -> pa.Table:
        onehot = labels_col_to_onehot(batch[labels_col], k)
        probs = pred_probs_to_numpy(batch[probs_col]).astype(np.float64)
        class_scores = np.where(onehot.astype(bool), probs, 1.0 - probs)
        pooled = exponential_moving_average(class_scores, alpha=alpha)
        return batch.append_column(
            "multilabel_quality", pa.array(pooled.astype(np.float32))
        )

    return kernel
