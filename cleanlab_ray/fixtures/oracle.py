"""Pure NumPy/pandas single-process oracle for the engine's test suite.

A direct, full-array implementation of the reference semantics
(cleanlab/count.py, cleanlab/rank.py, cleanlab/filter.py,
cleanlab/token_classification/rank.py) — deliberately NOT sharing the
per-block partial code in ``cleanlab_ray.state.confident`` so tests
compare two independent codepaths (Ray-distributed partials vs direct
full-array math), mirroring the reference's own batched-vs-in-memory
equivalence test (tests/test_filter_count.py:906).
"""

from __future__ import annotations

import numpy as np

from cleanlab_ray import (
    CLIPPING_LOWER_BOUND,
    CONFIDENT_THRESHOLDS_LOWER_BOUND,
    FLOATING_POINT_COMPARISON,
    TINY_VALUE,
)


def oracle_confident_thresholds(labels: np.ndarray, pred_probs: np.ndarray) -> np.ndarray:
    k = pred_probs.shape[1]
    unique = set(np.unique(labels).tolist())
    t = np.array(
        [np.mean(pred_probs[labels == j, j]) if j in unique else 2.0 for j in range(k)]
    )
    return np.clip(t, CONFIDENT_THRESHOLDS_LOWER_BOUND, None)


def oracle_confident_joint(
    labels: np.ndarray,
    pred_probs: np.ndarray,
    thresholds: np.ndarray | None = None,
    calibrate: bool = False,
):
    if thresholds is None:
        thresholds = oracle_confident_thresholds(labels, pred_probs)
    k = pred_probs.shape[1]
    pp_bool = pred_probs >= thresholds - FLOATING_POINT_COMPARISON
    num_conf = pp_bool.sum(axis=1)
    at_least_one = num_conf > 0
    guess = np.where(num_conf > 1, pred_probs.argmax(axis=1), pp_bool.argmax(axis=1))
    cj = np.zeros((k, k), dtype=np.int64)
    for lab, g in zip(labels[at_least_one], guess[at_least_one]):
        cj[lab, g] += 1
    np.fill_diagonal(cj, cj.diagonal().clip(min=1))
    if calibrate:
        cj = oracle_calibrate(cj, labels)
    return cj


def oracle_calibrate(cj: np.ndarray, labels: np.ndarray) -> np.ndarray:
    from cleanlab_ray.functions.numerics import round_preserving_row_totals

    k = len(cj)
    label_counts = np.bincount(labels, minlength=k)
    calibrated = (cj.T / np.clip(cj.sum(axis=1), TINY_VALUE, None) * label_counts).T
    calibrated = calibrated / np.clip(calibrated.sum(), TINY_VALUE, None) * label_counts.sum()
    return round_preserving_row_totals(calibrated)


def oracle_reduce_mask(labels: np.ndarray, pred_probs: np.ndarray) -> np.ndarray:
    nudged = pred_probs.copy()
    nudged[np.arange(len(labels)), labels] += FLOATING_POINT_COMPARISON
    return nudged.argmax(axis=1) == labels


def oracle_num_label_issues(labels: np.ndarray, pred_probs: np.ndarray) -> int:
    """estimation_method='off_diagonal' (cleanlab/count.py:129-143)."""
    thresholds = oracle_confident_thresholds(labels, pred_probs)
    pp_bool = pred_probs >= thresholds - FLOATING_POINT_COMPARISON
    num_conf = pp_bool.sum(axis=1)
    at_least_one = num_conf > 0
    guess = np.where(num_conf > 1, pred_probs.argmax(axis=1), pp_bool.argmax(axis=1))
    mask = at_least_one & (guess != labels)
    mask[oracle_reduce_mask(labels, pred_probs)] = False
    return int(mask.sum())


def oracle_self_confidence(labels: np.ndarray, pred_probs: np.ndarray) -> np.ndarray:
    return pred_probs[np.arange(len(labels)), labels]


def oracle_low_self_confidence_mask(
    labels: np.ndarray,
    pred_probs: np.ndarray,
    tie_break: np.ndarray | None = None,
) -> np.ndarray:
    """filter_by='low_self_confidence' (cleanlab/filter.py:321-337):
    bottom-`num_label_issues` rows by self-confidence score.

    ``tie_break``: array sorted lexicographically after score to make tie
    order deterministic (the engine uses (conv_id, turn_idx); the
    reference's quicksort tie order is arbitrary and it grants ±1-rank
    tolerance, cleanlab/experimental/label_issues_batched.py:403-406).
    """
    scores = oracle_self_confidence(labels, pred_probs)
    num_errors = oracle_num_label_issues(labels, pred_probs)
    if tie_break is None:
        order = np.argsort(scores, kind="stable")
    else:
        order = np.lexsort((tie_break, scores))
    mask = np.zeros(len(labels), dtype=bool)
    mask[order[:num_errors]] = True
    return mask


def oracle_softmin_pool(scores: np.ndarray, temperature: float = 0.05) -> float:
    """softmin sentence score (cleanlab/token_classification/rank.py:231-274)."""
    if len(scores) == 0:
        return float("nan")
    if temperature == 0:
        return float(np.min(scores))
    if temperature == np.inf:
        return float(np.mean(scores))
    x = (1.0 - scores) / max(temperature, 1e-6)
    x = x - x.max()
    w = np.exp(x)
    w = w / w.sum()
    return float(np.dot(scores, w))


def oracle_pool_conversations(
    conv_ids: np.ndarray,
    turn_idx: np.ndarray,
    scores: np.ndarray,
    temperature: float = 0.05,
):
    """Per-conversation (min, mean, softmin) pooling under ascending
    turn_idx — returns dict conv_id -> (min, mean, softmin)."""
    import pandas as pd

    df = pd.DataFrame({"conv_id": conv_ids, "turn_idx": turn_idx, "score": scores})
    df = df.sort_values(["conv_id", "turn_idx"])
    out = {}
    for cid, g in df.groupby("conv_id", sort=False):
        s = g["score"].to_numpy()
        out[cid] = (
            float(np.min(s)),
            float(np.mean(s)),
            oracle_softmin_pool(s, temperature),
        )
    return out


# ---------------------------------------------------------------------------
# Prune-filter oracles (filter.py:829-907 semantics, deterministic ties)
# ---------------------------------------------------------------------------

def oracle_prune_by_class(
    labels: np.ndarray,
    pred_probs: np.ndarray,
    pcm: np.ndarray,
    keys,
    min_examples_per_class: int = 1,
) -> np.ndarray:
    """Direct full-array _prune_by_class (filter.py:829-864) with
    (score, key) tie-break. ``keys`` = (conv_id array, turn_idx array)."""
    conv, turn = keys
    mask = np.zeros(len(labels), dtype=bool)
    for c in range(pred_probs.shape[1]):
        idx = np.nonzero(labels == c)[0]
        n_c = len(idx)
        if n_c <= min_examples_per_class:
            continue
        t = n_c - int(pcm[c, c])
        if t < 1:
            continue
        sc = pred_probs[idx, c]
        order = np.lexsort((turn[idx], conv[idx], sc))
        mask[idx[order[:t]]] = True
    return mask


def oracle_prune_by_count(
    labels: np.ndarray,
    pred_probs: np.ndarray,
    pcm: np.ndarray,
    keys,
    min_examples_per_class: int = 1,
) -> np.ndarray:
    """Direct full-array _prune_by_count (filter.py:867-907) with
    (margin desc, key asc) tie-break."""
    conv, turn = keys
    k = pred_probs.shape[1]
    mask = np.zeros(len(labels), dtype=bool)
    for c in range(k):
        idx = np.nonzero(labels == c)[0]
        if len(idx) <= min_examples_per_class:
            continue
        for j in range(k):
            if j == c:
                continue
            t = int(pcm[j, c])
            if t < 1:
                continue
            margin = pred_probs[idx, j] - pred_probs[idx, c]
            order = np.lexsort((turn[idx], conv[idx], -margin))
            mask[idx[order[:t]]] = True
    return mask


def oracle_confident_learning_mask(labels: np.ndarray, pred_probs: np.ndarray) -> np.ndarray:
    thresholds = oracle_confident_thresholds(labels, pred_probs)
    pp_bool = pred_probs >= thresholds - FLOATING_POINT_COMPARISON
    num_conf = pp_bool.sum(axis=1)
    at_least_one = num_conf > 0
    guess = np.where(num_conf > 1, pred_probs.argmax(axis=1), pp_bool.argmax(axis=1))
    mask = at_least_one & (guess != labels)
    mask[oracle_reduce_mask(labels, pred_probs)] = False
    return mask
