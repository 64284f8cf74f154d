"""Fused per-turn classifier: model/heuristic signals -> pred_probs (K=3).

This is the engine's analogue of the reference's model `pred_probs`
input (/root/reference/cleanlab/filter.py:97-107): a fixed, deterministic
logistic head over the langid posterior, trigram-LM perplexity and
heuristic features, emitting a ``pred_probs`` fixed_size_list<float32>[3]
column (classes: 0 clean / 1 low_quality / 2 non_target_language).

Also provides the pass-2 score kernel that appends the cleanlab rank
scores (self_confidence / normalized_margin / confidence_weighted_entropy)
given the broadcast confident thresholds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cleanlab_ray.functions import rank as rank_fns
from cleanlab_ray.state.confident import labels_to_numpy, pred_probs_to_numpy

K = 3

# Perplexity normalization anchors under the dense trigram LM:
# clean wordlist text sits near exp(9), OOV-heavy junk near exp(10.5).
_PPL_LO, _PPL_HI = 8.5, 11.0


def _get(batch: pa.Table, name: str) -> np.ndarray:
    return batch[name].to_numpy(zero_copy_only=False).astype(np.float64)


def fused_pred_probs(batch: pa.Table) -> np.ndarray:
    """(B, 3) class probabilities from the scored batch columns."""
    p_en = _get(batch, "lang_prob_en")
    ppl = _get(batch, "ppl")
    rep = _get(batch, "repetition_ratio")
    sym = _get(batch, "symbol_ratio")
    short = _get(batch, "short_flag")
    empty = _get(batch, "empty_flag")

    ppl_n = np.clip((np.log(np.maximum(ppl, 1.0)) - _PPL_LO) / (_PPL_HI - _PPL_LO), 0, 1)
    badness = np.clip(
        1.3 * rep + 2.2 * sym + 0.9 * short + 1.5 * empty, 0.0, 2.0
    )

    z0 = 2.2 * p_en - 1.8 * badness - 0.8 * ppl_n + 0.4
    z1 = 3.2 * badness - 1.2
    z2 = 3.0 * (1.0 - p_en) + 0.8 * ppl_n - 1.4

    z = np.stack([z0, z1, z2], axis=1)
    z -= z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def attach_pred_probs(batch: pa.Table) -> pa.Table:
    """map_batches kernel: append the fused ``pred_probs`` column."""
    probs = fused_pred_probs(batch).astype(np.float32)
    col = pa.FixedSizeListArray.from_arrays(pa.array(probs.reshape(-1)), K)
    return batch.append_column("pred_probs", col)


def make_score_kernel(
    thresholds: np.ndarray | None = None,
    methods: tuple[str, ...] = ("self_confidence",),
    adjust_pred_probs: bool = False,
    label_col: str = "label",
    probs_col: str = "pred_probs",
):
    """Pass-2 map_batches kernel: append rank-score columns given the
    broadcast (K,) thresholds from the pass-1 aggregate."""
    thresholds = None if thresholds is None else np.asarray(thresholds, dtype=np.float64)

    def kernel(batch: pa.Table) -> pa.Table:
        labels = labels_to_numpy(batch[label_col])
        probs = pred_probs_to_numpy(batch[probs_col]).astype(np.float64)
        for method in methods:
            scores = rank_fns.get_label_quality_scores(
                labels,
                probs,
                method=method,
                adjust_pred_probs=adjust_pred_probs,
                confident_thresholds=thresholds,
            )
            batch = batch.append_column(
                f"score_{method}", pa.array(scores.astype(np.float32), type=pa.float32())
            )
        return batch

    return kernel
