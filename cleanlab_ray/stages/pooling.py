"""Per-conversation score pooling (min / mean / softmin) with salted
two-level aggregation for mega-conversation skew.

Pooling semantics are the reference's sentence-score pooling
(/root/reference/cleanlab/token_classification/rank.py:121-126, 231-274:
min pooling and softmin = <s, softmax((1-s)/T)>), applied per
conversation instead of per sentence.

All three pools decompose into commutative partials
(min -> min; mean -> (sum, n); softmin -> (sum s·e^{(1-s)/T}, sum e^{(1-s)/T}))
so the salted path — groupby((conv_id, turn_idx // salt)) partials, then
groupby(conv_id) merge — is exact, not approximate (SURVEY.md §4.2 skew
row). With s in [0,1] and T >= 0.05 the exponent is <= 20, so the
unshifted exponentials are numerically safe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TEMPERATURE = 0.05


def _grouped_min(s: np.ndarray, codes: np.ndarray, n_groups: int) -> np.ndarray:
    """Per-group min of ``s`` for factorized group ``codes`` (one argsort,
    reused as both the gather order and the segment-start source)."""
    order = np.argsort(codes, kind="stable")
    seg = np.searchsorted(codes[order], np.arange(n_groups))
    return np.minimum.reduceat(s[order], seg)


def _partials(scores: np.ndarray, temperature: float):
    e = np.exp((1.0 - scores) / temperature)
    return (
        float(np.min(scores)),
        float(np.sum(scores)),
        int(len(scores)),
        float(np.sum(scores * e)),
        float(np.sum(e)),
    )


def pool_conversations(
    ds,
    score_col: str = "score_self_confidence",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    temperature: float = TEMPERATURE,
    salt: int | None = None,
):
    """Dataset[(conv_id, turn_idx, score)] -> Dataset[(conv_id, n_turns,
    min_score, mean_score, softmin_score)].

    ``salt``: if set, adds a first-level groupby on
    (conv_id, turn_idx // salt) computing partials, then a second
    groupby(conv_id) merging them — bounding any single group to
    ``salt`` rows regardless of conversation length.
    """

    if salt is None:
        return pool_conversations_fast(
            ds, score_col=score_col, conv_col=conv_col,
            temperature=temperature)

    import pyarrow as pa

    from cleanlab_ray.stages.topk import sorted_group_agg

    # level 1: per-batch partials keyed (conv, turn_idx // salt), then a
    # sorted-run merge on that pair — any single first-level group holds
    # at most ``salt`` turns regardless of conversation length. Both
    # levels are the sorted-run Arrow kernel (one sort exchange +
    # O(rows) run merge each); no per-group pandas roundtrips anywhere
    # (the old map_groups formulation paid ~0.3 ms/group at BOTH levels
    # — the per-group wall BASELINE.md measured, twice).
    def batch_partials(batch: pa.Table) -> pa.Table:
        conv = batch[conv_col].to_pandas()
        bucket = (
            batch[turn_col].to_numpy(zero_copy_only=False).astype(np.int64)
            // salt
        )
        s = batch[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        codes, uniques = pd.factorize(
            pd.MultiIndex.from_arrays([conv, bucket]))
        n_groups = len(uniques)
        e = np.exp((1.0 - s) / temperature)
        return pa.table({
            # preserve the input key type (the pre-rewrite map_groups
            # path accepted any conv-id dtype, not just string)
            conv_col: pa.array(uniques.get_level_values(0),
                               type=batch.schema.field(conv_col).type),
            "_salt": pa.array(
                uniques.get_level_values(1).to_numpy().astype(np.int64)),
            "_min": pa.array(
                np.full(n_groups, np.inf) if n_groups == 0
                else _grouped_min(s, codes, n_groups)),
            "_sum": pa.array(np.bincount(codes, weights=s,
                                         minlength=n_groups)),
            "_n": pa.array(np.bincount(codes, minlength=n_groups)
                           .astype(np.int64)),
            "_a": pa.array(np.bincount(codes, weights=s * e,
                                       minlength=n_groups)),
            "_b": pa.array(np.bincount(codes, weights=e,
                                       minlength=n_groups)),
        })

    level1 = sorted_group_agg(
        ds.map_batches(batch_partials, batch_format="pyarrow"),
        [conv_col, "_salt"],
        {"_min": "min", "_sum": "sum", "_n": "sum", "_a": "sum",
         "_b": "sum"},
    )

    def rekey(batch: pa.Table) -> pa.Table:
        return pa.table({
            conv_col: batch[conv_col],
            "_min": batch["min(_min)"], "_sum": batch["sum(_sum)"],
            "_n": batch["sum(_n)"], "_a": batch["sum(_a)"],
            "_b": batch["sum(_b)"],
        })

    merged = sorted_group_agg(
        level1.map_batches(rekey, batch_format="pyarrow"),
        conv_col,
        {"_min": "min", "_sum": "sum", "_n": "sum", "_a": "sum",
         "_b": "sum"},
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["sum(_n)"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        return pa.table({
            conv_col: batch[conv_col],
            "n_turns": pa.array(n.astype(np.int64)),
            "min_score": batch["min(_min)"],
            "mean_score": pa.array(
                batch["sum(_sum)"].to_numpy(zero_copy_only=False)
                / np.maximum(n, 1.0)),
            "softmin_score": pa.array(
                batch["sum(_a)"].to_numpy(zero_copy_only=False)
                / np.maximum(
                    batch["sum(_b)"].to_numpy(zero_copy_only=False),
                    1e-300)),
        })

    return merged.map_batches(finalize, batch_format="pyarrow")


def pool_conversations_fast(
    ds,
    score_col: str = "score_self_confidence",
    conv_col: str = "conv_id",
    temperature: float = TEMPERATURE,
):
    """Pre-aggregated pooling: per-BATCH vectorized partials (one row per
    conversation per batch, computed with factorize + bincount — no
    per-group Python) merged by native Sum/Min aggregates, then a
    finalize map. Same results as ``pool_conversations`` (the partials
    are the same commutative decomposition); ~no map_groups overhead,
    and the shuffle moves one row per (conv, batch) instead of every
    turn — the 'pre-aggregate before groupby' pattern. The partial merge
    uses sorted_group_agg (one sort exchange + O(rows) run kernel), NOT
    the native groupby().aggregate — the native path pays ~0.3 ms per
    group and there is one group per conversation here, which at 10^8+
    conversations is exactly the per-group wall BASELINE.md measured."""
    import pyarrow as pa

    def batch_partials(batch: pa.Table) -> pa.Table:
        conv = batch[conv_col].to_pandas()
        s = batch[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        codes, uniques = pd.factorize(conv)
        n_groups = len(uniques)
        e = np.exp((1.0 - s) / temperature)
        return pa.table(
            {
                # preserve the input key type (any conv-id dtype works)
                conv_col: pa.array(
                    uniques, type=batch.schema.field(conv_col).type),
                "_min": pa.array(
                    np.full(n_groups, np.inf)
                    if n_groups == 0
                    else _grouped_min(s, codes, n_groups)
                ),
                "_sum": pa.array(np.bincount(codes, weights=s, minlength=n_groups)),
                "_n": pa.array(np.bincount(codes, minlength=n_groups).astype(np.int64)),
                "_a": pa.array(np.bincount(codes, weights=s * e, minlength=n_groups)),
                "_b": pa.array(np.bincount(codes, weights=e, minlength=n_groups)),
            }
        )

    from cleanlab_ray.stages.topk import sorted_group_agg

    merged = sorted_group_agg(
        ds.map_batches(batch_partials, batch_format="pyarrow"),
        conv_col,
        {"_min": "min", "_sum": "sum", "_n": "sum", "_a": "sum", "_b": "sum"},
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["sum(_n)"].to_numpy(zero_copy_only=False).astype(np.float64)
        out = pa.table(
            {
                conv_col: batch[conv_col],
                "n_turns": pa.array(n.astype(np.int64)),
                "min_score": batch["min(_min)"],
                "mean_score": pa.array(
                    batch["sum(_sum)"].to_numpy(zero_copy_only=False)
                    / np.maximum(n, 1.0)
                ),
                "softmin_score": pa.array(
                    batch["sum(_a)"].to_numpy(zero_copy_only=False)
                    / np.maximum(batch["sum(_b)"].to_numpy(zero_copy_only=False), 1e-300)
                ),
            }
        )
        return out

    return merged.map_batches(finalize, batch_format="pyarrow")
