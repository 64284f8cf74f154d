"""Distributed `find_label_issues` — all five reference filter strategies.

Semantics: /root/reference/cleanlab/filter.py:91-449 (find_label_issues).
Strategies:

- ``low_self_confidence`` / ``low_normalized_margin``: global bottom-T by
  the rank score, T = num_label_issues (filter.py:321-337).
- ``confident_learning``: rows confidently counted off-diagonal
  (filter.py:311-319 + 425-427), reduce-veto applied.
- ``predicted_neq_given``: argmax(P) != label (filter.py:638-669),
  reduce-veto applied.
- ``prune_by_class`` / ``prune_by_noise_rate`` / ``both``: the per-class
  prune counts of filter.py:829-907, with the prune-count matrix
  adjustment of filter.py:539-635.

Scale design: the reference fans out one task per class over a
multiprocessing pool (filter.py:358-420) — a giant per-class group at
engine scale. Here every per-group top/bottom-T is solved with the same
two-pass histogram refinement as the flagship's global cutoff
(SURVEY.md §4.3.1): ONE aggregate produces per-group fixed-bin
histograms, the driver locates each group's boundary bin, only boundary
rows are pulled (expected group_size/num_bins), and the final mask pass
broadcasts (per-group thresholds + tiny boundary key sets). No group
ever materializes.

Tie-break everywhere is deterministic by (score, conv_id, turn_idx);
the reference's own tie order is argsort-arbitrary (it grants ±1,
label_issues_batched.py:403-406).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cleanlab_ray.state.confident import (
    ConfidentStats,
    compute_confident_stats,
    confident_rows,
    labels_to_numpy,
    pred_probs_to_numpy,
    reduce_issues_mask,
)
from cleanlab_ray.stages.decision import boundary_membership, encode_boundary_keys
from cleanlab_ray.state.prune import keep_at_least_n_per_class

NUM_BINS = 4096
KEYS = ("conv_id", "turn_idx")


def _cols(batch: pa.Table, label_col: str, probs_col: str):
    return (
        labels_to_numpy(batch[label_col]),
        pred_probs_to_numpy(batch[probs_col]).astype(np.float64),
    )


# ---------------------------------------------------------------------------
# Per-class self-confidence histograms (prune_by_class)
# ---------------------------------------------------------------------------

def _make_class_hist_aggfn(k: int, label_col: str, probs_col: str):
    from ray.data.aggregate import AggregateFn

    size = k * (NUM_BINS + 1)

    def accumulate_block(acc, block: pa.Table):
        labels, probs = _cols(block, label_col, probs_col)
        sc = probs[np.arange(len(labels)), labels]
        bins = np.clip((sc * NUM_BINS).astype(np.int64), 0, NUM_BINS)
        flat = labels * (NUM_BINS + 1) + bins
        return np.asarray(acc, dtype=np.float64) + np.bincount(flat, minlength=size)

    return AggregateFn(
        init=lambda _: np.zeros(size, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64),
        name="class_hist",
    )


# ---------------------------------------------------------------------------
# Per-(label, j) margin histograms (prune_by_noise_rate)
# ---------------------------------------------------------------------------

def _margin_scores(labels: np.ndarray, probs: np.ndarray) -> np.ndarray:
    """(B, K) normalized margins s_j = (p_j - p_label + 1) / 2 in [0,1]."""
    p_label = probs[np.arange(len(labels)), labels][:, None]
    return (probs - p_label + 1.0) / 2.0


def _make_margin_hist_aggfn(k: int, label_col: str, probs_col: str):
    from ray.data.aggregate import AggregateFn

    size = k * k * (NUM_BINS + 1)

    def accumulate_block(acc, block: pa.Table):
        labels, probs = _cols(block, label_col, probs_col)
        s = _margin_scores(labels, probs)  # (B, K)
        bins = np.clip((s * NUM_BINS).astype(np.int64), 0, NUM_BINS)
        j_idx = np.broadcast_to(np.arange(k), s.shape)
        flat = (labels[:, None] * k + j_idx) * (NUM_BINS + 1) + bins
        keep = j_idx != labels[:, None]  # only off-diagonal (j != label)
        return np.asarray(acc, dtype=np.float64) + np.bincount(
            flat[keep].ravel(), minlength=size
        )

    return AggregateFn(
        init=lambda _: np.zeros(size, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64),
        name="margin_hist",
    )


def _boundary_cut_bottom(hist: np.ndarray, t: int):
    """Bottom-t cut on one histogram: (bin_lo, need_in_bin, bin_id)."""
    cum = np.cumsum(hist)
    b = int(np.searchsorted(cum, t))
    count_below = int(cum[b - 1]) if b > 0 else 0
    return b / NUM_BINS, t - count_below, b


def _boundary_cut_top(hist: np.ndarray, t: int):
    """Top-t cut: (bin_hi, need_in_bin, bin_id) — rows with s > bin_hi all
    flagged."""
    cum_top = np.cumsum(hist[::-1])
    b_rev = int(np.searchsorted(cum_top, t))
    b = len(hist) - 1 - b_rev
    count_above = int(cum_top[b_rev - 1]) if b_rev > 0 else 0
    return (b + 1) / NUM_BINS, t - count_above, b


# ---------------------------------------------------------------------------
# find_label_issues
# ---------------------------------------------------------------------------

def find_label_issues(
    ds,
    *,
    filter_by: str = "prune_by_noise_rate",
    num_classes: int = 3,
    min_examples_per_class: int = 1,
    frac_noise: float = 1.0,
    label_col: str = "label",
    probs_col: str = "pred_probs",
    stats: ConfidentStats | None = None,
):
    """Append ``is_label_issue`` to ``ds``. Returns (Dataset, ConfidentStats).

    ``ds`` must carry (conv_id, turn_idx, label, pred_probs) and be
    re-scannable (materialized or parquet-backed)."""
    k = num_classes
    if stats is None:
        stats = compute_confident_stats(ds, k, label_col, probs_col)
    thresholds = stats.thresholds

    if filter_by in ("low_self_confidence", "low_normalized_margin"):
        from cleanlab_ray.stages.decision import make_issue_mask_kernel, resolve_bottom_t
        from cleanlab_ray.stages.scoring import make_score_kernel

        method = filter_by[4:]
        score_col = f"score_{method}"
        scored = ds.map_batches(
            make_score_kernel(methods=(method,), label_col=label_col, probs_col=probs_col),
            batch_format="pyarrow",
        ).materialize()
        bin_lo, boundary = resolve_bottom_t(scored, stats.num_issues, score_col=score_col)
        out = scored.map_batches(
            make_issue_mask_kernel(bin_lo, boundary, score_col=score_col),
            batch_format="pyarrow",
        )
        return out, stats

    if filter_by == "confident_learning":

        def kernel(batch: pa.Table) -> pa.Table:
            labels, probs = _cols(batch, label_col, probs_col)
            at_least_one, guess = confident_rows(labels, probs, thresholds)
            mask = at_least_one & (guess != labels)
            mask &= ~reduce_issues_mask(labels, probs)
            return batch.append_column("is_label_issue", pa.array(mask, type=pa.bool_()))

        return ds.map_batches(kernel, batch_format="pyarrow"), stats

    if filter_by == "predicted_neq_given":

        def kernel(batch: pa.Table) -> pa.Table:
            labels, probs = _cols(batch, label_col, probs_col)
            mask = probs.argmax(axis=1) != labels
            mask &= ~reduce_issues_mask(labels, probs)
            return batch.append_column("is_label_issue", pa.array(mask, type=pa.bool_()))

        return ds.map_batches(kernel, batch_format="pyarrow"), stats

    if filter_by not in ("prune_by_class", "prune_by_noise_rate", "both"):
        raise ValueError(f"unknown filter_by: {filter_by}")

    # prune filters — prune-count matrix on the driver (filter.py:343-349)
    pcm = keep_at_least_n_per_class(
        stats.confident_joint.T, n=min_examples_per_class, frac_noise=frac_noise
    )
    label_counts = stats.label_counts

    masks = {}
    if filter_by in ("prune_by_class", "both"):
        masks["class"] = _prune_by_class_mask(
            ds, k, pcm, label_counts, min_examples_per_class, label_col, probs_col
        )
    if filter_by in ("prune_by_noise_rate", "both"):
        masks["count"] = _prune_by_count_mask(
            ds, k, pcm, label_counts, min_examples_per_class, label_col, probs_col
        )

    def final_kernel(batch: pa.Table) -> pa.Table:
        labels, probs = _cols(batch, label_col, probs_col)
        mask = np.ones(len(labels), dtype=bool)
        for fn in masks.values():
            mask &= fn(batch, labels, probs)
        mask &= ~reduce_issues_mask(labels, probs)
        return batch.append_column("is_label_issue", pa.array(mask, type=pa.bool_()))

    return ds.map_batches(final_kernel, batch_format="pyarrow"), stats


def _pull_boundary(ds, selector, label_col, probs_col):
    """Run a map_batches returning only boundary rows (keys+info), small."""
    out = ds.map_batches(selector, batch_format="pyarrow").to_pandas()
    return out


def _prune_by_class_mask(ds, k, pcm, label_counts, min_examples, label_col, probs_col):
    """filter.py:829-864: within class k flag the (n_k - pcm[k,k]) rows
    with smallest P[:,k]."""
    hist = np.asarray(
        ds.aggregate(_make_class_hist_aggfn(k, label_col, probs_col))["class_hist"],
        dtype=np.int64,
    ).reshape(k, NUM_BINS + 1)

    bin_lo = np.zeros(k)
    need = np.zeros(k, dtype=np.int64)
    bin_id = np.full(k, -1, dtype=np.int64)
    for c in range(k):
        n_c = int(label_counts[c])
        t = n_c - int(pcm[c, c])
        if n_c <= min_examples or t < 1:
            continue
        bin_lo[c], need[c], bin_id[c] = _boundary_cut_bottom(hist[c], t)

    def boundary_selector(batch: pa.Table) -> pa.Table:
        labels, probs = _cols(batch, label_col, probs_col)
        sc = probs[np.arange(len(labels)), labels]
        bins = np.clip((sc * NUM_BINS).astype(np.int64), 0, NUM_BINS)
        sel = (bin_id[labels] >= 0) & (bins == bin_id[labels])
        idx = np.nonzero(sel)[0]
        return pa.table(
            {
                "conv_id": batch["conv_id"].take(pa.array(idx)),
                "turn_idx": batch["turn_idx"].take(pa.array(idx)),
                "_label": pa.array(labels[idx]),
                "_score": pa.array(sc[idx]),
            }
        )

    boundary = _pull_boundary(ds, boundary_selector, label_col, probs_col)
    boundary_keys: set = set()
    for c in range(k):
        if need[c] <= 0:
            continue
        g = boundary[boundary["_label"] == c].sort_values(
            ["_score", "conv_id", "turn_idx"], kind="mergesort"
        )
        chosen = g.head(int(need[c]))
        boundary_keys.update(zip(chosen["conv_id"], chosen["turn_idx"]))

    boundary_arr = encode_boundary_keys(boundary_keys)

    def mask_fn(batch: pa.Table, labels, probs) -> np.ndarray:
        sc = probs[np.arange(len(labels)), labels]
        mask = sc < bin_lo[labels]
        mask &= bin_id[labels] >= 0
        if len(boundary_arr):
            # only rows inside their class's boundary bin can be members
            bins = np.clip((sc * NUM_BINS).astype(np.int64), 0, NUM_BINS)
            cand = np.flatnonzero((bin_id[labels] >= 0) & (bins == bin_id[labels]))
            if len(cand):
                sub = batch.select(["conv_id", "turn_idx"]).take(pa.array(cand))
                memb = boundary_membership(sub, ("conv_id", "turn_idx"), boundary_arr)
                mask[cand[memb]] = True
        return mask

    return mask_fn


def _prune_by_count_mask(ds, k, pcm, label_counts, min_examples, label_col, probs_col):
    """filter.py:867-907: for rows labeled c, flag the pcm[j,c] largest
    margins (P[:,j] - P[:,c]) for every j != c."""
    hist = np.asarray(
        ds.aggregate(_make_margin_hist_aggfn(k, label_col, probs_col))["margin_hist"],
        dtype=np.int64,
    ).reshape(k, k, NUM_BINS + 1)

    bin_hi = np.full((k, k), 2.0)   # s > bin_hi flags; 2.0 = never
    need = np.zeros((k, k), dtype=np.int64)
    bin_id = np.full((k, k), -1, dtype=np.int64)
    for c in range(k):
        if int(label_counts[c]) <= min_examples:
            continue
        for j in range(k):
            if j == c:
                continue
            t = int(pcm[j, c])
            if t < 1:
                continue
            bin_hi[c, j], need[c, j], bin_id[c, j] = _boundary_cut_top(hist[c, j], t)

    def boundary_selector(batch: pa.Table) -> pa.Table:
        labels, probs = _cols(batch, label_col, probs_col)
        s = _margin_scores(labels, probs)  # (B, K)
        bins = np.clip((s * NUM_BINS).astype(np.int64), 0, NUM_BINS)
        sel = (bin_id[labels] >= 0) & (bins == bin_id[labels])  # (B, K)
        rows, js = np.nonzero(sel)
        return pa.table(
            {
                "conv_id": batch["conv_id"].take(pa.array(rows)),
                "turn_idx": batch["turn_idx"].take(pa.array(rows)),
                "_label": pa.array(labels[rows]),
                "_j": pa.array(js),
                "_score": pa.array(s[rows, js]),
            }
        )

    boundary = _pull_boundary(ds, boundary_selector, label_col, probs_col)
    boundary_keys: set = set()
    for c in range(k):
        for j in range(k):
            if need[c, j] <= 0:
                continue
            g = boundary[(boundary["_label"] == c) & (boundary["_j"] == j)]
            g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort").sort_values(
                "_score", ascending=False, kind="mergesort"
            )
            chosen = g.head(int(need[c, j]))
            boundary_keys.update(zip(chosen["conv_id"], chosen["turn_idx"]))

    boundary_arr = encode_boundary_keys(boundary_keys)

    def mask_fn(batch: pa.Table, labels, probs) -> np.ndarray:
        s = _margin_scores(labels, probs)
        over = s > bin_hi[labels]  # (B, K); diagonal is never set (bin_hi=2)
        mask = over.any(axis=1)
        if len(boundary_arr):
            # candidates: any (class, j) margin inside its boundary bin
            bins = np.clip((s * NUM_BINS).astype(np.int64), 0, NUM_BINS)
            in_bin = (bin_id[labels] >= 0) & (bins == bin_id[labels])  # (B, K)
            cand = np.flatnonzero(in_bin.any(axis=1))
            if len(cand):
                sub = batch.select(["conv_id", "turn_idx"]).take(pa.array(cand))
                memb = boundary_membership(sub, ("conv_id", "turn_idx"), boundary_arr)
                mask[cand[memb]] = True
        return mask

    return mask_fn
