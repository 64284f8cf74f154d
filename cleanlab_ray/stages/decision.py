"""Global bottom-T rank cutoff — the distributed order statistic.

Reference semantics: filter_by='low_self_confidence'
(/root/reference/cleanlab/filter.py:321-337): flag the T lowest-scored
rows where T = num_label_issues. A global argsort is an all-to-all sort
at scale, so the engine uses the exact two-pass refinement documented in
SURVEY.md §4.3.1:

  1. one histogram aggregate over the score column (fixed bins in [0,1])
     -> find the bin where the cumulative count crosses T;
  2. pull only that bin's rows (expected N/num_bins) to the driver,
     order them by (score, conv_id, turn_idx), and pick the remaining
     T - count_below keys exactly;
  3. broadcast (bin_lo, boundary key set) into a map_batches mask pass.

Ties at the boundary are broken deterministically by (conv_id, turn_idx)
— the reference's own tie order is argsort-arbitrary and it grants ±1
tolerance (label_issues_batched.py:403-406).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_BINS = 8192

#: boundary bins holding more rows than this get ONE recursive
#: histogram level (num_bins sub-bins inside the bin -> effective
#: resolution num_bins^2) before the key pull, so the driver-side
#: boundary set is O(N/num_bins^2) keys instead of O(N/num_bins).
#: At 10^12 turns / 8192 bins that is ~15k keys instead of ~10^8.
REFINE_PULL_THRESHOLD = 1 << 16


def check_scores(s: np.ndarray, score_col: str = "score") -> None:
    """Loud, not silently wrong: a NaN would be histogram-counted into
    bin 0 by the clip yet is invisible to the ``s < bin_lo`` mask kernel
    and the boundary pull, so fewer than T rows would be flagged;
    out-of-range scores skew the cutoff analogously. Shared by the
    standalone histogram aggregate and quality_filter's fused twins."""
    if len(s) and (np.isnan(s).any() or s.min() < 0.0 or s.max() > 1.0):
        raise ValueError(
            f"bottom-T decision: score column {score_col!r} must be "
            "NaN-free and within [0, 1]"
        )


def subhist_block_counts(scores: np.ndarray, b: int, num_bins: int) -> np.ndarray:
    """(num_bins,) counts of one block's scores over the sub-bins of
    coarse bin ``b``: sub-index = floor(s * num_bins^2) - b*num_bins.
    num_bins is a power of two, so s*num_bins and s*num_bins^2 are exact
    fp scalings — sub-bin membership agrees bit-exactly with the coarse
    histogram's bin assignment."""
    s = np.asarray(scores, dtype=np.float64)
    idx = (s * (num_bins * num_bins)).astype(np.int64) - b * num_bins
    sel = (idx >= 0) & (idx < num_bins)
    return np.bincount(idx[sel], minlength=num_bins).astype(np.int64)


def refine_boundary(sub_hist: np.ndarray, b: int, need: int, num_bins: int):
    """Given the boundary bin's sub-histogram, return the refined
    (pull_lo, pull_hi, need2): all rows with score < pull_lo are issues
    outright; ``need2`` more must be pulled from [pull_lo, pull_hi).
    The refined pull_lo is a num_bins^2-grid boundary inside coarse bin
    ``b``, so the (bin_lo, boundary_keys) contract of resolve_bottom_t
    is unchanged — the mask kernel's candidate window
    [bin_lo, bin_lo + 1/num_bins) still contains every boundary key."""
    cum = np.cumsum(np.asarray(sub_hist, dtype=np.int64))
    j = int(np.searchsorted(cum, need))
    below = int(cum[j - 1]) if j > 0 else 0
    n2 = num_bins * num_bins
    rb = b * num_bins + j
    return rb / n2, (rb + 1) / n2, need - below


def make_subhist_aggfn(score_col: str, b: int, num_bins: int = DEFAULT_BINS):
    """AggregateFn: sub-histogram of coarse bin ``b`` (see
    subhist_block_counts)."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(acc, block: pa.Table):
        s = block[score_col].to_numpy(zero_copy_only=False)
        return np.asarray(acc, dtype=np.int64) + subhist_block_counts(s, b, num_bins)

    return AggregateFn(
        init=lambda _: np.zeros(num_bins, dtype=np.int64),
        accumulate_block=accumulate_block,
        merge=lambda a, b_: np.asarray(a, dtype=np.int64) + np.asarray(b_, dtype=np.int64),
        name="score_subhist",
    )


def make_histogram_aggfn(score_col: str, num_bins: int = DEFAULT_BINS):
    """AggregateFn: fixed-bin histogram of a [0,1] score column
    (flat float64 accumulator; bin num_bins catches score==1.0)."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(acc, block: pa.Table):
        s = block[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        check_scores(s, score_col)
        idx = np.clip((s * num_bins).astype(np.int64), 0, num_bins)
        return np.asarray(acc, dtype=np.float64) + np.bincount(idx, minlength=num_bins + 1)

    return AggregateFn(
        init=lambda _: np.zeros(num_bins + 1, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64),
        name="score_histogram",
    )


def resolve_bottom_t(
    ds,
    t: int,
    score_col: str = "score_self_confidence",
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    num_bins: int = DEFAULT_BINS,
):
    """Find the exact bottom-T cutoff: returns (bin_lo, boundary_keys).

    Rows with score < bin_lo are all flagged; rows with
    bin_lo <= score < bin_hi are flagged iff their key is in
    boundary_keys (a small set, broadcast to the mask pass).
    """
    if t <= 0:
        return 0.0, set()
    hist = np.asarray(
        ds.aggregate(make_histogram_aggfn(score_col, num_bins))["score_histogram"],
        dtype=np.int64,
    )
    return resolve_bottom_t_from_hist(ds, hist, t, score_col, key_cols, num_bins)


def resolve_bottom_t_from_hist(
    ds,
    hist: np.ndarray,
    t: int,
    score_col: str = "score_self_confidence",
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    num_bins: int = DEFAULT_BINS,
):
    """Same as resolve_bottom_t but with a precomputed histogram (lets the
    caller fuse the histogram into another aggregate pass)."""
    if t <= 0:
        return 0.0, set()
    hist = np.asarray(hist, dtype=np.int64)
    cum = np.cumsum(hist)
    b = int(np.searchsorted(cum, t))  # first bin where cum >= t
    count_below = int(cum[b - 1]) if b > 0 else 0
    bin_lo = b / num_bins
    bin_hi = (b + 1) / num_bins
    need = t - count_below
    if need <= 0:
        return bin_lo, set()

    if b < num_bins and hist[b] > REFINE_PULL_THRESHOLD:
        # one recursive histogram level inside the boundary bin drops
        # the pulled key count from O(N/num_bins) to O(N/num_bins^2)
        sub = np.asarray(
            ds.aggregate(make_subhist_aggfn(score_col, b, num_bins))["score_subhist"],
            dtype=np.int64,
        )
        bin_lo, bin_hi, need = refine_boundary(sub, b, need, num_bins)
        if need <= 0:
            return bin_lo, set()

    # Pull only the boundary bin (expected N/num_bins rows).
    import pyarrow.compute as pc

    def filter_bin(batch: pa.Table) -> pa.Table:
        # select BEFORE filter: filtering the full table would copy the
        # wide pass-through columns (scrubbed text) just to drop them
        batch = batch.select([*key_cols, score_col])
        s = pc.cast(batch[score_col], pa.float64())
        mask = pc.and_(pc.greater_equal(s, bin_lo), pc.less(s, bin_hi))
        return batch.filter(mask)

    # batch_size=None: whole-block batches — the default 1024-row batches
    # turn this cheap filter scan into thousands of kernel invocations.
    # global_top_k (bottom-`need` by (score, keys)) prunes map-side to
    # <= need rows per block, so a boundary bin dominated by one exact
    # tied score value — which sub-bin refinement cannot split — pulls
    # O(blocks x need) survivors to the driver, never the whole bin.
    # (`need` itself bounds the broadcast boundary-key set either way.)
    from cleanlab_ray.stages.topk import global_top_k

    boundary_ds = ds.map_batches(
        filter_bin, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    chosen = global_top_k(
        boundary_ds, [score_col, *key_cols], need
    ).to_pandas()
    boundary_keys = set(zip(chosen[key_cols[0]], chosen[key_cols[1]]))
    return bin_lo, boundary_keys


def encode_boundary_keys(boundary_keys: set) -> np.ndarray:
    """Key tuples -> flat string encodings for vectorized membership."""
    return np.array(
        ["\x1f".join(str(p) for p in key) for key in boundary_keys], dtype=object
    )


def boundary_membership(batch: pa.Table, key_cols, boundary_arr: np.ndarray) -> np.ndarray:
    """Vectorized boundary-set membership: encode the batch keys with
    arrow kernels and np.isin against the (small) boundary array — no
    per-row Python."""
    import pyarrow.compute as pc

    parts = [pc.cast(batch[c], pa.string()) for c in key_cols]
    enc = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")
    return np.isin(np.asarray(enc.to_pandas(), dtype=object), boundary_arr)


def make_issue_mask_kernel(
    bin_lo: float,
    boundary_keys: set,
    score_col: str = "score_self_confidence",
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    out_col: str = "is_label_issue",
    num_bins: int = DEFAULT_BINS,
):
    """map_batches kernel appending the bottom-T boolean mask.

    Membership against the boundary key set is only POSSIBLE for rows
    whose score falls in the boundary bin (width 1/num_bins), so the
    string-encode + isin runs on ~N/num_bins candidate rows instead of
    every row — at 27M rows the full-batch isin was 12x the cost of the
    whole mask pass."""
    boundary_arr = encode_boundary_keys(boundary_keys)
    bin_hi = bin_lo + 1.0 / num_bins

    def kernel(batch: pa.Table) -> pa.Table:
        s = batch[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        mask = s < bin_lo
        if len(boundary_arr):
            cand = np.flatnonzero((s >= bin_lo) & (s < bin_hi))
            if len(cand):
                sub = batch.select(list(key_cols)).take(pa.array(cand))
                memb = boundary_membership(sub, key_cols, boundary_arr)
                mask[cand[memb]] = True
        return batch.append_column(out_col, pa.array(mask, type=pa.bool_()))

    return kernel
