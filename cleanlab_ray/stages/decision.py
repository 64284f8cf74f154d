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


def make_histogram_aggfn(score_col: str, num_bins: int = DEFAULT_BINS):
    """AggregateFn: fixed-bin histogram of a [0,1] score column
    (flat float64 accumulator; bin num_bins catches score==1.0)."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(acc, block: pa.Table):
        s = block[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
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
    # turn this cheap filter scan into thousands of kernel invocations
    boundary = ds.map_batches(
        filter_bin, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).to_pandas()
    boundary = boundary.sort_values([score_col, *key_cols], kind="mergesort")
    chosen = boundary.head(need)
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
