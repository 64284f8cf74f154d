"""Distributed exact order statistics over unbounded numeric columns.

Generalizes the [0,1]-histogram machinery of stages/decision.py to any
numeric range: one (min, max, count) aggregate, one fixed-bin histogram
aggregate over [min, max], then a single boundary-bin pull (expected
N/num_bins rows) to resolve the requested ranks exactly. Nothing bigger
than one histogram bin ever lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_BINS = 8192


def _range_aggfn(col: str):
    from ray.data.aggregate import AggregateFn

    def accumulate_block(acc, block: pa.Table):
        s = np.asarray(block[col], dtype=np.float64)  # pandas or arrow block
        s = s[np.isfinite(s)]
        a = np.asarray(acc, dtype=np.float64).copy()
        if len(s):
            a[0] = min(a[0], float(s.min()))
            a[1] = max(a[1], float(s.max()))
            a[2] += len(s)
        return a

    def merge(a, b):
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        return np.array([min(a[0], b[0]), max(a[1], b[1]), a[2] + b[2]])

    return AggregateFn(
        init=lambda _: np.array([np.inf, -np.inf, 0.0]),
        accumulate_block=accumulate_block,
        merge=merge,
        name="range_stats",
    )


def _hist_aggfn(col: str, lo: float, hi: float, num_bins: int):
    from ray.data.aggregate import AggregateFn

    width = max(hi - lo, 1e-300)

    def accumulate_block(acc, block: pa.Table):
        s = np.asarray(block[col], dtype=np.float64)  # pandas or arrow block
        s = s[np.isfinite(s)]
        idx = np.clip(((s - lo) / width * num_bins).astype(np.int64), 0, num_bins - 1)
        return np.asarray(acc, dtype=np.float64) + np.bincount(idx, minlength=num_bins)

    return AggregateFn(
        init=lambda _: np.zeros(num_bins, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64),
        name="value_histogram",
    )


def exact_values_at_ranks(ds, col: str, ranks: list[int],
                          num_bins: int = DEFAULT_BINS, _range=None):
    """Exact values of ``col`` at the given 0-based ascending ranks
    (keyed by the REQUESTED rank; out-of-range requests clamp to the
    nearest finite-value rank internally but keep their key).

    Two compact aggregates + one filtered pull of only the bins that
    contain the requested ranks. ``_range``: precomputed
    ``_range_aggfn`` result, to skip the first scan."""
    rng = (_range if _range is not None
           else ds.aggregate(_range_aggfn(col))["range_stats"])
    lo, hi, n = float(rng[0]), float(rng[1]), int(rng[2])
    if n == 0:
        raise ValueError(f"no finite values in column {col!r}")
    clipped = {int(r): min(max(int(r), 0), n - 1) for r in ranks}
    if lo == hi:
        return {r: lo for r in clipped}
    hist = ds.aggregate(_hist_aggfn(col, lo, hi, num_bins))["value_histogram"]
    cum = np.concatenate([[0], np.cumsum(hist)])
    width = hi - lo
    out = {}
    needed_bins: dict[int, list] = {}
    for r, rc in clipped.items():
        b = int(np.searchsorted(cum, rc + 1, side="left")) - 1
        needed_bins.setdefault(b, []).append((r, rc))
    for b, rs in needed_bins.items():
        # membership uses the SAME rounding as the histogram kernel —
        # a >= b_lo float-edge predicate disagrees with the bincount's
        # astype(int64) at computed bin edges (off-by-one pulls /
        # IndexError); decision.py avoids this only because its [0,1]
        # power-of-two scaling is bit-exact, which arbitrary data
        # ranges are not
        def in_bin(batch: pa.Table, b=b) -> pa.Table:
            s = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            s = s[np.isfinite(s)]
            idx = np.clip(((s - lo) / width * num_bins).astype(np.int64),
                          0, num_bins - 1)
            return pa.table({col: pa.array(s[idx == b])})

        vals = np.sort(
            ds.map_batches(in_bin, batch_format="pyarrow")
            .to_pandas()[col]
            .to_numpy()
            .astype(np.float64)
        )
        base = int(cum[b])
        for r, rc in rs:
            out[r] = float(vals[rc - base])
    return out


def exact_median(ds, col: str, num_bins: int = DEFAULT_BINS) -> float:
    """Exact median with even-count interpolation (DuckDB/NumPy
    continuous semantics: mean of the two central order statistics)."""
    rng = ds.aggregate(_range_aggfn(col))["range_stats"]
    n = int(rng[2])
    if n == 0:
        raise ValueError(f"no finite values in column {col!r}")
    r_lo, r_hi = (n - 1) // 2, n // 2
    vals = exact_values_at_ranks(ds, col, [r_lo, r_hi], num_bins, _range=rng)
    return 0.5 * (vals[r_lo] + vals[r_hi])
