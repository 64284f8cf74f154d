"""Non-IID / drift detection over event time.

The reference's NonIIDIssueManager (/root/reference/cleanlab/datalab/
internal/issue_manager/noniid.py:60-446) tests whether kNN neighbors
cluster in ROW-INDEX order — meaningful only when row order encodes
collection order. In this engine row order is not stable across
shuffles (SURVEY.md §2.9), so the analogue keys on EVENT TIME: the
score distribution inside each time window is compared against the
global distribution with the same simplified KS statistic the
reference uses (noniid.py:19-57: max |ECDF_a - ECDF_b| over histogram
CDFs).

One aggregate computes the global histogram AND all per-window
histograms (flat partials); the KS comparison is O(windows × bins) on
the driver. A window with a large KS statistic means the metric
distribution drifted there.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def simplified_ks_statistic(hist_a: np.ndarray, hist_b: np.ndarray) -> float:
    """Reference semantics (noniid.py:19-57): max |CDF_a - CDF_b| of the
    normalized histograms."""
    a = hist_a / max(hist_a.sum(), 1)
    b = hist_b / max(hist_b.sum(), 1)
    return float(np.max(np.abs(np.cumsum(a) - np.cumsum(b))))


def drift_by_window(
    ds,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "hour",
    num_bins: int = 64,
    lo: float | None = None,
    hi: float | None = None,
):
    """Per-time-window KS drift of ``value_col`` vs the global
    distribution. Returns a pandas frame (window, n, ks_statistic)
    sorted by ks descending, plus the dataset-level score
    (1 - max_ks, higher = more IID) as an attribute dict.

    ``lo``/``hi``: histogram range; when None, a cheap min/max aggregate
    pass determines it.
    """
    from ray.data.aggregate import AggregateFn, Max, Min

    if lo is None or hi is None:
        row = ds.aggregate(Min(value_col), Max(value_col)) or {}
        vmin, vmax = row.get(f"min({value_col})"), row.get(f"max({value_col})")
        lo = float(vmin) if lo is None and vmin is not None else (lo or 0.0)
        hi = float(vmax) if hi is None and vmax is not None else (hi or 1.0)
    span = max(hi - lo, 1e-300)

    def accumulate_block(acc, block: pa.Table):
        # dict window -> histogram; plus "__global__"
        acc = dict(acc)
        win = pc.floor_temporal(block[ts_col], unit=window).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        vals = block[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # rows with a null timestamp (NaN after the int64->float64
        # promotion) or a null/NaN value can be assigned to no window /
        # no bin: drop them instead of crashing on int(NaN) or silently
        # bincounting INT64_MIN-casts into bin 0
        ok = ~(np.isnan(win.astype(np.float64)) | np.isnan(vals))
        if not ok.all():
            win, vals = win[ok], vals[ok]
        if len(vals) == 0:
            return acc
        bins = np.clip(((vals - lo) / span * num_bins).astype(np.int64), 0, num_bins - 1)
        for w in np.unique(win):
            m = win == w
            h = np.bincount(bins[m], minlength=num_bins)
            key = int(w)
            acc[key] = np.asarray(acc.get(key, np.zeros(num_bins)), dtype=np.float64) + h
        acc["__global__"] = np.asarray(
            acc.get("__global__", np.zeros(num_bins)), dtype=np.float64
        ) + np.bincount(bins, minlength=num_bins)
        return acc

    def merge(a, b):
        out = dict(a)
        for k, v in dict(b).items():
            out[k] = np.asarray(out.get(k, np.zeros(len(v))), dtype=np.float64) + np.asarray(
                v, dtype=np.float64
            )
        return out

    agg = AggregateFn(
        init=lambda _: {},
        accumulate_block=accumulate_block,
        merge=merge,
        name="window_hists",
    )
    hists = dict((ds.aggregate(agg) or {}).get("window_hists") or {})
    global_hist = np.asarray(
        hists.pop("__global__", np.zeros(num_bins)), dtype=np.float64)

    rows = []
    for w, h in hists.items():
        h = np.asarray(h, dtype=np.float64)
        rows.append(
            {
                "window_us": int(w),
                "n": int(h.sum()),
                "ks_statistic": simplified_ks_statistic(h, global_hist),
            }
        )
    out = pd.DataFrame(rows, columns=["window_us", "n", "ks_statistic"])
    out = out.sort_values("ks_statistic", ascending=False).reset_index(drop=True)
    out.attrs["dataset_score"] = 1.0 - (out["ks_statistic"].max() if len(out) else 0.0)
    return out
