"""Sliding event-time window aggregation (streaming window shape).

Tumbling windows are a plain ``groupby(date_trunc)``; SLIDING windows
(width W, slide S, W = k*S) assign every event to k overlapping
windows. The scale-correct Ray shape is the pooling pattern:

- per batch, each event's k window-starts are computed arithmetically
  (np.repeat — no Python loop) and PRE-AGGREGATED to one partial row
  per (window, batch) via np.unique + bincount, so the shuffle moves
  ~k rows per batch instead of k rows per event;
- a tiny ``groupby(window_start)`` merges partials with native Sum/Min.

At 100 TB the exchange volume is O(windows x blocks), independent of
row count — the same pre-aggregate-before-groupby argument as
stages/pooling.pool_conversations_fast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sliding_window_agg(
    ds,
    ts_col: str = "ts",
    value_col: str = "value",
    width_us: int = 3_600_000_000,
    slide_us: int = 900_000_000,
):
    """Dataset[(window_start_us, n_events, sum_value)] — every window
    [w, w+width) with w on the slide grid and >= 1 event."""
    if width_us % slide_us:
        raise ValueError("width must be a multiple of slide")
    k = width_us // slide_us

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False).view(np.int64)
        val = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(ts)
        if n == 0:
            return pa.table(
                {
                    "window_start_us": pa.array([], type=pa.int64()),
                    "_n": pa.array([], type=pa.int64()),
                    "_sum": pa.array([], type=pa.float64()),
                }
            )
        # latest window containing ts starts at floor(ts/S)*S; the k-1
        # earlier grid starts also contain it
        last = (ts // slide_us) * slide_us
        starts = (last[:, None] - np.arange(k)[None, :] * slide_us).reshape(-1)
        vals = np.repeat(val, k)
        uniq, inv = np.unique(starts, return_inverse=True)
        return pa.table(
            {
                "window_start_us": pa.array(uniq),
                "_n": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64)),
                "_sum": pa.array(np.bincount(inv, weights=vals, minlength=len(uniq))),
            }
        )

    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("window_start_us")
        .aggregate(Sum("_n", alias_name="n_events"), Sum("_sum", alias_name="sum_value"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start_us": batch["window_start_us"],
                "n_events": pa.array(
                    batch["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "sum_value": batch["sum_value"],
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow")
