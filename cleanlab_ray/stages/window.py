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


def sessionize(ds, user_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value", gap_ms: int = 30 * 60 * 1000):
    """Gap-based sessionization: ONE exchange on the user key + a fully
    vectorized whole-block kernel (sessions are contiguous runs after an
    in-block (user, ts) lexsort, so counts/sums are reduceat-style run
    math — no per-user pandas group loop; the previous map_groups
    formulation paid the per-group roundtrip for every user).

    Returns Dataset[(user, session_id, n_events, sum_value_c)] with
    session_id counting from 0 per user and sum_value_c = round(sum*100).
    """
    import pyarrow.compute as pc

    from cleanlab_ray.stages.dedup import _sorted_block_map

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({
                user_col: batch[user_col],
                "session_id": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "sum_value_c": pa.array([], type=pa.int64()),
            })
        u = batch[user_col].to_numpy(zero_copy_only=False)
        ts_ms = (
            pc.cast(batch[ts_col].combine_chunks() if isinstance(
                batch[ts_col], pa.ChunkedArray) else batch[ts_col], pa.int64())
            .to_numpy(zero_copy_only=False) // 1000
        )
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((ts_ms, u))
        us, tss, vs = u[order], ts_ms[order], v[order]
        user_change = np.ones(n, dtype=bool)
        user_change[1:] = us[1:] != us[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = tss[1:] - tss[:-1]
        new_session = user_change | (gap > gap_ms)
        gsid = np.cumsum(new_session) - 1
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], n)
        n_events = ends - starts
        cs = np.concatenate([[0.0], np.cumsum(vs)])
        sums = cs[ends] - cs[starts]
        # session_id restarts at 0 per user
        user_run = np.cumsum(user_change) - 1
        first_gsid = gsid[np.flatnonzero(user_change)]
        sid = gsid[starts] - first_gsid[user_run[starts]]
        ukeys = batch[user_col]
        if isinstance(ukeys, pa.ChunkedArray):
            ukeys = ukeys.combine_chunks()
        return pa.table({
            user_col: ukeys.take(pa.array(order[starts])),
            "session_id": pa.array(sid.astype(np.int64)),
            "n_events": pa.array(n_events.astype(np.int64)),
            "sum_value_c": pa.array(np.round(sums * 100).astype(np.int64)),
        })

    return _sorted_block_map(ds.select_columns([user_col, ts_col, value_col]),
                             user_col, kernel)
