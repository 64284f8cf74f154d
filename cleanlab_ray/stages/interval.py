"""Distributed range (interval) join — an operator Ray Data lacks.

Inner-joins point rows to interval rows of the same key where
``lo <= point value <= hi`` (both ends inclusive). A point may match
many intervals; every match is emitted.

Ray shape: tag + union both sides, ONE exchange on the key
(``sort(key)`` — the map_groups co-location guarantee), then a
whole-block vectorized kernel: per key run the point values are sorted
once, each interval finds its matching points with two searchsorted
probes, and the (point, interval) pair indices are materialized with
the counts/cumsum arange trick — no per-pair Python.

Mega-key salting (``num_salts``): a key whose points + intervals exceed
one block is split by VALUE range — the point domain is cut into
``num_salts`` bins at linspace boundaries, each point lands in exactly
one bin, and each interval is REPLICATED to every bin its [lo, hi]
spans. The exchange key becomes (key, bin), so no single partition
holds more than one bin of one key. Output is identical to the unsalted
join with no dedup pass: a (point, interval) match is emitted only in
the point's bin, and the interval is present there iff it overlaps that
bin. Replication factor = interval span / bin width (documented cost —
pick num_salts from the hot key's row count / target block rows).
Boundaries come from a one-pass min/max aggregate over the point values
unless passed explicitly (at scale pass ``boundaries`` to skip it).

Un-keyed range joins (key_col=None semantics) would need the same
binning without the key — this operator requires a key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def interval_join(
    points,
    intervals,
    key_col: str,
    val_col: str,
    lo_col: str,
    hi_col: str,
    suffix: str = "_iv",
    num_salts: int | None = None,
    boundaries: np.ndarray | None = None,
):
    """Returns point columns + every interval column suffixed, one output
    row per (point, containing interval) pair."""
    _ps, _is = points.schema(), intervals.schema()
    if _ps is None or _is is None:
        raise ValueError(
            "interval_join: empty input — cannot infer the join schema "
            "from a dataset with no rows"
        )
    p_schema = dict(zip(_ps.names, _ps.types))
    i_schema = dict(zip(_is.names, _is.types))
    p_cols = [c for c in p_schema if c != key_col]
    i_cols = [c for c in i_schema if c != key_col]

    if num_salts is not None and num_salts > 1 and boundaries is None:
        stats = points.select_columns([val_col]).aggregate(
            *_min_max_aggs(val_col)
        )
        vmin, vmax = float(stats[f"min({val_col})"]), float(stats[f"max({val_col})"])
        boundaries = np.linspace(vmin, vmax, num_salts + 1)[1:-1]
    if boundaries is not None:
        boundaries = np.asarray(boundaries, dtype=np.float64)

    def _salt_of(vals: np.ndarray) -> np.ndarray:
        if boundaries is None:
            return np.zeros(len(vals), dtype=np.int32)
        return np.searchsorted(boundaries, vals, side="right").astype(np.int32)

    def tag_points(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch[key_col],
                "_side": pa.array(np.zeros(batch.num_rows, dtype=np.int8))}
        for c in p_cols:
            cols[c] = batch[c]
        for c in i_cols:
            cols[f"{c}{suffix}"] = pa.nulls(batch.num_rows, i_schema[c])
        val = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cols["_salt"] = pa.array(_salt_of(val))
        return pa.table(cols)

    def tag_intervals(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        lo = batch[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = batch[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lo_bin, hi_bin = _salt_of(lo), _salt_of(hi)
        counts = (hi_bin - lo_bin + 1).astype(np.int64)
        total = int(counts.sum())
        rep = np.repeat(np.arange(n, dtype=np.int64), counts)
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        salts = (lo_bin[rep] + offs).astype(np.int32)
        taken = batch.take(pa.array(rep))
        cols = {key_col: taken[key_col],
                "_side": pa.array(np.ones(total, dtype=np.int8))}
        for c in p_cols:
            cols[c] = pa.nulls(total, p_schema[c])
        for c in i_cols:
            cols[f"{c}{suffix}"] = taken[c]
        cols["_salt"] = pa.array(salts)
        return pa.table(cols)

    unioned = points.map_batches(tag_points, batch_format="pyarrow").union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow")
    )

    out_names = [key_col, *p_cols, *[f"{c}{suffix}" for c in i_cols]]

    def join_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.select(out_names)
        key = batch[key_col].to_numpy(zero_copy_only=False)
        salt = batch["_salt"].to_numpy(zero_copy_only=False)
        side = batch["_side"].to_numpy(zero_copy_only=False)
        val = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lo = batch[f"{lo_col}{suffix}"].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = batch[f"{hi_col}{suffix}"].to_numpy(zero_copy_only=False).astype(np.float64)
        # sort (key, salt, side, val-or-lo): point values sorted per run
        sortv = np.where(side == 0, val, lo)
        order = np.lexsort((sortv, side, salt, key))
        k_s, sa_s, s_s = key[order], salt[order], side[order]
        # per (key, salt) run: points first (side 0, val ascending), then intervals
        run_change = np.ones(n, dtype=bool)
        run_change[1:] = (k_s[1:] != k_s[:-1]) | (sa_s[1:] != sa_s[:-1])
        run_id = np.cumsum(run_change) - 1
        is_pt = s_s == 0
        pt_rows = order[is_pt]                       # global rows, val-sorted per run
        pv = np.where(side == 0, val, 0.0)[pt_rows]  # sorted point values (concat runs)
        iv_rows_local = np.flatnonzero(~is_pt)
        if len(iv_rows_local) == 0 or len(pt_rows) == 0:
            return batch.select(out_names).slice(0, 0)
        iv_run = run_id[iv_rows_local]
        iv_abs = order[iv_rows_local]
        lo_v, hi_v = lo[iv_abs], hi[iv_abs]
        # pv is only sorted WITHIN runs — shift each run into its own
        # disjoint band so one global searchsorted probes all runs at
        # once. The band key is built from integer RANKS, not raw
        # floats: a float shift ((v - vmin) + run*span) loses low-order
        # bits once run*span is large, and two values ~1 ulp apart can
        # alias onto the band boundary, emitting a spurious pair (seen
        # at sf0.1: point 17.19 vs hi 17.189999999999998 under ~1e4
        # runs). Ranks preserve <, ==, > exactly, so the searchsorted
        # sides keep [lo, hi] inclusivity bit-exactly.
        run_of_pt = run_id[is_pt]
        uniq = np.unique(np.concatenate([pv, lo_v, hi_v]))
        span_i = np.int64(len(uniq) + 1)
        pv_sh = np.searchsorted(uniq, pv).astype(np.int64) + \
            run_of_pt.astype(np.int64) * span_i
        lo_sh = np.searchsorted(uniq, lo_v).astype(np.int64) + \
            iv_run.astype(np.int64) * span_i
        hi_sh = np.searchsorted(uniq, hi_v).astype(np.int64) + \
            iv_run.astype(np.int64) * span_i
        s_idx = np.searchsorted(pv_sh, lo_sh, side="left")
        e_idx = np.searchsorted(pv_sh, hi_sh, side="right")
        counts = np.maximum(e_idx - s_idx, 0)
        total = int(counts.sum())
        if total == 0:
            return batch.select(out_names).slice(0, 0)
        iv_rep = np.repeat(np.arange(len(iv_abs)), counts)
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        pt_idx = s_idx[iv_rep] + offs
        pt_abs = pt_rows[pt_idx]
        out = batch.select([key_col, *p_cols]).take(pa.array(pt_abs))
        iv_take = pa.array(iv_abs[iv_rep])
        for c in i_cols:
            out = out.append_column(f"{c}{suffix}", batch[f"{c}{suffix}"].take(iv_take))
        return out

    sort_keys = [key_col, "_salt"] if boundaries is not None else key_col
    return unioned.sort(sort_keys).map_batches(
        join_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def _min_max_aggs(col: str):
    from ray.data.aggregate import Max, Min

    return Min(col), Max(col)
