"""Distributed as-of join — an operator Ray Data lacks natively.

Semantics: for each left row, attach the right row with the greatest
``ts`` <= left.ts within the same key (DuckDB/pandas ``merge_asof``
backward semantics; on ts ties the right row is visible to the left
row).

Ray shape (the (a)-composition from the engine's custom-operator
policy): tag both sides, union, ONE hash/range exchange on the key
(``Dataset.sort(key)`` — the same co-location guarantee
``groupby().map_groups`` relies on), then a whole-block vectorized
kernel: per block lexsort (key, ts, side), forward-fill the last right
row index with ``np.maximum.accumulate``, validate the fill stayed
inside the key run, and ``take`` the right columns. No per-row Python,
no driver state.

Mega-key salting (``num_salts``): a key whose history exceeds one block
is split by TS range — linspace boundaries over the global ts span cut
each key into ``num_salts`` salt partitions, and the exchange key
becomes (key, salt). Correctness across the cut needs a CARRY: the left
rows at the head of salt partition s must still see the last right row
from salts < s. The carry is computed distributively: (1) per (key,
salt) reduce the right side to its max-ts row (one sort exchange over
the right side only, whole-block kernel); (2) per key, forward-
propagate that tiny summary across salt gaps (a second sorted-block map
over <= num_salts rows per key), emitting each carry as a SYNTHETIC
right row replicated into every later salt partition up to the next
right-bearing salt; (3) union the synthetic rows into the main
exchange. A carry's ts is strictly below its target partition's lower
boundary, so it sorts first and the unsalted kernel logic applies
unchanged with (key, salt) runs. Output == the unsalted join.
Boundaries come from one min/max aggregate over both sides' ts unless
passed explicitly (at scale pass ``boundaries`` to skip the pass).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def asof_join(
    left,
    right,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
    num_salts: int | None = None,
    boundaries: np.ndarray | None = None,
):
    """Left as-of join; returns left's columns + ``<col><suffix>`` for
    each of ``right_cols`` plus ``<ts_col><suffix>`` (null when no right
    row precedes the left row for that key)."""
    _ls, _rs = left.schema(), right.schema()
    if _ls is None or _rs is None:
        raise ValueError(
            "asof_join: empty input — cannot infer the join schema from "
            "a dataset with no rows"
        )
    left_names = _ls.names
    left_schema = dict(zip(_ls.names, _ls.types))
    right_schema = dict(zip(_rs.names, _rs.types))

    salted = num_salts is not None and num_salts > 1
    if salted and boundaries is None:
        boundaries = _ts_boundaries(left, right, ts_col, num_salts)
    if boundaries is not None:
        boundaries = np.asarray(boundaries, dtype=np.int64)
        num_salts_eff = len(boundaries) + 1
    else:
        num_salts_eff = 1

    def _ts_int(batch: pa.Table) -> np.ndarray:
        return batch[ts_col].to_numpy(zero_copy_only=False).view(np.int64)

    def _salt_of(ts_i: np.ndarray) -> np.ndarray:
        if boundaries is None:
            return np.zeros(len(ts_i), dtype=np.int32)
        return np.searchsorted(boundaries, ts_i, side="right").astype(np.int32)

    def tag(side: int):
        def kernel(batch: pa.Table) -> pa.Table:
            cols = {
                on: batch[on],
                ts_col: batch[ts_col],
                "_side": pa.array(np.full(batch.num_rows, side, dtype=np.int8)),
                "_salt": pa.array(_salt_of(_ts_int(batch))),
            }
            for c in left_names:
                if c in (on, ts_col):
                    continue
                cols[c] = (
                    batch[c] if side == 1 else pa.nulls(batch.num_rows, left_schema[c])
                )
            for c in right_cols:
                cols[f"{c}{suffix}"] = (
                    batch[c] if side == 0 else pa.nulls(batch.num_rows, right_schema[c])
                )
            return pa.table(cols)

        return kernel

    unioned = left.map_batches(tag(1), batch_format="pyarrow").union(
        right.map_batches(tag(0), batch_format="pyarrow")
    )

    if salted:
        unioned = unioned.union(
            _carry_rows(
                right.map_batches(tag(0), batch_format="pyarrow"),
                on, ts_col, num_salts_eff,
            )
        )

    def join_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _empty_out(batch)
        key = batch[on].to_numpy(zero_copy_only=False)
        salt = batch["_salt"].to_numpy(zero_copy_only=False)
        ts = _ts_int(batch)
        side = batch["_side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, ts, salt, key))
        k_s, sa_s, side_s = key[order], salt[order], side[order]
        is_right = side_s == 0
        ridx = np.where(is_right, np.arange(n), -1)
        filled = np.maximum.accumulate(ridx)
        left_rows = np.flatnonzero(~is_right)
        src = filled[left_rows]
        valid = (src >= 0) & (k_s[np.maximum(src, 0)] == k_s[left_rows]) & (
            sa_s[np.maximum(src, 0)] == sa_s[left_rows]
        )
        src_abs = order[np.where(valid, src, 0)]
        out = batch.take(pa.array(order[left_rows])).drop_columns(
            ["_side", "_salt", *[f"{c}{suffix}" for c in right_cols]]
        )
        null_mask = pa.array(~valid)
        for c in right_cols:
            vals = batch[f"{c}{suffix}"].take(pa.array(src_abs))
            vals = pc.if_else(null_mask, pa.nulls(len(left_rows), right_schema[c]), vals)
            out = out.append_column(f"{c}{suffix}", vals)
        rts = batch[ts_col].take(pa.array(src_abs))
        rts = pc.if_else(
            null_mask, pa.nulls(len(left_rows), right_schema[ts_col]), rts
        )
        return out.append_column(f"{ts_col}{suffix}", rts)

    def _empty_out(batch: pa.Table) -> pa.Table:
        out = batch.drop_columns(
            ["_side", "_salt", *[f"{c}{suffix}" for c in right_cols]]
        )
        for c in right_cols:
            out = out.append_column(f"{c}{suffix}", pa.nulls(0, right_schema[c]))
        return out.append_column(f"{ts_col}{suffix}", pa.nulls(0, right_schema[ts_col]))

    sort_keys = [on, "_salt"] if salted else on
    return unioned.sort(sort_keys).map_batches(
        join_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def _ts_boundaries(left, right, ts_col: str, num_salts: int) -> np.ndarray:
    """Interior int64 ts boundaries at linspace over the global span."""
    from ray.data.aggregate import Max, Min

    def to_int(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False).view(np.int64)
        return pa.table({"_ts": pa.array(ts)})

    lo_hi = []
    for ds in (left, right):
        stats = ds.select_columns([ts_col]).map_batches(
            to_int, batch_format="pyarrow"
        ).aggregate(Min("_ts"), Max("_ts"))
        lo_hi.append((stats["min(_ts)"], stats["max(_ts)"]))
    tmin = min(v[0] for v in lo_hi)
    tmax = max(v[1] for v in lo_hi)
    return np.linspace(tmin, tmax, num_salts + 1)[1:-1].astype(np.int64)


def _carry_rows(tagged_right, on: str, ts_col: str, num_salts: int):
    """Synthetic right rows carrying each (key, salt<s) last right row
    into salt partition s (see module docstring, step 2)."""
    from cleanlab_ray.stages.dedup import _run_starts, _sorted_block_map

    def last_per_key_salt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        key = batch[on].to_numpy(zero_copy_only=False)
        salt = batch["_salt"].to_numpy(zero_copy_only=False)
        ts = batch[ts_col].to_numpy(zero_copy_only=False).view(np.int64)
        order = np.lexsort((ts, salt, key))
        starts = _run_starts(key[order], salt[order])
        ends = np.append(starts[1:], n) - 1  # max-ts row per (key, salt) run
        return batch.take(pa.array(order[ends]))

    summaries = _sorted_block_map(tagged_right, [on, "_salt"], last_per_key_salt)

    def propagate(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        key = batch[on].to_numpy(zero_copy_only=False)
        salt = batch["_salt"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((salt, key))
        k_s, sa_s = key[order], salt[order]
        # target range for summary row i: salts (s_i, next_s_i] where
        # next_s_i is the key's next right-bearing salt (or num_salts-1)
        next_s = np.empty(n, dtype=np.int64)
        next_s[:-1] = np.where(k_s[1:] == k_s[:-1], sa_s[1:], num_salts - 1)
        next_s[-1] = num_salts - 1
        counts = np.maximum(next_s - sa_s, 0)
        total = int(counts.sum())
        if total == 0:
            return batch.slice(0, 0)
        rep = np.repeat(np.arange(n, dtype=np.int64), counts)
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        target = (sa_s[rep] + 1 + offs).astype(np.int32)
        out = batch.take(pa.array(order[rep]))
        return out.set_column(
            out.schema.get_field_index("_salt"), "_salt", pa.array(target)
        )

    return _sorted_block_map(summaries, on, propagate)
