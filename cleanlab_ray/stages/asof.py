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

Partitioning assumption (documented): one key's full history fits in a
block — identical to any groupby over the same key. Skewed mega-keys
would need key-range salting plus per-range boundary carry, which this
operator does not implement.
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
):
    """Left as-of join; returns left's columns + ``<col><suffix>`` for
    each of ``right_cols`` plus ``<ts_col><suffix>`` (null when no right
    row precedes the left row for that key)."""
    left_names = left.schema().names
    out_right = [*right_cols, ts_col]

    def tag(side: int, keep_cols):
        def kernel(batch: pa.Table) -> pa.Table:
            cols = {
                on: batch[on],
                ts_col: batch[ts_col],
                "_side": pa.array(np.full(batch.num_rows, side, dtype=np.int8)),
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

    _ls, _rs = left.schema(), right.schema()
    left_schema = dict(zip(_ls.names, _ls.types))
    right_schema = dict(zip(_rs.names, _rs.types))

    unioned = left.map_batches(tag(1, left_names), batch_format="pyarrow").union(
        right.map_batches(tag(0, right_cols), batch_format="pyarrow")
    )

    def join_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _empty_out(batch)
        key = batch[on].to_numpy(zero_copy_only=False)
        ts = batch[ts_col].to_numpy(zero_copy_only=False).view(np.int64)
        side = batch[ts_col if False else "_side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, ts, key))
        k_s, side_s = key[order], side[order]
        is_right = side_s == 0
        ridx = np.where(is_right, np.arange(n), -1)
        filled = np.maximum.accumulate(ridx)
        left_rows = np.flatnonzero(~is_right)
        src = filled[left_rows]
        valid = (src >= 0) & (k_s[src] == k_s[left_rows])
        src_abs = order[np.where(valid, src, 0)]
        out = batch.take(pa.array(order[left_rows])).drop_columns(
            ["_side", *[f"{c}{suffix}" for c in right_cols]]
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
        out = batch.drop_columns(["_side", *[f"{c}{suffix}" for c in right_cols]])
        for c in right_cols:
            out = out.append_column(f"{c}{suffix}", pa.nulls(0, right_schema[c]))
        return out.append_column(f"{ts_col}{suffix}", pa.nulls(0, right_schema[ts_col]))

    return unioned.sort(on).map_batches(
        join_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
