"""Distributed prefix sum (scan) + token-budget sequence packing.

Training-data pipelines shard a tokenized corpus into fixed-token-budget
sequences/shards ("pack the token stream into 2048-token windows, in
deterministic document order"). The assignment of document d is
``floor(exclusive_prefix_tokens(d) / budget)`` — a global ordered
cumulative sum, which Ray Data has no primitive for. The scan here is
the textbook two-level plan, driver work O(blocks):

1. sort by the order key and ``materialize()`` so block boundaries are
   stable across the two passes;
2. **pass 1** (``batch_size=None`` → one batch per block) emits one
   tiny row per block: (block's first key, block total);
3. the driver sorts those rows by first key and computes the exclusive
   per-block offsets — O(blocks) scalars, never row data;
4. **pass 2** re-maps the same blocks: in-block ``np.cumsum`` plus the
   broadcast offset looked up by the block's first key.

Keys must be globally unique (they order the scan), so a block's first
key identifies it. At 256-node scale both passes are embarrassingly
parallel; the only sequential state is the O(blocks) offset table.

Reference kinship: cleanlab's two-pass streaming protocol
(/root/reference/cleanlab/experimental/label_issues_batched.py:99-170)
is the same shape — a cheap global pass that makes the second pass
embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def exclusive_prefix_sum(ds, key_col: str, value_col: str, out_col: str = "prefix"):
    """Globally ordered exclusive cumulative sum of ``value_col``.

    Returns (sorted materialized Dataset with ``out_col`` added, total).
    ``key_col`` values must be unique.
    """
    sds = ds.sort(key_col).materialize()

    def _int_vals(batch: pa.Table) -> np.ndarray:
        col = batch[value_col]
        if col.null_count:
            # a null would surface as NaN and cast to INT64_MIN,
            # silently corrupting every downstream prefix — refuse
            raise ValueError(
                f"exclusive_prefix_sum: value column {value_col!r} "
                f"contains {col.null_count} null(s)"
            )
        return np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.int64)

    def block_total(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"first_key": pa.array([], type=batch[key_col].type),
                 "total": pa.array([], type=pa.int64())}
            )
        vals = _int_vals(batch)
        return pa.table(
            {"first_key": batch[key_col].take(pa.array([0])),
             "total": pa.array([int(vals.sum())], type=pa.int64())}
        )

    from cleanlab_ray.functions.frames import typed_pandas

    parts = typed_pandas(
        sds.map_batches(block_total, batch_format="pyarrow", batch_size=None),
        {"first_key": "int64", "total": "int64"},
    )
    parts = parts.sort_values("first_key")
    offs = np.concatenate([[0], parts["total"].to_numpy().cumsum()[:-1]]).astype(np.int64)
    offset_by_first = dict(zip(parts["first_key"].tolist(), offs.tolist()))
    total = int(parts["total"].sum())

    def add_prefix(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], type=pa.int64()))
        vals = _int_vals(batch)
        base = offset_by_first[batch[key_col][0].as_py()]
        prefix = base + np.concatenate([[0], vals.cumsum()[:-1]]).astype(np.int64)
        return batch.append_column(out_col, pa.array(prefix, type=pa.int64()))

    return (
        sds.map_batches(add_prefix, batch_format="pyarrow", batch_size=None),
        total,
    )


def pack_sequences(ds, key_col: str, value_col: str, budget: int,
                   seq_col: str = "seq_id"):
    """Assign each row to the fixed-budget sequence where its token
    span starts: ``seq = floor(exclusive_prefix / budget)`` in global
    ``key_col`` order — the deterministic contiguous-fill packing used
    to shard token streams for training."""
    scanned, _total = exclusive_prefix_sum(ds, key_col, value_col, out_col="_prefix")

    def assign(batch: pa.Table) -> pa.Table:
        pref = np.asarray(batch["_prefix"].to_numpy(zero_copy_only=False))
        batch = batch.drop_columns(["_prefix"])
        return batch.append_column(
            seq_col, pa.array((pref // budget).astype(np.int64), type=pa.int64())
        )

    return scanned.map_batches(assign, batch_format="pyarrow")
