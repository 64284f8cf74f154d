"""Distributed flag attachment: left_outer hash-join helpers.

Replaces driver-side broadcast of unbounded key sets (round-1 VERDICT
"What's wrong" #2): per-key flags/scores stay a Ray Dataset and are
attached to the big table with a hash-partitioned ``Dataset.join`` —
zero driver state, both sides stream.

Two practical obstacles the helpers absorb:
- the acero-backed join rejects list-typed payload columns, so every
  list column is transparently packed into ``large_binary`` (a zero-copy
  reinterpretation of the flat value buffer) before the join and
  unpacked after;
- joins also reject mismatched key dtypes and empty right sides, so
  integer keys are canonicalized to int64 on both sides (and restored)
  and a never-matching sentinel row keeps the right side non-empty.

Null list rows are treated as empty lists (pa flatten semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SENTINEL_STR = "\x00__no_match__\x00"
_SENTINEL_INT = -(1 << 62)


def _default_num_partitions() -> int:
    import ray

    return max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)


def _list_col_meta(schema: pa.Schema) -> dict:
    """{name: (kind, value_type)} for every packable list column."""
    meta = {}
    for f in schema:
        t = f.type
        if pa.types.is_list(t):
            if pa.types.is_primitive(t.value_type):
                meta[f.name] = ("list", t.value_type)
        elif pa.types.is_large_list(t):
            if pa.types.is_primitive(t.value_type):
                # distinct kind so unpack rebuilds the SAME type (a
                # large_list silently downgraded to list both changes
                # the schema and risks int32 offset overflow)
                meta[f.name] = ("large", t.value_type)
        elif pa.types.is_fixed_size_list(t):
            if pa.types.is_primitive(t.value_type):
                meta[f.name] = ("fixed", t.value_type, t.list_size)
    return meta


def make_list_packer(meta: dict):
    """map_batches kernel: list columns -> large_binary (raw LE values)."""

    def pack(batch: pa.Table) -> pa.Table:
        for name, m in meta.items():
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if m[0] == "fixed" and col.null_count:
                # a null fixed-size-list ROW flattens to zero slots, so
                # the unpacked column would be shorter than the batch
                # ("empty list" is not representable at fixed size)
                raise ValueError(
                    f"attach_flags_by_key: fixed_size_list column "
                    f"{name!r} has {col.null_count} null row(s); fill "
                    "them before the join"
                )
            flat = col.flatten()  # slice-safe, null ROWS -> skipped (empty)
            if flat.null_count:
                # a null ELEMENT would upcast the value buffer to
                # float64 and the raw bytes would be reinterpreted as
                # the integer dtype on unpack — silent garbage
                raise ValueError(
                    f"attach_flags_by_key: list column {name!r} has "
                    f"{flat.null_count} null element(s); fill them "
                    "before the join"
                )
            vals = flat.to_numpy(zero_copy_only=False)
            itemsize = np.dtype(m[1].to_pandas_dtype()).itemsize
            vals = np.ascontiguousarray(
                vals, dtype=np.dtype(m[1].to_pandas_dtype()))
            lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            lens = np.nan_to_num(lens.astype(np.float64), nan=0.0).astype(np.int64)
            bin_offsets = np.zeros(len(col) + 1, dtype=np.int64)
            np.cumsum(lens * itemsize, out=bin_offsets[1:])
            byte_view = np.ascontiguousarray(vals).view(np.uint8)
            packed = pa.Array.from_buffers(
                pa.large_binary(),
                len(col),
                [None, pa.py_buffer(bin_offsets), pa.py_buffer(byte_view)],
            )
            i = batch.column_names.index(name)
            batch = batch.set_column(i, name, packed)
        return batch

    return pack


def make_list_unpacker(meta: dict):
    """Inverse of make_list_packer."""

    def unpack(batch: pa.Table) -> pa.Table:
        for name, m in meta.items():
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            bufs = col.buffers()
            offs = np.frombuffer(bufs[1], dtype=np.int64)[
                col.offset : col.offset + len(col) + 1
            ]
            data = (
                np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
                if bufs[2] is not None
                else np.empty(0, np.uint8)
            )
            offs = offs - offs[0]
            value_type = m[1]
            np_dtype = np.dtype(value_type.to_pandas_dtype())
            vals = pa.array(data.view(np_dtype), type=value_type)
            if m[0] == "fixed":
                rebuilt = pa.FixedSizeListArray.from_arrays(vals, m[2])
            elif m[0] == "large":
                rebuilt = pa.LargeListArray.from_arrays(
                    pa.array(offs // np_dtype.itemsize, type=pa.int64()), vals)
            else:
                elem_offs = offs // np_dtype.itemsize
                if len(elem_offs) and elem_offs[-1] > np.iinfo(np.int32).max:
                    raise ValueError(
                        f"attach_flags_by_key: list column {name!r} has "
                        f"{elem_offs[-1]} elements in one batch — exceeds "
                        "int32 list offsets; use large_list upstream"
                    )
                rebuilt = pa.ListArray.from_arrays(
                    pa.array(elem_offs.astype(np.int32)), vals)
            i = batch.column_names.index(name)
            batch = batch.set_column(i, name, rebuilt)
        return batch

    return unpack


def _sentinel_frame(key_fields: list[tuple[str, pa.DataType]], fills: dict) -> pd.DataFrame:
    row = {}
    for name, t in key_fields:
        row[name] = _SENTINEL_STR if pa.types.is_string(t) or pa.types.is_large_string(t) else _SENTINEL_INT
    for name, v in fills.items():
        row[name] = v
    df = pd.DataFrame([row])
    for name, t in key_fields:
        if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
            df[name] = df[name].astype(np.int64)
    return df


def attach_flags_by_key(
    ds,
    flags,
    key_cols: tuple[str, ...],
    fills: dict,
    num_partitions: int | None = None,
):
    """left_outer join ``flags`` (compact Dataset keyed by key_cols whose
    other columns are listed in ``fills``) onto ``ds``; rows without a
    flag get the ``fills`` defaults. List columns of ``ds`` survive the
    join via binary packing; integer key dtypes are canonicalized to
    int64 for the join and restored after."""
    import ray.data as rd

    if num_partitions is None:
        num_partitions = _default_num_partitions()

    schema = ds.schema()
    meta = _list_col_meta(pa.schema(list(zip(schema.names, schema.types))))
    key_types = {n: t for n, t in zip(schema.names, schema.types) if n in key_cols}
    int_keys = [
        n for n in key_cols
        if pa.types.is_integer(key_types[n]) and key_types[n] != pa.int64()
    ]
    key_fields = [(n, key_types[n]) for n in key_cols]

    pack = make_list_packer(meta)

    def prep_left(batch: pa.Table) -> pa.Table:
        if meta:
            batch = pack(batch)
        for n in int_keys:
            i = batch.column_names.index(n)
            batch = batch.set_column(i, n, pc.cast(batch[n], pa.int64()))
        return batch

    flag_types = {n: pa.scalar(v).type for n, v in fills.items()}
    right_order = [*key_cols, *fills]

    def prep_right(batch: pa.Table) -> pa.Table:
        for n in key_cols:
            t = key_types[n]
            i = batch.column_names.index(n)
            want = pa.int64() if pa.types.is_integer(t) else pa.string() if pa.types.is_string(t) or pa.types.is_large_string(t) else t
            if batch.schema.field(n).type != want:
                batch = batch.set_column(i, n, pc.cast(batch[n], want))
        for n, want in flag_types.items():
            i = batch.column_names.index(n)
            if batch.schema.field(n).type != want:
                batch = batch.set_column(i, n, pc.cast(batch[n], want))
        return batch.select(right_order)

    sentinel = rd.from_pandas(_sentinel_frame(key_fields, fills))
    right = flags.map_batches(prep_right, batch_format="pyarrow").union(
        sentinel.map_batches(prep_right, batch_format="pyarrow")
    )
    left = ds.map_batches(prep_left, batch_format="pyarrow")
    joined = left.join(right, "left_outer", num_partitions=num_partitions, on=tuple(key_cols))

    unpack = make_list_unpacker(meta)

    def finish(batch: pa.Table) -> pa.Table:
        for name, fill in fills.items():
            i = batch.column_names.index(name)
            batch = batch.set_column(i, name, pc.fill_null(batch[name], fill))
        for n in int_keys:
            i = batch.column_names.index(n)
            batch = batch.set_column(i, n, pc.cast(batch[n], key_types[n]))
        if meta:
            batch = unpack(batch)
        return batch

    return joined.map_batches(finish, batch_format="pyarrow")
