"""Out-of-core ``.npy`` array reader — mmap-backed, driver-light.

Closes the reference's mmap/Zarr ingestion path
(/root/reference/cleanlab/experimental/label_issues_batched.py:148-170:
``np.load(..., mmap_mode="r")`` of labels / pred_probs so huge arrays
never fully materialize). Ray-Data-native shape:

- the DRIVER only parses the .npy headers (shape/dtype/offset — a few
  hundred bytes per file) and emits row-range descriptors;
- each TASK opens its own ``np.load(mmap_mode="r")`` (cached per worker
  process) and slices exactly its row range, so a worker touches only
  the bytes of its blocks — the OS page cache is the streaming layer,
  matching the reference's two-pass mmap protocol;
- 1-D arrays become scalar columns, 2-D arrays become
  ``FixedSizeListArray`` columns (the engine's pred_probs layout).

All files must share the leading dimension; rows stay aligned because
every block carries rows [start, stop) of EVERY file (the reference's
positional-alignment contract, SURVEY §2.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: per-worker-process mmap cache: path -> np.memmap (tasks of one stage
#: reuse worker processes, so each file is opened once per worker)
_MMAP_CACHE: dict[str, np.ndarray] = {}


def npy_header(path: str) -> tuple[tuple[int, ...], np.dtype]:
    """(shape, dtype) from the .npy header without reading the data."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        shape, fortran, dtype = np.lib.format._read_array_header(f, version)
        if fortran:
            raise ValueError(f"{path}: Fortran-ordered .npy not supported")
    return shape, dtype


def _mmap(path: str) -> np.ndarray:
    arr = _MMAP_CACHE.get(path)
    if arr is None:
        arr = np.load(path, mmap_mode="r")
        _MMAP_CACHE[path] = arr
    return arr


def _slice_to_column(path: str, start: int, stop: int) -> pa.Array:
    arr = _mmap(path)
    chunk = np.ascontiguousarray(arr[start:stop])  # copy out of the mmap
    if chunk.ndim == 1:
        return pa.array(chunk)
    if chunk.ndim == 2:
        k = chunk.shape[1]
        return pa.FixedSizeListArray.from_arrays(pa.array(chunk.reshape(-1)), k)
    raise ValueError(f"{path}: ndim {chunk.ndim} > 2 not supported")


def read_npy_columns(paths: dict[str, str], batch_rows: int = 65536):
    """``{column_name: path.npy} -> ray.data.Dataset`` streaming blocks.

    Driver work is O(files): header parse + row-range planning. Blocks
    are produced by tasks that mmap + slice their own ranges (zero
    driver materialization, out-of-core safe at any N).
    """
    import ray.data as rd

    shapes = {c: npy_header(p) for c, p in paths.items()}
    lead = set(sh[0] for sh, _dt in shapes.values())
    if len(lead) != 1:
        raise ValueError(
            f"leading dimensions differ across files: { {c: sh for c, (sh, _d) in shapes.items()} }"
        )
    n = lead.pop()
    ranges = [
        {"start": s, "stop": min(s + batch_rows, n)} for s in range(0, n, batch_rows)
    ]
    items = rd.from_items(ranges)

    cols = dict(paths)

    def load(batch: pa.Table) -> pa.Table:
        tables = []
        for start, stop in zip(
            batch["start"].to_pylist(), batch["stop"].to_pylist()
        ):
            tables.append(
                pa.table(
                    {c: _slice_to_column(p, start, stop) for c, p in cols.items()}
                    | {"row_id": pa.array(np.arange(start, stop, dtype=np.int64))}
                )
            )
        return pa.concat_tables(tables)

    return items.map_batches(load, batch_format="pyarrow", batch_size=1)
