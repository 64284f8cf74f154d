"""Source/sink parity layer.

The reference ingests HF datasets / DataFrames / dicts / lists / csv /
json / txt (/root/reference/cleanlab/datalab/internal/data.py:156-235)
and serializes audit state (datalab/datalab.py:581-622). Engine
equivalents, all returning ray.data.Dataset:

    read_any(path_or_obj)   — parquet/csv/json/txt dispatch + from_pandas
                              / from_arrow / from_items
    save_audit / load_audit — issues Dataset as partitioned parquet +
                              JSON sidecar for the small state
    format_labels           — string labels -> int codes + mapping
                              (internal/util.py:563-586), Arrow
                              dictionary-encode based
    validate_schema         — cheap head-of-pipeline validation
                              (internal/validation.py:13-113 analogue)
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa


def read_any(src: Any, **kwargs):
    """Dispatch on input type/extension (data.py:156-235 analogue)."""
    import pandas as pd
    import ray.data as rd

    if isinstance(src, str):
        lowered = src.lower()
        if lowered.endswith(".parquet") or os.path.isdir(src):
            return rd.read_parquet(src, **kwargs)
        if lowered.endswith(".csv"):
            return rd.read_csv(src, **kwargs)
        if lowered.endswith((".json", ".jsonl")):
            return rd.read_json(src, **kwargs)
        if lowered.endswith(".txt"):
            return rd.read_text(src, **kwargs)
        raise ValueError(f"unsupported path {src!r}")
    if isinstance(src, pd.DataFrame):
        return rd.from_pandas(src)
    if isinstance(src, pa.Table):
        return rd.from_arrow(src)
    if isinstance(src, dict):
        return rd.from_arrow(pa.table(src))
    if isinstance(src, list):
        return rd.from_items(src)
    raise TypeError(f"cannot ingest {type(src)}")


def format_labels(ds, label_col: str = "label"):
    """String labels -> int codes (0..K-1 by sorted name) + mapping,
    reproducing format_labels (internal/util.py:563-586) distributed:
    the label set comes from a unique() pass, the map is broadcast."""
    import pyarrow.compute as pc

    names = sorted(x for x in ds.unique(label_col) if x is not None)
    mapping = {name: i for i, name in enumerate(names)}

    def kernel(batch: pa.Table) -> pa.Table:
        vals = batch[label_col].to_pylist()
        codes = pa.array([mapping.get(v, -1) for v in vals], type=pa.int32())
        i = batch.column_names.index(label_col)
        return batch.set_column(i, label_col, codes)

    return ds.map_batches(kernel, batch_format="pyarrow"), {v: k for k, v in mapping.items()}


def validate_schema(ds, required: dict[str, pa.DataType]):
    """Fail fast if required columns/types are missing (free — schema
    metadata only, no scan)."""
    schema = ds.schema()
    fields = dict(zip(schema.names, schema.types))
    problems = []
    for name, typ in required.items():
        if name not in fields:
            problems.append(f"missing column {name!r}")
        elif typ is not None and fields[name] != typ:
            problems.append(f"column {name!r} has type {fields[name]}, expected {typ}")
    if problems:
        raise ValueError("schema validation failed: " + "; ".join(problems))
    return ds


def save_audit(result, out_dir: str):
    """AuditResult -> partitioned parquet + JSON sidecar
    (Datalab.save analogue, datalab/datalab.py:581-622)."""
    os.makedirs(out_dir, exist_ok=True)
    result.dataset.write_parquet(os.path.join(out_dir, "issues"))
    side = {"summaries": result.summaries, "info": result.info, "errors": result.errors}
    with open(os.path.join(out_dir, "audit.json"), "w") as f:
        json.dump(side, f, indent=1)
    return out_dir


def load_audit(out_dir: str):
    """Inverse of save_audit; returns (issues Dataset, sidecar dict)."""
    import ray.data as rd

    with open(os.path.join(out_dir, "audit.json")) as f:
        side = json.load(f)
    return rd.read_parquet(os.path.join(out_dir, "issues")), side
