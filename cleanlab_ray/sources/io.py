"""Partitioned, lineage-tracked parquet IO — the resumable-output layout.

North-rule contract (BASELINE.json): every partition emits a lineage
record (input files, row counts, score histogram) so a killed run can be
resumed by subtracting completed partitions from the input file list
(SURVEY.md §4.2 checkpoint row; the reference has no such machinery —
cleanlab is single-machine, /root/reference/cleanlab — so this layout is
engine-native).

Layout:
    out_dir/
      part=00000/ *.parquet      # one directory per input shard group
      part=00000/_lineage.json   # written AFTER the data (commit marker)
      ...
A partition is complete iff its ``_lineage.json`` exists; partial
parquet from a killed run is overwritten on resume.
"""

from __future__ import annotations

import json
import os
import time


def shard_input_files(input_dir: str, num_groups: int) -> list[list[str]]:
    """Deterministically group the input parquet files into partitions."""
    files = sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".parquet")
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    num_groups = max(1, min(num_groups, len(files)))
    groups: list[list[str]] = [[] for _ in range(num_groups)]
    for i, f in enumerate(files):
        groups[i % num_groups].append(f)
    return groups


def partition_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def lineage_path(out_dir: str, part: int) -> str:
    return os.path.join(partition_dir(out_dir, part), "_lineage.json")


def is_partition_done(out_dir: str, part: int) -> bool:
    return os.path.exists(lineage_path(out_dir, part))


def completed_partitions(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    done = set()
    for name in os.listdir(out_dir):
        if name.startswith("part=") and os.path.exists(
            os.path.join(out_dir, name, "_lineage.json")
        ):
            done.add(int(name.split("=")[1]))
    return done


def write_partition(ds, out_dir: str, part: int, input_files: list[str], extra: dict | None = None):
    """Write one partition's data then its lineage record (commit order:
    data first, marker last, so presence of the marker implies complete
    data)."""
    pdir = partition_dir(out_dir, part)
    os.makedirs(pdir, exist_ok=True)
    # clear partials from a previous killed run
    for f in os.listdir(pdir):
        if f.endswith(".parquet"):
            os.remove(os.path.join(pdir, f))
    ds.write_parquet(pdir)
    n_rows = sum(
        _parquet_rows(os.path.join(pdir, f))
        for f in os.listdir(pdir)
        if f.endswith(".parquet")
    )
    record = {
        "partition": part,
        "input_files": input_files,
        "rows_written": n_rows,
        "completed_at": time.time(),
    }
    if extra:
        record.update(extra)
    with open(lineage_path(out_dir, part), "w") as f:
        json.dump(record, f, indent=1)
    return record


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(path).num_rows


def read_lineage(out_dir: str) -> list[dict]:
    recs = []
    for part in sorted(completed_partitions(out_dir)):
        with open(lineage_path(out_dir, part)) as f:
            recs.append(json.load(f))
    return recs
