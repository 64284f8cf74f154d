"""Deterministic distributed shuffle for training-data export.

Before training, a curated corpus is globally shuffled and written as
N reproducible shards ("shard 17 of seed 42" must mean the same rows
in the same order on every re-run, from any cluster size — so a failed
export can resume per shard and two runs produce byte-identical
shards). Ray's ``random_shuffle()`` is neither seeded-stable across
cluster shapes nor cheap (full all-to-all of every byte); this
operator derives order from a salted multiplicative hash of the row id
instead:

  z     = low32(id XOR (id >> 32)) XOR seed    (fold + salt)
  hv    = fmix32(z)                            (murmur3 finalizer)
  shard = hv mod n_shards
  pos   = rank of (hv, id) within the shard    (exact, gap-free)

One sort exchange over (shard, hv, id) co-locates and orders each
shard; the exact per-shard positions then come from the two-level scan
pattern of stages/prefix.py (per-block partial counts -> O(blocks)
driver offsets -> embarrassingly-parallel second map). Only the id +
hash columns ride the sort; payload columns can be re-attached by id
or carried through (they move once either way — the minimum any
shuffle can do).

The fmix32 xorshift-multiply avalanche matters here: a multiplicative
hash alone (the Knuth hash used by stratified_split / kfold /
mixture_sample) preserves low-bit structure — bit 0 of ``id*K`` IS bit
0 of ``id`` for odd K — so ``hv % n_shards`` would correlate with every
other low-bit decision made from the same ids (see ADVICE round 3:
correlated hashes make operator compositions statistically degenerate;
tested by test_shuffle.test_hash_decorrelated_from_split_hash). fmix32
mixes high bits into low, and stays exactly replicable in SQL (HUGEINT
product mod 2^32 == numpy uint64 wrap mod 2^32, since 2^32 | 2^64;
xor/shift are native DuckDB BIGINT ops).

Reference kinship: the reference shuffles in-memory with
``np.random.RandomState`` (e.g. /root/reference/cleanlab/internal/util.py
train/holdout splits); a seeded hash is the distributed-stable
equivalent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_M32 = np.uint64(0xFFFFFFFF)
_C1 = np.uint64(0x85EBCA6B)
_C2 = np.uint64(0xC2B2AE35)


def shuffle_hash(ids: np.ndarray, seed: int) -> np.ndarray:
    """Salted murmur3-fmix32 hash -> uint32 range (as int64)."""
    x = ids.astype(np.uint64)
    h = (x ^ (x >> np.uint64(32))) & _M32  # fold high bits of int64 ids
    h = h ^ np.uint64(seed & 0xFFFFFFFF)
    h ^= h >> np.uint64(16)
    h = (h * _C1) & _M32
    h ^= h >> np.uint64(13)
    h = (h * _C2) & _M32
    h ^= h >> np.uint64(16)
    return h.astype(np.int64)


def shuffled_shard_positions(
    ds,
    id_col: str,
    seed: int,
    n_shards: int,
    shard_col: str = "shard",
    pos_col: str = "pos",
):
    """Append ``shard`` (int32) and ``pos`` (int64, gap-free rank within
    the shard ordered by (hash, id)) to every row. ``id_col`` must be
    unique integers. One sort exchange + two O(blocks) passes."""

    def add_hash(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hv = shuffle_hash(ids, seed)
        batch = batch.append_column("_hv", pa.array(hv, type=pa.int64()))
        return batch.append_column(
            shard_col, pa.array((hv % n_shards).astype(np.int32))
        )

    sds = (
        ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None,
                       zero_copy_batch=True)
        .sort([shard_col, "_hv", id_col])
        .materialize()
    )

    # pass 1: one row per (block, shard)-run — the run's own first key +
    # its length. Within shard s the global row order is (hv, id), so
    # ordering runs by (s, run-first hv, run-first id) reproduces the
    # global run order exactly, even when a block spans a shard boundary
    # (the block's FIRST row would then carry the wrong shard's key).
    def block_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"run_id": pa.array([], type=pa.int64()),
                 "run_hv": pa.array([], type=pa.int64()),
                 "s": pa.array([], type=pa.int32()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        sh = batch[shard_col].to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(sh)) + 1])
        lens = np.diff(np.concatenate([starts, [len(sh)]]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hvs = batch["_hv"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"run_id": pa.array(ids[starts], type=pa.int64()),
             "run_hv": pa.array(hvs[starts], type=pa.int64()),
             "s": pa.array(sh[starts].astype(np.int32)),
             "cnt": pa.array(lens.astype(np.int64))}
        )

    from cleanlab_ray.functions.frames import typed_pandas

    parts = typed_pandas(
        sds.map_batches(
            block_counts, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        ),
        {"run_id": "int64", "run_hv": "int64", "s": "int32", "cnt": "int64"},
    )
    parts = parts.sort_values(["s", "run_hv", "run_id"], kind="mergesort")
    running: dict[int, int] = {}
    offsets: dict[int, int] = {}  # run-first id (unique) -> shard offset
    for rid, s, cnt in zip(parts["run_id"], parts["s"], parts["cnt"]):
        s = int(s)
        offsets[int(rid)] = running.get(s, 0)
        running[s] = running.get(s, 0) + int(cnt)

    # pass 2: in-block run-local positions + the broadcast block offsets
    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.drop_columns(["_hv"]).append_column(
                pos_col, pa.array([], type=pa.int64())
            )
        sh = batch[shard_col].to_numpy(zero_copy_only=False)
        n = len(sh)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(sh)) + 1])
        lens = np.diff(np.concatenate([starts, [n]]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.fromiter(
            (offsets[int(ids[st])] for st in starts),
            dtype=np.int64,
            count=len(starts),
        )
        local = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        pos = local + np.repeat(offs, lens)
        return batch.drop_columns(["_hv"]).append_column(
            pos_col, pa.array(pos, type=pa.int64())
        )

    return sds.map_batches(
        assign, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
