"""Bloom-prefiltered exact semijoin (semijoin pushdown).

"Keep the rows of a huge table whose key appears in a smaller table"
(blocklists, decontamination ids, customer segments) is a semijoin. A
plain distributed join shuffles every left row; at 100 TB most of them
are non-members and shuffle for nothing. The bloom pattern:

1. ONE AggregateFn pass folds the right side's keys into an m-bit
   bloom bitmap (flat uint8 ndarray, merge = bitwise OR — mergeable and
   order-independent);
2. the bitmap is broadcast once (``ray.put``) and a stateless map
   prefilters the left side — non-members are dropped at the scan with
   false-positive rate ~ (1 - e^{-hn/m})^h, so only
   |members| + FP x |left| rows enter the exchange;
3. the surviving candidates are verified EXACTLY by a hash join against
   the right keys (functions/joins.attach_flags_by_key), so the result
   is byte-identical to the exact semijoin regardless of FP rate — the
   bloom only shrinks the join's input, never changes its output.

Hashing: splitmix64 finalizer (stages/sketches._mix64) + double hashing
h_i = h1 + i*h2 (Kirsch & Mitzenmacher 2006), all vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cleanlab_ray.stages.sketches import _mix64

_SALT2 = np.uint64(0x9E3779B97F4A7C15)


def _key_hashes(col) -> np.ndarray:
    """uint64 hashes of a key column (int or string), vectorized."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        return _mix64(v)
    from cleanlab_ray.stages.dedup import polynomial_string_hashes

    return _mix64(polynomial_string_hashes(col))


def _bit_positions(h: np.ndarray, m_bits: int, n_hashes: int) -> np.ndarray:
    """(n_hashes, N) bit indices via double hashing."""
    h1 = h
    h2 = _mix64(h ^ _SALT2) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)).astype(np.int64)


def make_bloom_aggfn(key_col: str, m_bits: int = 1 << 20, n_hashes: int = 5,
                     name: str = "bloom"):
    """AggregateFn folding a key column into an m-bit bloom bitmap."""
    from ray.data.aggregate import AggregateFn

    nbytes = (m_bits + 7) // 8

    def accumulate_block(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        h = _key_hashes(block[key_col])
        if len(h) == 0:
            return acc
        pos = _bit_positions(h, m_bits, n_hashes).reshape(-1)
        out = acc.copy()
        np.bitwise_or.at(out, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return out

    return AggregateFn(
        init=lambda _k: np.zeros(nbytes, dtype=np.uint8),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.bitwise_or(a, b),
        name=name,
    )


def bloom_maybe_contains(bitmap: np.ndarray, h: np.ndarray, m_bits: int,
                         n_hashes: int) -> np.ndarray:
    """(N,) bool — True iff all n_hashes bits are set (may false-positive,
    never false-negative)."""
    if len(h) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bit_positions(h, m_bits, n_hashes)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=0)


def bloom_semijoin(
    left,
    right,
    left_key: str,
    right_key: str | None = None,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    broadcast_limit: int = 2_000_000,
):
    """Rows of ``left`` whose ``left_key`` appears in ``right``'s key
    column — exact output, bloom-pruned join input. ``right`` should be
    the (much) smaller side.

    When the right side holds at most ``broadcast_limit`` keys the
    exact verification is a broadcast sorted-array membership test
    fused into the prefilter map (no join operator at all — the usual
    bloom+broadcast pairing); above the limit it falls back to the
    distributed hash join, which spills instead of OOMing."""
    import ray
    import pyarrow.compute as pc

    from cleanlab_ray.functions.joins import attach_flags_by_key

    right_key = right_key or left_key
    # project to the key column and materialize ONCE: the bloom
    # aggregate, the count and the key collection / join below each
    # consume the right side — without this, a right built from
    # upstream stages re-runs its whole lineage three times
    right = right.select_columns([right_key]).materialize()
    bitmap = np.asarray(
        right.aggregate(make_bloom_aggfn(right_key, m_bits, n_hashes))["bloom"]
    )
    bitmap_ref = ray.put(bitmap)

    n_right = right.count()
    if n_right <= broadcast_limit:
        # exact keys fit one broadcast object: verify by hash membership
        # (the same collision-free-by-construction _key_hashes space the
        # bloom uses would NOT be exact for strings — broadcast the raw
        # keys and compare values)
        # drop Ray's zero-row blocks before concat: under fine
        # partitioning they arrive with an EMPTY schema and
        # concat_tables raises "Schema at index N was different"
        blocks = [t for t in ray.get(right.to_arrow_refs()) if t.num_rows > 0]
        if not blocks:
            # empty right side: the semijoin is empty with left's schema
            return left.map_batches(
                lambda b: b.slice(0, 0), batch_format="pyarrow"
            )
        keys_tbl = pa.concat_tables(blocks)
        kc = keys_tbl[right_key]
        kc = kc.combine_chunks() if isinstance(kc, pa.ChunkedArray) else kc
        keys_ref = ray.put(kc)

        def semi(batch: pa.Table) -> pa.Table:
            bm = ray.get(bitmap_ref)
            cand = bloom_maybe_contains(
                bm, _key_hashes(batch[left_key]), m_bits, n_hashes
            )
            batch = batch.filter(pa.array(cand))
            member = pc.is_in(batch[left_key], value_set=ray.get(keys_ref))
            return batch.filter(member)

        return left.map_batches(semi, batch_format="pyarrow")

    def prefilter(batch: pa.Table) -> pa.Table:
        bm = ray.get(bitmap_ref)
        keep = bloom_maybe_contains(
            bm, _key_hashes(batch[left_key]), m_bits, n_hashes
        )
        return batch.filter(pa.array(keep))

    candidates = left.map_batches(prefilter, batch_format="pyarrow")

    def right_flags(batch: pa.Table) -> pa.Table:
        keys = batch[right_key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        keys = keys.unique()  # map-side dedup before the key exchange
        return pa.table({
            left_key: keys,
            "_member": pa.array(np.ones(len(keys), dtype=np.int64)),
        })

    from cleanlab_ray.stages.topk import sorted_group_agg

    # Global dedup of right keys: without it, duplicate right keys would
    # duplicate matching left rows through the left-outer join, breaking
    # the semijoin contract (the broadcast path's pc.is_in is naturally
    # duplicate-safe). One sorted-run pass keeps this O(rows), not
    # O(groups).
    flags = sorted_group_agg(
        right.map_batches(right_flags, batch_format="pyarrow"),
        left_key,
        {"_member": "max"},
    ).map_batches(
        lambda b: b.rename_columns([left_key, "_member"]),
        batch_format="pyarrow",
    )
    joined = attach_flags_by_key(
        candidates, flags, (left_key,), {"_member": np.int64(0)}
    )
    return joined.map_batches(
        lambda b: b.filter(pc.equal(b["_member"], 1)).drop_columns(["_member"]),
        batch_format="pyarrow",
    )
