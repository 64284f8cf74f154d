"""Deduplication operators: exact, MinHash-LSH near-dup, SimHash.

Exact dedup reproduces the semantics of the reference's exact-duplicate
sets (/root/reference/cleanlab/internal/neighbor/knn_graph.py:250-290:
identical content grouped, one stable representative kept) as a
hash-partitioned shuffle: vectorized 64-bit content hash per batch ->
groupby(hash) -> keep the first row per distinct content under the
stable minimal key ordering. Hash collisions are handled inside the
group by comparing the actual content.

MinHash-LSH follows the standard shingle -> minhash -> band-bucket
groupby construction (near-duplicate sets, semantics of
/root/reference/cleanlab/datalab/internal/issue_manager/duplicate.py:52-120,
re-expressed for scale).

All text kernels here are whole-column vectorized: an Arrow string
column is processed as ONE contiguous byte buffer (offsets + data, the
same zero-copy pattern as stages/_chargram.py) — no per-row Python in
any hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def add_content_hash(
    batch: pa.Table, text_col: str = "text", out_col: str = "content_hash"
) -> pa.Table:
    """Vectorized 64-bit hash of a string column (pandas C hashing)."""
    s = batch[text_col].to_pandas().fillna("")
    h = pd.util.hash_array(s.to_numpy(dtype=object)).astype(np.uint64)
    return batch.append_column(out_col, pa.array(h.astype(np.int64), type=pa.int64()))


def _sorted_block_map(ds, sort_cols, fn, guard: bool = True):
    """Sort-shuffle + whole-block vectorized map.

    ``Dataset.sort`` range-partitions so that all rows with equal sort
    keys land in ONE block — the exact guarantee GroupedData.map_groups
    relies on (ray.data.grouped_data: sort + batch_size=None). The
    exchange splits each map block at sampled boundaries with a
    searchsorted, which places ALL rows equal to a boundary key on one
    side, so an equal-key run can never straddle two reduce partitions
    even when the run is larger than the target block size (the hot key
    simply yields one oversized block). Unlike map_groups, ``fn``
    receives the WHOLE sorted block (many groups) as one pyarrow Table,
    so per-group work can be vectorized instead of paying a
    Python/pandas roundtrip per group.

    ``guard=True`` wraps ``fn`` with a vectorized monotonicity assert on
    the primary sort key: if a future Ray version ever handed this
    kernel a block that is not internally sorted (the precondition for
    the run-colocation guarantee above), the stage fails loudly instead
    of silently splitting groups. Full cross-block straddle detection
    (needs block identity) lives in :func:`edge_run_report` and is
    exercised by the hot-key tests."""
    if guard:
        primary = sort_cols if isinstance(sort_cols, str) else sort_cols[0]

        def checked(batch: pa.Table) -> pa.Table:
            col = batch[primary]
            if len(col) > 1:
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                try:
                    vals = arr.to_numpy(zero_copy_only=False)
                    ok = bool(np.all(vals[1:] >= vals[:-1]))
                except (TypeError, ValueError, pa.ArrowInvalid):
                    srt = pc.take(arr, pc.array_sort_indices(arr))
                    ok = bool(pc.min(pc.equal(arr, srt)).as_py())
                if not ok:
                    raise AssertionError(
                        f"_sorted_block_map: block not sorted on {primary!r}; "
                        "run-colocation precondition violated"
                    )
            return fn(batch)

        mapped = checked
    else:
        mapped = fn
    return ds.sort(sort_cols).map_batches(
        mapped, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def edge_run_report(ds, sort_cols) -> pd.DataFrame:
    """Loud cross-block straddle detector for the sort-colocation
    guarantee ``_sorted_block_map`` relies on.

    Sorts ``ds`` exactly like ``_sorted_block_map`` would, then maps each
    block to its two EDGE keys tagged with a per-block nonce. A key run
    straddles a block boundary iff the same key value appears at the
    edges of two DIFFERENT blocks, i.e. shows >1 distinct nonce in this
    report. Returns the offending keys (empty DataFrame == guarantee
    holds). Cost: one sort exchange + 2 rows per block — test/debug
    scale, not a hot-path stage."""
    import uuid

    primary = sort_cols if isinstance(sort_cols, str) else sort_cols[0]

    def edges(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"_key": pa.array([], batch[primary].type),
                             "_block": pa.array([], pa.string())})
        nonce = uuid.uuid4().hex
        keys = batch[primary]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pa.table({
            "_key": keys.take(pa.array([0, len(batch) - 1])),
            "_block": pa.array([nonce, nonce]),
        })

    rep = (
        ds.sort(sort_cols)
        .map_batches(edges, batch_size=None, batch_format="pyarrow")
        .to_pandas()
    )
    per_key = rep.groupby("_key")["_block"].nunique()
    return per_key[per_key > 1].reset_index().rename(columns={"_block": "n_blocks"})


def _run_starts(*sorted_cols) -> np.ndarray:
    """Start indices of equal-key runs in block-sorted column(s)."""
    n = len(sorted_cols[0])
    if n == 0:
        return np.empty(0, np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in sorted_cols:
        arr = np.asarray(c)
        change[1:] |= arr[1:] != arr[:-1]
    return np.flatnonzero(change)


def _encode_keys(batch: pa.Table, key_cols: tuple[str, ...]) -> pa.Array:
    """Deterministic fixed-order string encoding of the key columns
    (ints are zero-padded so lexicographic order == numeric order for
    non-negative ids) — vectorized in pyarrow."""
    parts = []
    for c in key_cols:
        col = batch[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            col = pc.utf8_lpad(pc.cast(col, pa.string()), width=20, padding="0")
        elif not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            col = pc.cast(col, pa.string())
        parts.append(col)
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "\x1f")


def exact_dedup(
    ds,
    text_col: str = "text",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    hash_col: str = "content_hash",
):
    """Keep one row per distinct text: the minimal (key_cols) row.

    Shuffle key = 64-bit content hash; within each hash run rows are
    compared on the actual text so collisions cannot merge distinct
    contents. One sort all-to-all + a fully vectorized block kernel
    (no per-group Python)."""

    def add_keys(batch: pa.Table) -> pa.Table:
        batch = add_content_hash(batch, text_col, hash_col)
        return batch.append_column("_ekey", _encode_keys(batch, key_cols))

    def keep_first_block(batch: pa.Table) -> pa.Table:
        h = batch[hash_col].to_numpy(zero_copy_only=False)
        if len(h) == 0:
            return batch.drop_columns([hash_col, "_ekey"])
        keep = np.sort(first_per_distinct_text(h, batch, text_col, "_ekey"))
        return batch.take(pa.array(keep)).drop_columns([hash_col, "_ekey"])

    with_hash = ds.map_batches(add_keys, batch_format="pyarrow")
    return _sorted_block_map(with_hash, hash_col, keep_first_block)


def first_per_distinct_text(h: np.ndarray, batch: pa.Table, text_col: str,
                            tie_col: str) -> np.ndarray:
    """Block indices of the minimal-``tie_col`` row of each distinct
    (hash, text) group.

    The previous formulation lexsorted OBJECT arrays (text + tie key):
    O(N log N) Python string comparisons per block, superlinear in
    practice (it dominated a 500k-doc run). Hash runs of length 1 — the
    overwhelming majority — need no text at all: the row is its own
    group. Only multi-row runs (true duplicates + rare collisions)
    materialize their strings, and those are grouped with one pandas
    sort over just that subset."""
    order = np.argsort(h, kind="stable")
    hs = h[order]
    n = len(hs)
    change = np.ones(n, dtype=bool)
    change[1:] = hs[1:] != hs[:-1]
    run_id = np.cumsum(change) - 1
    run_len = np.bincount(run_id)
    single = run_len[run_id] == 1
    keep = [order[single]]
    multi_pos = np.flatnonzero(~single)
    if len(multi_pos):
        import pandas as pd

        idx = order[multi_pos]
        sub = pd.DataFrame({
            "run": run_id[multi_pos],
            "text": batch[text_col].take(pa.array(idx)).to_pandas(),
            "tie": batch[tie_col].take(pa.array(idx)).to_pandas(),
            "idx": idx,
        })
        firsts = (
            sub.sort_values(["run", "text", "tie"], kind="mergesort")
            .drop_duplicates(["run", "text"])["idx"]
            .to_numpy()
        )
        keep.append(firsts)
    return np.concatenate(keep)


#: XOR salt for the leakage-safe split hash — distinct from the mixture
#: salt (topk.MIXTURE_SALT = 805306457) and the unsalted CV-fold hash so
#: the three partitions are pairwise decorrelated.
LEAK_SPLIT_SALT = np.uint64(605459861)


def leakage_safe_split(
    ds,
    text_col: str = "text",
    key_col: str = "doc_id",
    train_frac: float = 0.9,
    hash_col: str = "content_hash",
):
    """Train/holdout split where every EXACT-duplicate group lands on
    one side — the dedup-aware split that prevents train→eval leakage
    through verbatim copies (the contamination mode test-set dedup
    audits measure; reference semantics anchor: the duplicate-set
    grouping of datalab/internal/issue_manager/duplicate.py applied to
    split assignment).

    Returns (key_col, split) with split ∈ {'train', 'holdout'}. The
    side is a pure function of the group's MINIMUM key through a salted
    Knuth multiplicative hash, so the assignment is coordination-free,
    restart-stable, identical under any partitioning, and decorrelated
    from the plain-key split/fold/mixture hashes. ONE content-hash sort
    exchange (same shape as exact_dedup); within a hash run, groups are
    resolved on the actual text so 64-bit collisions cannot co-assign
    distinct contents."""
    if not 0.0 <= train_frac <= 1.0:
        raise ValueError(f"train_frac must be in [0, 1], got {train_frac}")
    thr = int(round(train_frac * 1_000_000))

    def add_keys(batch: pa.Table) -> pa.Table:
        return add_content_hash(
            batch.select([key_col, text_col]), text_col, hash_col)

    def assign_block(batch: pa.Table) -> pa.Table:
        h = batch[hash_col].to_numpy(zero_copy_only=False)
        if len(h) == 0:
            return pa.table({
                key_col: pa.array([], batch.schema.field(key_col).type),
                "split": pa.array([], pa.string()),
            })
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # group-min key per row: hash runs of length 1 are their own
        # group; only multi-row runs (true dups + rare collisions)
        # materialize their strings (same split as first_per_distinct_text)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        change = np.ones(len(hs), dtype=bool)
        change[1:] = hs[1:] != hs[:-1]
        run_id = np.cumsum(change) - 1
        run_len = np.bincount(run_id)
        gmin = keys.copy()
        multi_pos = np.flatnonzero(run_len[run_id] > 1)
        if len(multi_pos):
            idx = order[multi_pos]
            sub = pd.DataFrame({
                "run": run_id[multi_pos],
                "text": batch[text_col].take(pa.array(idx)).to_pandas(),
                "key": keys[idx],
            })
            gmin[idx] = sub.groupby(["run", "text"])["key"].transform("min").to_numpy()
        u = ((gmin.astype(np.uint64) ^ LEAK_SPLIT_SALT)
             * np.uint64(2654435761)) % np.uint64(1 << 32) % np.uint64(1_000_000)
        split = np.where(u < np.uint64(thr), "train", "holdout")
        return pa.table({
            key_col: batch[key_col],
            "split": pa.array(split, type=pa.string()),
        })

    with_hash = ds.map_batches(add_keys, batch_format="pyarrow")
    return _sorted_block_map(with_hash, hash_col, assign_block)


def near_dup_safe_split(
    ds,
    text_col: str = "text",
    key_col: str = "doc_id",
    train_frac: float = 0.9,
    num_perm: int = 64,
    bands: int = 8,
    shingle_k: int = 5,
):
    """Near-duplicate-aware train/holdout split: every transitive
    MinHash-LSH CANDIDATE group lands on one side.

    Strictly stronger leak protection than :func:`leakage_safe_split`
    (identical texts hash to identical signatures, so every exact-dup
    group is contained in a candidate component) — near-verbatim copies
    can no longer straddle the split. Candidate semantics BY DESIGN,
    like the incremental state: a false-positive band collision only
    merges MORE rows onto one side — conservative for leakage, never a
    leak. Side = the same salted hash of the component-min key as
    leakage_safe_split (singleton docs get identical sides under both
    operators).

    Exchange shape: one band sort over compact (key, bucket) int rows
    (text never leaves the signature kernel), min-label propagation
    over candidate edges only (stages/components.py — bounded by the
    dup-graph diameter, not corpus size), then ONE node-keyed exchange
    unioning component rows with identity rows so isolated docs assign
    themselves — no driver-side or broadcast component map."""
    if not 0.0 <= train_frac <= 1.0:
        raise ValueError(f"train_frac must be in [0, 1], got {train_frac}")
    from cleanlab_ray.stages.components import connected_components
    from cleanlab_ray.stages.topk import sorted_group_agg

    thr = int(round(train_frac * 1_000_000))
    bucket_fn = make_band_bucket_fn(num_perm, bands, shingle_k)

    def band_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        bucket = bucket_fn(batch[text_col])  # (n, bands) int64
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "k": pa.array(np.repeat(keys, bands)),
            "bucket": pa.array(bucket.reshape(-1)),
        })

    def candidate_edges(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        empty = pa.table({"node_a": pa.array([], pa.int64()),
                          "node_b": pa.array([], pa.int64())})
        if len(b) == 0:
            return empty
        k = batch["k"].to_numpy(zero_copy_only=False)
        starts = _run_starts(b)
        sizes = np.diff(np.append(starts, len(b)))
        run_id = np.repeat(np.arange(len(starts)), sizes)
        rep = np.minimum.reduceat(k, starts)[run_id]
        keep = (np.repeat(sizes, sizes) >= 2) & (k != rep)
        if not keep.any():
            return empty
        return pa.table({"node_a": pa.array(k[keep]),
                         "node_b": pa.array(rep[keep])})

    banded = ds.select_columns([key_col, text_col]).map_batches(
        band_rows, batch_format="pyarrow")
    edges = _sorted_block_map(banded, "bucket", candidate_edges)
    comp = connected_components(edges, src_col="node_a", dst_col="node_b")

    def identity_rows(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(keys), "component": pa.array(keys)})

    ident = ds.select_columns([key_col]).map_batches(
        identity_rows, batch_format="pyarrow")
    roots = sorted_group_agg(comp.union(ident), "node", {"component": "min"})

    def finalize(batch: pa.Table) -> pa.Table:
        root = batch["min(component)"].to_numpy(zero_copy_only=False)
        u = ((root.astype(np.uint64) ^ LEAK_SPLIT_SALT)
             * np.uint64(2654435761)) % np.uint64(1 << 32) % np.uint64(1_000_000)
        return pa.table({
            key_col: batch["node"],
            "split": pa.array(np.where(u < np.uint64(thr), "train", "holdout"),
                              type=pa.string()),
        })

    return roots.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Columnar shingle machinery (shared by MinHash and SimHash)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_FNV_P = np.uint64(1099511628211)


def _minhash_params(num_perm: int, seed: int = 7):
    """Multiply-shift hash family (Dietzfelbinger et al.): odd 64-bit
    multipliers, arbitrary addends; h -> (h*a + b) >> 3 in wrapping
    uint64 arithmetic. ~2.4x faster than multiply-mod-Mersenne in numpy
    (no integer modulo on the hot path) with the same min-wise LSH
    behavior; the SQL oracle replicates the wrap with HUGEINT mods."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Reference (single-row) shingle hasher — kept as the oracle the
    vectorized column kernels are tested against."""
    data = text.lower().encode("utf-8")
    if len(data) < k:
        data = data + b" " * (k - len(data))
    arr = np.frombuffer(data, dtype=np.uint8)
    view = np.lib.stride_tricks.sliding_window_view(arr, k)
    # 64-bit FNV-ish rolling hash of each shingle, vectorized
    h = np.zeros(len(view), dtype=np.uint64)
    for i in range(k):
        h = h * _FNV_P + view[:, i].astype(np.uint64)
    return np.unique(h)


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Reference (single-row) minhash — oracle for the column kernel."""
    if len(shingles) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    # (P, S) permuted hashes -> min per permutation
    vals = (shingles[None, :] * a[:, None] + b[:, None]) >> np.uint64(3)
    return vals.min(axis=1)


def _lower_padded_bytes(col, k: int):
    """(data, offsets) of a lowercased string column with every row
    right-padded to at least ``k`` bytes — zero-copy view of the Arrow
    buffers, no per-row Python.

    NOTE: lowercasing + padding happen at the codepoint level via
    pyarrow.compute; identical to the byte-level reference
    ``char_shingles`` preprocessing for ASCII text (non-ASCII rows may
    differ only in which near-dup candidates LSH surfaces — exact
    Jaccard verification still decides membership)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    col = pc.utf8_lower(col)
    col = pc.utf8_rpad(col, width=k, padding=" ")
    col = col.cast(pa.large_string())
    bufs = col.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[col.offset : col.offset + len(col) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    return data, offsets - offsets[0]


def shingle_hashes_column(col, k: int = 5):
    """All k-byte shingle hashes of a string column in ONE vectorized
    pass.

    Returns (hashes uint64 (W,), seg_starts int64 (n,), widths int64
    (n,)): ``hashes[seg_starts[i] : seg_starts[i] + widths[i]]`` are row
    i's shingle hashes in positional order (NOT deduplicated — callers
    needing set semantics dedupe per segment). Every row has >= 1
    shingle (short rows are space-padded to k, as in char_shingles)."""
    data, offsets = _lower_padded_bytes(col, k)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    widths = lens - k + 1  # >= 1 after padding
    if n == 0 or data.size == 0:
        return np.empty(0, np.uint64), np.zeros(n, np.int64), widths
    view = np.lib.stride_tricks.sliding_window_view(data, k)
    h_all = np.zeros(len(view), dtype=np.uint64)
    for i in range(k):
        h_all = h_all * _FNV_P + view[:, i].astype(np.uint64)
    # valid window start positions: row i contributes offsets[i] .. offsets[i+1]-k
    seg_starts = np.concatenate([[0], np.cumsum(widths)[:-1]])
    pos = np.arange(int(widths.sum()), dtype=np.int64) + np.repeat(
        offsets[:-1] - seg_starts, widths
    )
    return h_all[pos], seg_starts, widths


def _unique_per_segment(hashes: np.ndarray, seg_starts: np.ndarray, widths: np.ndarray):
    """Per-row sorted-unique shingle sets, vectorized: global lexsort by
    (row, hash) then first-occurrence mask.

    Returns (uniq uint64, row_ids int64, useg_starts int64 (n,),
    usizes int64 (n,)); every input row has >= 1 unique hash."""
    n = len(seg_starts)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), widths)
    order = np.lexsort((hashes, row_ids))
    hs, rs = hashes[order], row_ids[order]
    first = np.ones(len(hs), dtype=bool)
    if len(hs) > 1:
        first[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
    hu, ru = hs[first], rs[first]
    useg = np.searchsorted(ru, np.arange(n))
    usizes = np.diff(np.append(useg, len(ru)))
    return hu, ru, useg, usizes


def minhash_signatures_column(col, a: np.ndarray, b: np.ndarray, k: int = 5) -> np.ndarray:
    """(n, num_perm) minhash signatures for a whole Arrow string column —
    identical values to per-row minhash_signature(char_shingles(t)), but
    computed as num_perm vectorized passes + np.minimum.reduceat over
    the column's shingle-hash buffer (duplicate shingles cannot change a
    min, so no per-row dedup is needed)."""
    hashes, seg_starts, widths = shingle_hashes_column(col, k)
    n = len(seg_starts)
    num_perm = len(a)
    sigs = np.empty((n, num_perm), dtype=np.uint64)
    if n == 0:
        return sigs
    sh3 = np.uint64(3)
    for j in range(num_perm):
        vals = (hashes * a[j] + b[j]) >> sh3
        sigs[:, j] = np.minimum.reduceat(vals, seg_starts)
    return sigs


def make_band_bucket_fn(num_perm: int, bands: int, shingle_k: int):
    """Returns fn(string column) -> (n, bands) int64 LSH band-bucket
    keys: per-band FNV fold of the minhash signature, salted per band
    so band id rides inside the single int64 sort key. The SAME bucket
    values make_minhash_kernel emits (incremental.py's persisted state
    depends on that equality)."""
    a, b = _minhash_params(num_perm)
    rows_per_band = num_perm // bands
    band_salt = (np.arange(bands, dtype=np.uint64) + np.uint64(1)) * np.uint64(
        0x9E3779B97F4A7C15
    )

    def buckets(col) -> np.ndarray:
        sigs = minhash_signatures_column(col, a, b, shingle_k)
        n = len(sigs)
        band_view = sigs.reshape(n, bands, rows_per_band)
        band_hash = np.zeros((n, bands), dtype=np.uint64)
        for j in range(rows_per_band):
            band_hash = band_hash * _FNV_P + band_view[:, :, j]
        return (band_hash ^ band_salt[None, :]).astype(np.int64)

    return buckets


def make_minhash_kernel(
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 8,
    shingle_k: int = 5,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
):
    """map_batches kernel emitting one compact row per (row, band):
    (key cols..., _ekey, bucket) for the LSH bucket sort. The text
    column never leaves the kernel; band id is mixed into the single
    int64 ``bucket`` key so downstream needs only one sort column."""
    bucket_fn = make_band_bucket_fn(num_perm, bands, shingle_k)
    bands = int(bands)

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        bucket = bucket_fn(batch[text_col])
        ekey = _encode_keys(batch, key_cols)
        keep = batch.select(list(key_cols)).append_column("_ekey", ekey)
        idx = np.repeat(np.arange(n, dtype=np.int64), bands)
        tiled = keep.take(pa.array(idx))
        return tiled.append_column(
            "bucket", pa.array(bucket.reshape(-1))
        )

    return kernel


def near_dup_groups(
    ds,
    text_col: str = "text",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_perm: int = 64,
    bands: int = 8,
    jaccard_threshold: float = 0.8,
    shingle_k: int = 5,
):
    """Flag near-duplicate rows: returns Dataset[key_cols + (is_near_dup,)].

    Construction — four sort all-to-alls, every block kernel vectorized,
    NOTHING materialized on the driver:
      1. band map emits compact (keys, _ekey, bucket) rows ×bands (text
         never rides the band exchange); sort by bucket; runs of >= 2
         become candidate (member, _rep=bucket-min _ekey) pairs;
      2. texts are attached by a UNION + single sort on _ekey (a
         cogroup: each key's text row and its candidate-pair rows land
         in the same block), which also dedups pairs found by several
         bands — text moves through exactly one shuffle, same volume as
         exact_dedup's;
      3. sort by _rep co-locates each candidate group with its
         representative for exact Jaccard verification (whole-block
         shingle hashing; only the isin per candidate group loops, over
         numpy slices);
      4. a final tiny sort dedups flagged keys.
    Partitioning assumption: LSH bucket runs fit in a block (same
    assumption as any groupby). bands=8 x rows_per_band=8 puts the LSH
    s-curve midpoint at (1/8)^(1/8) ~= 0.77, matched to the default 0.8
    Jaccard threshold — band-match probability for sub-threshold pairs
    falls off sharply, keeping the candidate set (and the text that must
    be re-shuffled for exact verification) sparse."""

    sel = ds.select_columns([*key_cols, text_col])
    banded = sel.map_batches(
        make_minhash_kernel(text_col, num_perm, bands, shingle_k, key_cols),
        batch_format="pyarrow",
    )

    def emit_pairs(batch: pa.Table) -> pa.Table:
        bucket = batch["bucket"].to_numpy(zero_copy_only=False)
        base = batch.select([*key_cols, "_ekey"])
        if len(bucket) == 0:
            return base.append_column("_rep", pa.array([], type=pa.string()))
        ekey = np.asarray(batch["_ekey"].to_pandas(), dtype=object)
        starts = _run_starts(bucket)
        sizes = np.diff(np.append(starts, len(bucket)))
        # min _ekey per run: lexsort (bucket asc, ekey asc) -> run head
        order = np.lexsort((ekey, bucket))
        rep_per_run = ekey[order[starts]]
        run_of_row = np.repeat(np.arange(len(starts)), sizes)
        member = np.repeat(sizes, sizes) >= 2
        idx = np.flatnonzero(member)
        out = base.take(pa.array(idx))
        return out.append_column(
            "_rep", pa.array(rep_per_run[run_of_row[idx]], type=pa.string())
        )

    cand = _sorted_block_map(banded, "bucket", emit_pairs)

    # --- cogroup pairs with texts on _ekey (one text shuffle, dedups pairs)
    def text_side(batch: pa.Table) -> pa.Table:
        ekey = _encode_keys(batch, key_cols)
        t = batch[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        return pa.table(
            {
                **{c: batch[c] for c in key_cols},
                "_ekey": ekey,
                text_col: pc.cast(pc.fill_null(t, ""), pa.string()),
                "_rep": pa.nulls(batch.num_rows, pa.string()),
            }
        )

    def pair_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                **{c: batch[c] for c in key_cols},
                "_ekey": pc.cast(batch["_ekey"], pa.string()),
                text_col: pa.nulls(batch.num_rows, pa.string()),
                "_rep": pc.cast(batch["_rep"], pa.string()),
            }
        )

    unioned = sel.map_batches(text_side, batch_format="pyarrow").union(
        cand.map_batches(pair_side, batch_format="pyarrow")
    )

    def fill_text(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keep = np.empty(0, np.int64)
        fill_vals = np.empty(0, dtype=object)
        if n:
            ekey = np.asarray(batch["_ekey"].to_pandas(), dtype=object)
            rep = np.asarray(batch["_rep"].to_pandas(), dtype=object)
            txt = np.asarray(batch[text_col].to_pandas(), dtype=object)
            is_text_row = pc.is_null(batch["_rep"]).to_numpy(zero_copy_only=False)
            starts = _run_starts(ekey)
            sizes = np.diff(np.append(starts, n))
            run_of_row = np.repeat(np.arange(len(starts)), sizes)
            # one text row per key (engine-keyed data); take the first
            text_rows = np.flatnonzero(is_text_row)
            run_text = np.full(len(starts), None, dtype=object)
            run_text[run_of_row[text_rows]] = txt[text_rows]
            # dedup (ekey, rep) pairs: lexsort within block
            pair_rows = np.flatnonzero(~is_text_row)
            if len(pair_rows):
                pr_ekey, pr_rep = ekey[pair_rows], rep[pair_rows]
                order = np.lexsort((pr_rep, pr_ekey))
                e_s, r_s = pr_ekey[order], pr_rep[order]
                first = np.ones(len(order), dtype=bool)
                first[1:] = (e_s[1:] != e_s[:-1]) | (r_s[1:] != r_s[:-1])
                keep = pair_rows[order[first]]
                fill_vals = run_text[run_of_row[keep]]
                has_text = pd.notna(fill_vals)
                keep, fill_vals = keep[has_text], fill_vals[has_text]
        out = batch.take(pa.array(keep)).drop_columns([text_col])
        return out.append_column(text_col, pa.array(fill_vals, type=pa.string()))

    cand_rows = _sorted_block_map(unioned, "_ekey", fill_text)

    def verify_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        base_cols = batch.select([*key_cols, "_ekey"])
        if n == 0:
            return base_cols
        rep = np.asarray(batch["_rep"].to_pandas(), dtype=object)
        ekey = np.asarray(batch["_ekey"].to_pandas(), dtype=object)
        hashes, seg_starts, widths = shingle_hashes_column(batch[text_col], shingle_k)
        hu, _, useg, usizes = _unique_per_segment(hashes, seg_starts, widths)
        useg_end = np.append(useg[1:], len(hu))
        starts = _run_starts(rep)
        bounds = np.append(starts, n)
        keep_rows: list[int] = []
        for gi in range(len(starts)):
            lo, hi = bounds[gi], bounds[gi + 1]
            if hi - lo < 2:
                continue
            grp_rep = rep[lo]
            base_local = np.flatnonzero(ekey[lo:hi] == grp_rep)
            if len(base_local) == 0:
                continue
            bi = lo + int(base_local[0])
            base_set = hu[useg[bi] : useg_end[bi]]
            members = hu[useg[lo] : useg_end[hi - 1]]
            inter = np.add.reduceat(
                np.isin(members, base_set).astype(np.int64),
                useg[lo:hi] - useg[lo],
            )
            union = usizes[bi] + usizes[lo:hi] - inter
            jac = inter / np.maximum(union, 1)
            ok = np.flatnonzero(jac >= jaccard_threshold) + lo
            ok = ok[ok != bi]
            if len(ok):
                keep_rows.append(bi)
                keep_rows.extend(ok.tolist())
        return base_cols.take(pa.array(np.array(keep_rows, dtype=np.int64)))

    flagged = _sorted_block_map(cand_rows, "_rep", verify_block)
    return _sorted_block_map(
        flagged, "_ekey", _distinct_flag_block(key_cols, "is_near_dup")
    )


# ---------------------------------------------------------------------------
# SimHash near-duplicate detection
# ---------------------------------------------------------------------------

def simhash_column(col, shingle_k: int = 4) -> np.ndarray:
    """64-bit SimHash per row of a string column: sign of summed +/-1 bit
    votes over each row's UNIQUE shingle hashes — whole-column
    vectorized (lexsort dedup + 64 reduceat bit-count passes)."""
    hashes, seg_starts, widths = shingle_hashes_column(col, shingle_k)
    n = len(seg_starts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0 or len(hashes) == 0:
        return out
    hu, _, useg, usizes = _unique_per_segment(hashes, seg_starts, widths)
    one = np.uint64(1)
    for s in range(64):
        bit = ((hu >> np.uint64(s)) & one).astype(np.int64)
        cnt1 = np.add.reduceat(bit, useg)
        out |= (2 * cnt1 > usizes).astype(np.uint64) << np.uint64(s)
    return out


def _simhash_batch(texts: list[str], shingle_k: int = 4) -> np.ndarray:
    """Reference (per-row) SimHash — oracle for simhash_column."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        sh = char_shingles(t or "", shingle_k)
        if len(sh) == 0:
            continue
        bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        out[i] = np.bitwise_or.reduce(
            (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    return out


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x)
    v = x.copy()
    v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
    v = (v & np.uint64(0x3333333333333333)) + (
        (v >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (v * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _distinct_flag_block(key_cols: tuple[str, ...], flag_name: str):
    """Block kernel: first row per _ekey run -> keys + True flag."""

    def distinct_keys(batch: pa.Table) -> pa.Table:
        ekey = np.asarray(batch["_ekey"].to_pandas(), dtype=object)
        out = batch.select(list(key_cols))
        if len(ekey) == 0:
            keep = np.empty(0, np.int64)
        else:
            first = np.ones(len(ekey), dtype=bool)
            first[1:] = ekey[1:] != ekey[:-1]
            keep = np.flatnonzero(first)
        out = out.take(pa.array(keep))
        return out.append_column(flag_name, pa.array(np.ones(len(keep), dtype=bool)))

    return distinct_keys


def simhash_near_dup(
    ds,
    text_col: str = "text",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    bands: int = 4,
    max_hamming: int = 3,
    shingle_k: int = 4,
):
    """SimHash LSH: 64-bit signature split into ``bands`` 16-bit bands;
    rows sharing any band bucket are verified by full hamming distance
    against the bucket's minimal-key row. Two sort all-to-alls, fully
    vectorized block kernels (verification needs only the 8-byte
    signature, so text never leaves the map stage)."""
    bits_per_band = 64 // bands
    band_salt = (np.arange(bands, dtype=np.uint64) + np.uint64(1)) * np.uint64(
        0x9E3779B97F4A7C15
    )

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sigs = simhash_column(batch[text_col], shingle_k)
        keep = batch.select(list(key_cols)).append_column(
            "_ekey", _encode_keys(batch, key_cols)
        )
        idx = np.repeat(np.arange(n, dtype=np.int64), bands)
        tiled = keep.take(pa.array(idx))
        shifts = (np.arange(bands, dtype=np.uint64) * np.uint64(bits_per_band))
        mask = np.uint64((1 << bits_per_band) - 1)
        bucket = ((sigs[:, None] >> shifts[None, :]) & mask) ^ band_salt[None, :]
        tiled = tiled.append_column(
            "bucket", pa.array(bucket.reshape(-1).astype(np.int64))
        )
        return tiled.append_column(
            "simhash", pa.array(np.repeat(sigs.astype(np.int64), bands))
        )

    banded = ds.select_columns([*key_cols, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )

    def verify_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        base_cols = batch.select([*key_cols, "_ekey"])
        if n == 0:
            return base_cols
        bucket = batch["bucket"].to_numpy(zero_copy_only=False)
        ekey = np.asarray(batch["_ekey"].to_pandas(), dtype=object)
        sigs = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        starts = _run_starts(bucket)
        sizes = np.diff(np.append(starts, n))
        run_of_row = np.repeat(np.arange(len(starts)), sizes)
        # base row per run = min _ekey
        order = np.lexsort((ekey, bucket))
        base_row = order[starts]
        ham = _popcount64(sigs ^ sigs[base_row][run_of_row])
        close = ham <= max_hamming
        # a run is emitted only if >= 2 of its rows are close to the base
        close_per_run = np.bincount(run_of_row, weights=close).astype(np.int64)
        keep = close & (close_per_run[run_of_row] >= 2) & (np.repeat(sizes, sizes) >= 2)
        return base_cols.take(pa.array(np.flatnonzero(keep)))

    flagged = _sorted_block_map(banded, "bucket", verify_block)
    return _sorted_block_map(
        flagged, "_ekey", _distinct_flag_block(key_cols, "is_simhash_dup")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection (random-hyperplane LSH)
# ---------------------------------------------------------------------------

def embedding_near_dup(
    ds,
    embedding_col: str = "embedding",
    key_cols: tuple[str, ...] = ("vec_id",),
    num_planes: int = 16,
    num_tables: int = 4,
    cosine_threshold: float = 0.95,
    seed: int = 11,
):
    """Near-duplicate vectors: ``num_tables`` independent random-hyperplane
    sign buckets (num_planes bits each, table id mixed into the single
    int64 bucket key) -> sort by bucket -> exact cosine verification
    against each bucket's minimal-key row. Two sort all-to-alls; the
    verification block kernel is one batched matmul-style pass (no
    per-bucket Python)."""
    table_salt = (np.arange(num_tables, dtype=np.uint64) + np.uint64(1)) * np.uint64(
        0x9E3779B97F4A7C15
    )

    def make_planes(dim):
        rng = np.random.default_rng(seed)
        return rng.standard_normal((num_tables, num_planes, dim))

    planes_cache = {}

    def _embed_matrix(batch: pa.Table) -> np.ndarray:
        col = batch[embedding_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(batch.num_rows, -1)

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        mat = _embed_matrix(batch)
        dim = mat.shape[1]
        if dim not in planes_cache:
            planes_cache[dim] = make_planes(dim)
        planes = planes_cache[dim]
        bucket = np.empty((n, num_tables), dtype=np.uint64)
        for t in range(num_tables):
            signs = (mat @ planes[t].T) > 0  # (B, P)
            bucket[:, t] = signs.dot(1 << np.arange(num_planes)).astype(np.uint64)
        bucket ^= table_salt[None, :]
        keep = batch.append_column("_ekey", _encode_keys(batch, key_cols))
        tiled = keep.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), num_tables)))
        return tiled.append_column(
            "bucket", pa.array(bucket.reshape(-1).astype(np.int64))
        )

    banded = ds.select_columns([*key_cols, embedding_col]).map_batches(
        kernel, batch_format="pyarrow"
    )

    def verify_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        base_cols = batch.select([*key_cols, "_ekey"])
        if n == 0:
            return base_cols
        bucket = batch["bucket"].to_numpy(zero_copy_only=False)
        ekey = np.asarray(batch["_ekey"].to_pandas(), dtype=object)
        mat = _embed_matrix(batch)
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-300)
        unit = mat / norms[:, None]
        starts = _run_starts(bucket)
        sizes = np.diff(np.append(starts, n))
        run_of_row = np.repeat(np.arange(len(starts)), sizes)
        order = np.lexsort((ekey, bucket))
        base_row = order[starts]
        cs = np.einsum("ij,ij->i", unit, unit[base_row][run_of_row])
        close = cs >= cosine_threshold
        close_per_run = np.bincount(run_of_row, weights=close).astype(np.int64)
        keep = close & (close_per_run[run_of_row] >= 2) & (np.repeat(sizes, sizes) >= 2)
        return base_cols.take(pa.array(np.flatnonzero(keep)))

    flagged = _sorted_block_map(banded, "bucket", verify_block)
    return _sorted_block_map(
        flagged, "_ekey", _distinct_flag_block(key_cols, "is_embedding_dup")
    )


# ---------------------------------------------------------------------------
# Document fingerprinting (rolling polynomial hash)
# ---------------------------------------------------------------------------

_FP_P = np.uint64(1099511628211)
# multiplicative inverse of the (odd) base mod 2^64 — lets the segmented
# weighted-sum formulation below equal the sequential fold exactly
_FP_INV = np.uint64(pow(int(_FP_P), -1, 1 << 64))


def polynomial_string_hashes(col) -> np.ndarray:
    """64-bit polynomial rolling hash of every string in an Arrow
    column, returned as uint64 (N,).

    Definition (documented so an external oracle can reproduce it):
    ``h = fold(h*P + byte, init=0) mod 2^64`` with P=1099511628211 over
    the UTF-8 bytes; equivalently ``h = sum_j byte_j * P^(L-1-j)``.
    Computed fully vectorized as a segmented weighted sum over the
    column's concatenated byte buffer: weight(byte at p) = P^(distance
    from its row's end), per-row totals via np.add.reduceat — O(total
    bytes) numpy, no per-row or per-byte Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "").cast(pa.large_string())
    bufs = col.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[col.offset : col.offset + len(col) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    n = len(col)
    lens = np.diff(offsets)
    out = np.zeros(n, dtype=np.uint64)
    if data.size:
        max_len = int(lens.max())
        pow_table = np.empty(max_len, dtype=np.uint64)
        pow_table[0] = 1
        if max_len > 1:
            np.cumprod(np.full(max_len - 1, _FP_P, dtype=np.uint64), out=pow_table[1:])
        # exponent of each byte = (row_end - 1 - position)
        dist = np.repeat(offsets[1:], lens) - 1 - np.arange(data.size, dtype=np.int64)
        terms = data.astype(np.uint64) * pow_table[dist]
        nonempty = lens > 0
        out[nonempty] = np.add.reduceat(terms, offsets[:-1][nonempty])
    return out


def add_fingerprint(batch: pa.Table, text_col: str = "text",
                    out_col: str = "fingerprint") -> pa.Table:
    """64-bit polynomial rolling hash of the whole text (see
    :func:`polynomial_string_hashes` for the documented fold)."""
    out = polynomial_string_hashes(batch[text_col])
    return batch.append_column(out_col, pa.array(out.astype(np.int64), type=pa.int64()))


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard all-pairs (inverted-index formulation)
# ---------------------------------------------------------------------------

def _pairs_within_runs(starts: np.ndarray, lens: np.ndarray):
    """Position-index pairs (i < j) inside each equal-key run.

    Vectorized per DISTINCT run length: all runs of length m emit their
    C(m,2) pairs in one broadcast (``starts[:, None] + triu_indices``),
    so the Python loop count is the number of distinct lengths, not the
    number of runs or pairs. Returns (pos_a, pos_b) int64 arrays."""
    out_a, out_b = [], []
    for m in np.unique(lens):
        m = int(m)
        if m < 2:
            continue
        sel = starts[lens == m]
        iu, ju = np.triu_indices(m, k=1)
        out_a.append((sel[:, None] + iu[None, :]).reshape(-1))
        out_b.append((sel[:, None] + ju[None, :]).reshape(-1))
    if not out_a:
        e = np.empty(0, np.int64)
        return e, e
    return np.concatenate(out_a), np.concatenate(out_b)


def ngram_jaccard_pairs(
    ds,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
    df_cap: int | None = None,
    max_pairs: float = 100e6,
    on_excess: str = "raise",
):
    """EXACT n-gram (character k-shingle) Jaccard similarity for every
    document pair sharing at least one shingle — the inverted-index
    algorithm, fully distributed (reference semantics: the Jaccard
    verify step of /root/reference/cleanlab/datalab/internal/
    issue_manager/duplicate.py applied all-pairs instead of to LSH
    candidates):

    1. one vectorized map extracts each doc's DISTINCT shingle-hash set
       (``shingle_hashes_column`` + ``_unique_per_segment`` — the same
       lowercased, space-padded k-byte shingles as MinHash-LSH) and
       emits (shingle, doc, set_size) postings;
    2. a single sort exchange on the shingle hash co-locates postings;
       equal-shingle runs emit co-occurring (doc_a < doc_b) pairs via
       ``_pairs_within_runs`` (vectorized per distinct run length);
    3. ``groupby(doc_a, doc_b).count`` = intersection size; set sizes
       ride the postings so no extra join is needed;
    4. jaccard = inter / (|A| + |B| - inter), filtered at ``threshold``.

    Scale notes: the only all-to-all moves (shingle, doc, n) triples —
    text never shuffles. The quadratic hazard is a stop-shingle shared
    by thousands of docs; ``df_cap`` switches to STOP-SHINGLE-REMOVAL
    semantics (see :func:`_capped_jaccard`): shingles with df > cap are
    deleted from every document's set and jaccard is computed exactly
    over the surviving universe — so exact/near duplicates still score
    ~1.0, and only similarity carried exclusively by corpus-common
    shingles is lost (at web scale a shingle shared by >50 docs carries
    no near-dup signal). Default None = exact (the SQL oracle's
    semantics).

    ``max_pairs`` is the loud-failure guard on that hazard: before any
    pairs are emitted, one CHEAP exchange (per-shingle document
    frequency — O(distinct shingles) rows) computes the EXACT number of
    pair emissions Σ C(df, 2) the run would produce; if it exceeds the
    bound with ``df_cap=None``, the operator raises immediately with
    the measured df profile and remediation options (set ``df_cap``, or
    use :func:`near_dup_groups` LSH) instead of grinding through a
    quadratic shuffle for hours. Corpora whose shingle diversity is low
    relative to the doc count (every shingle common to hundreds of
    docs) make exact all-pairs intrinsically near-quadratic — no
    candidate-generation scheme avoids it, which is why web-scale
    systems use LSH or df caps there; the guard makes that wall
    explicit instead of silent.

    ``on_excess="cap"`` replaces the raise with a DOCUMENTED
    degradation: from the same df profile (one extra O(distinct-df)
    frequency-of-frequencies aggregate, driver side ≤ max-df rows) it
    picks the LARGEST df_cap whose capped emission count
    Σ_{df≤cap} C(df, 2) stays within ``max_pairs``, warns with the
    chosen cap, and proceeds with the stop-shingle-removal semantics
    above. Recall bound: a pair is missed only if its similarity lives
    entirely in shingles shared by > cap documents (the prefix-filter
    df-cap trade of the similarity-join literature); duplicates of
    small clusters keep jaccard ~1 because denominators shrink with
    the intersections. Exactness is unchanged whenever the guard would
    not have fired, so small-scale oracle checks see exact semantics.

    Returns Dataset[(doc_a, doc_b, jaccard_e6)] with jaccard_e6 =
    floor(jaccard * 1e6 + 0.5) (half-away rounding, DuckDB-compatible).
    """
    from ray.data.aggregate import Count, Max

    def postings(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        hashes, seg_starts, widths = shingle_hashes_column(col, shingle_k)
        hu, ru, _useg, usizes = _unique_per_segment(hashes, seg_starts, widths)
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pa.table({
            "h": pa.array(hu.astype(np.int64), type=pa.int64()),
            "doc": keys.take(pa.array(ru)),
            "n": pa.array(usizes[ru].astype(np.int64), type=pa.int64()),
        })

    # effective cap — mutated (driver-side, after the guard below) when
    # on_excess="cap" lowers it; any non-None cap routes the whole query
    # through _capped_jaccard, so emit_pairs only ever runs uncapped
    cap_state = {"cap": df_cap}

    def emit_pairs(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False)
        doc_arr = batch["doc"]
        if isinstance(doc_arr, pa.ChunkedArray):
            doc_arr = doc_arr.combine_chunks()
        doc = doc_arr.to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        # block is sorted on h only — order runs by doc for doc_a < doc_b
        order = np.lexsort((doc, h))
        h, doc, n = h[order], doc[order], n[order]
        starts = _run_starts(h)
        lens = np.diff(np.append(starts, len(h)))
        pos_a, pos_b = _pairs_within_runs(starts, lens)
        da = pa.array(doc[pos_a])
        db = pa.array(doc[pos_b])
        return pa.table({
            "doc_a": da, "doc_b": db,
            "na": pa.array(n[pos_a], type=pa.int64()),
            "nb": pa.array(n[pos_b], type=pa.int64()),
        })

    def finalize(batch: pa.Table) -> pa.Table:
        inter = batch["count(doc_a)"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["max(na)"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch["max(nb)"].to_numpy(zero_copy_only=False).astype(np.float64)
        jac = inter / np.maximum(na + nb - inter, 1.0)
        keep = jac >= threshold
        out = batch.filter(pa.array(keep))
        jac_e6 = np.floor(jac[keep] * 1_000_000 + 0.5).astype(np.int64)
        return pa.table({
            "doc_a": out["doc_a"], "doc_b": out["doc_b"],
            "jaccard_e6": pa.array(jac_e6, type=pa.int64()),
        })

    from cleanlab_ray.stages.topk import sorted_group_agg

    posts = ds.map_batches(postings, batch_format="pyarrow")

    if max_pairs is not None:
        # exact emission count from the df profile: one O(distinct)
        # exchange (rows are already distinct per (h, doc) from
        # `postings`). Materialize posts so the guard pass and the pair
        # exchange share one shingling scan instead of recomputing it.
        posts = posts.materialize()
        df_tbl = sorted_group_agg(posts.select_columns(["h"]),
                                  "h", {"h": "count"})

        def pair_partial(batch: pa.Table) -> pa.Table:
            df = batch["count(h)"].to_numpy(zero_copy_only=False).astype(
                np.float64)
            capped = df if df_cap is None else df[df <= df_cap]
            return pa.table({
                "pairs": pa.array([float((capped * (capped - 1) / 2).sum())]),
            })

        # sum() returns None on a zero-row dataset (empty input corpus)
        n_pairs = float(df_tbl.map_batches(
            pair_partial, batch_format="pyarrow", batch_size=None
        ).sum("pairs") or 0.0)
        if n_pairs > max_pairs:
            if on_excess == "cap":
                # frequency-of-frequencies of the df profile (tiny:
                # one row per DISTINCT df value), then the largest cap
                # whose capped emission count fits the budget
                def fof_partial(batch: pa.Table) -> pa.Table:
                    df = batch["count(h)"].to_numpy(
                        zero_copy_only=False).astype(np.int64)
                    v, c = np.unique(df, return_counts=True)
                    return pa.table({
                        "df": pa.array(v, type=pa.int64()),
                        "cnt": pa.array(c.astype(np.int64)),
                    })

                fof = sorted_group_agg(
                    df_tbl.map_batches(fof_partial, batch_format="pyarrow"),
                    "df", {"cnt": "sum"},
                ).take_all()
                dfv = np.array([r["df"] for r in fof], dtype=np.int64)
                cnt = np.array([r["sum(cnt)"] for r in fof], dtype=np.float64)
                order = np.argsort(dfv)
                dfv, cnt = dfv[order], cnt[order]
                cum = np.cumsum(cnt * dfv * (dfv - 1) / 2.0)
                ok = dfv[cum <= max_pairs]
                cap = int(ok[-1]) if len(ok) else 1
                if df_cap is not None:
                    cap = min(cap, int(df_cap))
                import warnings

                warnings.warn(
                    f"ngram_jaccard_pairs: exact all-pairs would emit "
                    f"{n_pairs:.3g} pairs (> max_pairs={max_pairs:.3g}); "
                    f"degrading to df_cap={cap} (drops shingles shared "
                    "by more docs — a pair is lost only if ALL its "
                    "shared shingles exceed the cap; see docstring "
                    "recall bound)."
                )
                cap_state["cap"] = cap
            else:
                raise ValueError(
                    f"ngram_jaccard_pairs would emit {n_pairs:.3g} "
                    f"co-occurrence pairs (bound max_pairs={max_pairs:.3g}) "
                    "— the shingle df profile makes exact all-pairs "
                    "near-quadratic on this corpus. Set df_cap (drops "
                    "shingles shared by more docs than the cap; documented "
                    "recall trade), pass on_excess='cap' to auto-pick the "
                    "largest in-budget cap, use near_dup_groups "
                    "(MinHash-LSH) instead, or raise max_pairs explicitly "
                    "if the cost is intended."
                )

    if cap_state["cap"] is not None:
        return _capped_jaccard(posts, cap_state["cap"], threshold)

    pairs = _sorted_block_map(posts, "h", emit_pairs)
    if max_pairs is not None:
        # bounded by the guard (≤ max_pairs 32-byte rows); breaking the
        # AllToAll→AllToAll chain here avoids the streaming executor's
        # chained-sort stall (~4 s fixed, measured — see BASELINE.md)
        pairs = pairs.materialize()
    # pairs are the quadratic hazard — aggregate them with the sorted
    # run kernel, not the per-group-cost native aggregate
    counted = sorted_group_agg(
        pairs, ["doc_a", "doc_b"], {"na": "max", "nb": "max", "doc_a": "count"}
    )
    return counted.map_batches(finalize, batch_format="pyarrow")


def _capped_jaccard(posts, cap: int, threshold: float):
    """Df-capped Jaccard = stop-shingle removal THEN exact Jaccard:
    shingles shared by more than ``cap`` docs are deleted from every
    document's set, and similarity is computed over the surviving
    (informative) shingle universe. Unlike capping only the
    intersection, this keeps exact/near duplicates at jaccard ~1 even
    when most of their shingles are corpus-common — the standard
    stop-word-removal semantics of prefix-filter similarity joins.

    Join-free Ray shape: the one hash-sorted pass emits BOTH
    co-occurrence pairs (from sub-cap runs) and per-doc survivor
    counts; pair counts and survivor totals aggregate independently,
    then each side of the pair picks up its denominator via two
    union + sort exchanges (sorted-run colocation, same pattern as
    dup_span_counts) — never a broadcast of the doc table, never a
    join operator. All post-guard tables are O(capped pairs + docs).
    """
    from cleanlab_ray.stages.topk import sorted_group_agg

    def emit_tagged(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False)
        doc_arr = batch["doc"]
        if isinstance(doc_arr, pa.ChunkedArray):
            doc_arr = doc_arr.combine_chunks()
        doc = doc_arr.to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h))
        h, doc = h[order], doc[order]
        starts = _run_starts(h)
        lens = np.diff(np.append(starts, len(h)))
        keep = lens <= cap
        starts, lens = starts[keep], lens[keep]
        # member postings of surviving runs -> per-doc survivor counts
        total = int(lens.sum())
        if total:
            offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
            idx = np.arange(total, dtype=np.int64) + np.repeat(
                starts - offs, lens)
            v, c = np.unique(doc[idx], return_counts=True)
        else:
            v = doc[:0]
            c = np.empty(0, dtype=np.int64)
        pos_a, pos_b = _pairs_within_runs(starts, lens)
        da = np.concatenate([doc[pos_a], v])
        db = np.concatenate([doc[pos_b], v])
        cnt = np.concatenate([np.zeros(len(pos_a), dtype=np.int64),
                              c.astype(np.int64)])
        kind = np.concatenate([np.zeros(len(pos_a), dtype=np.int8),
                               np.ones(len(v), dtype=np.int8)])
        return pa.table({
            "doc_a": pa.array(da), "doc_b": pa.array(db),
            "cnt": pa.array(cnt, type=pa.int64()),
            "kind": pa.array(kind, type=pa.int8()),
        })

    tagged = _sorted_block_map(posts, "h", emit_tagged).materialize()

    def only(kind_val: int):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["kind"], kind_val))
        return f

    inter = sorted_group_agg(
        tagged.map_batches(only(0), batch_format="pyarrow")
        .select_columns(["doc_a", "doc_b"]),
        ["doc_a", "doc_b"], {"doc_a": "count"},
    )  # (doc_a, doc_b, count(doc_a))
    nsurv = sorted_group_agg(
        tagged.map_batches(only(1), batch_format="pyarrow")
        .select_columns(["doc_a", "cnt"]),
        "doc_a", {"cnt": "sum"},
    ).materialize()  # (doc_a=doc, sum(cnt)=survivor set size)

    def attach(side_col: str, out_col: str):
        """union(pair rows, survivor rows) sorted on ``side_col``; the
        colocated survivor row fills ``out_col`` for every pair row of
        that key (vectorized searchsorted within the sorted block)."""

        def fill(batch: pa.Table) -> pa.Table:
            kind = batch["kind"].to_numpy(zero_copy_only=False)
            key_arr = batch[side_col]
            if isinstance(key_arr, pa.ChunkedArray):
                key_arr = key_arr.combine_chunks()
            key = key_arr.to_numpy(zero_copy_only=False)
            n = batch["n"].to_numpy(zero_copy_only=False)
            is_n = kind == 1
            nk, nv = key[is_n], n[is_n]
            out = batch.filter(pa.array(~is_n))
            pos = np.searchsorted(nk, key[~is_n])
            vals = nv[np.minimum(pos, max(len(nk) - 1, 0))] if len(nk) else \
                np.zeros(int((~is_n).sum()), dtype=np.int64)
            return out.set_column(
                out.schema.get_field_index("n"), out_col,
                pa.array(vals.astype(np.int64)))

        return fill

    def pair_rows_pass1(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_a": batch["doc_a"], "doc_b": batch["doc_b"],
            "inter": batch["count(doc_a)"].cast(pa.int64()),
            "n": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
            "kind": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
        })

    def nsurv_rows(batch: pa.Table) -> pa.Table:
        # survivor-count rows keyed doc_a=doc (pass 2 re-keys via
        # swap_key below instead of a doc_b variant of this function)
        z = np.zeros(batch.num_rows, dtype=np.int64)
        d = batch["doc_a"]
        return pa.table({
            "doc_a": d,
            "doc_b": d,
            "inter": pa.array(z),
            "n": batch["sum(cnt)"].cast(pa.int64()),
            "kind": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
        })

    # pass 1: na by doc_a (survivor rows keyed doc_a=doc)
    u1 = inter.map_batches(pair_rows_pass1, batch_format="pyarrow").union(
        nsurv.map_batches(nsurv_rows, batch_format="pyarrow"))
    p1 = _sorted_block_map(u1, "doc_a", attach("doc_a", "na"))
    # pass 2: nb by doc_b (survivor rows keyed doc_b=doc)

    def swap_key(batch: pa.Table) -> pa.Table:
        z = np.zeros(batch.num_rows, dtype=np.int64)
        d = batch["doc_a"]
        return pa.table({
            "doc_a": d, "doc_b": d, "inter": pa.array(z),
            "na": batch["sum(cnt)"].cast(pa.int64()),
            "kind": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
        })

    def relabel_p1(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_a": batch["doc_a"], "doc_b": batch["doc_b"],
            "inter": batch["inter"], "na": batch["na"],
            "kind": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
        })

    u2 = p1.map_batches(relabel_p1, batch_format="pyarrow").union(
        nsurv.map_batches(swap_key, batch_format="pyarrow"))

    def fill_nb(batch: pa.Table) -> pa.Table:
        kind = batch["kind"].to_numpy(zero_copy_only=False)
        key_arr = batch["doc_b"]
        if isinstance(key_arr, pa.ChunkedArray):
            key_arr = key_arr.combine_chunks()
        key = key_arr.to_numpy(zero_copy_only=False)
        na = batch["na"].to_numpy(zero_copy_only=False)
        is_n = kind == 1
        nk, nv = key[is_n], na[is_n]
        pair = batch.filter(pa.array(~is_n))
        if pair.num_rows == 0:
            return pa.table({
                "doc_a": pair["doc_a"], "doc_b": pair["doc_b"],
                "jaccard_e6": pa.array(
                    np.empty(0, dtype=np.int64), type=pa.int64()),
            })
        pos = np.searchsorted(nk, key[~is_n])
        nb = nv[np.minimum(pos, len(nk) - 1)] if len(nk) else np.zeros(
            pair.num_rows, dtype=np.int64)
        inter_v = pair["inter"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        na_v = pair["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        jac = inter_v / np.maximum(na_v + nb - inter_v, 1.0)
        keep = jac >= threshold
        out = pair.filter(pa.array(keep))
        return pa.table({
            "doc_a": out["doc_a"], "doc_b": out["doc_b"],
            "jaccard_e6": pa.array(
                np.floor(jac[keep] * 1_000_000 + 0.5).astype(np.int64)),
        })

    return _sorted_block_map(u2, "doc_b", fill_nb)


# ---------------------------------------------------------------------------
# Cross-document duplicate-substring spans (Lee et al. 2022 signal)
# ---------------------------------------------------------------------------

def dup_span_counts(ds, text_col: str = "text", key_col: str = "doc_id",
                    span_k: int = 20):
    """Per-document duplicated-substring coverage: how many of a doc's
    k-byte window positions hold a substring that also occurs in ANOTHER
    document (the substring-level dedup signal of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", with
    fixed-length char k-grams standing in for the suffix-array step —
    the practical web-pipeline variant).

    Ray shape (text never shuffles):
      1. one vectorized map per block emits (window_hash, doc,
         positions_in_doc) postings — DISTINCT per (doc, hash), with
         within-doc multiplicity carried as a count (each doc is one
         row, so (doc, hash) postings are globally unique by
         construction);
      2. one sort exchange on the hash; because postings are distinct
         per doc, an equal-hash run of size >= 2 means >= 2 distinct
         docs share the substring — the whole run's (doc, count) rows
         are duplicated positions;
      3. the sparse dup rows are UNIONED with zero-filled map-only
         per-doc totals rows, and ONE ``groupby(key).sum`` produces
         both columns — the totals rows guarantee every doc appears, so
         no join operator is needed at all (a previous hash-join
         formulation spent 6.4 s of a 10 s sf0.1 run in Ray's
         JoinOperator fixed costs; the fused aggregate removed it).

    Windows use the same lowercased, space-padded byte preprocessing as
    every other shingle kernel here (``shingle_hashes_column``), so a
    doc shorter than ``span_k`` contributes exactly one padded window.

    Returns Dataset[(key, n_spans, n_dup_spans, dup_frac_e6)] with
    dup_frac_e6 = floor(n_dup/n_spans * 1e6 + 0.5).
    """

    def postings(batch: pa.Table):
        hashes, seg_starts, widths = shingle_hashes_column(batch[text_col], span_k)
        n = len(seg_starts)
        row_ids = np.repeat(np.arange(n, dtype=np.int64), widths)
        order = np.lexsort((hashes, row_ids))
        hs, rs = hashes[order], row_ids[order]
        first = np.ones(len(hs), dtype=bool)
        if len(hs) > 1:
            first[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
        idx = np.flatnonzero(first)
        counts = np.diff(np.append(idx, len(hs)))
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        out = pa.table({
            "h": pa.array(hs[first].astype(np.int64), type=pa.int64()),
            "doc": keys.take(pa.array(rs[first])),
            "c": pa.array(counts.astype(np.int64), type=pa.int64()),
        })
        # postings inflate the input ~40x; yield bounded chunks so the
        # downstream sort's parallelism tracks the POSTINGS size, not
        # the (much smaller) input block count
        chunk = 1 << 20
        for off in range(0, out.num_rows, chunk):
            yield out.slice(off, chunk)

    def emit_dups(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False)
        if len(h) == 0:
            return batch
        run_change = np.ones(len(h), dtype=bool)
        run_change[1:] = h[1:] != h[:-1]
        run_id = np.cumsum(run_change) - 1
        run_sizes = np.bincount(run_id)
        keep = run_sizes[run_id] >= 2
        return batch.filter(pa.array(keep))

    def dup_rows(batch: pa.Table) -> pa.Table:
        # map-side combine: one (doc, sum) row per doc per block — the
        # downstream groupby sees O(blocks x docs) rows, not one row per
        # duplicated (doc, hash) posting
        doc = batch["doc"]
        if isinstance(doc, pa.ChunkedArray):
            doc = doc.combine_chunks()
        enc = doc.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False)
        sums = np.bincount(codes, weights=c, minlength=len(enc.dictionary))
        return pa.table({
            key_col: enc.dictionary,
            "_dup": pa.array(sums.astype(np.int64)),
            "_tot": pa.array(np.zeros(len(enc.dictionary), dtype=np.int64)),
        })

    dups = _sorted_block_map(
        ds.map_batches(postings, batch_format="pyarrow"), "h", emit_dups
    ).map_batches(dup_rows, batch_format="pyarrow")

    def totals(batch: pa.Table) -> pa.Table:
        # n_spans MUST come from the same lowercased space-padded BYTE
        # buffer the numerator's windows slide over (utf8_length counts
        # characters — for non-ASCII text that undercounts windows and
        # n_dup_spans could exceed n_spans)
        _, offsets = _lower_padded_bytes(batch[text_col], span_k)
        lens = np.diff(offsets)
        n_spans = np.maximum(lens - span_k + 1, 1).astype(np.int64)
        return pa.table({
            key_col: batch[key_col],
            "_dup": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
            "_tot": pa.array(n_spans),
        })

    from cleanlab_ray.stages.topk import sorted_group_agg

    unioned = ds.map_batches(totals, batch_format="pyarrow").union(dups)
    # sort + run kernel, NOT native groupby: the native aggregate pays
    # ~0.3 ms per group (17 s at 50k docs); this is O(rows) after the
    # same exchange
    summed = sorted_group_agg(unioned, key_col, {"_dup": "sum", "_tot": "sum"})

    def finalize(batch: pa.Table) -> pa.Table:
        nd = batch["sum(_dup)"].to_numpy(zero_copy_only=False).astype(np.float64)
        ns = batch["sum(_tot)"].to_numpy(zero_copy_only=False).astype(np.float64)
        frac = np.floor(nd / ns * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            key_col: batch[key_col],
            "n_spans": pa.array(ns.astype(np.int64)),
            "n_dup_spans": pa.array(nd.astype(np.int64)),
            "dup_frac_e6": pa.array(frac),
        })

    return summed.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cross-document line-level dedup (CCNet-style boilerplate removal)
# ---------------------------------------------------------------------------

def line_dedup_documents(ds, text_col: str = "text", key_col: str = "doc_id",
                         min_docs: int = 2, separator: str = "\n"):
    """Remove every line whose content occurs in >= ``min_docs``
    DISTINCT documents (the line-level dedup / boilerplate-removal step
    of CCNet, Wenzek et al. 2020 — headers, nav bars, cookie banners
    repeat across pages; prose lines don't).

    Ray shape (the text crosses an exchange exactly once, keyed by the
    doc, for the rebuild; the counting exchange moves only hashes):
      1. postings map: split each doc into lines, 64-bit-hash each line
         (pandas C hasher — same as exact dedup), emit one posting
         (h, doc_encoded_key, line_idx) per line occurrence;
      2. ONE sort exchange on h; the run kernel counts DISTINCT docs
         per hash run ((doc,hash) pairs are NOT pre-deduped, so the
         kernel first-occurrence-masks doc ids inside the run) and
         emits (key, line_idx) removal rows for runs hitting min_docs;
      3. union(tagged doc rows, removal rows) + ONE sort exchange on
         the doc key; the rebuild kernel splits each doc's text again,
         drops removed positions with a flat boolean mask, and
         re-joins lines with pc.binary_join — all vectorized.

    Returns Dataset[(key_col, text_dedup, n_lines, n_removed)] with one
    row per input document (documents with every line removed get '').
    """
    sep = separator

    def split_lines(batch: pa.Table):
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        lines = pc.split_pattern(col, pattern=sep)
        flat = pc.list_flatten(lines)
        lens = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(lens.sum())
        if total:
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
            parents = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        else:
            pos = np.empty(0, np.int64)
            parents = np.empty(0, np.int64)
        return lines, flat, lens, pos, parents

    def postings(batch: pa.Table) -> pa.Table:
        _, flat, _lens, pos, parents = split_lines(batch)
        h = pd.util.hash_array(
            np.asarray(flat.to_pandas(), dtype=object)
        ).astype(np.int64)
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pa.table({
            "h": pa.array(h),
            key_col: keys.take(pa.array(parents)),
            "line_idx": pa.array(pos),
        })

    def emit_removals(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.select([key_col, "line_idx"])
        h = batch["h"].to_numpy(zero_copy_only=False)
        starts = _run_starts(h)
        run_id = np.repeat(np.arange(len(starts), dtype=np.int64),
                           np.diff(np.append(starts, n)))
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        try:
            kv = keys.to_numpy(zero_copy_only=False)
        except (TypeError, ValueError):
            kv = np.asarray(keys.to_pandas(), dtype=object)
        # distinct docs per run: first occurrence of (run, doc) in
        # (run, doc)-sorted order
        order = np.lexsort((kv, run_id))
        rs, ds_ = run_id[order], kv[order]
        first = np.ones(n, dtype=bool)
        first[1:] = (rs[1:] != rs[:-1]) | (ds_[1:] != ds_[:-1])
        ndocs = np.bincount(rs[first], minlength=len(starts))
        keep = ndocs[run_id] >= min_docs
        return batch.select([key_col, "line_idx"]).filter(pa.array(keep))

    removals = _sorted_block_map(
        ds.map_batches(postings, batch_format="pyarrow"), "h", emit_removals
    )

    def tag_docs(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({
            key_col: batch[key_col],
            "line_idx": pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
            text_col: pc.cast(pc.fill_null(col, ""), pa.large_string()),
        })

    def tag_removals(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch[key_col],
            "line_idx": pc.cast(batch["line_idx"], pa.int64()),
            text_col: pa.nulls(batch.num_rows, pa.large_string()),
        })

    unioned = ds.map_batches(tag_docs, batch_format="pyarrow").union(
        removals.map_batches(tag_removals, batch_format="pyarrow")
    )

    def rebuild(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.table({
            key_col: batch[key_col].slice(0, 0),
            "text_dedup": pa.array([], type=pa.large_string()),
            "n_lines": pa.array([], type=pa.int64()),
            "n_removed": pa.array([], type=pa.int64()),
        })
        if n == 0:
            return empty
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        try:
            kv = keys.to_numpy(zero_copy_only=False)
        except (TypeError, ValueError):
            kv = np.asarray(keys.to_pandas(), dtype=object)
        li = batch["line_idx"].to_numpy(zero_copy_only=False)
        starts = _run_starts(kv)
        n_runs = len(starts)
        run_id = np.repeat(np.arange(n_runs, dtype=np.int64),
                           np.diff(np.append(starts, n)))
        doc_rows = np.flatnonzero(li == -1)  # exactly one per run
        # map each run to its doc row (runs without a doc row cannot
        # happen: removals reference existing docs)
        doc_of_run = np.full(n_runs, -1, dtype=np.int64)
        doc_of_run[run_id[doc_rows]] = doc_rows
        doc_tbl = batch.take(pa.array(doc_rows[np.argsort(run_id[doc_rows])]))
        lines, flat, lens, _pos, _parents = split_lines(doc_tbl)
        doc_starts = np.concatenate([[0], np.cumsum(lens)])
        # removal rows -> global flat positions
        rem_rows = np.flatnonzero(li >= 0)
        keep = np.ones(int(lens.sum()), dtype=bool)
        if len(rem_rows):
            g = doc_starts[run_id[rem_rows]] + li[rem_rows]
            keep[g] = False
        kept_per_doc = np.add.reduceat(keep.astype(np.int64), doc_starts[:-1]) \
            if len(lens) else np.empty(0, np.int64)
        kept_per_doc = np.where(lens > 0, kept_per_doc, 0)
        new_offsets = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int64)
        flat_kept = flat.filter(pa.array(keep))
        rebuilt = pa.LargeListArray.from_arrays(
            pa.array(new_offsets), pc.cast(flat_kept, pa.large_string()))
        return pa.table({
            key_col: doc_tbl[key_col],
            "text_dedup": pc.binary_join(
                rebuilt, pa.scalar(sep, type=pa.large_string())),
            "n_lines": pa.array(lens),
            "n_removed": pa.array((lens - kept_per_doc).astype(np.int64)),
        })

    return _sorted_block_map(unioned, key_col, rebuild)
