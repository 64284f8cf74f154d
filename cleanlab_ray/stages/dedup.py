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
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def add_content_hash(
    batch: pa.Table, text_col: str = "text", out_col: str = "content_hash"
) -> pa.Table:
    """Vectorized 64-bit hash of a string column (pandas C hashing)."""
    s = batch[text_col].to_pandas().fillna("")
    h = pd.util.hash_array(s.to_numpy(dtype=object)).astype(np.uint64)
    return batch.append_column(out_col, pa.array(h.astype(np.int64), type=pa.int64()))


def exact_dedup(
    ds,
    text_col: str = "text",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    hash_col: str = "content_hash",
):
    """Keep one row per distinct text: the minimal (key_cols) row.

    Shuffle key = 64-bit content hash; within each hash group rows are
    compared on the actual text so collisions cannot merge distinct
    contents."""

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(key_cols), kind="mergesort")
        return g.drop_duplicates(subset=[text_col], keep="first")

    with_hash = ds.map_batches(
        lambda b: add_content_hash(b, text_col, hash_col), batch_format="pyarrow"
    )
    return (
        with_hash.groupby(hash_col)
        .map_groups(keep_first, batch_format="pandas")
        .drop_columns([hash_col])
    )


# ---------------------------------------------------------------------------
# MinHash-LSH near-duplicate detection
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    data = text.lower().encode("utf-8")
    if len(data) < k:
        data = data + b" " * (k - len(data))
    arr = np.frombuffer(data, dtype=np.uint8)
    view = np.lib.stride_tricks.sliding_window_view(arr, k)
    # 64-bit FNV-ish rolling hash of each shingle, vectorized
    h = np.zeros(len(view), dtype=np.uint64)
    for i in range(k):
        h = h * np.uint64(1099511628211) + view[:, i].astype(np.uint64)
    return np.unique(h)


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(shingles) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    # (P, S) permuted hashes -> min per permutation
    vals = (shingles[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def make_minhash_kernel(
    text_col: str = "text", num_perm: int = 64, bands: int = 16, shingle_k: int = 5
):
    """map_batches kernel emitting one row per (row, band):
    (key cols..., band_id, band_hash) for the LSH bucket groupby."""
    a, b = _minhash_params(num_perm)
    rows_per_band = num_perm // bands

    def kernel(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        sigs = np.empty((n, num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = minhash_signature(char_shingles(t or "", shingle_k), a, b)
        band_view = sigs.reshape(n, bands, rows_per_band)
        band_hash = np.zeros((n, bands), dtype=np.uint64)
        for j in range(rows_per_band):
            band_hash = band_hash * np.uint64(1099511628211) + band_view[:, :, j]
        pdf = batch.to_pandas()
        tiled = pdf.loc[pdf.index.repeat(bands)].reset_index(drop=True)
        tiled["band_id"] = np.tile(np.arange(bands, dtype=np.int32), n)
        tiled["band_hash"] = band_hash.reshape(-1).astype(np.int64)
        return pa.Table.from_pandas(tiled, preserve_index=False)

    return kernel


def near_dup_groups(
    ds,
    text_col: str = "text",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    shingle_k: int = 5,
):
    """Flag near-duplicate rows: returns Dataset[key_cols + (is_near_dup,)].

    Construction (two shuffles, both COMPACT):
      1. band shuffle carries only (keys, band_id, band_hash) — never the
         text — to find candidate buckets (>= 2 members); each bucket
         emits (key, group_rep=bucket-minimal key) rows;
      2. candidate rows only (usually a tiny fraction) are re-shuffled BY
         GROUP REP with their text for exact Jaccard verification
         against the representative.
    Partitioning assumption: the candidate set is sparse relative to the
    corpus (true when bands/num_perm are tuned to the target threshold);
    the candidate->rep map is broadcast, so candidate discovery adds no
    text movement at all."""

    sel = ds.select_columns([*key_cols, text_col])
    banded = sel.map_batches(
        make_minhash_kernel(text_col, num_perm, bands, shingle_k),
        batch_format="pyarrow",
    ).drop_columns([text_col])

    def candidate_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=[*key_cols, "_rep"])
        g = g.sort_values(list(key_cols), kind="mergesort")
        rep = "\x1f".join(str(g.iloc[0][c]) for c in key_cols)
        out = g[list(key_cols)].copy()
        out["_rep"] = rep
        return out

    candidates = (
        banded.groupby(["band_id", "band_hash"])
        .map_groups(candidate_pairs, batch_format="pandas")
        .to_pandas()
    )
    if candidates.empty:
        import ray.data as rd

        return rd.from_items([])
    # (key -> rep) candidate table, broadcast (compact: candidate keys only)
    candidates["_key"] = candidates[list(key_cols)].astype(str).agg("\x1f".join, axis=1)
    cand_frame = candidates[["_key", "_rep"]].drop_duplicates()
    import ray

    map_ref = ray.put(cand_frame)

    def attach_rep(batch: pa.Table) -> pa.Table:
        cand = ray.get(map_ref)
        pdf = batch.to_pandas()
        pdf["_key"] = pdf[list(key_cols)].astype(str).agg("\x1f".join, axis=1)
        merged = pdf.merge(cand, on="_key", how="inner").drop(columns=["_key"])
        return pa.Table.from_pandas(merged, preserve_index=False)

    candidate_rows = sel.map_batches(attach_rep, batch_format="pyarrow")

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(key_cols), kind="mergesort").drop_duplicates(subset=list(key_cols))
        if len(g) < 2:
            return pd.DataFrame(columns=[*key_cols, "peer_count"])
        rep_key = g["_rep"].iloc[0]
        gk = g[list(key_cols)].astype(str).agg("\x1f".join, axis=1)
        base_rows = g[gk == rep_key]
        if base_rows.empty:
            return pd.DataFrame(columns=[*key_cols, "peer_count"])
        base = char_shingles(base_rows.iloc[0][text_col] or "", shingle_k)
        keep = []
        for i in range(len(g)):
            if gk.iloc[i] == rep_key:
                continue
            sh = char_shingles(g.iloc[i][text_col] or "", shingle_k)
            inter = np.intersect1d(base, sh, assume_unique=True).size
            union = base.size + sh.size - inter
            if union > 0 and inter / union >= jaccard_threshold:
                keep.append(i)
        if not keep:
            return pd.DataFrame(columns=[*key_cols, "peer_count"])
        rows = pd.concat([base_rows.iloc[[0]], g.iloc[keep]])[list(key_cols)].copy()
        rows["peer_count"] = len(keep) + 1
        return rows

    flagged = candidate_rows.groupby("_rep").map_groups(verify_group, batch_format="pandas")

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        out = g.iloc[[0]][list(key_cols)].copy()
        out["is_near_dup"] = True
        return out

    return flagged.groupby(list(key_cols)).map_groups(collapse, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash near-duplicate detection
# ---------------------------------------------------------------------------

def _simhash_batch(texts: list[str], shingle_k: int = 4) -> np.ndarray:
    """64-bit SimHash per text: sign of summed +/-1 bit votes from
    shingle hashes."""
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
    against the bucket's minimal-key row. Returns flagged keys."""
    bits_per_band = 64 // bands

    def kernel(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        sigs = _simhash_batch(texts, shingle_k)
        n = len(texts)
        pdf = batch.to_pandas()
        tiled = pdf.loc[pdf.index.repeat(bands)].reset_index(drop=True)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        shifts = (band_ids * bits_per_band).astype(np.uint64)
        mask = np.uint64((1 << bits_per_band) - 1)
        band_hash = (np.repeat(sigs, bands) >> shifts) & mask
        tiled["band_id"] = band_ids
        tiled["band_hash"] = band_hash.astype(np.int64)
        tiled["simhash"] = np.repeat(sigs.astype(np.int64), bands)
        return pa.Table.from_pandas(tiled, preserve_index=False)

    banded = ds.select_columns([*key_cols, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=list(key_cols))
        g = g.sort_values(list(key_cols), kind="mergesort")
        sigs = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        base = sigs[0]
        ham = np.array([bin(int(base ^ s)).count("1") for s in sigs])
        keep = np.nonzero(ham <= max_hamming)[0]
        if len(keep) < 2:
            return pd.DataFrame(columns=list(key_cols))
        return g.iloc[keep][list(key_cols)]

    flagged = banded.groupby(["band_id", "band_hash"]).map_groups(
        verify_bucket, batch_format="pandas"
    )

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        out = g.iloc[[0]][list(key_cols)].copy()
        out["is_simhash_dup"] = True
        return out

    return flagged.groupby(list(key_cols)).map_groups(collapse, batch_format="pandas")


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
    sign buckets (num_planes bits each) -> groupby bucket -> exact cosine
    verification against the bucket's minimal-key row."""
    def make_planes(dim):
        rng = np.random.default_rng(seed)
        return rng.standard_normal((num_tables, num_planes, dim))

    planes_cache = {}

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch[embedding_col].combine_chunks()
        flat = np.asarray(col.values, dtype=np.float64)
        mat = flat.reshape(len(col), -1)
        dim = mat.shape[1]
        if dim not in planes_cache:
            planes_cache[dim] = make_planes(dim)
        planes = planes_cache[dim]
        pdf = batch.to_pandas()
        frames = []
        for t in range(num_tables):
            signs = (mat @ planes[t].T) > 0          # (B, P)
            bucket = signs.dot(1 << np.arange(num_planes)).astype(np.int64)
            f = pdf.copy()
            f["table_id"] = t
            f["bucket"] = bucket
            frames.append(f)
        return pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False)

    banded = ds.select_columns([*key_cols, embedding_col]).map_batches(
        kernel, batch_format="pyarrow"
    )

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=list(key_cols))
        g = g.sort_values(list(key_cols), kind="mergesort")
        mat = np.stack(g[embedding_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        base = mat[0] / max(norms[0], 1e-300)
        cs = (mat @ base) / np.maximum(norms, 1e-300)
        keep = np.nonzero(cs >= cosine_threshold)[0]
        if len(keep) < 2:
            return pd.DataFrame(columns=list(key_cols))
        return g.iloc[keep][list(key_cols)]

    flagged = banded.groupby(["table_id", "bucket"]).map_groups(
        verify_bucket, batch_format="pandas"
    )

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        out = g.iloc[[0]][list(key_cols)].copy()
        out["is_embedding_dup"] = True
        return out

    return flagged.groupby(list(key_cols)).map_groups(collapse, batch_format="pandas")


# ---------------------------------------------------------------------------
# Document fingerprinting (rolling polynomial hash)
# ---------------------------------------------------------------------------

def add_fingerprint(batch: pa.Table, text_col: str = "text",
                    out_col: str = "fingerprint") -> pa.Table:
    """64-bit polynomial rolling hash of the whole text (vectorized
    Horner evaluation over the concatenated byte buffer)."""
    import pyarrow.compute as pc

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "").cast(pa.large_string())
    bufs = col.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[col.offset : col.offset + len(col) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    out = np.zeros(len(col), dtype=np.uint64)
    P = np.uint64(1099511628211)
    for i in range(len(col)):
        h = np.uint64(14695981039346656037)
        for b in data[offsets[i] : offsets[i + 1]]:
            h = h * P ^ np.uint64(b)
        out[i] = h
    return batch.append_column(out_col, pa.array(out.astype(np.int64), type=pa.int64()))

