"""Similarity search over an embedding column.

- ``ann_brute_force``: the exact baseline — per-batch numpy matmul of
  each block against a broadcast query matrix (``ray.put`` once, read in
  every task), per-batch partial top-k, then a tiny groupby(query_id)
  merge. No all-to-all shuffle: the only reduced data is Q×k rows per
  block.
- ``ann_lsh``: the scale path — random-hyperplane buckets; only rows
  whose bucket matches a query bucket (within ``multiprobe`` hamming
  distance) are scored. Recall/cost is tuned by num_planes/multiprobe;
  partitioning assumption: bucket ids distribute uniformly, so the
  candidate set per query is ~N / 2^planes × probes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _matrix_from_list_col(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        # reshape(0, -1) raises on a zero-size buffer; emit (0, 0) so
        # empty blocks pass through guards instead of crashing
        return np.empty((0, 0), dtype=np.float64)
    flat = np.asarray(col.values, dtype=np.float64)
    return flat.reshape(len(col), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)


_EMPTY_TOPK = pa.table({
    "query_id": pa.array([], type=pa.int64()),
    "vec_id": pa.array([], type=pa.int64()),
    "cos_sim": pa.array([], type=pa.float64()),
})


def _select_topk(sims: np.ndarray, ids: np.ndarray, kk: int):
    """Per-query bottom-kk row selection by (cos_sim DESC, id ASC) —
    a per-column lexsort, NOT bare argpartition, so rows tied at the
    kk-th score keep the SMALLEST ids (the merge's documented total
    order; an arbitrary tie subset here could drop rows the global
    top-k needs). Returns (qid, sel) flat index arrays."""
    ids_b = np.broadcast_to(ids[:, None], sims.shape)
    order = np.lexsort((ids_b, -sims), axis=0)[:kk]  # (kk, Q)
    nq = sims.shape[1]
    qid = np.repeat(np.arange(nq, dtype=np.int64), kk)
    return qid, order.T.reshape(-1)


def ann_brute_force(
    ds,
    queries: np.ndarray,
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Exact cosine top-k for each query row. Returns
    Dataset[(query_id, vec_id, cos_sim)] with k rows per query."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(qn)

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_TOPK
        q = ray.get(qref)  # (Q, D)
        mat = _normalize(_matrix_from_list_col(batch[embedding_col]))
        sims = mat @ q.T  # (B, Q)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qid, sel = _select_topk(sims, ids, min(k, sims.shape[0]))
        return pa.table(
            {
                "query_id": pa.array(qid),
                "vec_id": pa.array(ids[sel]),
                "cos_sim": pa.array(sims[sel, qid]),
            }
        )

    from cleanlab_ray.stages.topk import grouped_top_k

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    # merge = top-k per query by (cos_sim DESC, vec_id ASC) — the
    # sorted-run Arrow kernel, not a per-group pandas roundtrip (the
    # native map_groups path costs ~0.3 ms/group; see stages/topk.py)
    return grouped_top_k(partials, "query_id", "cos_sim", k,
                         tie_cols=("vec_id",))


def ann_lsh(
    ds,
    queries: np.ndarray,
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    multiprobe: int = 1,
    seed: int = 13,
):
    """LSH-bucketed approximate top-k: score only rows whose hyperplane
    bucket is within ``multiprobe`` bit flips of a query's bucket."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    dim = qn.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))

    def bucket_of(m: np.ndarray) -> np.ndarray:
        return ((m @ planes.T) > 0).dot(1 << np.arange(num_planes)).astype(np.int64)

    from itertools import combinations

    q_buckets = bucket_of(qn)
    candidate_buckets: set[int] = set()
    # all buckets within `multiprobe` bit flips (true hamming-ball
    # probing — previously only 1-bit flips were generated, so
    # multiprobe > 1 was silently a no-op)
    flip_masks = [0]
    for r in range(1, min(int(multiprobe), num_planes) + 1):
        for bits in combinations(range(num_planes), r):
            m = 0
            for bit in bits:
                m |= 1 << bit
            flip_masks.append(m)
    for b in q_buckets:
        for m in flip_masks:
            candidate_buckets.add(int(b) ^ m)
    cand_arr = np.fromiter(candidate_buckets, dtype=np.int64,
                           count=len(candidate_buckets))
    qref = ray.put((qn, cand_arr))

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_TOPK
        q, cand = ray.get(qref)
        mat = _matrix_from_list_col(batch[embedding_col])
        buckets = bucket_of(_normalize(mat))
        idx = np.flatnonzero(np.isin(buckets, cand))
        if len(idx) == 0:
            return _EMPTY_TOPK
        sub = _normalize(mat[idx])
        sims = sub @ q.T
        ids = batch[id_col].to_numpy(zero_copy_only=False)[idx].astype(np.int64)
        qid, sel = _select_topk(sims, ids, min(k, sims.shape[0]))
        return pa.table(
            {
                "query_id": pa.array(qid),
                "vec_id": pa.array(ids[sel]),
                "cos_sim": pa.array(sims[sel, qid]),
            }
        )

    from cleanlab_ray.stages.topk import grouped_top_k

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    # merge = top-k per query by (cos_sim DESC, vec_id ASC) — the
    # sorted-run Arrow kernel, not a per-group pandas roundtrip (the
    # native map_groups path costs ~0.3 ms/group; see stages/topk.py)
    return grouped_top_k(partials, "query_id", "cos_sim", k,
                         tie_cols=("vec_id",))


def ann_ivf(
    ds,
    queries: np.ndarray,
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 8,
    nprobe: int = 2,
    n_iter: int = 3,
):
    """IVF (inverted-file) approximate top-k — the classic FAISS-style
    scale path: a coarse k-means quantizer partitions the corpus into
    ``nlist`` cells; each query probes only its ``nprobe`` nearest cells,
    so the scored fraction is ~nprobe/nlist of the data.

    Ray-Data-first: the quantizer is the engine's distributed Lloyd
    k-means (one streaming moment-aggregate per iteration — only the
    (nlist, D) centroids ever live on the driver), cell assignment +
    masked partial top-k run inside one ``map_batches`` pass against a
    broadcast (queries, centroids, probe-mask) triple, and the merge is
    a tiny groupby over Q×k candidate rows per block. No all-to-all
    shuffle of the embeddings.

    Determinism: centroids seed from the ``nlist`` smallest ids;
    assignment ties break to the lowest cell id (argmin), probe order by
    (distance, cell id) — all replicable in SQL via the chained Lloyd
    CTEs of the ``kmeans_clusters`` oracle."""
    import ray

    from cleanlab_ray.stages.kmeans import _assign, kmeans_fit

    cents = kmeans_fit(ds, embedding_col, id_col, k=nlist, n_iter=n_iter)
    q = np.asarray(queries, dtype=np.float64)
    qn = _normalize(q)
    # probe cells per query: nprobe nearest centroids by euclidean
    # distance on the RAW query vector, ties to the lowest cell id
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)  # (Q, nlist)
    order = np.lexsort((np.broadcast_to(np.arange(nlist), d2.shape), d2), axis=1)
    probes = order[:, :nprobe]  # (Q, nprobe)
    probe_mask = np.zeros((nlist, q.shape[0]), dtype=bool)  # (nlist, Q)
    for qi in range(q.shape[0]):  # Q is tiny (driver-side, once)
        probe_mask[probes[qi], qi] = True
    bref = ray.put((qn, cents, probe_mask))

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_TOPK
        qmat, cmat, pmask = ray.get(bref)
        mat = _matrix_from_list_col(batch[embedding_col])
        cell = _assign(mat, cmat)                       # (B,)
        cand = pmask[cell]                              # (B, Q) bool
        sims = _normalize(mat) @ qmat.T                 # (B, Q)
        sims = np.where(cand, sims, -np.inf)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qid, sel = _select_topk(sims, ids, min(k, sims.shape[0]))
        vals = sims[sel, qid]
        ok = np.isfinite(vals)                          # drop non-candidates
        return pa.table({
            "query_id": pa.array(qid[ok]),
            "vec_id": pa.array(ids[sel[ok]]),
            "cos_sim": pa.array(vals[ok]),
        })

    from cleanlab_ray.stages.topk import grouped_top_k

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    # merge = top-k per query by (cos_sim DESC, vec_id ASC) — the
    # sorted-run Arrow kernel, not a per-group pandas roundtrip (the
    # native map_groups path costs ~0.3 ms/group; see stages/topk.py)
    return grouped_top_k(partials, "query_id", "cos_sim", k,
                         tie_cols=("vec_id",))
