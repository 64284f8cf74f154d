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
    flat = np.asarray(col.values, dtype=np.float64)
    return flat.reshape(len(col), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)


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
        q = ray.get(qref)  # (Q, D)
        mat = _normalize(_matrix_from_list_col(batch[embedding_col]))
        sims = mat @ q.T  # (B, Q)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
        nq = q.shape[0]
        qid = np.repeat(np.arange(nq, dtype=np.int64), kk)
        sel = top.T.reshape(-1)  # row indices, one flatten — no per-query loop
        return pa.table(
            {
                "query_id": pa.array(qid),
                "vec_id": pa.array(ids[sel].astype(np.int64)),
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

    q_buckets = bucket_of(qn)
    candidate_buckets: set[int] = set()
    for b in q_buckets:
        candidate_buckets.add(int(b))
        if multiprobe >= 1:
            for bit in range(num_planes):
                candidate_buckets.add(int(b) ^ (1 << bit))
    qref = ray.put((qn, candidate_buckets))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q, cand = ray.get(qref)
        mat = _matrix_from_list_col(batch[embedding_col])
        buckets = bucket_of(_normalize(mat))
        keep = np.fromiter((int(b) in cand for b in buckets), dtype=bool, count=len(buckets))
        idx = np.nonzero(keep)[0]
        if len(idx) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cos_sim": pa.array([], type=pa.float64()),
                }
            )
        sub = _normalize(mat[idx])
        sims = sub @ q.T
        ids = batch[id_col].to_numpy(zero_copy_only=False)[idx]
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
        nq = q.shape[0]
        qid = np.repeat(np.arange(nq, dtype=np.int64), kk)
        sel = top.T.reshape(-1)  # one flatten — no per-query loop
        return pa.table(
            {
                "query_id": pa.array(qid),
                "vec_id": pa.array(ids[sel].astype(np.int64)),
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
        qmat, cmat, pmask = ray.get(bref)
        mat = _matrix_from_list_col(batch[embedding_col])
        if len(mat) == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "cos_sim": pa.array([], type=pa.float64()),
            })
        cell = _assign(mat, cmat)                       # (B,)
        cand = pmask[cell]                              # (B, Q) bool
        sims = _normalize(mat) @ qmat.T                 # (B, Q)
        sims = np.where(cand, sims, -np.inf)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]   # (kk, Q)
        nq = qmat.shape[0]
        qid = np.repeat(np.arange(nq, dtype=np.int64), kk)
        sel = top.T.reshape(-1)
        vals = sims[sel, qid]
        ok = np.isfinite(vals)                          # drop non-candidates
        return pa.table({
            "query_id": pa.array(qid[ok]),
            "vec_id": pa.array(ids[sel[ok]].astype(np.int64)),
            "cos_sim": pa.array(vals[ok]),
        })

    from cleanlab_ray.stages.topk import grouped_top_k

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    # merge = top-k per query by (cos_sim DESC, vec_id ASC) — the
    # sorted-run Arrow kernel, not a per-group pandas roundtrip (the
    # native map_groups path costs ~0.3 ms/group; see stages/topk.py)
    return grouped_top_k(partials, "query_id", "cos_sim", k,
                         tie_cols=("vec_id",))
