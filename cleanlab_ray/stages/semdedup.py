"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): cluster embeddings with k-means, then inside each
cluster drop every item whose cosine similarity to a *higher-priority*
cluster member is >= eps. Priority keeps the items farthest from the
centroid (lowest cosine-to-centroid), matching the paper's
keep-low-centroid-similarity rule; ties break on the smaller key.

Divergence from the paper's greedy scan (documented): an item is
dropped if ANY higher-priority member is eps-similar, whether or not
that member was itself dropped. This removes the sequential dependency
(the greedy variant needs the kept-set so far), is slightly more
aggressive, and is expressible as a self-join — so a DuckDB oracle can
verify it exactly.

Scale design:
- k-means fit/assign reuse stages/kmeans.py (streaming-aggregate Lloyd
  iterations; only the (k, D) centroids live on the driver).
- ONE sort exchange keyed by cluster colocates members (the embedding
  column must ride it — that is the irreducible data movement of any
  within-cluster comparison). Per-cluster work is a chunked
  (C x C) cosine matmul: O(C^2) flops but O(C x chunk) memory, the
  SemDeDup design point — size k so C = N/k stays ~1e4-1e5.
- No driver-side row data; output streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def semdedup(
    ds,
    embedding_col: str = "embedding",
    key_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 3,
    eps: float = 0.99,
    chunk: int = 4096,
):
    """Returns (key, cluster, cos_cent_e6, is_semdup) per input row."""
    import ray

    from cleanlab_ray.stages.ann import _normalize
    from cleanlab_ray.stages.dedup import _sorted_block_map
    from cleanlab_ray.stages.kmeans import _matrix, kmeans_cluster

    assigned, cents = kmeans_cluster(ds, embedding_col, key_col, k, n_iter)
    cn = _normalize(np.asarray(cents, dtype=np.float64))
    cents_ref = ray.put(cn)

    def add_cos_cent(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        mat = _matrix(batch, embedding_col)
        cl = batch["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        en = _normalize(mat)
        cc = np.einsum("ij,ij->i", en, c[cl]) if len(cl) else np.empty(0)
        return batch.append_column("cos_cent", pa.array(cc, type=pa.float64()))

    prepped = assigned.map_batches(add_cos_cent, batch_format="pyarrow")

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int64()),
                    "cos_cent_e6": pa.array([], type=pa.int64()),
                    "is_semdup": pa.array([], type=pa.bool_()),
                }
            )
        cl = batch["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cc = batch["cos_cent"].to_numpy(zero_copy_only=False)
        mat = _matrix(batch, embedding_col)
        en = _normalize(mat)

        change = np.ones(n, dtype=bool)
        change[1:] = cl[1:] != cl[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        dropped = np.zeros(n, dtype=bool)
        for s, e in zip(starts, ends):
            c = e - s
            if c < 2:
                continue
            # priority order: farthest-from-centroid first, then key
            order = np.lexsort((keys[s:e], cc[s:e]))
            eo = en[s:e][order]
            drop_o = np.zeros(c, dtype=bool)
            # chunk rows AND columns: O(chunk^2) memory regardless of C
            for a in range(1, c, chunk):
                b = min(a + chunk, c)
                best = np.full(b - a, -np.inf)
                rows_g = np.arange(a, b)
                for a2 in range(0, b, chunk):
                    b2 = min(a2 + chunk, b)
                    sim = eo[a:b] @ eo[a2:b2].T
                    if b2 <= a:  # block entirely of earlier columns
                        np.maximum(best, sim.max(axis=1), out=best)
                    else:  # diagonal block: keep only cols j < row index
                        mask = np.arange(a2, b2)[None, :] < rows_g[:, None]
                        np.maximum(
                            best,
                            np.where(mask, sim, -np.inf).max(axis=1),
                            out=best,
                        )
                drop_o[a:b] = best >= eps
            idx = np.arange(s, e)[order]
            dropped[idx] = drop_o
        return pa.table(
            {
                key_col: pa.array(keys, type=pa.int64()),
                "cluster": pa.array(cl, type=pa.int64()),
                "cos_cent_e6": pa.array(
                    np.round(cc * 1_000_000).astype(np.int64), type=pa.int64()
                ),
                "is_semdup": pa.array(dropped, type=pa.bool_()),
            }
        )

    return _sorted_block_map(prepped, "cluster", kernel)
