"""Distributed Lloyd k-means over an embedding column.

Reference semantics: the clustering step the reference delegates to
sklearn (KMeans/DBSCAN) when Datalab's underperforming-group manager
is given features instead of cluster ids
(/root/reference/cleanlab/datalab/internal/issue_manager/underperforming_group.py
:~90-140 `perform_clustering`). The engine implements the same role as
a native Ray Data operator instead of a driver-side sklearn call.

Ray shape — the scale-correct decomposition:
- init: centroids = the k rows with the smallest key values via the
  exchange-free exact `global_top_k` (deterministic and
  SQL-reproducible, unlike random restarts);
- each Lloyd iteration is ONE streaming aggregate pass: every block
  computes (sums[K,D], counts[K]) partials against the broadcast
  centroids — a flat mergeable float64 accumulator, no shuffle, no
  driver-side data; the driver only updates the (K,D) centroid matrix
  (tiny) between passes;
- assignment is a final `map_batches` with the fixed centroids.

Empty clusters keep their previous centroid. Ties in the argmin break
to the lowest cluster index (np.argmin first-min).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _matrix(batch: pa.Table, col: str) -> np.ndarray:
    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    if batch.num_rows == 0:
        # reshape(0, -1) raises on a zero-size buffer; emit (0, 0) so
        # empty blocks pass through callers' guards instead of crashing
        return np.empty((0, 0), dtype=np.float64)
    flat = np.asarray(c.values, dtype=np.float64)
    return flat.reshape(batch.num_rows, -1)


def _assign(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid index per row (squared euclidean, first-min)."""
    d2 = (
        np.sum(mat * mat, axis=1)[:, None]
        + np.sum(cents * cents, axis=1)[None, :]
        - 2.0 * (mat @ cents.T)
    )
    return np.argmin(d2, axis=1)


def _moment_aggfn(embedding_col: str, cents: np.ndarray):
    from ray.data.aggregate import AggregateFn

    k, d = cents.shape

    # Flat accumulator: [sums(K*D) | counts(K)].
    def accumulate_block(acc, block: pa.Table):
        mat = _matrix(block, embedding_col)
        if mat.size == 0:
            return acc
        a = _assign(mat, cents)
        sums = np.zeros((k, d))
        np.add.at(sums, a, mat)
        counts = np.bincount(a, minlength=k).astype(np.float64)
        return acc + np.concatenate([sums.reshape(-1), counts])

    return AggregateFn(
        init=lambda _: np.zeros(k * d + k, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: a + b,
        name="kmeans_moments",
    )


def kmeans_fit(
    ds,
    embedding_col: str = "embedding",
    key_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 3,
) -> np.ndarray:
    """Fit k-means; returns the (k, D) centroid matrix.

    One streaming aggregate pass over ``ds`` per iteration; nothing but
    the (k, D) centroids ever lives on the driver. Seeding picks the k
    globally-smallest keys' embeddings via :func:`~cleanlab_ray.stages
    .topk.global_top_k` — exchange-free exact bottom-k (previously:
    sort(key).limit(k), an all-to-all over every embedding to select k
    seed rows)."""
    from cleanlab_ray.stages.topk import global_top_k

    # global_top_k's driver merge already returns rows sorted ascending
    # by key_col — no re-sort needed
    seed_rows = global_top_k(
        ds.select_columns([key_col, embedding_col]), key_col, k
    ).to_pandas()
    if len(seed_rows) == 0:
        raise ValueError(
            "kmeans_fit: empty input — cannot seed centroids from zero rows"
        )
    cents = np.stack(seed_rows[embedding_col].to_numpy()).astype(np.float64)
    for _ in range(n_iter):
        agg = ds.aggregate(_moment_aggfn(embedding_col, cents))["kmeans_moments"]
        flat = np.asarray(agg, dtype=np.float64)
        kk, d = cents.shape
        sums = flat[: kk * d].reshape(kk, d)
        counts = flat[kk * d :]
        nonempty = counts > 0
        new = cents.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        cents = new
    return cents


def kmeans_assign(ds, cents: np.ndarray, embedding_col: str = "embedding"):
    """Append a ``cluster`` (int64) column: nearest fitted centroid."""
    import ray

    handle = ray.put(np.asarray(cents, dtype=np.float64))

    def kernel(batch: pa.Table) -> pa.Table:
        c = ray.get(handle)
        mat = _matrix(batch, embedding_col)
        a = _assign(mat, c) if len(mat) else np.empty(0, np.int64)
        return batch.append_column("cluster", pa.array(a.astype(np.int64)))

    return ds.map_batches(kernel, batch_format="pyarrow")


def kmeans_cluster(
    ds,
    embedding_col: str = "embedding",
    key_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 3,
):
    """fit + assign in one call; returns (assigned Dataset, centroids)."""
    cents = kmeans_fit(ds, embedding_col, key_col, k, n_iter)
    return kmeans_assign(ds, cents, embedding_col), cents
