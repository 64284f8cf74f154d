"""Data valuation — KNN-Shapley, partition-local.

Reference: /root/reference/cleanlab/data_valuation.py:14-51 (the O(N^2)
recursion from Jia et al. 2019 eqs. 18-19, training set as its own test
set). A global N x N score matrix cannot exist at engine scale, so the
engine computes the SAME recursion within LSH partitions: rows are
bucketed by random-hyperplane signs (locality-preserving), each bucket
computes its exact in-bucket KNN-Shapley, and the per-row value is
averaged over the bucket's rows only. Documented approximation:
neighbors outside the bucket are not considered — the partitioning
assumption is that hyperplane buckets keep near neighbors together
(same assumption as stages/ann.ann_lsh).

Per datalab's issue manager the exported score is ``0.5 * (1 + value)``
(rescaled to [0, 1]) with low-score rows flagged via ``score <
threshold`` UNIFORMLY (data_valuation.py issue manager line 142) — a
singleton bucket has no neighbors, gets the neutral score 0.5, and is
flagged iff ``0.5 < threshold``, exactly like any other neutral row
(no special-case False: the reference applies one threshold rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def knn_shapley_score(neighbor_indices: np.ndarray, y: np.ndarray, k: int) -> np.ndarray:
    """Exact reference recursion (data_valuation.py:14-51), vectorized.

    The backward recurrence
    ``s_alpha[idx[j]] = s_alpha[idx[j+1]] + (matches[j] - matches[j+1])``
    seeded with ``s_alpha[idx[k-1]] = 0`` telescopes to
    ``s_alpha[idx[j]] = matches[j] - matches[k-1]``, so the whole (n, n)
    score matrix reduces to one (n, k) match matrix plus a bincount
    scatter-add over the neighbor indices — no per-row Python loop.
    """
    n = y.shape[0]
    matches = (y[neighbor_indices] == y[:, None]).astype(np.float64)
    contrib = matches - matches[:, -1:]
    totals = np.bincount(
        neighbor_indices.ravel(), weights=contrib.ravel(), minlength=n
    )
    return totals / (n * k)


def data_valuation(
    ds,
    embedding_col: str = "embedding",
    label_col: str = "label",
    key_cols: tuple[str, ...] = ("vec_id",),
    k: int = 10,
    num_planes: int = 4,
    seed: int = 17,
    threshold: float = 0.5,
):
    """Dataset[(keys, embedding, label)] ->
    Dataset[(keys, data_valuation_score, is_data_valuation_issue)]."""

    planes_cache: dict[int, np.ndarray] = {}

    def bucketize(batch: pa.Table) -> pa.Table:
        col = batch[embedding_col].combine_chunks() if isinstance(
            batch[embedding_col], pa.ChunkedArray
        ) else batch[embedding_col]
        flat = np.asarray(col.values, dtype=np.float64)
        mat = flat.reshape(len(col), -1)
        dim = mat.shape[1]
        if dim not in planes_cache:
            planes_cache[dim] = np.random.default_rng(seed).standard_normal((num_planes, dim))
        signs = (mat @ planes_cache[dim].T) > 0
        bucket = signs.dot(1 << np.arange(num_planes)).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket, type=pa.int64()))

    def per_bucket_block(batch: pa.Table) -> pa.Table:
        """All bucket runs of one sorted block — a loop over the (few)
        buckets, each an O(n_b²) vectorized kernel; replaces the
        per-group pandas map_groups roundtrip."""
        key_arrays = {c: batch[c].to_numpy(zero_copy_only=False)
                      for c in key_cols}
        emb = batch[embedding_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = np.asarray(emb.values, dtype=np.float64)
        n_rows = batch.num_rows
        mat_all = flat.reshape(n_rows, -1) if n_rows else flat.reshape(0, 1)
        y_all = batch[label_col].to_numpy(zero_copy_only=False)
        bucket = batch["bucket"].to_numpy(zero_copy_only=False)
        out_keys = {c: [] for c in key_cols}
        out_score = []
        for b in np.unique(bucket):
            idx = np.flatnonzero(bucket == b)
            # stable order by key columns (the old pandas sort_values)
            order = np.lexsort(tuple(
                key_arrays[c][idx] for c in reversed(key_cols)))
            idx = idx[order]
            n = len(idx)
            kk = min(k, n - 1)
            if kk < 1:
                score = np.full(n, 0.5)
            else:
                mat = mat_all[idx]
                norms = np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
                sims = (mat / norms) @ (mat / norms).T
                np.fill_diagonal(sims, -np.inf)  # leave-self-out
                nbrs = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
                values = knn_shapley_score(nbrs, y_all[idx], kk)
                score = 0.5 * (1.0 + values)
            for c in key_cols:
                out_keys[c].append(key_arrays[c][idx])
            out_score.append(score)
        score = (np.concatenate(out_score) if out_score
                 else np.empty(0, dtype=np.float64))
        cols = {c: pa.array(np.concatenate(out_keys[c]) if out_keys[c]
                            else key_arrays[c][:0]) for c in key_cols}
        cols["data_valuation_score"] = pa.array(score)
        cols["is_data_valuation_issue"] = pa.array(score < threshold)
        return pa.table(cols)

    from cleanlab_ray.stages.dedup import _sorted_block_map

    return _sorted_block_map(
        ds.select_columns([*key_cols, embedding_col, label_col])
        .map_batches(bucketize, batch_format="pyarrow"),
        "bucket", per_bucket_block)
