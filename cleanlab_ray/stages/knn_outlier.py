"""Feature/kNN-distance outlier scores over an embedding column.

Reference semantics (/root/reference/cleanlab/outlier.py:306-478 +
internal/outlier.py:11-58, datalab/internal/issue_manager/outlier.py):
score = exp(-t * avg_knn_dist / scaling_factor) with
scaling_factor = max(median(avg_knn_dist), 100*eps) by default, plus the
precision correction that pins scores to 1.0 where the average distance
is below sqrt(100*eps) (euclidean).

Two execution modes:

- ``knn_outlier_scores`` (exact): the full (N, D) embedding matrix is
  broadcast once via ray.put and every batch brute-forces its rows
  against it — exactly reproducible by an O(N^2) SQL oracle. This is
  the moderate-N path (matrix must fit in the object store; fine up to
  a few million rows at typical dims).
- ``knn_outlier_scores_bucketed`` (scale path): random-hyperplane LSH
  buckets (num_tables independent tables, the same family as
  stages/dedup.embedding_near_dup); per-bucket exact kNN, per-row best
  (minimum) average distance across tables. Approximate — neighbors
  outside every shared bucket are missed, biasing distances up for
  isolated points (which is the signal anyway). No driver state beyond
  the (tiny) scaling factor.

The global median uses functions/quantiles.exact_median (histogram +
boundary-bin pull — no full materialization).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_EPS_SCALE = 100 * np.finfo(np.float64).eps
_EUCLIDEAN_TOL = float(np.sqrt(100 * np.finfo(np.float64).eps))
EPSILON = 1e-6  # reference internal/constants.py:15


def _embed_matrix(batch: pa.Table, embedding_col: str) -> np.ndarray:
    col = batch[embedding_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def _avg_knn_dist_exact(mat: np.ndarray, ids: np.ndarray, ref_mat: np.ndarray,
                        ref_ids: np.ndarray, k: int) -> np.ndarray:
    """Average euclidean distance to the k nearest OTHER reference rows,
    ties broken by ascending reference id (deterministic, matches the
    SQL oracle's ORDER BY dist, vec_id)."""
    # ||x-y||^2 = |x|^2 + |y|^2 - 2 x.y, clipped for fp safety
    d2 = (
        np.sum(mat * mat, axis=1)[:, None]
        + np.sum(ref_mat * ref_mat, axis=1)[None, :]
        - 2.0 * (mat @ ref_mat.T)
    )
    np.maximum(d2, 0.0, out=d2)
    d = np.sqrt(d2)
    # exclude self-matches by id
    self_mask = ids[:, None] == ref_ids[None, :]
    d[self_mask] = np.inf
    # k smallest with (dist, ref_id) tie order: argsort over structured keys
    order = np.lexsort((np.broadcast_to(ref_ids, d.shape), d), axis=-1)[:, :k]
    top = np.take_along_axis(d, order, axis=1)
    return top.mean(axis=1)


#: rows above which knn_outlier_scores auto-switches from the exact
#: broadcast path (reference-parity, driver materializes the full
#: embedding table) to the LSH-bucketed scale path — the same
#: auto-escalation pattern quality_filter uses for checkpoint mode.
EXACT_KNN_MAX_ROWS = 200_000


def knn_outlier_scores(
    ds,
    embedding_col: str = "embedding",
    key_cols: tuple[str, ...] = ("vec_id",),
    k: int = 10,
    t: float = 1.0,
    scaling_factor: float | None = None,
    exact_max_rows: int | None = EXACT_KNN_MAX_ROWS,
):
    """Exact kNN-distance outlier scores (broadcast brute force).

    Returns Dataset[key_cols + (avg_knn_distance, ood_score_knn)].
    Requires a single integer key column for self-exclusion and
    deterministic tie order.

    The exact path materializes the reference set on the driver — fine
    at reference-parity scales, O(N) driver memory at corpus scale.
    Above ``exact_max_rows`` (pass None to force exact) the call
    auto-delegates to :func:`knn_outlier_scores_bucketed`, whose
    embedding table never leaves the cluster."""
    import ray

    if len(key_cols) != 1:
        raise ValueError("exact knn_outlier_scores needs a single key column")
    key = key_cols[0]

    if exact_max_rows is not None and ds.count() > exact_max_rows:
        return knn_outlier_scores_bucketed(
            ds, embedding_col=embedding_col, key_cols=key_cols, k=k, t=t,
            scaling_factor=scaling_factor,
        )

    ref = ds.select_columns([key, embedding_col]).to_pandas()
    if len(ref) == 0:
        raise ValueError(
            "knn_outlier_scores: empty input — a kNN graph needs rows"
        )
    ref = ref.sort_values(key, kind="mergesort")
    ref_ids = ref[key].to_numpy().astype(np.int64)
    ref_mat = np.stack(ref[embedding_col].to_numpy()).astype(np.float64)
    ref_handle = ray.put((ref_ids, ref_mat))

    def dist_kernel(batch: pa.Table) -> pa.Table:
        r_ids, r_mat = ray.get(ref_handle)
        ids = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _embed_matrix(batch, embedding_col)
        avg = _avg_knn_dist_exact(mat, ids, r_mat, r_ids, k)
        return pa.table({key: batch[key], "avg_knn_distance": pa.array(avg)})

    dists = ds.map_batches(dist_kernel, batch_format="pyarrow").materialize()
    return _finalize_scores(dists, key, t, scaling_factor)


def _finalize_scores(dists, key: str, t: float, scaling_factor: float | None):
    from cleanlab_ray.functions.quantiles import exact_median

    if scaling_factor is None:
        med = exact_median(dists, "avg_knn_distance")
        scaling_factor = float(max(med, _EPS_SCALE))

    sf = max(float(scaling_factor), EPSILON)

    def score_kernel(batch: pa.Table) -> pa.Table:
        avg = batch["avg_knn_distance"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = np.exp(-t * avg / sf)
        score[avg < _EUCLIDEAN_TOL] = 1.0  # precision correction
        return batch.append_column("ood_score_knn", pa.array(score))

    return dists.map_batches(score_kernel, batch_format="pyarrow")


def knn_outlier_scores_bucketed(
    ds,
    embedding_col: str = "embedding",
    key_cols: tuple[str, ...] = ("vec_id",),
    k: int = 10,
    t: float = 1.0,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 23,
    scaling_factor: float | None = None,
    max_bucket: int = 4096,
):
    """Approximate kNN outlier scores: per-LSH-bucket exact kNN, best
    (minimum) avg distance per row across num_tables hash tables.

    Rows in buckets larger than ``max_bucket`` are subsampled to cap the
    in-bucket O(B^2) work (documented approximation). Rows that share a
    bucket with < 2 rows in every table keep avg = +inf -> score ~ 0
    (maximally outlying), matching the isolation signal."""
    from cleanlab_ray.stages.dedup import _encode_keys, _run_starts, _sorted_block_map

    table_salt = (np.arange(num_tables, dtype=np.uint64) + np.uint64(1)) * np.uint64(
        0x9E3779B97F4A7C15
    )
    planes_cache: dict = {}

    def make_planes(dim):
        rng = np.random.default_rng(seed)
        return rng.standard_normal((num_tables, num_planes, dim))

    def bucket_kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        mat = _embed_matrix(batch, embedding_col)
        dim = mat.shape[1]
        if dim not in planes_cache:
            planes_cache[dim] = make_planes(dim)
        planes = planes_cache[dim]
        bucket = np.empty((n, num_tables), dtype=np.uint64)
        for ti in range(num_tables):
            signs = (mat @ planes[ti].T) > 0
            bucket[:, ti] = signs.dot(1 << np.arange(num_planes)).astype(np.uint64)
        bucket ^= table_salt[None, :]
        keep = batch.select([*key_cols, embedding_col]).append_column(
            "_ekey", _encode_keys(batch, key_cols)
        )
        tiled = keep.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), num_tables)))
        return tiled.append_column("bucket", pa.array(bucket.reshape(-1).astype(np.int64)))

    banded = ds.map_batches(bucket_kernel, batch_format="pyarrow")

    def bucket_knn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out_base = batch.select([*key_cols, "_ekey"])
        if n == 0:
            return out_base.append_column("avg_knn_distance", pa.array([], type=pa.float64()))
        bucket = batch["bucket"].to_numpy(zero_copy_only=False)
        mat = _embed_matrix(batch, embedding_col)
        starts = _run_starts(bucket)
        bounds = np.append(starts, n)
        avg = np.full(n, np.inf)
        for gi in range(len(starts)):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            b = hi - lo
            if b < 2:
                continue
            sub = np.arange(lo, hi)
            if b > max_bucket:
                sub = lo + np.linspace(0, b - 1, max_bucket).astype(np.int64)
            m = mat[sub]
            d2 = (
                np.sum(m * m, axis=1)[:, None]
                + np.sum(m * m, axis=1)[None, :]
                - 2.0 * (m @ m.T)
            )
            np.maximum(d2, 0.0, out=d2)
            np.fill_diagonal(d2, np.inf)
            kk = min(k, len(sub) - 1)
            part = np.partition(np.sqrt(d2), kk - 1, axis=1)[:, :kk]
            avg[sub] = part.mean(axis=1)
        return out_base.append_column("avg_knn_distance", pa.array(avg))

    per_table = _sorted_block_map(banded, "bucket", bucket_knn)

    def best_per_row(batch: pa.Table) -> pa.Table:
        ekey = np.asarray(batch["_ekey"].to_pandas(), dtype=object)
        out = batch.select(list(key_cols))
        avg = batch["avg_knn_distance"].to_numpy(zero_copy_only=False).astype(np.float64)
        if len(ekey) == 0:
            return out.append_column("avg_knn_distance", pa.array([], type=pa.float64()))
        starts = _run_starts(ekey)
        sizes = np.diff(np.append(starts, len(ekey)))
        best = np.minimum.reduceat(np.nan_to_num(avg, nan=np.inf, posinf=np.inf), starts)
        out = out.take(pa.array(starts))
        return out.append_column("avg_knn_distance", pa.array(best))

    dists = _sorted_block_map(per_table, "_ekey", best_per_row).materialize()

    # median over finite rows only
    def finite_only(batch: pa.Table) -> pa.Table:
        a = batch["avg_knn_distance"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"avg_knn_distance": pa.array(a[np.isfinite(a)])})

    from cleanlab_ray.functions.quantiles import exact_median

    if scaling_factor is None:
        med = exact_median(dists.map_batches(finite_only, batch_format="pyarrow"),
                           "avg_knn_distance")
        scaling_factor = float(max(med, _EPS_SCALE))

    sf = max(float(scaling_factor), EPSILON)

    def score_kernel(batch: pa.Table) -> pa.Table:
        avg = batch["avg_knn_distance"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = np.exp(-t * np.where(np.isfinite(avg), avg, np.inf) / sf)
        score[avg < _EUCLIDEAN_TOL] = 1.0
        return batch.append_column("ood_score_knn", pa.array(score))

    return dists.map_batches(score_kernel, batch_format="pyarrow")


def knn_vote_pred_probs(
    ds,
    embedding_col: str = "embedding",
    label_col: str = "label",
    key_cols: tuple[str, ...] = ("vec_id",),
    num_classes: int | None = None,
    k: int = 10,
    num_planes: int = 4,
    num_tables: int = 2,
    seed: int = 23,
    max_bucket: int = 4096,
):
    """kNN-vote out-of-sample pred_probs from features + labels — the
    features-only Datalab fallback when no model pred_probs exist.

    Reference semantics
    (/root/reference/cleanlab/datalab/internal/issue_manager/label.py:147-159):
    sklearn fits k+1 neighbors INCLUDING self then algebraically removes
    the self vote, which equals a plain vote over the k nearest OTHER
    rows: pred_probs[i, c] = |{j in kNN(i) : y_j = c}| / k. The engine
    computes that vote per LSH bucket (same random-hyperplane family and
    partitioning assumption as knn_outlier_scores_bucketed); per row the
    vote of the BEST table — minimal in-bucket avg kNN distance, ties to
    the lowest table index — is kept, so the neighborhood used is the
    tightest one any table found. kk = min(k, bucket_size - 1) like the
    bucketed outlier op.

    Rows isolated in every table (no bucket with >= 2 rows) have no
    evidence against their given label: knn_prob_given = 1.0 and
    knn_pred = the given label (documented engine choice; the reference
    never sees this case because its kNN is global-exact).

    Returns Dataset[key_cols + (label, knn_prob_given, knn_pred)] where
    knn_prob_given is the self-confidence pred_probs[i, y_i] and
    knn_pred the argmax class (ties -> lowest class index).
    """
    from cleanlab_ray.stages.dedup import _encode_keys, _run_starts, _sorted_block_map

    table_salt = (np.arange(num_tables, dtype=np.uint64) + np.uint64(1)) * np.uint64(
        0x9E3779B97F4A7C15
    )
    planes_cache: dict = {}

    def make_planes(dim):
        rng = np.random.default_rng(seed)
        return rng.standard_normal((num_tables, num_planes, dim))

    def bucket_kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        mat = _embed_matrix(batch, embedding_col)
        dim = mat.shape[1]
        if dim not in planes_cache:
            planes_cache[dim] = make_planes(dim)
        planes = planes_cache[dim]
        bucket = np.empty((n, num_tables), dtype=np.uint64)
        for ti in range(num_tables):
            signs = (mat @ planes[ti].T) > 0
            bucket[:, ti] = signs.dot(1 << np.arange(num_planes)).astype(np.uint64)
        bucket ^= table_salt[None, :]
        keep = batch.select([*key_cols, label_col, embedding_col]).append_column(
            "_ekey", _encode_keys(batch, key_cols)
        )
        tiled = keep.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), num_tables)))
        tiled = tiled.append_column(
            "_t", pa.array(np.tile(np.arange(num_tables, dtype=np.int64), n))
        )
        return tiled.append_column("bucket", pa.array(bucket.reshape(-1).astype(np.int64)))

    banded = ds.map_batches(bucket_kernel, batch_format="pyarrow")

    def bucket_vote(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out_base = batch.select([*key_cols, label_col, "_ekey", "_t"])
        if n == 0:
            return out_base.append_column(
                "avg_knn_distance", pa.array([], type=pa.float64())
            ).append_column("_match", pa.array([], type=pa.int64())).append_column(
                "_pred", pa.array([], type=pa.int64())
            ).append_column("_kk", pa.array([], type=pa.int64()))
        bucket = batch["bucket"].to_numpy(zero_copy_only=False)
        labels = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[key_cols[0]].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _embed_matrix(batch, embedding_col)
        nclasses = int(num_classes) if num_classes else int(labels.max()) + 1
        starts = _run_starts(bucket)
        bounds = np.append(starts, n)
        avg = np.full(n, np.inf)
        match = np.zeros(n, dtype=np.int64)
        pred = labels.copy()
        kks = np.zeros(n, dtype=np.int64)
        for gi in range(len(starts)):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            b = hi - lo
            if b < 2:
                continue
            sub = np.arange(lo, hi)
            if b > max_bucket:
                # deterministic cap: evenly spaced rows of the id-sorted bucket
                by_id = sub[np.argsort(ids[sub], kind="stable")]
                sub = np.sort(by_id[np.linspace(0, b - 1, max_bucket).astype(np.int64)])
            m = mat[sub]
            sid = ids[sub]
            slab = labels[sub]
            d2 = (
                np.sum(m * m, axis=1)[:, None]
                + np.sum(m * m, axis=1)[None, :]
                - 2.0 * (m @ m.T)
            )
            np.maximum(d2, 0.0, out=d2)
            d = np.sqrt(d2)
            self_mask = sid[:, None] == sid[None, :]
            d[self_mask] = np.inf
            kk = min(k, len(sub) - 1)
            # deterministic (dist, id) tie order — matches the SQL oracle
            order = np.lexsort((np.broadcast_to(sid, d.shape), d), axis=-1)[:, :kk]
            nd = np.take_along_axis(d, order, axis=1)
            nlab = slab[order]  # (B, kk) neighbor labels
            votes = np.zeros((len(sub), nclasses), dtype=np.int64)
            rows = np.repeat(np.arange(len(sub)), kk)
            np.add.at(votes, (rows, nlab.ravel()), 1)
            avg[sub] = nd.mean(axis=1)
            match[sub] = votes[np.arange(len(sub)), slab]
            pred[sub] = votes.argmax(axis=1)  # ties -> lowest class index
            kks[sub] = kk
        return (
            out_base.append_column("avg_knn_distance", pa.array(avg))
            .append_column("_match", pa.array(match))
            .append_column("_pred", pa.array(pred))
            .append_column("_kk", pa.array(kks))
        )

    per_table = _sorted_block_map(banded, "bucket", bucket_vote)

    def best_per_row(batch: pa.Table) -> pa.Table:
        out = batch.select([*key_cols, label_col])
        n = batch.num_rows
        if n == 0:
            return out.append_column(
                "knn_prob_given", pa.array([], type=pa.float64())
            ).append_column("knn_pred", pa.array([], type=pa.int64()))
        ekey = np.asarray(batch["_ekey"].to_pandas(), dtype=object)
        avg = batch["avg_knn_distance"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = batch["_t"].to_numpy(zero_copy_only=False)
        match = batch["_match"].to_numpy(zero_copy_only=False).astype(np.float64)
        pred = batch["_pred"].to_numpy(zero_copy_only=False).astype(np.int64)
        kk = batch["_kk"].to_numpy(zero_copy_only=False).astype(np.float64)
        # blocks arrive sorted by _ekey; order rows (avg, t) within runs
        order = np.lexsort((t, np.nan_to_num(avg, nan=np.inf, posinf=np.inf), ekey))
        starts = _run_starts(ekey[order])
        pick = order[starts]
        prob = np.where(kk[pick] > 0, match[pick] / np.maximum(kk[pick], 1.0), 1.0)
        labels = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        best_pred = np.where(kk[pick] > 0, pred[pick], labels[pick])
        out = out.take(pa.array(pick))
        return out.append_column("knn_prob_given", pa.array(prob)).append_column(
            "knn_pred", pa.array(best_pred)
        )

    return _sorted_block_map(per_table, "_ekey", best_per_row)
