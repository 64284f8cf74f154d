"""Non-IID detection: the reference's kNN permutation test, distributed.

Reference semantics (/root/reference/cleanlab/datalab/internal/
issue_manager/noniid.py:60-446):
- build a kNN graph over features; for each row i compute the
  INDEX-ORDER distances |i - j| to its k neighbors;
- KS statistic: max |foreground CDF - background CDF| where the
  foreground is the empirical CDF of all N*k neighbor index distances
  and the background is the analytic all-pairs distance CDF
  P(d) = (N-d) / (N(N-1)/2);
- p-value: permutation test — permute the index order, recompute the KS
  statistic per permutation, then integrate a Gaussian KDE of the
  permuted statistics above the observed one (scipy's gaussian_kde with
  Scott bandwidth, re-implemented here with math.erf — no scipy in the
  environment);
- per-row score: absolute AUC difference between each row's foreground
  CDF and its analytic background CDF, normalized and tanh-mapped to
  [0, 1] (noniid.py:301-415); the minimum-score row is flagged when the
  p-value is significant.

Ray shape: the kNN graph comes from the exact broadcast kNN
(stages/knn_outlier machinery, neighbor INDICES kept); the foreground
histogram over index distances and every permutation's histogram are ONE
flat mergeable AggregateFn over the neighbor-index dataset (permutations
are broadcast once via closure); per-row scores are a pure per-batch
kernel. Only O(num_permutations * N_bins) state reaches the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


#: Hard cap on the exact (global-broadcast) path. The permutation test
#: is inherently global-order, so the exact path materializes the full
#: (N, D) embedding matrix on the driver and broadcasts it; past this
#: row count use :func:`noniid_issues_windowed` (per-window test, no
#: broadcast) instead.
MAX_EXACT_ROWS = 2_000_000


def knn_index_graph(ds, embedding_col: str = "embedding", key_col: str = "vec_id",
                    k: int = 10, max_rows: int = MAX_EXACT_ROWS,
                    n_total: int | None = None):
    """Dataset[(key, neighbor indices fixed_size_list<int64>[k])] — exact
    broadcast kNN with (distance, id) tie order. Row 'index' = the rank
    of its key in ascending key order (collection order). ``k`` is
    clamped to n-1 (the reference's features_to_knn does the same), so
    tiny inputs work; returns (graph, n, k_effective).

    Raises ValueError past ``max_rows`` — this path broadcasts the full
    embedding matrix (documented exact-only design); the scale path is
    noniid_issues_windowed. Pass ``n_total`` when the caller already
    counted (avoids re-executing the upstream lineage)."""
    import ray

    if n_total is None:
        n_total = ds.count()
    if n_total < 2:
        raise ValueError(
            f"knn_index_graph needs >= 2 rows, got {n_total}")
    if n_total > max_rows:
        raise ValueError(
            f"knn_index_graph exact path materializes the full embedding "
            f"matrix; {n_total} rows > max_rows={max_rows}. Use "
            f"noniid_issues_windowed for the windowed scale path."
        )
    ref = ds.select_columns([key_col, embedding_col]).to_pandas()
    ref = ref.sort_values(key_col, kind="mergesort")
    ref_ids = ref[key_col].to_numpy().astype(np.int64)
    ref_mat = np.stack(ref[embedding_col].to_numpy()).astype(np.float64)
    handle = ray.put((ref_ids, ref_mat))
    n = len(ref_ids)
    k = min(k, n - 1)  # self is masked, so at most n-1 neighbors exist

    def kernel(batch: pa.Table) -> pa.Table:
        r_ids, r_mat = ray.get(handle)
        ids = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch[embedding_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(
            batch.num_rows, -1
        )
        d2 = (
            np.sum(mat * mat, axis=1)[:, None]
            + np.sum(r_mat * r_mat, axis=1)[None, :]
            - 2.0 * (mat @ r_mat.T)
        )
        np.maximum(d2, 0.0, out=d2)
        d = np.sqrt(d2)
        d[ids[:, None] == r_ids[None, :]] = np.inf
        order = np.lexsort((np.broadcast_to(r_ids, d.shape), d), axis=-1)[:, :k]
        # neighbor INDEX = position in sorted key order == order columns
        own_idx = np.searchsorted(r_ids, ids)
        return pa.table(
            {
                key_col: batch[key_col],
                "row_index": pa.array(own_idx.astype(np.int64)),
                "neighbor_indices": pa.FixedSizeListArray.from_arrays(
                    pa.array(order.reshape(-1).astype(np.int64)), k
                ),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow"), n, k


def _background_cdf(n: int) -> np.ndarray:
    """Analytic all-pairs index-distance CDF over distances 1..N-1."""
    dist_probs = (n - np.arange(1, n)) / (n * (n - 1) / 2)
    return np.cumsum(dist_probs)


def _ks_from_hist(hist: np.ndarray, n: int) -> float:
    """KS statistic from a histogram of index distances (1..N-1): the
    sorted sample array the reference's _get_statistics operates on is
    reconstructed exactly via np.repeat, then the reference formula
    (noniid.py:426-446 incl. the N-1 sentinel sample) applies verbatim.
    The histogram is lossless here because index distances are integers."""
    counts = hist.astype(np.int64)
    if counts.sum() == 0:
        return 0.0
    samples = np.repeat(np.arange(1, n), counts)
    sorted_neighbors = np.hstack([samples, [n - 1]]).astype(np.int64)
    bg_cdf = _background_cdf(n)
    fg_cdf = np.arange(sorted_neighbors.shape[0]) / (sorted_neighbors.shape[0] - 1)
    return float(np.max(np.abs(fg_cdf - bg_cdf[sorted_neighbors - 1])))


def _kde_tail_pvalue(samples: np.ndarray, observed: float) -> float:
    """scipy.stats.gaussian_kde(...).integrate_box(observed, 100) for 1D
    samples with Scott bandwidth, via the normal CDF in closed form."""
    m = len(samples)
    std = float(np.std(samples, ddof=1))
    h = max(std * m ** (-1.0 / 5.0), 1e-12)

    def phi(z):
        return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))

    hi = 100.0
    return float(
        np.mean([phi((hi - x) / h) - phi((observed - x) / h) for x in samples])
    )


def _index_distance_hist_aggfn(n: int, perms: np.ndarray | None, k: int):
    """Flat aggregate: [observed hist (n-1) | perm hists (P, n-1)] of
    neighbor index distances. The (P, n) permutation matrix is shipped
    via ray.put (400 MB at the 2M-row cap with P=25 — far too large for
    a task-spec closure), fetched zero-copy per accumulate call."""
    import ray
    from ray.data.aggregate import AggregateFn

    p = 0 if perms is None else len(perms)
    size = (p + 1) * (n - 1)
    perms_ref = None if perms is None else ray.put(
        np.asarray(perms, dtype=np.int64))

    def accumulate_block(acc, block):
        a = np.asarray(acc, dtype=np.float64).copy()
        col = block["neighbor_indices"]
        if not isinstance(col, (pa.ChunkedArray, pa.Array)):
            nbrs = np.stack(np.asarray(col)).astype(np.int64)
            own = np.asarray(block["row_index"], dtype=np.int64)
        else:
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            nbrs = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64).reshape(
                len(col), -1
            )
            own = np.asarray(block["row_index"], dtype=np.int64)
        dist = np.abs(own[:, None] - nbrs).reshape(-1)
        a[: n - 1] += np.bincount(dist, minlength=n)[1:n]
        if perms_ref is not None:
            perms = ray.get(perms_ref)
            for pi in range(p):
                perm = perms[pi]
                pd_ = np.abs(perm[own][:, None] - perm[nbrs]).reshape(-1)
                a[(pi + 1) * (n - 1) : (pi + 2) * (n - 1)] += np.bincount(
                    pd_, minlength=n
                )[1:n]
        return a

    return AggregateFn(
        init=lambda _: np.zeros(size, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64),
        name="index_dist_hists",
    )


def noniid_scores_kernel(n: int):
    """Per-row AUC-difference score (noniid.py:301-415), whole-batch
    vectorized; returns a map_batches kernel appending noniid_score."""

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch["neighbor_indices"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        nbrs = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64).reshape(
            batch.num_rows, -1
        )
        own = batch["row_index"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = len(own)
        sorted_neighbors = np.sort(np.abs(own[:, None] - nbrs), axis=1)
        middle_idx = int(np.floor((n - 1) / 2))
        dd = own.copy().reshape(b, 1)
        dd[dd > middle_idx] -= n - 1
        dd = np.abs(dd)
        sn = np.hstack([sorted_neighbors, np.full((b, 1), n - 1)]).astype(np.int64)
        set_beg = sn <= dd
        set_mid = (sn > dd) & (sn <= (n - dd - 1))
        set_end = sn > (n - dd - 1)
        shifted = np.zeros(sn.shape)
        shifted[:, 1:] = sn[:, :-1]
        diffs = sn - shifted
        area_beg = (dd ** 2) / (n - 1)
        length = n - 2 * dd - 1
        a_slope = 2 * dd / (n - 1)
        area_mid = 0.5 * (a_slope + 1) * length
        bg_area = np.zeros(diffs.shape)
        bg_area[set_beg] = ((sn ** 2) / (n - 1))[set_beg]
        bg_area[set_mid] = (
            area_beg + 0.5 * ((sn + 3 * dd) * (sn - dd) / (n - 1))
        )[set_mid]
        bg_area[set_end] = (area_beg + area_mid + (sn - (n - dd - 1) * 1.0))[set_end]
        shifted_bg = np.zeros(bg_area.shape)
        shifted_bg[:, 1:] = bg_area[:, :-1]
        bg_diffs = bg_area - shifted_bg
        fg_cdf = np.arange(sn.shape[1]) / (sn.shape[1] - 1)
        fg_diffs = fg_cdf.reshape(1, -1) * diffs
        stats = np.abs(fg_diffs - bg_diffs).sum(axis=1)
        normalizer = np.maximum(own, n - own)
        scores = np.tanh(-1 * (stats / normalizer)) + 1
        return batch.append_column("noniid_score", pa.array(scores))

    return kernel


def noniid_issues(
    ds,
    embedding_col: str = "embedding",
    key_col: str = "vec_id",
    k: int = 10,
    num_permutations: int = 25,
    significance_threshold: float = 0.05,
    seed: int = 0,
):
    """Full NonIID manager: returns (scores Dataset[key, row_index,
    noniid_score, is_noniid_issue], info dict with p-value/KS).

    The observed KS statistic and all permutation statistics come from
    ONE aggregate pass; the permutations are generated on the driver
    (np.random.seed(seed), matching noniid.py:270-276) and shipped in
    the aggregate's closure.

    Above MAX_EXACT_ROWS the exact path's driver-side embedding
    materialization is unsafe, so the call auto-delegates to
    :func:`noniid_issues_windowed` (window count sized so one window
    stays under the exact limit) — same auto-escalation pattern as
    quality_filter's checkpoint mode."""
    n_total = ds.count()
    if n_total > MAX_EXACT_ROWS:
        num_windows = int(-(-n_total // MAX_EXACT_ROWS))  # ceil
        out = noniid_issues_windowed(
            ds, embedding_col=embedding_col, key_col=key_col,
            num_windows=num_windows, k=k,
            num_permutations=num_permutations,
            significance_threshold=significance_threshold, seed=seed,
        )
        info = {"mode": "windowed", "num_windows": num_windows,
                "n": int(n_total), "p_value": None, "ks": None}
        return out, info
    graph, n, k = knn_index_graph(ds, embedding_col, key_col, k,
                                  n_total=n_total)
    graph = graph.materialize()

    np.random.seed(seed)
    perms = np.stack([np.random.permutation(n) for _ in range(num_permutations)])

    hists = np.asarray(
        graph.aggregate(_index_distance_hist_aggfn(n, perms, k))["index_dist_hists"],
        dtype=np.float64,
    ).reshape(num_permutations + 1, n - 1)
    observed_ks = _ks_from_hist(hists[0], n)
    perm_ks = np.array([_ks_from_hist(h, n) for h in hists[1:]])
    p_value = _kde_tail_pvalue(perm_ks, observed_ks)

    scored = graph.map_batches(noniid_scores_kernel(n), batch_format="pyarrow")
    flag = bool(p_value < significance_threshold)

    if flag:
        # flag the SINGLE minimum-score row (noniid.py:198-200 uses
        # argmin, i.e. the smallest dataset index among exact ties) —
        # exact distributed min, then min row_index within the tie set
        from ray.data.aggregate import Min

        min_score = float(scored.aggregate(Min("noniid_score"))["min(noniid_score)"])

        def only_min(batch: pa.Table) -> pa.Table:
            s = batch["noniid_score"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(s == min_score))

        min_row = int(
            scored.map_batches(only_min, batch_format="pyarrow")
            .aggregate(Min("row_index"))["min(row_index)"]
        )
    else:
        min_score, min_row = None, None

    def flag_kernel(batch: pa.Table) -> pa.Table:
        s = batch["noniid_score"].to_numpy(zero_copy_only=False)
        mask = np.zeros(len(s), dtype=bool)
        if flag and min_score is not None:
            rows = batch["row_index"].to_numpy(zero_copy_only=False)
            mask = (s == min_score) & (rows == min_row)
        return batch.append_column("is_noniid_issue", pa.array(mask))

    out = scored.map_batches(flag_kernel, batch_format="pyarrow")
    info = {"p_value": float(p_value), "ks": float(observed_ks),
            "num_permutations": num_permutations, "k": k, "n": n}
    return out, info


def noniid_issues_windowed(
    ds,
    embedding_col: str = "embedding",
    key_col: str = "vec_id",
    order_col: str | None = None,
    num_windows: int = 8,
    k: int = 10,
    num_permutations: int = 25,
    significance_threshold: float = 0.05,
    seed: int = 0,
    boundaries: np.ndarray | None = None,
):
    """Windowed non-IID scale path: the SAME kNN permutation test run
    independently inside contiguous windows of the global order — no
    global embedding broadcast, no driver materialization.

    The order column's span is cut into ``num_windows`` value ranges
    (one min/max aggregate, or pass ``boundaries``); rows are exchanged
    once on the window id (sort — the map_groups co-location guarantee)
    and each window runs the full exact test in its block: in-window
    kNN graph (chunked brute force, (dist, key) tie order), in-window
    index order by (order_col, key), observed + permutation histograms,
    KS -> KDE-tail p-value, per-row AUC scores, min-score row flagged
    when that window's p-value is significant.

    With one window covering everything and order_col == key_col the
    output matches :func:`noniid_issues` exactly (tested). Partitioning
    assumption: one window's rows fit a block — size num_windows from
    N / target block rows. Window independence is the documented
    approximation: drift WITHIN a window is detected, drift only visible
    across window boundaries shows up in the per-window score levels
    rather than a single global p-value.

    Returns Dataset[key, window_id, row_index, noniid_score, p_value,
    is_noniid_issue].
    """
    order_col = order_col or key_col

    if boundaries is None:
        from ray.data.aggregate import Max, Min

        def to_f64(batch: pa.Table) -> pa.Table:
            v = batch[order_col].to_numpy(zero_copy_only=False)
            if np.issubdtype(v.dtype, np.datetime64):
                v = v.view(np.int64)
            return pa.table({"_o": pa.array(v.astype(np.float64))})

        stats = ds.select_columns([order_col]).map_batches(
            to_f64, batch_format="pyarrow"
        ).aggregate(Min("_o"), Max("_o"))
        boundaries = np.linspace(stats["min(_o)"], stats["max(_o)"],
                                 num_windows + 1)[1:-1]
    boundaries = np.asarray(boundaries, dtype=np.float64)

    def assign_window(batch: pa.Table) -> pa.Table:
        v = batch[order_col].to_numpy(zero_copy_only=False)
        if np.issubdtype(v.dtype, np.datetime64):
            v = v.view(np.int64)
        w = np.searchsorted(boundaries, v.astype(np.float64), side="right")
        keep = list(dict.fromkeys([key_col, order_col, embedding_col]))
        return batch.select(keep).append_column(
            "window_id", pa.array(w.astype(np.int64))
        )

    windowed = ds.map_batches(assign_window, batch_format="pyarrow")

    def per_window(batch: pa.Table) -> pa.Table:
        from cleanlab_ray.stages.dedup import _run_starts

        nrows = batch.num_rows
        empty = pa.table({
            key_col: pa.array([], batch[key_col].type),
            "window_id": pa.array([], pa.int64()),
            "row_index": pa.array([], pa.int64()),
            "noniid_score": pa.array([], pa.float64()),
            "p_value": pa.array([], pa.float64()),
            "is_noniid_issue": pa.array([], pa.bool_()),
        })
        if nrows == 0:
            return empty
        win = batch["window_id"].to_numpy(zero_copy_only=False)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        ov = batch[order_col].to_numpy(zero_copy_only=False)
        if np.issubdtype(ov.dtype, np.datetime64):
            ov = ov.view(np.int64)
        col = batch[embedding_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(
            nrows, -1
        )
        starts = _run_starts(win)
        bounds = np.append(starts, nrows)
        outs = []
        for gi in range(len(starts)):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            rows = np.arange(lo, hi)
            # in-window index order: (order value, key) ascending
            rows = rows[np.lexsort((keys[lo:hi], ov[lo:hi]))]
            n = len(rows)
            if n < k + 2:
                outs.append({
                    "keys": keys[rows], "win": win[rows],
                    "idx": np.arange(n), "score": np.ones(n),
                    "p": np.ones(n), "flag": np.zeros(n, dtype=bool),
                })
                continue
            m = mat[rows]
            wkeys = keys[rows]
            sq = np.sum(m * m, axis=1)
            nbrs = np.empty((n, k), dtype=np.int64)
            for c0 in range(0, n, 1024):  # chunked: O(n^2) flops, O(chunk*n) memory
                c1 = min(c0 + 1024, n)
                d2 = sq[c0:c1, None] + sq[None, :] - 2.0 * (m[c0:c1] @ m.T)
                np.maximum(d2, 0.0, out=d2)
                d = np.sqrt(d2)
                d[np.arange(c0, c1) - c0, np.arange(c0, c1)] = np.inf
                nbrs[c0:c1] = np.lexsort(
                    (np.broadcast_to(wkeys, d.shape), d), axis=-1
                )[:, :k]
            own = np.arange(n, dtype=np.int64)
            hist = np.bincount(np.abs(own[:, None] - nbrs).reshape(-1),
                               minlength=n)[1:n]
            observed_ks = _ks_from_hist(hist, n)
            np.random.seed(seed)
            perm_ks = np.empty(num_permutations)
            for pi in range(num_permutations):
                perm = np.random.permutation(n)
                ph = np.bincount(np.abs(perm[own][:, None] - perm[nbrs]).reshape(-1),
                                 minlength=n)[1:n]
                perm_ks[pi] = _ks_from_hist(ph, n)
            p_value = _kde_tail_pvalue(perm_ks, observed_ks)
            tb = pa.table({
                "row_index": pa.array(own),
                "neighbor_indices": pa.FixedSizeListArray.from_arrays(
                    pa.array(nbrs.reshape(-1)), k
                ),
            })
            scores = noniid_scores_kernel(n)(tb)["noniid_score"].to_numpy(
                zero_copy_only=False
            )
            flagged = np.zeros(n, dtype=bool)
            if p_value < significance_threshold:
                flagged[np.argmin(scores)] = True
            outs.append({
                "keys": keys[rows], "win": win[rows], "idx": own,
                "score": scores, "p": np.full(n, p_value), "flag": flagged,
            })
        return pa.table({
            key_col: pa.array(np.concatenate([o["keys"] for o in outs])),
            "window_id": pa.array(
                np.concatenate([o["win"] for o in outs]).astype(np.int64)
            ),
            "row_index": pa.array(
                np.concatenate([o["idx"] for o in outs]).astype(np.int64)
            ),
            "noniid_score": pa.array(np.concatenate([o["score"] for o in outs])),
            "p_value": pa.array(np.concatenate([o["p"] for o in outs])),
            "is_noniid_issue": pa.array(np.concatenate([o["flag"] for o in outs])),
        })

    # the shared sorted-block helper (one sort exchange + per-block
    # kernel) also asserts block-internal sortedness, so a run-colocation
    # violation fails loudly instead of testing window fragments
    from cleanlab_ray.stages.dedup import _sorted_block_map

    return _sorted_block_map(windowed, "window_id", per_window)
