"""Regression CleanLearning: noisy-Y detection for regression tasks.

Reference semantics (/root/reference/cleanlab/regression/learn.py:81-871
+ regression/rank.py:90-120), re-expressed Ray-Data-first:

- the model is a from-scratch ridge regression fit by DISTRIBUTED normal
  equations: one AggregateFn pass accumulates per-CV-fold (X'X, X'y)
  moments (a single flat float64 accumulator), and the leave-fold-out
  model for fold f is solved from (total - fold_f) — exact K-fold
  cross-validation from ONE pass over the data, no sampling, no driver
  materialization;
- out-of-fold predictions, residuals and scores are map_batches passes;
- epistemic uncertainty = std over the K leave-fold-out models'
  predictions per row (the scalable analogue of learn.py:537-580's
  bootstrap ensemble); aleatoric uncertainty = a second ridge fit
  predicting |residual| from features (learn.py:581-607);
- label_quality = exp(-|residual/(u + TINY)| / median(adjusted)) with
  the exact distributed median (functions/quantiles.exact_median),
  learn.py:476-487;
- the flagged fraction k is chosen by the reference's coarse+fine
  search (learn.py:728-836): refit on the best (1-k) fraction by
  initial |residual| and keep the k with the best out-of-fold R^2 —
  each candidate k costs one compact aggregate pass, with the |residual|
  rank threshold resolved exactly via exact_values_at_ranks;
- final flags = bottom ceil(N*k) by (label_quality, keys), resolved
  with the same histogram + boundary-pull order statistic as the
  classification pipeline (stages/decision.py).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

TINY_VALUE = 1e-9  # reference internal/constants.py


def _features_matrix(block, feature_col: str) -> np.ndarray:
    """(n, D) float64 from an arrow table OR pandas block (aggregate
    accumulators can receive either)."""
    col = block[feature_col]
    if isinstance(col, (pa.ChunkedArray, pa.Array)):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(col), -1)
    return np.stack(np.asarray(col)).astype(np.float64)


def _design(mat: np.ndarray) -> np.ndarray:
    return np.concatenate([mat, np.ones((len(mat), 1))], axis=1)


def _fold_of(ids: np.ndarray, n_folds: int) -> np.ndarray:
    """Deterministic hash-fold assignment (same family as
    functions/aggregators.stratified_hash_folds)."""
    h = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
    return (h % np.uint64(n_folds)).astype(np.int64)


def _moments_aggfn(feature_col: str, target_col: str, key_col: str, n_folds: int,
                   dim: int, keep_mask_fn=None):
    """AggregateFn: per-fold ridge moments, one flat accumulator of
    shape n_folds * (D+1)*(D+2) laid out as [XtX (D+1)^2, Xty (D+1)]
    per fold (flat float64 — see round-1 gotcha on AggregateFn)."""
    from ray.data.aggregate import AggregateFn

    d1 = dim + 1
    per_fold = d1 * d1 + d1
    size = n_folds * per_fold

    def accumulate_block(acc, block: pa.Table):
        a = np.asarray(acc, dtype=np.float64).copy()
        X = _design(_features_matrix(block, feature_col))
        y = np.asarray(block[target_col], dtype=np.float64)
        ids = np.asarray(block[key_col], dtype=np.int64)
        folds = _fold_of(ids, n_folds)
        if keep_mask_fn is not None:
            m = keep_mask_fn(block)
            X, y, folds = X[m], y[m], folds[m]
        for f in np.unique(folds):
            sel = folds == f
            Xf, yf = X[sel], y[sel]
            base = int(f) * per_fold
            a[base : base + d1 * d1] += (Xf.T @ Xf).ravel()
            a[base + d1 * d1 : base + per_fold] += Xf.T @ yf
        return a

    return AggregateFn(
        init=lambda _: np.zeros(size, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda x, y: np.asarray(x, dtype=np.float64) + np.asarray(y, dtype=np.float64),
        name="ridge_moments",
    )


def _solve_fold_models(moments: np.ndarray, n_folds: int, dim: int, l2: float):
    """Leave-fold-out ridge weights per fold from the per-fold moments."""
    d1 = dim + 1
    per_fold = d1 * d1 + d1
    xtx = np.zeros((n_folds, d1, d1))
    xty = np.zeros((n_folds, d1))
    for f in range(n_folds):
        base = f * per_fold
        xtx[f] = moments[base : base + d1 * d1].reshape(d1, d1)
        xty[f] = moments[base + d1 * d1 : base + per_fold]
    tot_xtx, tot_xty = xtx.sum(axis=0), xty.sum(axis=0)
    reg = l2 * np.eye(d1)
    reg[-1, -1] = 0.0  # don't penalize the bias
    weights = np.zeros((n_folds, d1))
    for f in range(n_folds):
        weights[f] = np.linalg.solve(tot_xtx - xtx[f] + reg, tot_xty - xty[f])
    return weights


def _r2_aggfn(pred_col: str, target_col: str):
    """AggregateFn for SS_res / (n, sum y, sum y^2) -> R^2."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(acc, block: pa.Table):
        a = np.asarray(acc, dtype=np.float64).copy()
        y = np.asarray(block[target_col], dtype=np.float64)
        p = np.asarray(block[pred_col], dtype=np.float64)
        a[0] += float(((y - p) ** 2).sum())
        a[1] += len(y)
        a[2] += float(y.sum())
        a[3] += float((y * y).sum())
        return a

    return AggregateFn(
        init=lambda _: np.zeros(4, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda x, y: np.asarray(x, dtype=np.float64) + np.asarray(y, dtype=np.float64),
        name="r2_stats",
    )


def _r2_from(stats: np.ndarray) -> float:
    ss_res, n, sy, syy = stats
    ss_tot = syy - sy * sy / max(n, 1.0)
    return 1.0 - ss_res / max(ss_tot, TINY_VALUE)


class RegressionCleanLearning:
    """Distributed analogue of cleanlab.regression.learn.CleanLearning
    (ridge model, int key column for fold hashing)."""

    def __init__(self, n_folds: int = 5, l2: float = 1e-6,
                 coarse_search_range=(0.01, 0.05, 0.1, 0.15, 0.2),
                 fine_search_size: int = 3,
                 include_aleatoric_uncertainty: bool = True):
        self.n_folds = n_folds
        self.l2 = l2
        self.coarse_search_range = list(coarse_search_range)
        self.fine_search_size = fine_search_size
        self.include_aleatoric_uncertainty = include_aleatoric_uncertainty
        self.k: float | None = None

    # -- internals ---------------------------------------------------------

    def _oof_predictions(self, ds, feature_col, target_col, key_col, dim,
                         keep_mask_fn=None):
        moments = ds.aggregate(
            _moments_aggfn(feature_col, target_col, key_col, self.n_folds, dim,
                           keep_mask_fn)
        )["ridge_moments"]
        weights = _solve_fold_models(np.asarray(moments, dtype=np.float64),
                                     self.n_folds, dim, self.l2)
        n_folds = self.n_folds

        def predict_kernel(batch: pa.Table) -> pa.Table:
            drop = [c for c in ("predicted_label", "_epistemic") if c in batch.column_names]
            if drop:
                batch = batch.drop_columns(drop)
            X = _design(_features_matrix(batch, feature_col))
            ids = np.asarray(batch[key_col], dtype=np.int64)
            folds = _fold_of(ids, n_folds)
            all_preds = X @ weights.T          # (B, K): every leave-fold-out model
            oof = all_preds[np.arange(len(ids)), folds]
            epi = all_preds.std(axis=1)
            batch = batch.append_column("predicted_label", pa.array(oof))
            return batch.append_column("_epistemic", pa.array(epi))

        return ds.map_batches(predict_kernel, batch_format="pyarrow"), weights

    def _cv_r2(self, ds, feature_col, target_col, key_col, dim, keep_mask_fn):
        scored, _ = self._oof_predictions(ds, feature_col, target_col, key_col,
                                          dim, keep_mask_fn)
        stats = scored.aggregate(_r2_aggfn("predicted_label", target_col))["r2_stats"]
        return _r2_from(np.asarray(stats, dtype=np.float64))

    def _residual_threshold(self, scored_ds, n: int, k: float):
        """|initial residual| value at rank ceil(n*(1-k)) — rows below it
        are the 'clean' (1-k) fraction used for the refit."""
        from cleanlab_ray.functions.quantiles import exact_values_at_ranks

        keep_n = n - math.ceil(n * k)
        if keep_n >= n:
            return np.inf
        r = max(keep_n - 1, 0)
        vals = exact_values_at_ranks(scored_ds, "_abs_residual", [r])
        return vals[r]

    # -- public API --------------------------------------------------------

    def find_label_issues(self, ds, feature_col: str = "embedding",
                          target_col: str = "y", key_col: str = "vec_id"):
        """Returns Dataset[key_col, given_label, predicted_label,
        label_quality, is_label_issue] (learn.py:362-517)."""
        schema = ds.schema()
        if schema is None:
            raise ValueError(
                "regression find_label_issues: empty input — cannot fit "
                "on zero rows"
            )
        dim = None
        for name, typ in zip(schema.names, schema.types):
            if name == feature_col and isinstance(typ, pa.DataType):
                if pa.types.is_fixed_size_list(typ):
                    dim = typ.list_size
        if dim is None:
            dim = len(ds.take(1)[0][feature_col])

        # 1. initial CV predictions + residuals
        initial, _ = self._oof_predictions(ds, feature_col, target_col, key_col, dim)

        def add_abs_residual(batch: pa.Table) -> pa.Table:
            y = np.asarray(batch[target_col], dtype=np.float64)
            p = np.asarray(batch["predicted_label"], dtype=np.float64)
            return batch.append_column("_abs_residual", pa.array(np.abs(p - y)))

        initial = initial.map_batches(add_abs_residual, batch_format="pyarrow").materialize()
        n = initial.count()
        initial_stats = initial.aggregate(_r2_aggfn("predicted_label", target_col))
        initial_r2 = _r2_from(np.asarray(initial_stats["r2_stats"], dtype=np.float64))

        # 2. coarse + fine search for k (learn.py:728-836)
        def r2_for_k(k: float) -> float:
            thr = self._residual_threshold(initial, n, k)

            def keep_mask(block: pa.Table) -> np.ndarray:
                return np.asarray(block["_abs_residual"], dtype=np.float64) <= thr

            return self._cv_r2(initial, feature_col, target_col, key_col, dim, keep_mask)

        sorted_ks = sorted(self.coarse_search_range)
        r2_coarse = np.array([r2_for_k(k) for k in sorted_ks])
        i = int(np.argmax(r2_coarse))
        best_k, best_r2 = sorted_ks[i], float(r2_coarse[i])
        # fine search stays between the neighboring coarse points
        # (learn.py:783-812 — never beyond the coarse range)
        fine: list[float] = []
        if i > 0:
            fine += list(np.linspace(sorted_ks[i - 1], sorted_ks[i],
                                     self.fine_search_size + 1, endpoint=False)[1:])
        if i + 1 < len(sorted_ks):
            fine += list(np.linspace(sorted_ks[i], sorted_ks[i + 1],
                                     self.fine_search_size + 1, endpoint=False)[1:])
        for k in fine:
            k = float(k)
            if k <= 0 or k == best_k:
                continue
            r2 = r2_for_k(k)
            if r2 > best_r2:
                best_k, best_r2 = k, r2
        # plateau guard (slight deviation from learn.py:451-453's raw
        # >= comparison): on clean data all r2 values tie to ~1e-6 noise
        # and the raw argmax flips a coin; require a material improvement
        # before flagging anything at all
        if best_r2 - initial_r2 <= 1e-4:
            best_k = 0.0
        self.k = best_k

        # 3. final predictions with the chosen k
        if best_k > 0:
            thr = self._residual_threshold(initial, n, best_k)

            def keep_mask(block: pa.Table) -> np.ndarray:
                return np.asarray(block["_abs_residual"], dtype=np.float64) <= thr

            scored, _ = self._oof_predictions(
                initial.drop_columns(["predicted_label", "_epistemic"]),
                feature_col, target_col, key_col, dim, keep_mask)
        else:
            scored = initial.drop_columns([])  # keep initial predictions

        def residual_kernel(batch: pa.Table) -> pa.Table:
            y = np.asarray(batch[target_col], dtype=np.float64)
            p = np.asarray(batch["predicted_label"], dtype=np.float64)
            return batch.append_column("_residual", pa.array(p - y))

        scored = scored.map_batches(residual_kernel, batch_format="pyarrow")

        # 4. uncertainty (epistemic per-row + aleatoric |residual| model)
        if self.include_aleatoric_uncertainty:
            def abs_res(batch: pa.Table) -> pa.Table:
                r = np.asarray(batch["_residual"], dtype=np.float64)
                return batch.append_column("_abs_res_t", pa.array(np.abs(r)))

            with_t = scored.map_batches(abs_res, batch_format="pyarrow")
            alea_moments = with_t.aggregate(
                _moments_aggfn(feature_col, "_abs_res_t", key_col, 1, dim)
            )["ridge_moments"]
            d1 = dim + 1
            xtx = np.asarray(alea_moments[: d1 * d1], dtype=np.float64).reshape(d1, d1)
            xty = np.asarray(alea_moments[d1 * d1 :], dtype=np.float64)
            reg = self.l2 * np.eye(d1)
            reg[-1, -1] = 0.0
            alea_w = np.linalg.solve(xtx + reg, xty)
        else:
            alea_w = None

        def adjust_kernel(batch: pa.Table) -> pa.Table:
            r = np.asarray(batch["_residual"], dtype=np.float64)
            u = np.asarray(batch["_epistemic"], dtype=np.float64)
            if alea_w is not None:
                X = _design(_features_matrix(batch, feature_col))
                u = u + np.maximum(X @ alea_w, 0.0)
            adj = np.abs(r / (u + TINY_VALUE))
            return batch.append_column("_adj_residual", pa.array(adj))

        scored = scored.map_batches(adjust_kernel, batch_format="pyarrow").materialize()

        from cleanlab_ray.functions.quantiles import exact_median

        med = max(exact_median(scored, "_adj_residual"), TINY_VALUE)

        def quality_kernel(batch: pa.Table) -> pa.Table:
            adj = np.asarray(batch["_adj_residual"], dtype=np.float64)
            q = np.exp(-adj / med)
            return pa.table(
                {
                    key_col: batch[key_col],
                    "given_label": batch[target_col],
                    "predicted_label": batch["predicted_label"],
                    "label_quality": pa.array(q),
                }
            )

        quality = scored.map_batches(quality_kernel, batch_format="pyarrow").materialize()

        # 5. flags: bottom ceil(n*k) by (label_quality, key)
        num_issues = math.ceil(n * best_k)
        flag_thr, boundary = self._bottom_t(quality, num_issues, key_col)

        def flag_kernel(batch: pa.Table) -> pa.Table:
            q = np.asarray(batch["label_quality"], dtype=np.float64)
            ids = np.asarray(batch[key_col], dtype=np.int64)
            mask = q < flag_thr[0]
            if boundary is not None:
                in_bin = (q >= flag_thr[0]) & (q < flag_thr[1])
                mask |= in_bin & np.isin(ids, boundary)
            return batch.append_column("is_label_issue", pa.array(mask))

        return quality.map_batches(flag_kernel, batch_format="pyarrow")

    def _bottom_t(self, quality, t: int, key_col: str):
        """Exact bottom-T over the [0,1] quality score: histogram bin +
        boundary pull, ties broken by key (stages/decision.py pattern)."""
        if t <= 0:
            return (-np.inf, -np.inf), None
        from cleanlab_ray.stages.decision import DEFAULT_BINS, make_histogram_aggfn

        hist = quality.aggregate(make_histogram_aggfn("label_quality", DEFAULT_BINS))[
            "score_histogram"
        ]
        cum = np.concatenate([[0], np.cumsum(hist)])
        b = int(np.searchsorted(cum, t, side="left")) - 1
        b = max(b, 0)
        bin_lo = b / DEFAULT_BINS
        bin_hi = (b + 1) / DEFAULT_BINS
        below = int(cum[b])
        need = t - below
        if need <= 0:
            return (bin_lo, bin_lo), None

        def in_bin(batch: pa.Table) -> pa.Table:
            q = np.asarray(batch["label_quality"], dtype=np.float64)
            m = (q >= bin_lo) & (q < bin_hi)
            return pa.table(
                {
                    "label_quality": pa.array(q[m]),
                    key_col: pa.array(np.asarray(batch[key_col], dtype=np.int64)[m]),
                }
            )

        pulled = quality.map_batches(in_bin, batch_format="pyarrow").to_pandas()
        pulled = pulled.sort_values(["label_quality", key_col], kind="mergesort")
        boundary = pulled[key_col].to_numpy()[:need].astype(np.int64)
        return (bin_lo, bin_hi), boundary
