"""CleanLearning — train-with-noise wrapper (parity with
/root/reference/cleanlab/classification.py:139-1062), Dataset-shaped.

The reference wraps any sklearn classifier; this engine has no sklearn,
so the default classifier is a from-scratch multinomial softmax
regression (numpy, deterministic full-batch gradient descent). Any
object with ``fit(X, y, sample_weight=None)`` / ``predict_proba(X)``
can be passed instead.

Fit protocol (classification.py:469-575 semantics):
  1. deterministic hash folds (the StratifiedKFold analogue,
     count.py:989-997);
  2. per fold: train on the other folds, predict out-of-sample
     pred_probs — assembling the full OOF ``pred_probs`` column
     (estimate_confident_joint_and_cv_pred_proba, count.py:888-1066);
  3. find_label_issues on (labels, OOF pred_probs);
  4. per-class sample weights 1 / P(label=k|true=k)
     (classification.py:513-543) and refit on the clean subset.

Scale notes: the default classifier's fit is DISTRIBUTED full-batch
gradient descent — the slim (id, features, label) projection is
materialized once into object-store blocks, and every GD iteration is
one fan-out of vectorized gradient tasks over those blocks (all
cv_n_folds out-of-fold models advance simultaneously in a single pass;
the final clean-subset refit is a second loop of the same shape). Only
O(M * D * K) weight state ever reaches the driver; no training row
does. A user-supplied ``clf`` (arbitrary fit/predict_proba object)
cannot be trained this way, so that path falls back to the documented
capped driver sample (``max_train_rows``) — INFERENCE is always a
broadcast-weight ``map_batches`` over the full Dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cleanlab_ray.functions.aggregators import stratified_hash_folds
from cleanlab_ray.state.confident import pred_probs_to_numpy


class SoftmaxRegression:
    """Deterministic multinomial logistic regression (L2, full-batch GD
    with simple backtracking); sklearn-shaped fit/predict_proba."""

    def __init__(self, num_classes: int, l2: float = 1e-3, max_iter: int = 200, lr: float = 1.0):
        self.num_classes = num_classes
        self.l2 = l2
        self.max_iter = max_iter
        self.lr = lr
        self.coef_: np.ndarray | None = None  # (D+1, K)

    def _design(self, x: np.ndarray) -> np.ndarray:
        return np.hstack([x, np.ones((len(x), 1))])

    def fit(self, x: np.ndarray, y: np.ndarray, sample_weight: np.ndarray | None = None):
        x = self._design(np.asarray(x, dtype=np.float64))
        y = np.asarray(y)
        n, d = x.shape
        k = self.num_classes
        w = np.zeros((d, k))
        sw = np.ones(n) if sample_weight is None else np.asarray(sample_weight, dtype=np.float64)
        sw = sw / sw.sum() * n
        onehot = np.zeros((n, k))
        onehot[np.arange(n), y] = 1.0
        lr = self.lr
        prev_loss = np.inf
        for _ in range(self.max_iter):
            z = x @ w
            z -= z.max(axis=1, keepdims=True)
            p = np.exp(z)
            p /= p.sum(axis=1, keepdims=True)
            loss = -np.mean(sw * np.log(np.clip(p[np.arange(n), y], 1e-12, None))) + \
                self.l2 * np.sum(w * w) / 2
            grad = x.T @ ((p - onehot) * sw[:, None]) / n + self.l2 * w
            if loss > prev_loss:
                lr *= 0.5
            prev_loss = loss
            w -= lr * grad
            if np.linalg.norm(grad) < 1e-6:
                break
        self.coef_ = w
        return self

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        z = self._design(np.asarray(x, dtype=np.float64)) @ self.coef_
        z -= z.max(axis=1, keepdims=True)
        p = np.exp(z)
        return p / p.sum(axis=1, keepdims=True)

    def predict(self, x: np.ndarray) -> np.ndarray:
        return self.predict_proba(x).argmax(axis=1)


def _prep_block(feature_col: str, label_col: str, id_col: str,
                n_folds: int, issue_col: str | None, *tables) -> dict:
    """Per-block training cache: design matrix + labels + fold ids +
    per-class first (min-id) row for the missing-class guard. Rows
    flagged in ``issue_col`` get pseudo-fold ``n_folds`` so membership
    masks can exclude them without a filtered data copy. Accepts several
    source blocks (varargs, deref'd by Ray) so tiny input blocks are
    coalesced into one gradient unit — per-GD-iteration task count
    scales with DATA size, not input block count."""
    table = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    feats = pred_probs_to_numpy(table[feature_col]).astype(np.float64)
    xd = np.hstack([feats, np.ones((len(feats), 1))])
    y = table[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = table[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    folds = stratified_hash_folds(ids, n_folds).astype(np.int64)
    if issue_col is not None:
        folds = np.where(
            table[issue_col].to_numpy(zero_copy_only=False), n_folds, folds
        )
    firsts = {}
    for c in np.unique(y):
        rows = np.flatnonzero(y == c)
        i = rows[np.argmin(ids[rows])]
        firsts[int(c)] = (int(ids[i]), xd[i].copy())
    counts = np.zeros((n_folds + 1, int(y.max()) + 1 if len(y) else 1), dtype=np.int64)
    np.add.at(counts, (folds, y), 1)
    return {"xd": xd, "y": y, "folds": folds, "firsts": firsts, "counts": counts}


def _grad_block(prep: dict, weights: np.ndarray, member: np.ndarray,
                sw_scale: np.ndarray, class_w: np.ndarray | None,
                active: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-block loss/gradient partials for M softmax models at once.

    member: (M, n_folds+1) bool — model m trains on rows whose fold f
    has member[m, f] (the +1 slot is the 'dropped row' pseudo-fold used
    by the final refit). sw_scale[m] = n_m / swsum_m (the reference's
    sw / sw.sum() * n normalization, distributed). class_w: per-class
    raw weights or None (ones)."""
    m_models, k = weights.shape[0], weights.shape[2]
    losses = np.zeros(m_models)
    grads = np.zeros_like(weights)
    xd, y, folds = prep["xd"], prep["y"], prep["folds"]
    for m in range(m_models):
        if not active[m]:
            continue
        mask = member[m][folds]
        if not mask.any():
            continue
        xm, ym = xd[mask], y[mask]
        sw = (np.ones(len(ym)) if class_w is None else class_w[ym]) * sw_scale[m]
        z = xm @ weights[m]
        z -= z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        losses[m] = -np.sum(sw * np.log(np.clip(p[np.arange(len(ym)), ym], 1e-12, None)))
        resid = p * sw[:, None]
        resid[np.arange(len(ym)), ym] -= sw
        grads[m] = xm.T @ resid
    return losses, grads


def _fit_softmax_distributed(
    block_refs: list,
    num_classes: int,
    member: np.ndarray,
    class_w: np.ndarray | None = None,
    inject: list | None = None,
    l2: float = 1e-3,
    max_iter: int = 200,
    lr0: float = 1.0,
):
    """Distributed full-batch GD over prepped blocks — the same update
    rule, backtracking and stop rule as SoftmaxRegression.fit, with the
    per-row pass expressed as one fan-out of gradient tasks per
    iteration (iterative optimization is the engine's documented
    raw-Ray-task case: the Dataset API cannot express a sequential
    dependence of pass t+1 on pass t's result).

    member: (M, F) bool over fold ids. inject: per model, a list of
    (xd_row, y) duplicated rows (missing-class guard,
    count.py:1012-1033) whose gradient contribution is added driver-side
    (<= K rows per model). Returns weights (M, D+1, K)."""
    import ray

    grad_task = ray.remote(_grad_block)
    meta_task = ray.remote(_meta_block)
    dim_task = ray.remote(lambda p: p["xd"].shape[1])

    # one metadata pass: per-model row count and raw-weight sum
    n_m = np.zeros(len(member))
    swsum = np.zeros(len(member))
    metas = ray.get([
        meta_task.remote(r, member, class_w) for r in block_refs
    ])
    for nm, sm in metas:
        n_m += nm
        swsum += sm
    if inject:
        for m, rows in enumerate(inject):
            for _, yv in rows:
                n_m[m] += 1
                swsum[m] += 1.0 if class_w is None else float(class_w[yv])
    n_m = np.maximum(n_m, 1.0)
    sw_scale = n_m / np.maximum(swsum, 1e-300)

    m_models = len(member)
    d1 = int(ray.get(dim_task.remote(block_refs[0]))) if block_refs else 1
    w = np.zeros((m_models, d1, num_classes))
    lr = np.full(m_models, lr0)
    prev_loss = np.full(m_models, np.inf)
    active = np.ones(m_models, dtype=bool)
    for _ in range(max_iter):
        wref = ray.put(w)
        parts = ray.get([
            grad_task.remote(r, wref, member, sw_scale, class_w, active)
            for r in block_refs
        ])
        losses = sum(p[0] for p in parts)
        grads = sum(p[1] for p in parts)
        if inject:
            for m, rows in enumerate(inject):
                if not active[m] or not rows:
                    continue
                for xd_row, yv in rows:
                    swv = (1.0 if class_w is None else float(class_w[yv])) * sw_scale[m]
                    z = xd_row @ w[m]
                    z -= z.max()
                    p = np.exp(z)
                    p /= p.sum()
                    losses[m] += -swv * np.log(max(p[yv], 1e-12))
                    resid = p * swv
                    resid[yv] -= swv
                    grads[m] += np.outer(xd_row, resid)
        done = True
        for m in range(m_models):
            if not active[m]:
                continue
            loss = losses[m] / n_m[m] + l2 * np.sum(w[m] * w[m]) / 2
            grad = grads[m] / n_m[m] + l2 * w[m]
            if loss > prev_loss[m]:
                lr[m] *= 0.5
            prev_loss[m] = loss
            w[m] -= lr[m] * grad
            if np.linalg.norm(grad) < 1e-6:
                active[m] = False
            else:
                done = False
        if done:
            break
    return w


def _prep_refs(ds, feature_col: str, label_col: str, id_col: str,
               n_folds: int, issue_col: str | None,
               rows_per_unit: int = 65_536) -> list:
    """Coalesced prep-block refs: group the dataset's (possibly tiny)
    arrow blocks into ~rows_per_unit gradient units so the per-iteration
    task count tracks data size, not input block count."""
    import ray

    prep_task = ray.remote(_prep_block)
    refs = ds.to_arrow_refs()
    total = ds.count()
    if total == 0:
        raise ValueError(
            "clean_learning: empty input — cannot fit a model on zero rows"
        )
    n_units = max(1, min(len(refs), -(-total // rows_per_unit)))
    per = -(-len(refs) // n_units)
    out = []
    for i in range(0, len(refs), per):
        group = refs[i : i + per]
        out.append(
            prep_task.remote(feature_col, label_col, id_col, n_folds,
                             issue_col, *group)
        )
    return out


def _meta_block(prep: dict, member: np.ndarray, class_w) -> tuple[np.ndarray, np.ndarray]:
    y, folds = prep["y"], prep["folds"]
    n_m = np.zeros(len(member))
    swsum = np.zeros(len(member))
    for m in range(len(member)):
        mask = member[m][folds]
        n_m[m] = mask.sum()
        sw = np.ones(int(mask.sum())) if class_w is None else class_w[y[mask]]
        swsum[m] = sw.sum()
    return n_m, swsum


def _collect_sample(ds, feature_col, label_col, key_cols, max_rows: int):
    """Deterministic capped sample to the driver: hash-ordered take."""
    cols = [*key_cols, feature_col, label_col]
    n = ds.count()
    frac = min(1.0, max_rows / max(n, 1))
    sample = ds.select_columns(cols)
    if frac < 1.0:
        sample = sample.random_sample(frac, seed=42)
    df = sample.to_pandas()
    x = np.stack(df[feature_col].to_numpy()).astype(np.float64)
    y = df[label_col].to_numpy().astype(np.int64)
    ids = df[key_cols[0]].to_numpy()
    return x, y, ids, df


class CleanLearning:
    def __init__(
        self,
        clf=None,
        *,
        num_classes: int,
        cv_n_folds: int = 5,
        filter_by: str = "prune_by_noise_rate",
        max_train_rows: int = 100_000,
    ):
        self.clf = clf
        self.num_classes = num_classes
        self.cv_n_folds = cv_n_folds
        self.filter_by = filter_by
        self.max_train_rows = max_train_rows
        self.label_issues_ds = None
        self.stats = None
        self.final_clf = None

    def _new_clf(self):
        import copy

        if self.clf is None:
            return SoftmaxRegression(self.num_classes)
        return copy.deepcopy(self.clf)

    def fit(
        self,
        ds,
        feature_col: str = "embedding",
        label_col: str = "label",
        id_col: str = "vec_id",
    ):
        """Returns self; ``self.label_issues_ds`` carries per-row
        (keys, pred_probs, is_label_issue, label_quality)."""
        import ray

        k = self.num_classes
        n_folds = self.cv_n_folds

        if self.clf is None:
            # distributed path: prep blocks once, GD over them
            slim = ds.select_columns([id_col, feature_col, label_col]).materialize()
            block_refs = _prep_refs(
                slim, feature_col, label_col, id_col, n_folds, None
            )
            fold_models = self._fit_fold_models_distributed(block_refs)
        else:
            # user-supplied clf: documented capped driver-sample fallback
            x, y, ids, _ = _collect_sample(
                ds, feature_col, label_col, (id_col,), self.max_train_rows
            )
            folds = stratified_hash_folds(ids.astype(np.int64), n_folds)
            fold_models = []
            for f in range(n_folds):
                clf = self._new_clf()
                train = folds != f
                # missing-class guard (count.py:1012-1033): duplicate one row
                xtr, ytr = x[train], y[train]
                for c in range(k):
                    if not (ytr == c).any() and (y == c).any():
                        i = int(np.nonzero(y == c)[0][0])
                        xtr = np.vstack([xtr, x[[i]]])
                        ytr = np.append(ytr, c)
                clf.fit(xtr, ytr)
                fold_models.append(clf)

        # distributed OOF inference: broadcast all fold models, each row
        # scored by the model of the fold it does NOT belong to
        models_ref = ray.put(fold_models)

        def oof_kernel(batch: pa.Table) -> pa.Table:
            models = ray.get(models_ref)
            feats = pred_probs_to_numpy(batch[feature_col]).astype(np.float64)
            row_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            row_folds = stratified_hash_folds(row_ids, n_folds)
            probs = np.empty((len(row_ids), k))
            for f in range(n_folds):
                m = row_folds == f
                if m.any():
                    probs[m] = models[f].predict_proba(feats[m])
            return batch.append_column(
                "pred_probs",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(probs.reshape(-1).astype(np.float32)), k
                ),
            )

        base = ds.select_columns([id_col, feature_col, label_col])
        # find_label_issues expects (conv_id, turn_idx) keys
        def add_keys(batch: pa.Table) -> pa.Table:
            rid = batch[id_col].to_numpy(zero_copy_only=False)
            batch = batch.append_column("conv_id", pa.array(rid.astype(str), type=pa.string()))
            return batch.append_column(
                "turn_idx", pa.array(np.zeros(len(rid), dtype=np.int32))
            )

        with_probs = (
            base.map_batches(oof_kernel, batch_format="pyarrow")
            .map_batches(add_keys, batch_format="pyarrow")
            .materialize()
        )

        from cleanlab_ray.pipelines.label_issues import find_label_issues
        from cleanlab_ray.stages.scoring import make_score_kernel

        issues_ds, stats = find_label_issues(
            with_probs, filter_by=self.filter_by, num_classes=k, label_col=label_col
        )
        issues_ds = issues_ds.map_batches(
            make_score_kernel(methods=("self_confidence",), label_col=label_col),
            batch_format="pyarrow",
        ).materialize()
        self.label_issues_ds = issues_ds
        self.stats = stats

        # refit on the clean subset with per-class weights 1/p(label=k|true=k)
        noise_diag = np.clip(stats.noise_matrix.diagonal(), 1e-6, None)
        class_weights = 1.0 / noise_diag

        if self.clf is None:
            # distributed refit: issue rows excluded via pseudo-fold, no
            # filtered copy and no training row on the driver
            final_refs = _prep_refs(
                issues_ds, feature_col, label_col, id_col, n_folds, "is_label_issue"
            )
            member = np.array([[True] * n_folds + [False]])  # all clean rows
            w = _fit_softmax_distributed(
                final_refs, k, member, class_w=class_weights
            )
            final = SoftmaxRegression(k)
            final.coef_ = w[0]
        else:
            issue_ids = set(
                int(i)
                for i in issues_ds.map_batches(
                    lambda b: b.filter(b["is_label_issue"]).select([id_col]),
                    batch_format="pyarrow",
                ).to_pandas()[id_col]
            )
            keep = ~np.isin(ids, list(issue_ids))
            final = self._new_clf()
            final.fit(x[keep], y[keep], sample_weight=class_weights[y[keep]])
        self.final_clf = final
        return self

    def _fit_fold_models_distributed(self, block_refs):
        """All cv_n_folds out-of-fold softmax models in one GD loop —
        one gradient fan-out per iteration advances every model."""
        import ray

        k, n_folds = self.num_classes, self.cv_n_folds
        member = np.array(
            [[f != m for f in range(n_folds)] + [False] for m in range(n_folds)]
        )
        # missing-class guard (count.py:1012-1033): per-model class
        # presence from the prepped per-fold class counts; inject the
        # global min-id row of each missing-but-present class
        metas = ray.get([
            ray.remote(lambda p: (p["counts"], p["firsts"])).remote(r)
            for r in block_refs
        ])
        kmax = max(c.shape[1] for c, _ in metas)
        counts = np.zeros((n_folds + 1, kmax), dtype=np.int64)
        firsts: dict[int, tuple[int, np.ndarray]] = {}
        for c, f in metas:
            counts[:, : c.shape[1]] += c
            for cls, (rid, row) in f.items():
                if cls not in firsts or rid < firsts[cls][0]:
                    firsts[cls] = (rid, row)
        global_present = counts.sum(axis=0) > 0
        inject = []
        for m in range(n_folds):
            model_counts = counts[member[m]].sum(axis=0)
            rows = []
            for c in range(min(k, kmax)):
                if global_present[c] and model_counts[c] == 0 and c in firsts:
                    rows.append((firsts[c][1], c))
            inject.append(rows)
        w = _fit_softmax_distributed(block_refs, k, member, inject=inject)
        models = []
        for m in range(n_folds):
            clf = SoftmaxRegression(k)
            clf.coef_ = w[m]
            models.append(clf)
        return models

    def predict_proba(self, ds, feature_col: str = "embedding"):
        import ray

        ref = ray.put(self.final_clf)
        k = self.num_classes

        def kernel(batch: pa.Table) -> pa.Table:
            clf = ray.get(ref)
            feats = pred_probs_to_numpy(batch[feature_col]).astype(np.float64)
            probs = clf.predict_proba(feats)
            return batch.append_column(
                "clean_pred_probs",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(probs.reshape(-1).astype(np.float32)), k
                ),
            )

        return ds.map_batches(kernel, batch_format="pyarrow")
