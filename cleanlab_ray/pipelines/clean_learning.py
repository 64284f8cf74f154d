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

Scale notes: training data is brought to the driver via a deterministic
capped sample (``max_train_rows``) — model FITTING of nonlinear models
is Ray-Train territory (SURVEY.md §3.3); INFERENCE is a broadcast-weight
``map_batches`` over the full Dataset, which is the part that must
scale.
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
        k = self.num_classes
        x, y, ids, _ = _collect_sample(ds, feature_col, label_col, (id_col,), self.max_train_rows)
        folds = stratified_hash_folds(ids.astype(np.int64), self.cv_n_folds)

        # per-fold OOF models (trained driver-side on the sample)
        fold_models = []
        for f in range(self.cv_n_folds):
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
        import ray

        models_ref = ray.put(fold_models)
        n_folds = self.cv_n_folds

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
