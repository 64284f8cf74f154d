"""Spurious-correlation scoring (parity with /root/reference/cleanlab/
datalab/internal/spurious_correlation.py:33-113).

Per property column: 5-fold CV accuracy of a single-feature Gaussian
naive Bayes predicting the label, converted to the reference's
"relative room for improvement" score
(min(1, (1 - cv_acc) / (1 - baseline_acc)); baseline = majority class).
Low score = the property alone predicts labels = suspicious shortcut.

GaussianNB is implemented from scratch (no sklearn in this
environment); model fitting runs on a deterministic driver-side sample
— this is a diagnostics operator, not a data-parallel transform
(SURVEY.md §2.5 classifies it driver-side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cleanlab_ray.functions.aggregators import stratified_hash_folds


class GaussianNB1D:
    """Single-feature Gaussian naive Bayes."""

    def fit(self, x: np.ndarray, y: np.ndarray, num_classes: int):
        self.priors = np.bincount(y, minlength=num_classes) / len(y)
        self.mu = np.zeros(num_classes)
        self.var = np.ones(num_classes)
        for c in range(num_classes):
            xc = x[y == c]
            if len(xc):
                self.mu[c] = xc.mean()
                self.var[c] = max(xc.var(), 1e-9)
        return self

    def predict(self, x: np.ndarray) -> np.ndarray:
        ll = (
            -0.5 * (x[:, None] - self.mu[None, :]) ** 2 / self.var[None, :]
            - 0.5 * np.log(self.var)[None, :]
            + np.log(np.clip(self.priors, 1e-12, None))[None, :]
        )
        return ll.argmax(axis=1)


def relative_room_for_improvement(baseline: float, mean_acc: float, eps: float = 1e-8) -> float:
    denominator = 1 - baseline
    if baseline == 1:
        denominator += eps
    return min(1.0, (1 - mean_acc) / denominator)


def spurious_correlations(
    ds,
    property_cols: list[str],
    label_col: str = "label",
    num_classes: int = 3,
    id_col: str | None = None,
    cv: int = 5,
    max_rows: int = 50_000,
) -> pd.DataFrame:
    """Returns DataFrame (property, score) — reference output shape."""
    cols = [*property_cols, label_col] + ([id_col] if id_col else [])
    sample = ds.select_columns(cols)
    n = ds.count()
    if n > max_rows:
        sample = sample.random_sample(max_rows / n, seed=42)
    df = sample.to_pandas()
    if len(df) == 0:
        raise ValueError(
            "spurious_correlations: empty input — nothing to cross-validate"
        )
    y = df[label_col].to_numpy().astype(np.int64)
    ids = df[id_col].to_numpy().astype(np.int64) if id_col else np.arange(len(y))
    folds = stratified_hash_folds(ids, cv)
    baseline = float(np.bincount(y, minlength=num_classes).max() / len(y))

    rows = []
    for prop in property_cols:
        x = df[prop].to_numpy().astype(np.float64)
        accs = []
        for f in range(cv):
            tr, te = folds != f, folds == f
            if not te.any() or not tr.any():
                continue
            clf = GaussianNB1D().fit(x[tr], y[tr], num_classes)
            accs.append(float((clf.predict(x[te]) == y[te]).mean()))
        rows.append(
            {
                "property": prop,
                "score": relative_room_for_improvement(baseline, float(np.mean(accs))),
            }
        )
    return pd.DataFrame(rows)
