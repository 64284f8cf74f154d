"""Ensemble label-quality scores — distributed analogue of
cleanlab.rank.get_label_quality_ensemble_scores (rank.py:158-360).

Input: a Dataset carrying ``label`` plus M pred_probs columns
(``pred_probs_0`` .. ``pred_probs_{M-1}``, fixed_size_list<float>[K]).

Weighting schemes (rank.py:316-352):
- "uniform": simple average of per-model scores;
- "accuracy": weights = per-model argmax accuracy / sum — ONE flat
  aggregate pass for all M accuracies;
- "log_loss_search": weights = exp(-t * logloss_m) normalized, with t
  chosen (from ``t_values``) to minimize the log loss of the blended
  pred_probs — pass A aggregates all M per-model log losses, the driver
  forms candidate weights per t, pass B aggregates the blended log loss
  for ALL t values in one flat accumulator, the driver picks argmin;
- "custom": caller-provided weights, normalized.

Log loss here is mean(-ln(max(p[label], 1e-6-clipped renormalized)))
per rank.py:268-273 (the reference additionally delegates to
sklearn.metrics.log_loss, whose internal eps-clipping is not
replicated — documented divergence, irrelevant for probs > eps).

Everything driver-side is O(M) / O(M * len(t_values)); the per-row
work is ordinary map_batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CLIP = 1e-6


def _probs(batch: pa.Table, col: str) -> np.ndarray:
    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return np.asarray(c.values, dtype=np.float64).reshape(batch.num_rows, -1)


def _labels(batch: pa.Table, col: str) -> np.ndarray:
    return batch[col].to_numpy(zero_copy_only=False).astype(np.int64)


def _clipped(p: np.ndarray) -> np.ndarray:
    q = np.clip(p, _CLIP, None)
    return q / q.sum(axis=1, keepdims=True)


def _pass_a_aggfn(m: int, label_col: str, prefix: str):
    """Flat accumulator: [acc_hits(M) | nll_sums(M) | n]."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(acc, block: pa.Table):
        a = np.asarray(acc, dtype=np.float64).copy()
        y = _labels(block, label_col)
        n = len(y)
        for i in range(m):
            p = _probs(block, f"{prefix}{i}")
            a[i] += float((p.argmax(axis=1) == y).sum())
            q = _clipped(p)
            a[m + i] += float(-np.log(q[np.arange(n), y]).sum())
        a[2 * m] += n
        return a

    return AggregateFn(
        init=lambda _: np.zeros(2 * m + 1, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64),
        name="ensemble_pass_a",
    )


def _pass_b_aggfn(m: int, weights_per_t: np.ndarray, label_col: str, prefix: str):
    """Flat accumulator: blended -log p sums, one slot per t value."""
    from ray.data.aggregate import AggregateFn

    n_t = len(weights_per_t)

    def accumulate_block(acc, block: pa.Table):
        a = np.asarray(acc, dtype=np.float64).copy()
        y = _labels(block, label_col)
        n = len(y)
        ps = [_clipped(_probs(block, f"{prefix}{i}")) for i in range(m)]
        for ti in range(n_t):
            w = weights_per_t[ti]
            blend = sum(w[i] * ps[i] for i in range(m))
            a[ti] += float(-np.log(np.clip(blend[np.arange(n), y], 1e-300, None)).sum())
        return a

    return AggregateFn(
        init=lambda _: np.zeros(n_t, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64),
        name="ensemble_pass_b",
    )


def ensemble_label_quality_scores(
    ds,
    num_models: int,
    label_col: str = "label",
    probs_prefix: str = "pred_probs_",
    method: str = "self_confidence",
    weight_by: str = "accuracy",
    custom_weights: np.ndarray | None = None,
    t_values: tuple = (1e-4, 1e-3, 1e-2, 1e-1, 1e0, 1e1, 1e2, 2e2),
    out_col: str = "ensemble_score",
):
    """Appends ``out_col`` (float64 weighted per-model quality score).

    Returns (Dataset, weights ndarray)."""
    m = num_models
    if weight_by == "custom":
        if custom_weights is None:
            raise ValueError("custom weights required for weight_by='custom'")
        w = np.asarray(custom_weights, dtype=np.float64)
        weights = w / w.sum()
    elif weight_by == "uniform":
        weights = np.full(m, 1.0 / m)
    else:
        acc = np.asarray(
            ds.aggregate(_pass_a_aggfn(m, label_col, probs_prefix))["ensemble_pass_a"],
            dtype=np.float64,
        )
        n = acc[2 * m]
        if weight_by == "accuracy":
            accs = acc[:m] / max(n, 1.0)
            weights = accs / accs.sum()
        elif weight_by == "log_loss_search":
            loglosses = acc[m : 2 * m] / max(n, 1.0)
            cand = np.stack(
                [np.exp(-t * loglosses) / np.exp(-t * loglosses).sum() for t in t_values]
            )
            blend_sums = np.asarray(
                ds.aggregate(
                    _pass_b_aggfn(m, cand, label_col, probs_prefix)
                )["ensemble_pass_b"],
                dtype=np.float64,
            )
            weights = cand[int(np.argmin(blend_sums / max(n, 1.0)))]
        else:
            raise ValueError(f"unknown weight_by {weight_by!r}")

    from cleanlab_ray.functions import rank as rank_fns

    def score_kernel(batch: pa.Table) -> pa.Table:
        y = _labels(batch, label_col)
        total = np.zeros(len(y))
        for i in range(m):
            p = _probs(batch, f"{probs_prefix}{i}")
            s = rank_fns.get_label_quality_scores(y, p, method=method)
            total += weights[i] * s
        return batch.append_column(out_col, pa.array(total))

    return ds.map_batches(score_kernel, batch_format="pyarrow"), weights
