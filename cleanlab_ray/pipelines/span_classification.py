"""Span-classification label issues over ragged per-sentence tokens.

Reference semantics:
/root/reference/cleanlab/experimental/span_classification.py — span
classification is token classification with K=2 where the model emits a
single per-token probability of the span class; `_get_pred_prob_token`
(:103-108) expands each scalar p to the 2-class row (1-p, p) and every
downstream step delegates to the token_classification machinery
(find_label_issues :17-62, get_label_quality_scores :90-100).

Ray shape: the expansion is one vectorized map over the ragged
``span_probs`` list column (offsets double, values interleave — zero
per-row Python); everything after is pipelines/token_classification.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def span_to_token_probs(ds, probs_col: str = "span_probs",
                        out_col: str = "token_pred_probs"):
    """list<float>[T] span-class probabilities -> list<float>[2T]
    row-major (1-p, p) token pred_probs
    (span_classification.py:103-108)."""

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch[probs_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
        pair = np.stack([1.0 - v, v], axis=1).reshape(-1)
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = pa.array(
            (np.concatenate([[0], np.cumsum(lens)]) * 2).astype(np.int32))
        out = batch.drop_columns([probs_col])
        return out.append_column(
            out_col, pa.ListArray.from_arrays(offsets, pa.array(pair)))

    return ds.map_batches(kernel, batch_format="pyarrow")


def span_label_quality_scores(
    ds,
    labels_col: str = "token_labels",
    probs_col: str = "span_probs",
    key_col: str = "sentence_id",
    token_score_method: str = "self_confidence",
    sentence_score_method: str = "min",
    temperature: float = 0.05,
    issue_threshold: float = 0.1,
):
    """get_label_quality_scores analogue
    (span_classification.py:90-100): expand to K=2 token probs, then
    the token pipeline's scoring + sentence pooling + threshold issues.
    Returns Dataset[(sentence_id, token_pos, token_score,
    sentence_score, is_token_issue)]."""
    from cleanlab_ray.pipelines.token_classification import token_label_quality_scores

    expanded = span_to_token_probs(ds, probs_col)
    return token_label_quality_scores(
        expanded, labels_col=labels_col, probs_col="token_pred_probs",
        key_col=key_col, num_classes=2,
        token_score_method=token_score_method,
        sentence_score_method=sentence_score_method,
        temperature=temperature, issue_threshold=issue_threshold,
    )


def span_find_label_issues(
    ds,
    labels_col: str = "token_labels",
    probs_col: str = "span_probs",
    key_col: str = "sentence_id",
    filter_by: str = "prune_by_noise_rate",
):
    """find_label_issues analogue (span_classification.py:17-62):
    confident-learning token issues on the expanded K=2 table, keyed
    back to (sentence_id, token_pos)."""
    from cleanlab_ray.pipelines.token_classification import token_find_label_issues

    expanded = span_to_token_probs(ds, probs_col)
    return token_find_label_issues(
        expanded, labels_col=labels_col, probs_col="token_pred_probs",
        key_col=key_col, num_classes=2, filter_by=filter_by,
    )
