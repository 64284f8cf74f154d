"""Token-classification label issues over ragged per-sentence tokens.

Reference semantics:
- /root/reference/cleanlab/token_classification/rank.py:30-127
  (get_label_quality_scores): flatten ragged (labels, pred_probs) to
  token level, score each token (self_confidence etc.), pool per
  sentence with min or softmin <s, softmax((1-s)/T)>;
- rank.py:156-274 (issues_from_scores): token issues = score < threshold;
- filter.py:17-101 (find_label_issues): confident-learning issues on the
  flattened token table, mapped back to (sentence, token) pairs.

Ray shape: the ragged columns are exploded ONCE per batch with
pc.list_flatten / list_parent_indices (zero-copy, no per-row Python);
token rows are keyed (sentence key, token_pos) so every downstream
stage is the engine's ordinary keyed machinery: the scoring kernel,
confident-joint aggregate, and the pre-aggregated pooling shuffle
(stages/pooling.pool_conversations_fast — one partial row per
(sentence, batch) rides the shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def flatten_token_table(
    ds,
    labels_col: str = "token_labels",
    probs_col: str = "token_pred_probs",
    key_col: str = "sentence_id",
    num_classes: int = 3,
):
    """Explode ragged sentences to one row per token:
    (conv_id=str(sentence key), turn_idx=token_pos, label,
    pred_probs fixed_size_list[K]).

    ``labels_col``: list<int> per sentence; ``probs_col``: list<float>
    of length T*K per sentence (row-major token-by-token)."""
    k = num_classes

    def kernel(batch: pa.Table) -> pa.Table:
        lab = batch[labels_col]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        pr = batch[probs_col]
        if isinstance(pr, pa.ChunkedArray):
            pr = pr.combine_chunks()
        flat_lab = pc.list_flatten(lab)
        parents = pc.list_parent_indices(lab)
        lens = pc.list_value_length(lab).to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(lens.sum())
        pos = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
            if total
            else np.empty(0, np.int64)
        )
        flat_probs = pc.list_flatten(pr).to_numpy(zero_copy_only=False).astype(np.float32)
        keys = pc.cast(batch[key_col], pa.string()).take(parents)
        return pa.table(
            {
                "conv_id": keys,
                "turn_idx": pa.array(pos.astype(np.int32)),
                "label": pc.cast(flat_lab, pa.int64()),
                "pred_probs": pa.FixedSizeListArray.from_arrays(pa.array(flat_probs), k),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def token_label_quality_scores(
    ds,
    labels_col: str = "token_labels",
    probs_col: str = "token_pred_probs",
    key_col: str = "sentence_id",
    num_classes: int = 3,
    token_score_method: str = "self_confidence",
    sentence_score_method: str = "min",
    temperature: float = 0.05,
    issue_threshold: float = 0.1,
):
    """Per-token scores + per-sentence pooled scores + threshold issues.

    Returns a token-level Dataset: (sentence_id, token_pos, token_score,
    sentence_score, is_token_issue). sentence_score is attached back to
    every token row by the pooling shuffle's compact output (broadcast
    join is unnecessary: the pooled table is re-joined by a second pass
    of the same sorted cogroup used everywhere else)."""
    from cleanlab_ray.stages.dedup import _run_starts, _sorted_block_map
    from cleanlab_ray.stages.scoring import make_score_kernel

    tokens = flatten_token_table(ds, labels_col, probs_col, key_col, num_classes)
    score_col = f"score_{token_score_method}"
    scored = tokens.map_batches(
        make_score_kernel(methods=(token_score_method,)), batch_format="pyarrow"
    ).select_columns(["conv_id", "turn_idx", score_col])

    method = sentence_score_method
    temp = temperature
    thr = issue_threshold

    def pool_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        conv = np.asarray(batch["conv_id"].to_pandas(), dtype=object)
        s = batch[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if n == 0:
            sent = np.empty(0, np.float64)
        else:
            starts = _run_starts(conv)
            sizes = np.diff(np.append(starts, n))
            if method == "min":
                per_run = np.minimum.reduceat(s, starts)
            else:  # softmin: <s, softmax((1-s)/T)> per sentence
                e = np.exp((1.0 - s) / temp)
                per_run = np.add.reduceat(s * e, starts) / np.add.reduceat(e, starts)
            sent = np.repeat(per_run, sizes)
        return pa.table(
            {
                "sentence_id": batch["conv_id"],
                "token_pos": pc.cast(batch["turn_idx"], pa.int64()),
                "token_score": pa.array(s),
                "sentence_score": pa.array(sent),
                "is_token_issue": pa.array(s < thr),
            }
        )

    return _sorted_block_map(scored, "conv_id", pool_block)


def token_common_label_issues(token_ds, top: int | None = None):
    """Which token strings most commonly carry label issues
    (token_classification/summary.py:139-300): count flagged tokens per
    (token, given_label, predicted_label) swap, ordered by count.

    ``token_ds`` columns: token (string), given_label (int),
    predicted_label (int), is_label_issue (bool). One compact
    groupby-aggregate; the result is O(vocabulary), tiny."""
    from ray.data.aggregate import Sum

    def pre(batch: pa.Table) -> pa.Table:
        flag = batch["is_label_issue"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "token": batch["token"],
                "given_label": batch["given_label"],
                "predicted_label": batch["predicted_label"],
                "_n": pa.array(flag.astype(np.int64)),
            }
        )

    counts = (
        token_ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["token", "given_label", "predicted_label"])
        .aggregate(Sum("_n", alias_name="num_label_issues"))
    )

    def keep_flagged(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # groupby emits schema-less empty blocks
            return pa.table({
                "token": pa.array([], pa.string()),
                "given_label": pa.array([], pa.int64()),
                "predicted_label": pa.array([], pa.int64()),
                "num_label_issues": pa.array([], pa.int64()),
            })
        n = batch["num_label_issues"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(n > 0))

    from cleanlab_ray.functions.frames import typed_pandas

    out = counts.map_batches(keep_flagged, batch_format="pyarrow")
    df = typed_pandas(out, {
        "token": object, "given_label": "int64",
        "predicted_label": "int64", "num_label_issues": "int64",
    }).sort_values(
        ["num_label_issues", "token", "given_label", "predicted_label"],
        ascending=[False, True, True, True],
    ).reset_index(drop=True)
    return df.head(top) if top else df


def token_find_label_issues(
    ds,
    labels_col: str = "token_labels",
    probs_col: str = "token_pred_probs",
    key_col: str = "sentence_id",
    num_classes: int = 3,
    filter_by: str = "prune_by_noise_rate",
):
    """Confident-learning token issues (filter.py:17-101): flatten, run
    the engine's find_label_issues on the token table, return
    (sentence_id, token_pos, is_label_issue)."""
    from cleanlab_ray.pipelines.label_issues import find_label_issues

    tokens = flatten_token_table(
        ds, labels_col, probs_col, key_col, num_classes
    ).materialize()
    out, _stats = find_label_issues(tokens, filter_by=filter_by, num_classes=num_classes)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sentence_id": batch["conv_id"],
                "token_pos": pc.cast(batch["turn_idx"], pa.int64()),
                "is_label_issue": batch["is_label_issue"],
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")
