"""Semantic-segmentation label quality over dense per-pixel tensors.

Reference semantics:
- /root/reference/cleanlab/segmentation/rank.py:14-231
  (get_label_quality_scores, method='softmin'): pixel score =
  pred_probs[image, given_label, h, w]; image score =
  softmin(pixel scores, T=0.1) = <s, softmax((1-s)/T)>;
  issues_from_scores: pixel issue = score < threshold;
- /root/reference/cleanlab/segmentation/summary.py:159-267
  (common_label_issues): frequency of (given_label -> predicted_label)
  swaps among issue pixels.

Engine shape: one row per image, tensors stored flattened
(labels: fixed_size_list<int>[H*W], pred_probs:
fixed_size_list<float>[K*H*W], K-major like the reference's (K,H,W)).
Every kernel is whole-batch vectorized (one gather per batch for the
pixel scores); the dataset-level swap table is a flat (K*K,) mergeable
AggregateFn — nothing image-sized reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _tensors(batch: pa.Table, labels_col: str, probs_col: str, k: int):
    lab = batch[labels_col]
    if isinstance(lab, pa.ChunkedArray):
        lab = lab.combine_chunks()
    pr = batch[probs_col]
    if isinstance(pr, pa.ChunkedArray):
        pr = pr.combine_chunks()
    n = batch.num_rows
    labels = lab.flatten().to_numpy(zero_copy_only=False).astype(np.int64).reshape(n, -1)
    hw = labels.shape[1]
    probs = (
        pr.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(n, k, hw)
    )
    return labels, probs


def segmentation_scores(
    ds,
    labels_col: str = "pixel_labels",
    probs_col: str = "pixel_pred_probs",
    key_col: str = "image_id",
    num_classes: int = 3,
    temperature: float = 0.1,
    issue_threshold: float = 0.1,
):
    """Per-image quality Dataset: (image_id, image_score,
    num_pixel_issues, n_pixels). Pixel scores/issues stay inside the
    kernel (emit them with ``segmentation_pixel_scores`` when needed)."""
    k = num_classes

    def kernel(batch: pa.Table) -> pa.Table:
        labels, probs = _tensors(batch, labels_col, probs_col, k)
        n, hw = labels.shape
        rows = np.arange(n)[:, None]
        pix = np.arange(hw)[None, :]
        s = probs[rows, labels, pix]  # (n, hw) self-confidence per pixel
        e = np.exp((1.0 - s) / temperature)
        image_score = (s * e).sum(axis=1) / e.sum(axis=1)
        issues = (s < issue_threshold).sum(axis=1)
        return pa.table(
            {
                key_col: batch[key_col],
                "image_score": pa.array(image_score),
                "num_pixel_issues": pa.array(issues.astype(np.int64)),
                "n_pixels": pa.array(np.full(n, hw, dtype=np.int64)),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def segmentation_pixel_scores(
    ds,
    labels_col: str = "pixel_labels",
    probs_col: str = "pixel_pred_probs",
    key_col: str = "image_id",
    num_classes: int = 3,
    issue_threshold: float = 0.1,
):
    """Exploded per-pixel Dataset: (image_id, pixel_idx, pixel_score,
    is_pixel_issue) — one vectorized gather + flatten per batch."""
    k = num_classes

    def kernel(batch: pa.Table) -> pa.Table:
        labels, probs = _tensors(batch, labels_col, probs_col, k)
        n, hw = labels.shape
        rows = np.arange(n)[:, None]
        pix = np.arange(hw)[None, :]
        s = probs[rows, labels, pix]
        keys = batch[key_col].take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), hw))
        )
        return pa.table(
            {
                key_col: keys,
                "pixel_idx": pa.array(np.tile(np.arange(hw, dtype=np.int64), n)),
                "pixel_score": pa.array(s.reshape(-1)),
                "is_pixel_issue": pa.array((s < issue_threshold).reshape(-1)),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def common_label_issues(
    ds,
    labels_col: str = "pixel_labels",
    probs_col: str = "pixel_pred_probs",
    num_classes: int = 3,
    issue_threshold: float = 0.1,
):
    """(given_label, predicted_label, num_label_issues) frequency table
    of swaps among issue pixels (summary.py:159-267) — one flat (K*K,)
    aggregate."""
    from ray.data.aggregate import AggregateFn

    k = num_classes

    def accumulate_block(acc, block):
        labels, probs = _tensors(
            block if isinstance(block, pa.Table) else pa.Table.from_pandas(block),
            labels_col, probs_col, k,
        )
        n, hw = labels.shape
        rows = np.arange(n)[:, None]
        pix = np.arange(hw)[None, :]
        s = probs[rows, labels, pix]
        pred = probs.argmax(axis=1)  # (n, hw)
        issue = (s < issue_threshold) & (pred != labels)
        flat = (labels[issue] * k + pred[issue]).ravel()
        return np.asarray(acc, dtype=np.float64) + np.bincount(flat, minlength=k * k)

    agg = AggregateFn(
        init=lambda _: np.zeros(k * k, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64),
        name="swap_counts",
    )
    counts = np.asarray(ds.aggregate(agg)["swap_counts"], dtype=np.int64).reshape(k, k)
    import pandas as pd

    rows = [
        {"given_label": i, "predicted_label": j, "num_label_issues": int(counts[i, j])}
        for i in range(k)
        for j in range(k)
        if i != j and counts[i, j] > 0
    ]
    return (
        pd.DataFrame(rows, columns=["given_label", "predicted_label", "num_label_issues"])
        .sort_values("num_label_issues", ascending=False)
        .reset_index(drop=True)
    )
