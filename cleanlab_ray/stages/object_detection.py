"""Object-detection per-class Average Precision, distributed.

Reference semantics: /root/reference/cleanlab/object_detection/filter.py
:245-400 — per image, per class: IoU greedy matching (score-descending,
each ground-truth box matched at most once, IoU = intersection/union,
rank.py:313-356) produces TP/FP flags per predicted box; per class the
flags are cumsum'd over ALL images' predictions sorted by confidence,
giving recall/precision curves and the right-envelope interpolated AP
(filter.py:361-386).

Engine decomposition (SURVEY §2.5 object-detection row): a per-image
``map_batches`` emits one row per predicted box (class, score, tp) plus
per-(image, class) ground-truth counts; a ``groupby(class).map_groups``
does the global confidence sort + cumsum + AP. Row format: one row per
image with ragged list columns (gt/pred boxes + labels + scores).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def iou_matrix(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Vectorized (A, B) IoU (intersection/union, rank.py:323-356)."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)))
    ax1, ay1, ax2, ay2 = boxes_a[:, 0:1], boxes_a[:, 1:2], boxes_a[:, 2:3], boxes_a[:, 3:4]
    bx1, by1, bx2, by2 = boxes_b[:, 0], boxes_b[:, 1], boxes_b[:, 2], boxes_b[:, 3]
    ix = np.clip(np.minimum(ax2, bx2) - np.maximum(ax1, bx1), 0, None)
    iy = np.clip(np.minimum(ay2, by2) - np.maximum(ay1, by1), 0, None)
    inter = ix * iy
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    return inter / np.clip(area_a + area_b - inter, 1e-6, None)


def greedy_tp_fp(pred_boxes: np.ndarray, pred_scores: np.ndarray,
                 gt_boxes: np.ndarray, iou_threshold: float = 0.5):
    """Per-prediction TP/FP flags (filter.py:315-359 greedy rule):
    predictions visited score-descending; a prediction is TP iff its
    best-IoU ground-truth box is >= threshold and not already covered."""
    n = len(pred_boxes)
    tp = np.zeros(n, dtype=np.float32)
    if len(gt_boxes) == 0:
        return tp, np.ones(n, dtype=np.float32)
    fp = np.zeros(n, dtype=np.float32)
    ious = iou_matrix(pred_boxes, gt_boxes)
    ious_max = ious.max(axis=1)
    ious_argmax = ious.argmax(axis=1)
    covered = np.zeros(len(gt_boxes), dtype=bool)
    for i in np.argsort(-pred_scores):
        if ious_max[i] >= iou_threshold:
            m = ious_argmax[i]
            if not covered[m]:
                covered[m] = True
                tp[i] = 1
            else:
                fp[i] = 1
        else:
            fp[i] = 1
    return tp, fp


def average_precision(recalls: np.ndarray, precisions: np.ndarray) -> float:
    """Right-envelope interpolated AP (filter.py:361-386)."""
    r = np.concatenate([[0.0], recalls, [1.0]])
    p = np.concatenate([[0.0], precisions, [0.0]])
    for i in range(len(p) - 1, 0, -1):
        p[i - 1] = max(p[i - 1], p[i])
    idx = np.nonzero(r[1:] != r[:-1])[0]
    return float(np.sum((r[idx + 1] - r[idx]) * p[idx + 1]))


def per_class_ap(ds, num_classes: int, iou_threshold: float = 0.5):
    """Dataset of image rows -> pandas (class_idx, ap, n_gt, n_pred).

    Expected columns per image row:
      gt_boxes  list<list<float>[4]>, gt_labels list<int>,
      pred_boxes list<list<float>[4]>, pred_labels list<int>,
      pred_scores list<float>.
    """

    def per_image(batch: pa.Table) -> pa.Table:
        out = {"class_idx": [], "score": [], "tp": [], "n_gt": [], "is_gt_row": []}
        gtb = batch["gt_boxes"].to_pylist()
        gtl = batch["gt_labels"].to_pylist()
        pdb = batch["pred_boxes"].to_pylist()
        pdl = batch["pred_labels"].to_pylist()
        pds = batch["pred_scores"].to_pylist()
        for i in range(batch.num_rows):
            gt_boxes = np.asarray(gtb[i], dtype=np.float64).reshape(-1, 4)
            gt_labels = np.asarray(gtl[i], dtype=np.int64)
            p_boxes = np.asarray(pdb[i], dtype=np.float64).reshape(-1, 4)
            p_labels = np.asarray(pdl[i], dtype=np.int64)
            p_scores = np.asarray(pds[i], dtype=np.float64)
            for c in range(num_classes):
                gsel = gt_labels == c
                psel = p_labels == c
                tp, _fp = greedy_tp_fp(
                    p_boxes[psel], p_scores[psel], gt_boxes[gsel], iou_threshold
                )
                for s, t in zip(p_scores[psel], tp):
                    out["class_idx"].append(c)
                    out["score"].append(float(s))
                    out["tp"].append(float(t))
                    out["n_gt"].append(0)
                    out["is_gt_row"].append(False)
                out["class_idx"].append(c)
                out["score"].append(0.0)
                out["tp"].append(0.0)
                out["n_gt"].append(int(gsel.sum()))
                out["is_gt_row"].append(True)
        return pa.table(
            {
                "class_idx": pa.array(out["class_idx"], type=pa.int64()),
                "score": pa.array(out["score"]),
                "tp": pa.array(out["tp"]),
                "n_gt": pa.array(out["n_gt"], type=pa.int64()),
                "is_gt_row": pa.array(out["is_gt_row"]),
            }
        )

    def per_class(g: pd.DataFrame) -> pd.DataFrame:
        c = int(g["class_idx"].iloc[0])
        n_gt = int(g.loc[g["is_gt_row"], "n_gt"].sum())
        preds = g[~g["is_gt_row"]].sort_values(
            "score", ascending=False, kind="mergesort"
        )
        n_pred = len(preds)
        if n_pred == 0:
            ap = 0.0
        else:
            tp_cum = preds["tp"].to_numpy().cumsum()
            fp_cum = (1.0 - preds["tp"].to_numpy()).cumsum()
            eps = np.finfo(np.float32).eps
            recalls = tp_cum / max(n_gt, eps)
            precisions = tp_cum / np.maximum(tp_cum + fp_cum, eps)
            ap = average_precision(recalls, precisions)
        return pd.DataFrame(
            {"class_idx": [c], "ap": [ap], "n_gt": [n_gt], "n_pred": [n_pred]}
        )

    return (
        ds.map_batches(per_image, batch_format="pyarrow")
        .groupby("class_idx")
        .map_groups(per_class, batch_format="pandas")
    )
