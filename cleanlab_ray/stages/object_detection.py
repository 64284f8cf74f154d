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
    """Right-envelope interpolated AP (filter.py:361-386). The envelope
    (suffix running max) is one reversed np.maximum.accumulate — the
    reference's backward Python loop costs seconds per million-row
    class."""
    r = np.concatenate([[0.0], recalls, [1.0]])
    p = np.concatenate([[0.0], precisions, [0.0]])
    p = np.maximum.accumulate(p[::-1])[::-1]
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
            # only classes PRESENT in this image emit rows (at 1000
            # classes x 1M images the old range(num_classes) loop made
            # 1e9 empty greedy calls and shuffled 1e9 zero gt rows); the
            # num_classes-row seed table below keeps absent-everywhere
            # classes in the output
            present = np.unique(np.concatenate([gt_labels, p_labels]))
            for c in present[(present >= 0) & (present < num_classes)]:
                gsel = gt_labels == c
                psel = p_labels == c
                tp, _fp = greedy_tp_fp(
                    p_boxes[psel], p_scores[psel], gt_boxes[gsel], iou_threshold
                )
                for s, t in zip(p_scores[psel], tp):
                    out["class_idx"].append(int(c))
                    out["score"].append(float(s))
                    out["tp"].append(float(t))
                    out["n_gt"].append(0)
                    out["is_gt_row"].append(False)
                if gsel.any():
                    out["class_idx"].append(int(c))
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

    def per_class_block(batch: pa.Table) -> pa.Table:
        """All class runs of a sorted block in one kernel — a loop over
        the (few) classes, each vectorized; replaces the per-group
        pandas map_groups roundtrip (~0.3 ms/group)."""
        if batch.num_rows == 0:
            return pa.table({
                "class_idx": pa.array([], type=pa.int64()),
                "ap": pa.array([], type=pa.float64()),
                "n_gt": pa.array([], type=pa.int64()),
                "n_pred": pa.array([], type=pa.int64()),
            })
        cls = batch["class_idx"].to_numpy(zero_copy_only=False)
        score = batch["score"].to_numpy(zero_copy_only=False)
        tp = batch["tp"].to_numpy(zero_copy_only=False)
        ngt_col = batch["n_gt"].to_numpy(zero_copy_only=False)
        is_gt = batch["is_gt_row"].to_numpy(zero_copy_only=False)
        eps = np.finfo(np.float32).eps
        out_c, out_ap, out_gt, out_np = [], [], [], []
        for c in np.unique(cls):
            m = cls == c
            n_gt = int(ngt_col[m & is_gt].sum())
            pm = m & ~is_gt
            s, t = score[pm], tp[pm]
            n_pred = int(pm.sum())
            if n_pred == 0:
                ap = 0.0
            else:
                order = np.argsort(-s, kind="stable")
                tp_cum = t[order].cumsum()
                fp_cum = (1.0 - t[order]).cumsum()
                recalls = tp_cum / max(n_gt, eps)
                precisions = tp_cum / np.maximum(tp_cum + fp_cum, eps)
                ap = average_precision(recalls, precisions)
            out_c.append(int(c))
            out_ap.append(float(ap))
            out_gt.append(n_gt)
            out_np.append(n_pred)
        return pa.table({
            "class_idx": pa.array(out_c, type=pa.int64()),
            "ap": pa.array(out_ap, type=pa.float64()),
            "n_gt": pa.array(out_gt, type=pa.int64()),
            "n_pred": pa.array(out_np, type=pa.int64()),
        })

    import ray.data as rd

    from cleanlab_ray.stages.dedup import _sorted_block_map

    # one row per class (num_classes total, NOT per image): guarantees
    # every class 0..num_classes-1 appears in the output (ap=0, n_gt=0,
    # n_pred=0 when absent everywhere), contributing nothing to sums
    seed = rd.from_arrow(pa.table({
        "class_idx": pa.array(np.arange(num_classes, dtype=np.int64)),
        "score": pa.array(np.zeros(num_classes)),
        "tp": pa.array(np.zeros(num_classes)),
        "n_gt": pa.array(np.zeros(num_classes, dtype=np.int64)),
        "is_gt_row": pa.array(np.ones(num_classes, dtype=bool)),
    }))

    return _sorted_block_map(
        ds.map_batches(per_image, batch_format="pyarrow").union(seed),
        "class_idx", per_class_block)


# ---------------------------------------------------------------------------
# ObjectLab label-quality scores (overlooked / badloc / swap subtypes)
# ---------------------------------------------------------------------------
# Reference semantics: /root/reference/cleanlab/object_detection/rank.py
# get_label_quality_scores (:50-124), issues_from_scores (:126-157),
# _get_subtype_label_quality_scores (:1017-1110), subtype kernels
# (:555-608 overlooked, :690-747 badloc, :825-890 swap), similarity
# matrix (:300-405), pool_box_scores_per_image (:976-1015) and constants
# (/root/reference/cleanlab/internal/constants.py).
#
# Engine decomposition: the reference is a per-image Python loop over an
# in-memory list; here the dataset is a Dataset of image rows and the
# computation is the cleanlab two-pass protocol —
#   pass 1: one flat aggregate for min_possible_similarity (a global
#           min over every image's nonzero label-pred similarities);
#   pass 2: a map_batches kernel computing all three subtype scores per
#           image with vectorized (L, M) matrix math (the reference's
#           per-box loops are re-derived as masked matrix reductions).
# Nothing image-sized ever reaches the driver; the only broadcast state
# is one float.

OD_ALPHA = 0.9               # constants.py:17
OD_LOW_PROB = 0.5            # constants.py:18
OD_HIGH_PROB = 0.95          # constants.py:19
OD_TEMPERATURE = 0.1         # constants.py:20
OD_OVERLAP_THR = 0.95        # constants.py:21 LABEL_OVERLAP_THRESHOLD
OD_TINY = 1e-100             # constants.py:6
OD_EUC_FACTOR = 0.1          # constants.py:10


def od_similarity_matrix(lab_boxes: np.ndarray, pred_boxes: np.ndarray):
    """(L, M) similarity = ALPHA * IoU + (1-ALPHA) * exp(-EUC_FACTOR * d)
    between box centers (rank.py:388-405, 460-463) plus the raw IoU."""
    iou = iou_matrix(lab_boxes, pred_boxes)
    if len(lab_boxes) == 0 or len(pred_boxes) == 0:
        return iou, iou.copy()
    lc = (lab_boxes[:, :2] + lab_boxes[:, 2:]) / 2.0
    pc_ = (pred_boxes[:, :2] + pred_boxes[:, 2:]) / 2.0
    d = np.sqrt(((lc[:, None, :] - pc_[None, :, :]) ** 2).sum(axis=2))
    sim = OD_ALPHA * iou + (1.0 - OD_ALPHA) * np.exp(-d * OD_EUC_FACTOR)
    return sim, iou


def _od_image_iter(batch: pa.Table):
    """Yield (lab_boxes, lab_labels, pred_boxes, pred_labels,
    pred_probs) numpy views per image row."""
    gtb = batch["gt_boxes"].to_pylist()
    gtl = batch["gt_labels"].to_pylist()
    pdb_ = batch["pred_boxes"].to_pylist()
    pdl = batch["pred_labels"].to_pylist()
    pds = batch["pred_scores"].to_pylist()
    for i in range(batch.num_rows):
        yield (
            np.asarray(gtb[i], dtype=np.float64).reshape(-1, 4),
            np.asarray(gtl[i], dtype=np.int64),
            np.asarray(pdb_[i], dtype=np.float64).reshape(-1, 4),
            np.asarray(pdl[i], dtype=np.int64),
            np.asarray(pds[i], dtype=np.float64),
        )


def od_min_possible_similarity(ds) -> float:
    """Pass 1: global min over all images' nonzero similarity entries,
    1.0 when every matrix is empty (rank.py:407-426) — ONE flat
    aggregate, O(1) driver state."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(acc, block: pa.Table):
        m = float(np.asarray(acc)[0])
        for lb, _ll, pb, _pl, _pp in _od_image_iter(block):
            sim, _ = od_similarity_matrix(lb, pb)
            nz = sim[sim != 0]
            if nz.size:
                m = min(m, float(nz.min()))
        return np.array([m])

    out = ds.aggregate(AggregateFn(
        init=lambda _: np.array([1.0]),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.minimum(np.asarray(a), np.asarray(b)),
        name="od_min_sim",
    ))["od_min_sim"]
    return float(np.asarray(out)[0])


def _od_softmin_pool(scores: np.ndarray) -> float:
    """softmin over non-NaN entries; 1.0 when none (rank.py:512-520)."""
    from cleanlab_ray.functions.numerics import softmax

    s = scores[~np.isnan(scores)]
    if len(s) == 0:
        return 1.0
    w = softmax(-s, temperature=OD_TEMPERATURE, axis=0, shift=True)
    return float(np.dot(w, s))


def _od_image_scores(lb, ll, pb, pl, pp, min_sim: float,
                     overlapping_label_check: bool):
    """(overlooked, badloc, swap) pooled scores for one image — the
    reference's three per-box loops as masked matrix reductions."""
    sim, iou = od_similarity_matrix(lb, pb)
    L, M = sim.shape

    # overlooked (rank.py:555-608): one score per HIGH-prob pred box
    # with zero IoU against every label box
    if M:
        valid = (pp >= OD_HIGH_PROB) & ~((iou > 0).any(axis=0) if L else np.zeros(M, bool))
        same = (ll[:, None] == pl[None, :]) if L else np.zeros((0, M), bool)
        best = np.where(same, sim, -np.inf).max(axis=0) if L else np.full(M, -np.inf)
        has_k = same.any(axis=0) if L else np.zeros(M, bool)
        score = np.where(has_k, best, min_sim * (1.0 - pp))
        overlooked = np.where(valid, score, np.nan)
    else:
        overlooked = np.empty(0)

    if L:
        # badloc (rank.py:690-747): per label box, best similarity among
        # same-class preds with prob > LOW and IoU > 0; 1.0 when none
        same_lm = pl[None, :] == ll[:, None] if M else np.zeros((L, 0), bool)
        comb = same_lm & (pp > OD_LOW_PROB)[None, :] & (iou > 0) if M else same_lm
        any_c = comb.any(axis=1) if M else np.zeros(L, bool)
        best = np.where(comb, sim, -np.inf).max(axis=1) if M else np.full(L, -np.inf)
        badloc = np.where(any_c, best, 1.0)

        # swap (rank.py:825-890): per label box, 1 - best similarity
        # among HIGH-prob preds of a DIFFERENT class (floored at
        # min_sim); min_sim outright for multi-class-overlap boxes
        cand = (~same_lm) & (pp > OD_HIGH_PROB)[None, :] if M else np.zeros((L, 0), bool)
        any_s = cand.any(axis=1) if M else np.zeros(L, bool)
        best_s = np.where(cand, sim, -np.inf).max(axis=1) if M else np.full(L, -np.inf)
        swap = np.where(any_s, np.maximum(min_sim, 1.0 - best_s), 1.0)
        if overlapping_label_check and L > 1:
            iou_ll = iou_matrix(lb, lb)
            ov = ((iou_ll >= OD_OVERLAP_THR)
                  & (ll[:, None] != ll[None, :])).any(axis=1)
            swap = np.where(ov, min_sim, swap)
    else:
        badloc = np.empty(0)
        swap = np.empty(0)

    return (_od_softmin_pool(overlooked), _od_softmin_pool(badloc),
            _od_softmin_pool(swap))


def od_label_quality_scores(
    ds,
    id_col: str = "img_id",
    aggregation_weights: dict | None = None,
    overlapping_label_check: bool = True,
    min_possible_similarity: float | None = None,
):
    """ObjectLab per-image label-quality scores (rank.py:50-124 with
    method='objectlab', threshold=0.0 -> the prune pass is a no-op).

    Input: Dataset of image rows (id_col, gt_boxes list<list<f8>[4]>,
    gt_labels list<i8>, pred_boxes, pred_labels, pred_scores).
    Returns Dataset[(id_col, score_overlooked, score_badloc, score_swap,
    label_quality_score)], one row per image."""
    w = aggregation_weights or {"overlooked": 1 / 3, "badloc": 1 / 3, "swap": 1 / 3}
    total = w["overlooked"] + w["badloc"] + w["swap"]
    if abs(total - 1.0) > 1e-9:
        raise ValueError("aggregation_weights must sum to 1")
    if min_possible_similarity is None:
        min_possible_similarity = od_min_possible_similarity(ds)
    min_sim = float(min_possible_similarity)

    def kernel(batch: pa.Table) -> pa.Table:
        ov, bl, sw = [], [], []
        for lb, ll, pb, pl, pp in _od_image_iter(batch):
            o, b, s = _od_image_scores(lb, ll, pb, pl, pp, min_sim,
                                       overlapping_label_check)
            ov.append(o); bl.append(b); sw.append(s)
        ov = np.asarray(ov); bl = np.asarray(bl); sw = np.asarray(sw)
        agg = np.exp(w["overlooked"] * np.log(OD_TINY + ov)
                     + w["badloc"] * np.log(OD_TINY + bl)
                     + w["swap"] * np.log(OD_TINY + sw))
        return pa.table({
            id_col: batch[id_col],
            "score_overlooked": pa.array(ov),
            "score_badloc": pa.array(bl),
            "score_swap": pa.array(sw),
            "label_quality_score": pa.array(agg),
        })

    return ds.map_batches(kernel, batch_format="pyarrow")


def od_issues_from_scores(scores_ds, threshold: float = 0.1,
                          score_col: str = "label_quality_score"):
    """rank.py:126-157: images with score <= threshold, most severe
    first — a filter + distributed sort, never a driver argsort."""
    import pyarrow.compute as pc

    if threshold > 1.0:
        raise ValueError("threshold must be <= 1")
    return scores_ds.filter(
        expr=f"{score_col} <= {threshold!r}"
    ).sort(score_col)
