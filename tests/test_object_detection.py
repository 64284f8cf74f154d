"""Object-detection AP: IoU, greedy matching, AP interpolation, e2e."""

import numpy as np
import pytest


def test_iou():
    from cleanlab_ray.stages.object_detection import iou_matrix

    a = np.array([[0, 0, 10, 10]], dtype=float)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], dtype=float)
    m = iou_matrix(a, b)
    np.testing.assert_allclose(m[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(m[0, 1], 25 / 175, atol=1e-6)
    assert m[0, 2] == 0.0


def test_greedy_matching_covers_each_gt_once():
    from cleanlab_ray.stages.object_detection import greedy_tp_fp

    gt = np.array([[0, 0, 10, 10]], dtype=float)
    preds = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], dtype=float)
    scores = np.array([0.9, 0.8])
    tp, fp = greedy_tp_fp(preds, scores, gt)
    assert tp.tolist() == [1, 0] and fp.tolist() == [0, 1]
    # higher-scored duplicate wins even if listed second
    tp2, fp2 = greedy_tp_fp(preds, np.array([0.5, 0.9]), gt)
    assert tp2.tolist() == [0, 1]


def test_average_precision_perfect_and_worst():
    from cleanlab_ray.stages.object_detection import average_precision

    assert average_precision(np.array([0.5, 1.0]), np.array([1.0, 1.0])) == 1.0
    assert average_precision(np.array([0.0, 0.0]), np.array([0.0, 0.0])) == 0.0


def test_per_class_ap_e2e(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.object_detection import per_class_ap

    rng = np.random.default_rng(8)
    rows = []
    for img in range(40):
        gt_boxes, gt_labels = [], []
        pred_boxes, pred_labels, pred_scores = [], [], []
        for _ in range(rng.integers(1, 4)):
            c = int(rng.integers(0, 2))
            x, y = rng.uniform(0, 80, 2)
            box = [x, y, x + 20, y + 20]
            gt_boxes.append(box)
            gt_labels.append(c)
            # class 0: accurate predictions; class 1: poor ones
            if c == 0:
                pb = [x + 1, y + 1, x + 21, y + 21]
            else:
                pb = [x + 15, y + 15, x + 35, y + 35]
            pred_boxes.append(pb)
            pred_labels.append(c)
            pred_scores.append(float(rng.uniform(0.5, 1.0)))
        rows.append(
            {
                "gt_boxes": gt_boxes,
                "gt_labels": gt_labels,
                "pred_boxes": pred_boxes,
                "pred_labels": pred_labels,
                "pred_scores": pred_scores,
            }
        )
    out = per_class_ap(rd.from_items(rows), num_classes=2).to_pandas().set_index("class_idx")
    assert out.loc[0, "ap"] > 0.95     # well-localized class
    assert out.loc[1, "ap"] < 0.1      # IoU ~0.08 boxes never match
    assert out["n_gt"].sum() == out["n_pred"].sum()
