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


# ---------------------------------------------------------------------------
# ObjectLab label-quality scores
# ---------------------------------------------------------------------------

def _ref_image_scores(lb, ll, pb, pl, pp, min_sim, overlap_check=True):
    """Loop-based re-derivation of the reference subtype math
    (rank.py:555-608, 690-747, 825-890) for the pytest oracle."""
    import numpy as np

    from cleanlab_ray.stages.object_detection import (
        OD_HIGH_PROB, OD_LOW_PROB, OD_OVERLAP_THR, od_similarity_matrix,
        _od_softmin_pool,
    )
    from cleanlab_ray.stages.object_detection import iou_matrix

    sim, iou = od_similarity_matrix(lb, pb)
    L, M = sim.shape
    overlooked = []
    for j in range(M):
        if pp[j] < OD_HIGH_PROB or (L and np.any(iou[:, j] > 0)):
            overlooked.append(np.nan)
            continue
        k_sim = sim[ll == pl[j], j] if L else np.empty(0)
        if len(k_sim) == 0:
            overlooked.append(min_sim * (1 - pp[j]))
        else:
            overlooked.append(float(k_sim.max()))
    badloc, swap = [], []
    if L and overlap_check and L > 1:
        iou_ll = iou_matrix(lb, lb)
        has_ov = [
            any(iou_ll[i, j] >= OD_OVERLAP_THR and ll[i] != ll[j]
                for j in range(L) if j != i)
            for i in range(L)
        ]
    else:
        has_ov = [False] * L
    for i in range(L):
        k = ll[i]
        k_pred = pp[pl == k] if M else np.empty(0)
        if len(k_pred) == 0 or k_pred.max() <= OD_LOW_PROB:
            badloc.append(1.0)
        else:
            m1 = (pl == k) & (pp > OD_LOW_PROB) & (iou[i] > 0)
            badloc.append(float(sim[i, m1].max()) if m1.any() else 1.0)
        if has_ov[i]:
            swap.append(min_sim)
            continue
        notk = pl != k
        if not notk.any() or np.all(pp[notk] <= OD_HIGH_PROB):
            swap.append(1.0)
            continue
        cand = notk & (pp > OD_HIGH_PROB)
        swap.append(max(min_sim, 1 - float(sim[i, cand].max())))
    return (_od_softmin_pool(np.asarray(overlooked, dtype=np.float64)),
            _od_softmin_pool(np.asarray(badloc, dtype=np.float64)),
            _od_softmin_pool(np.asarray(swap, dtype=np.float64)))


def _random_od_rows(seed, n_images=30):
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for img in range(n_images):
        L = int(rng.integers(0, 4))
        M = int(rng.integers(0, 5))
        def boxes(n):
            xy = rng.uniform(0, 80, (n, 2))
            wh = rng.uniform(5, 30, (n, 2))
            return np.concatenate([xy, xy + wh], axis=1)
        rows.append({
            "img_id": img,
            "gt_boxes": boxes(L).tolist(),
            "gt_labels": rng.integers(0, 3, L).tolist(),
            "pred_boxes": boxes(M).tolist(),
            "pred_labels": rng.integers(0, 3, M).tolist(),
            "pred_scores": rng.uniform(0, 1, M).round(2).tolist(),
        })
    return rows


def test_od_label_quality_matches_reference_math(ray_session):
    import numpy as np
    import ray.data as rd

    from cleanlab_ray.stages.object_detection import (
        OD_TINY, od_label_quality_scores, od_min_possible_similarity,
    )

    rows = _random_od_rows(11)
    ds = rd.from_items(rows)
    min_sim = od_min_possible_similarity(ds)

    # driver-side oracle
    expect = {}
    for r in rows:
        lb = np.asarray(r["gt_boxes"], dtype=np.float64).reshape(-1, 4)
        ll = np.asarray(r["gt_labels"], dtype=np.int64)
        pb = np.asarray(r["pred_boxes"], dtype=np.float64).reshape(-1, 4)
        pl = np.asarray(r["pred_labels"], dtype=np.int64)
        pp = np.asarray(r["pred_scores"], dtype=np.float64)
        o, b, s = _ref_image_scores(lb, ll, pb, pl, pp, min_sim)
        agg = float(np.exp((np.log(OD_TINY + o) + np.log(OD_TINY + b)
                            + np.log(OD_TINY + s)) / 3))
        expect[r["img_id"]] = (o, b, s, agg)

    got = od_label_quality_scores(ds).to_pandas().set_index("img_id")
    assert len(got) == len(rows)
    for img, (o, b, s, agg) in expect.items():
        row = got.loc[img]
        np.testing.assert_allclose(
            [row.score_overlooked, row.score_badloc, row.score_swap,
             row.label_quality_score], [o, b, s, agg], atol=1e-12)
    assert ((got["label_quality_score"] >= 0)
            & (got["label_quality_score"] <= 1 + 1e-12)).all()


def test_od_issues_from_scores(ray_session):
    import numpy as np
    import ray.data as rd

    from cleanlab_ray.stages.object_detection import (
        od_issues_from_scores, od_label_quality_scores,
    )

    scores = od_label_quality_scores(rd.from_items(_random_od_rows(7)))
    thr = 0.5
    out = od_issues_from_scores(scores, threshold=thr).to_pandas()
    assert (out["label_quality_score"] <= thr).all()
    vals = out["label_quality_score"].to_numpy()
    assert (np.diff(vals) >= 0).all()  # most severe first
    full = scores.to_pandas()
    assert len(out) == int((full["label_quality_score"] <= thr).sum())
