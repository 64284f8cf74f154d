"""Segmentation label quality vs a direct NumPy port of the reference
rank.py softmin / summary.py swap-count semantics."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def seg_ds(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(23)
    n, k, hw = 60, 3, 25
    labels = rng.integers(0, k, (n, hw))
    logits = rng.normal(0, 1, (n, k, hw))
    # make most pixels agree with their label, corrupt image 0 heavily
    for i in range(n):
        logits[i, labels[i], np.arange(hw)] += 2.0
    logits[0] = rng.normal(0, 1, (k, hw))  # image 0: noisy labels
    e = np.exp(logits)
    probs = (e / e.sum(axis=1, keepdims=True)).astype(np.float32)
    tbl = pa.table(
        {
            "image_id": pa.array(np.arange(n, dtype=np.int64)),
            "pixel_labels": pa.FixedSizeListArray.from_arrays(
                pa.array(labels.reshape(-1).astype(np.int32)), hw
            ),
            "pixel_pred_probs": pa.FixedSizeListArray.from_arrays(
                pa.array(probs.reshape(-1)), k * hw
            ),
        }
    )
    return rd.from_arrow(tbl), labels, probs.astype(np.float64)


def _oracle(labels, probs, T=0.1):
    n, k, hw = probs.shape
    s = probs[np.arange(n)[:, None], labels, np.arange(hw)[None, :]]
    e = np.exp((1.0 - s) / T)
    img = (s * e).sum(1) / e.sum(1)
    return s, img


def test_segmentation_scores_match_oracle(seg_ds):
    from cleanlab_ray.pipelines.segmentation import segmentation_scores

    ds, labels, probs = seg_ds
    out = segmentation_scores(ds).to_pandas().sort_values("image_id")
    s, img = _oracle(labels, probs)
    np.testing.assert_allclose(out["image_score"].to_numpy(), img, rtol=1e-9)
    np.testing.assert_array_equal(
        out["num_pixel_issues"].to_numpy(), (s < 0.1).sum(axis=1)
    )
    # the corrupted image ranks among the worst (softmin ~ min pixel, so
    # a clean image's single unlucky pixel can edge it out)
    assert 0 in set(out.nsmallest(5, "image_score")["image_id"].astype(int))
    assert int(out.loc[out["image_id"] == 0, "num_pixel_issues"].iloc[0]) >= int(
        out["num_pixel_issues"].median()
    )


def test_segmentation_pixel_scores(seg_ds):
    from cleanlab_ray.pipelines.segmentation import segmentation_pixel_scores

    ds, labels, probs = seg_ds
    out = segmentation_pixel_scores(ds).to_pandas()
    s, _ = _oracle(labels, probs)
    assert len(out) == s.size
    got = out.sort_values(["image_id", "pixel_idx"])["pixel_score"].to_numpy()
    np.testing.assert_allclose(got, s.reshape(-1), rtol=1e-9)


def test_common_label_issues(seg_ds):
    from cleanlab_ray.pipelines.segmentation import common_label_issues

    ds, labels, probs = seg_ds
    df = common_label_issues(ds, issue_threshold=0.4)
    s, _ = _oracle(labels, probs)
    pred = probs.argmax(axis=1)
    mask = (s < 0.4) & (pred != labels)
    expected = {}
    for g, p in zip(labels[mask].ravel(), pred[mask].ravel()):
        expected[(g, p)] = expected.get((g, p), 0) + 1
    got = {(r.given_label, r.predicted_label): r.num_label_issues for r in df.itertuples()}
    assert got == expected
