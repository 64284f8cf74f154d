"""Multilabel find_label_issues vs a per-class NumPy reduction oracle."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from cleanlab_ray.pipelines.multilabel_issues import multilabel_find_label_issues


def _fixture(n=300, k=3, seed=4, noise=25):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, k)) * 2
    probs = 1.0 / (1.0 + np.exp(-logits))
    onehot = (logits > 0).astype(np.int8)
    flips = rng.choice(n, size=noise, replace=False)
    cls = rng.integers(0, k, size=noise)
    onehot[flips, cls] ^= 1
    labels = [list(np.nonzero(r)[0].astype(int)) for r in onehot]
    tbl = pa.table(
        {
            "conv_id": pa.array([str(i) for i in range(n)]),
            "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
            "labels": pa.array(labels, type=pa.list_(pa.int32())),
            "pred_probs": pa.FixedSizeListArray.from_arrays(
                pa.array(probs.reshape(-1)), k
            ),
        }
    )
    return rd.from_arrow(tbl).repartition(4), onehot, probs


def test_multilabel_issues_or_of_binary(ray_session):
    from cleanlab_ray.pipelines.label_issues import find_label_issues

    ds, onehot, probs = _fixture()
    got = (
        multilabel_find_label_issues(ds, 3)
        .to_pandas()
        .assign(i=lambda d: d.conv_id.astype(int))
        .sort_values("i")["is_label_issue"]
        .to_numpy()
    )
    # oracle: run the ENGINE's binary filter per class on the same
    # reduction and OR — checks the reduction + merge wiring exactly
    want = np.zeros(len(onehot), dtype=bool)
    for c in range(3):
        p = probs[:, c]
        sub = pa.table(
            {
                "conv_id": pa.array([str(i) for i in range(len(onehot))]),
                "turn_idx": pa.array(np.zeros(len(onehot), dtype=np.int32)),
                "label": pa.array(onehot[:, c].astype(np.int64)),
                "pred_probs": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.stack([1 - p, p], axis=1).reshape(-1)), 2
                ),
            }
        )
        out, _ = find_label_issues(rd.from_arrow(sub), num_classes=2)
        f = (
            out.to_pandas()
            .assign(i=lambda d: d.conv_id.astype(int))
            .sort_values("i")["is_label_issue"]
            .to_numpy()
        )
        want |= f
    assert (got == want).all()
    assert want.any()  # planted noise must be detectable


def test_common_issues_and_health(ray_session):
    from cleanlab_ray.pipelines.multilabel_issues import (
        common_multilabel_issues,
        overall_multilabel_health_score,
    )

    ds, onehot, probs = _fixture()
    df = common_multilabel_issues(ds, 3)
    assert len(df) == 6  # 3 classes x 2 polarities
    assert (df["issue_probability"] >= 0).all()
    assert df["num_examples"].sum() > 0
    # issue probabilities are sorted descending (reference contract)
    assert (np.diff(df["issue_probability"].to_numpy()) <= 1e-12).all()
    h = overall_multilabel_health_score(ds, 3)
    assert 0.0 <= h <= 1.0
    # health consistent with the OR'd flags
    from cleanlab_ray.pipelines.multilabel_issues import multilabel_find_label_issues
    flags = multilabel_find_label_issues(ds, 3).to_pandas()["is_label_issue"]
    assert abs(h - (1.0 - flags.mean())) < 1e-12
