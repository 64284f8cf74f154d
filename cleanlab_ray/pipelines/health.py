"""Dataset-health report from the aggregated confident joint.

Reproduces /root/reference/cleanlab/dataset.py driver-side math:
- rank_classes_by_label_quality (dataset.py:16-108)
- find_overlapping_classes      (dataset.py:111-283)
- overall_label_health_score    (dataset.py:286-358)
- health_summary                (dataset.py:361-489)

All inputs are the tiny (K,K)/(K,) reductions produced by the engine's
aggregate passes (``ConfidentStats``) — the only distributed work is the
one scan those passes already do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cleanlab_ray import EPSILON
from cleanlab_ray.state.confident import ConfidentStats, estimate_joint


def rank_classes_by_label_quality(
    stats: ConfidentStats, class_names: list[str] | None = None
) -> pd.DataFrame:
    joint = estimate_joint(stats.confident_joint, stats.label_counts)
    n = stats.n
    given_label_noise = joint.sum(axis=1) - joint.diagonal()
    true_label_noise = joint.sum(axis=0) - joint.diagonal()
    given_cond = given_label_noise / np.clip(joint.sum(axis=1), EPSILON, None)
    true_cond = true_label_noise / np.clip(joint.sum(axis=0), EPSILON, None)
    df = pd.DataFrame(
        {
            "Class Index": np.arange(len(joint)),
            "Label Issues": (given_label_noise * n).round().astype(int),
            "Inverse Label Issues": (true_label_noise * n).round().astype(int),
            "Label Noise": given_cond,
            "Inverse Label Noise": true_cond,
            "Label Quality Score": 1 - given_cond,
        }
    )
    if class_names is not None:
        df.insert(0, "Class Name", class_names)
    return df.sort_values("Label Quality Score", ascending=True).reset_index(drop=True)


def find_overlapping_classes(
    stats: ConfidentStats,
    asymmetric: bool = False,
    class_names: list[str] | None = None,
) -> pd.DataFrame:
    joint = estimate_joint(stats.confident_joint, stats.label_counts)
    n = stats.n
    if asymmetric:
        rcv = [
            (i, j, joint[i, j])
            for i in range(len(joint))
            for j in range(len(joint))
            if i != j
        ]
    else:
        sym = np.triu(joint) + np.tril(joint).T
        rcv = [
            (i, j, sym[i, j]) for i in range(len(joint)) for j in range(len(joint)) if i < j
        ]
    df = pd.DataFrame(rcv, columns=["Class Index A", "Class Index B", "Joint Probability"])
    df["Num Overlapping Examples"] = (df["Joint Probability"] * n).round().astype(int)
    if class_names is not None:
        df.insert(0, "Class Name A", [class_names[i] for i in df["Class Index A"]])
        df.insert(1, "Class Name B", [class_names[i] for i in df["Class Index B"]])
    return df.sort_values("Joint Probability", ascending=False).reset_index(drop=True)


def overall_label_health_score(stats: ConfidentStats) -> float:
    """1 - num_issues/N (dataset.py:286-358, labels+pred_probs branch —
    the engine always has the off-diagonal issue count from pass 2)."""
    return 1.0 - stats.num_issues / max(stats.n, 1)


def health_summary(
    stats: ConfidentStats, class_names: list[str] | None = None
) -> dict:
    """dataset.py:361-489: the combined report."""
    return {
        "overall_label_health_score": overall_label_health_score(stats),
        "num_examples": stats.n,
        "num_issues": stats.num_issues,
        "joint": estimate_joint(stats.confident_joint, stats.label_counts).tolist(),
        "classes_by_label_quality": rank_classes_by_label_quality(stats, class_names),
        "overlapping_classes": find_overlapping_classes(stats, class_names=class_names),
    }
