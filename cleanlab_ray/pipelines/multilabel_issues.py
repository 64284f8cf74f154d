"""Multi-label find_label_issues — one-vs-rest reduction, distributed.

Reference semantics (multilabel_classification/filter.py:13-156 +
internal/multilabel_utils.py): per class c the problem reduces to the
binary pair (labels = onehot[:, c], probs = [1-p_c, p_c]); an example
has a label issue iff ANY class's binary filter flags it.

Ray shape: one derivation map per class feeding the engine's ordinary
binary ``find_label_issues`` (all five filter strategies available),
then the per-class flag tables (compact: keys + bool) are unioned and
OR-merged with a single ``groupby(keys).max`` — K small shuffles of
flag rows, never the wide data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cleanlab_ray.state.confident import pred_probs_to_numpy
from cleanlab_ray.state.multilabel import labels_col_to_onehot


def multilabel_find_label_issues(
    ds,
    num_classes: int,
    labels_col: str = "labels",
    probs_col: str = "pred_probs",
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    filter_by: str = "prune_by_noise_rate",
):
    """Dataset[(keys..., is_label_issue)] — flagged iff any class's
    one-vs-rest binary filter flags the row."""
    from cleanlab_ray.pipelines.label_issues import find_label_issues

    per_class = []
    for c in range(num_classes):

        def derive_c(batch: pa.Table, c=c) -> pa.Table:
            onehot = labels_col_to_onehot(batch[labels_col], num_classes)
            probs = pred_probs_to_numpy(batch[probs_col]).astype(np.float64)
            p = probs[:, c]
            bin_probs = np.stack([1.0 - p, p], axis=1)
            return pa.table(
                {
                    **{k: batch[k] for k in key_cols},
                    "label": pa.array(onehot[:, c].astype(np.int64)),
                    "pred_probs": pa.FixedSizeListArray.from_arrays(
                        pa.array(bin_probs.reshape(-1)), 2
                    ),
                }
            )

        sub = ds.map_batches(derive_c, batch_format="pyarrow")
        out, _stats = find_label_issues(sub, filter_by=filter_by, num_classes=2)

        def compact(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    **{k: batch[k] for k in key_cols},
                    "_flag": pa.array(
                        batch["is_label_issue"].to_numpy(zero_copy_only=False).astype(np.int8)
                    ),
                }
            )

        per_class.append(out.map_batches(compact, batch_format="pyarrow"))

    unioned = per_class[0]
    for o in per_class[1:]:
        unioned = unioned.union(o)

    from ray.data.aggregate import Max

    merged = unioned.groupby(list(key_cols)).aggregate(Max("_flag", alias_name="_any"))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                **{k: batch[k] for k in key_cols},
                "is_label_issue": pa.array(
                    batch["_any"].to_numpy(zero_copy_only=False).astype(np.int8) > 0
                ),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow")


def common_multilabel_issues(
    ds,
    num_classes: int,
    labels_col: str = "labels",
    probs_col: str = "pred_probs",
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    filter_by: str = "prune_by_noise_rate",
):
    """Per-class issue summary (multilabel dataset.py:18-97): for every
    class, how many flagged rows have the class True in the given label
    (suggested False) and vice versa; Issue Probability = count / N.
    Driver state is O(K); each class pass is one aggregate."""
    import pandas as pd

    from cleanlab_ray.pipelines.label_issues import find_label_issues
    from ray.data.aggregate import Count, Sum

    rows = []
    n_total = None
    for c in range(num_classes):

        def derive_c(batch: pa.Table, c=c) -> pa.Table:
            onehot = labels_col_to_onehot(batch[labels_col], num_classes)
            probs = pred_probs_to_numpy(batch[probs_col]).astype(np.float64)
            p = probs[:, c]
            bin_probs = np.stack([1.0 - p, p], axis=1)
            return pa.table(
                {
                    **{k: batch[k] for k in key_cols},
                    "label": pa.array(onehot[:, c].astype(np.int64)),
                    "pred_probs": pa.FixedSizeListArray.from_arrays(
                        pa.array(bin_probs.reshape(-1)), 2
                    ),
                }
            )

        sub = ds.map_batches(derive_c, batch_format="pyarrow")
        out, _stats = find_label_issues(sub, filter_by=filter_by, num_classes=2)

        def split_counts(batch: pa.Table) -> pa.Table:
            flag = batch["is_label_issue"].to_numpy(zero_copy_only=False)
            lab = batch["label"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "_tf": pa.array((flag & (lab == 1)).astype(np.int64)),
                    "_ft": pa.array((flag & (lab == 0)).astype(np.int64)),
                }
            )

        agg = out.map_batches(split_counts, batch_format="pyarrow").aggregate(
            Sum("_tf", alias_name="tf"), Sum("_ft", alias_name="ft"),
            Count(alias_name="n"),
        )
        n_total = int(agg["n"])
        rows.append({"class_idx": c, "in_given": True,
                     "num_examples": int(agg["tf"] or 0)})
        rows.append({"class_idx": c, "in_given": False,
                     "num_examples": int(agg["ft"] or 0)})
    df = pd.DataFrame(rows)
    df["in_suggested"] = ~df["in_given"]
    df["issue_probability"] = df["num_examples"] / max(n_total or 1, 1)
    return df.sort_values("issue_probability", ascending=False).reset_index(drop=True)


def rank_classes_by_multilabel_quality(
    ds,
    num_classes: int,
    labels_col: str = "labels",
    probs_col: str = "pred_probs",
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
):
    """Per-class quality frame (multilabel dataset.py:100-188):
    Label Issues / Inverse Label Issues counts, Label Noise =
    issue probability (the implementation's definition — NOT divided by
    the class count, despite the reference docstring), quality =
    1 - noise; ordered worst-first."""
    import pandas as pd

    df = common_multilabel_issues(ds, num_classes, labels_col, probs_col, key_cols)
    rows = {}
    for _, r in df.iterrows():
        d = rows.setdefault(int(r["class_idx"]), {})
        if r["in_given"]:
            d["label_issues"] = int(r["num_examples"])
            d["label_noise"] = float(r["issue_probability"])
            d["label_quality_score"] = 1.0 - float(r["issue_probability"])
        else:
            d["inverse_label_issues"] = int(r["num_examples"])
            d["inverse_label_noise"] = float(r["issue_probability"])
    out = pd.DataFrame([{"class_idx": c, **v} for c, v in sorted(rows.items())])
    return out.sort_values("label_quality_score").reset_index(drop=True)


def overall_multilabel_health_score(
    ds,
    num_classes: int,
    labels_col: str = "labels",
    probs_col: str = "pred_probs",
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
) -> float:
    """1 - num_issue_rows / N (dataset.py:218-244): the any-class OR'd
    issue mask counted with one tiny aggregate."""
    from ray.data.aggregate import Count, Sum

    flags = multilabel_find_label_issues(
        ds, num_classes, labels_col, probs_col, key_cols
    )

    def as_int(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"_i": pa.array(
                batch["is_label_issue"].to_numpy(zero_copy_only=False).astype(np.int64))}
        )

    agg = flags.map_batches(as_int, batch_format="pyarrow").aggregate(
        Sum("_i", alias_name="s"), Count(alias_name="n")
    )
    return 1.0 - float(agg["s"] or 0) / max(int(agg["n"]), 1)
