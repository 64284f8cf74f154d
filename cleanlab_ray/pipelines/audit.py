"""Datalab-parity audit framework: registered issue stages over one Dataset.

Mirrors the reference's Datalab architecture
(/root/reference/cleanlab/datalab/datalab.py:151,
datalab/internal/issue_finder.py:232-320,
datalab/internal/issue_manager/issue_manager.py:67-190): a registry of
issue types, each stage appending ``is_<type>_issue`` + ``<type>_score``
columns to the audited Dataset and contributing a dataset-level summary
row; per-stage failures are caught and reported, not fatal
(issue_finder.py:315-317).

Engine differences (documented, deliberate):
- stages transform a shared Ray Dataset (columns appended per batch)
  instead of mutating a pandas issues frame;
- the kNN-graph-based managers (outlier-by-features, noniid) use the
  pred_probs-based scores or LSH approximations — exact global kNN does
  not scale (SURVEY.md §4.3.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from cleanlab_ray.state.confident import (
    compute_confident_stats,
    confident_rows,
    labels_to_numpy,
    pred_probs_to_numpy,
    reduce_issues_mask,
)

KEYS = ("conv_id", "turn_idx")


@dataclass
class AuditResult:
    dataset: "object"                      # Dataset with issue columns appended
    summaries: list = field(default_factory=list)  # [{issue_type, num_issues, score}]
    info: dict = field(default_factory=dict)
    errors: dict = field(default_factory=dict)

    def summary_frame(self):
        import pandas as pd

        return pd.DataFrame(self.summaries)

    def get_info(self, issue_name: str) -> dict:
        """Per-manager info dict (Datalab.get_info semantics)."""
        return self.info.get(issue_name, {})


# --- individual issue stages ------------------------------------------------

def _label_stage(ds, ctx):
    """Label issues: confident_learning mask + self-confidence score
    (datalab/internal/issue_manager/label.py via filter.py semantics)."""
    stats = ctx["stats"]
    thresholds = stats.thresholds
    label_col, probs_col = ctx["label_col"], ctx["probs_col"]

    def kernel(batch: pa.Table) -> pa.Table:
        labels = labels_to_numpy(batch[label_col])
        probs = pred_probs_to_numpy(batch[probs_col]).astype(np.float64)
        at_least_one, guess = confident_rows(labels, probs, thresholds)
        mask = at_least_one & (guess != labels)
        mask &= ~reduce_issues_mask(labels, probs)
        score = probs[np.arange(len(labels)), labels]
        batch = batch.append_column("is_label_issue", pa.array(mask, type=pa.bool_()))
        return batch.append_column("label_score", pa.array(score, type=pa.float32()))

    from ray.data.aggregate import Mean, Sum

    out = ds.map_batches(kernel, batch_format="pyarrow")
    agg = out.aggregate(Sum("is_label_issue", alias_name="n"), Mean("label_score", alias_name="s"))
    return out, {"issue_type": "label", "num_issues": int(agg["n"]), "score": float(agg["s"]),
                 "info": {"num_classes": stats.num_classes,
                          "confident_joint": stats.confident_joint.tolist(),
                          "noise_diagonal": np.round(stats.noise_matrix.diagonal(), 4).tolist()}}


def _outlier_stage(ds, ctx):
    """OOD score from pred_probs (outlier.py:482-564, method='entropy',
    adjust_pred_probs=True); flagged below ``outlier_threshold``."""
    from cleanlab_ray.functions.numerics import normalized_entropy
    from cleanlab_ray.functions.rank import subtract_confident_thresholds

    stats = ctx["stats"]
    thresholds = stats.thresholds
    cutoff = ctx.get("outlier_threshold", 0.1)
    probs_col = ctx["probs_col"]

    def kernel(batch: pa.Table) -> pa.Table:
        probs = pred_probs_to_numpy(batch[probs_col]).astype(np.float64)
        adj = subtract_confident_thresholds(probs, thresholds)
        score = 1.0 - normalized_entropy(adj)
        batch = batch.append_column(
            "is_outlier_issue", pa.array(score < cutoff, type=pa.bool_())
        )
        return batch.append_column("outlier_score", pa.array(score, type=pa.float32()))

    from ray.data.aggregate import Mean, Sum

    out = ds.map_batches(kernel, batch_format="pyarrow")
    agg = out.aggregate(Sum("is_outlier_issue", alias_name="n"), Mean("outlier_score", alias_name="s"))
    return out, {"issue_type": "outlier", "num_issues": int(agg["n"]), "score": float(agg["s"]),
                 "info": {"threshold": cutoff, "adjusted_by_thresholds": True}}


def _class_imbalance_stage(ds, ctx):
    """Exact reference semantics (imbalance.py:41-69): rarest class
    flagged when its prior < threshold/K; score = rarest prior for its
    rows else 1."""
    stats = ctx["stats"]
    label_col = ctx["label_col"]
    k = stats.num_classes
    class_probs = stats.label_counts / max(stats.n, 1)
    rarest = int(np.argmin(class_probs))
    threshold = ctx.get("imbalance_threshold", 0.1)
    exists = class_probs[rarest] < threshold * (1.0 / k)
    rarest_issue = rarest if exists else -1

    def kernel(batch: pa.Table) -> pa.Table:
        labels = labels_to_numpy(batch[label_col])
        score = np.where(labels == rarest, class_probs[rarest], 1.0)
        batch = batch.append_column(
            "is_class_imbalance_issue", pa.array(labels == rarest_issue, type=pa.bool_())
        )
        return batch.append_column(
            "class_imbalance_score", pa.array(score, type=pa.float32())
        )

    out = ds.map_batches(kernel, batch_format="pyarrow")
    n_issues = int(stats.label_counts[rarest]) if exists else 0
    return out, {
        "issue_type": "class_imbalance",
        "num_issues": n_issues,
        "score": float(class_probs[rarest]),
        "info": {"rarest_class": rarest, "threshold": threshold,
                 "class_probs": np.round(class_probs, 4).tolist()},
    }


def _null_stage(ds, ctx):
    """Per-row null fraction over the audited columns (null.py:36-74):
    score = non-null fraction; issue = every audited column null."""
    cols = ctx.get("null_cols")

    def kernel(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        audit_cols = cols or [
            c for c in batch.column_names
            if not c.startswith("is_") and not c.endswith("_score")
        ]
        null_counts = np.zeros(batch.num_rows, dtype=np.int64)
        for c in audit_cols:
            null_counts += pc.is_null(batch[c]).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(audit_cols)
        score = (n - null_counts) / n
        batch = batch.append_column(
            "is_null_issue", pa.array(null_counts == n, type=pa.bool_())
        )
        return batch.append_column("null_score", pa.array(score, type=pa.float32()))

    from ray.data.aggregate import Mean, Sum

    out = ds.map_batches(kernel, batch_format="pyarrow")
    agg = out.aggregate(Sum("is_null_issue", alias_name="n"), Mean("null_score", alias_name="s"))
    return out, {"issue_type": "null", "num_issues": int(agg["n"]), "score": float(agg["s"]),
                 "info": {"audited_columns": list(cols) if cols else "all data columns"}}


def _near_duplicate_stage(ds, ctx):
    """MinHash-LSH near-dup flags attached by a distributed left_outer
    key join (duplicate.py:52-120 semantics, LSH approximation) — the
    flagged-key set never lands on the driver."""
    import pyarrow.compute as pc

    from cleanlab_ray.functions.joins import attach_flags_by_key
    from cleanlab_ray.stages.dedup import near_dup_groups

    text_col = ctx.get("text_col", "text")
    flagged = near_dup_groups(
        ds, text_col=text_col, key_cols=KEYS,
        jaccard_threshold=ctx.get("jaccard_threshold", 0.8),
    )
    joined = attach_flags_by_key(ds, flagged, KEYS, {"is_near_dup": False})

    def kernel(batch: pa.Table) -> pa.Table:
        mask = batch["is_near_dup"]
        batch = batch.drop_columns(["is_near_dup"])
        batch = batch.append_column("is_near_duplicate_issue", pc.cast(mask, pa.bool_()))
        score = np.where(mask.to_numpy(zero_copy_only=False), 0.0, 1.0)
        return batch.append_column(
            "near_duplicate_score", pa.array(score, type=pa.float32())
        )

    from ray.data.aggregate import Count, Sum

    out = joined.map_batches(kernel, batch_format="pyarrow")
    agg = out.aggregate(Sum("is_near_duplicate_issue", alias_name="n"), Count(alias_name="c"))
    n = int(agg["n"] or 0)
    return out, {
        "issue_type": "near_duplicate",
        "num_issues": n,
        "score": float(1.0 - n / max(int(agg["c"]), 1)),
        "info": {"jaccard_threshold": ctx.get("jaccard_threshold", 0.8)},
    }


REGISTRY = {
    "label": _label_stage,
    "outlier": _outlier_stage,
    "class_imbalance": _class_imbalance_stage,
    "null": _null_stage,
    "near_duplicate": _near_duplicate_stage,
}


def register_issue_stage(name: str, fn):
    """User-extension hook (cleanlab's register decorator,
    issue_manager_factory.py:140-213)."""
    REGISTRY[name] = fn
    return fn


def find_issues(
    ds,
    issue_types: list[str] | dict | None = None,
    *,
    num_classes: int = 3,
    label_col: str = "label",
    probs_col: str = "pred_probs",
    **ctx_extra,
) -> AuditResult:
    """Run the registered issue stages over a (materialized or
    parquet-backed) Dataset carrying label + pred_probs columns."""
    if issue_types is None:
        issue_types = list(REGISTRY)
    if isinstance(issue_types, dict):
        names = list(issue_types)
        per_type = issue_types
    else:
        names = list(issue_types)
        per_type = {}

    stats = compute_confident_stats(ds, num_classes, label_col, probs_col)
    ctx = {"stats": stats, "label_col": label_col, "probs_col": probs_col, **ctx_extra}

    result = AuditResult(dataset=ds)
    result.info["confident_stats"] = stats.to_json_dict()
    current = ds
    for name in names:
        stage = REGISTRY.get(name)
        if stage is None:
            result.errors[name] = f"unknown issue type {name!r}"
            continue
        stage_ctx = {**ctx, **per_type.get(name, {})}
        try:
            current, summary = stage(current, stage_ctx)
            # per-manager info dict (issue_manager.py:91-150): stages
            # attach extra state under summary["info"], surfaced by
            # report(verbosity=...) and result.get_info(name)
            result.info[summary["issue_type"]] = summary.pop("info", {})
            result.summaries.append(summary)
        except Exception as exc:  # per-stage failure isolation
            result.errors[name] = f"{type(exc).__name__}: {exc}"
    result.dataset = current
    return result


def _data_valuation_stage(ds, ctx):
    """Partition-local KNN-Shapley values attached by a distributed
    left_outer key join (requires an ``embedding`` column) — the per-key
    score table never lands on the driver."""
    if "embedding" not in ds.schema().names:
        raise ValueError("data_valuation requires an 'embedding' column")
    import pyarrow.compute as pc

    from cleanlab_ray.functions.joins import attach_flags_by_key
    from cleanlab_ray.stages.valuation import data_valuation

    flagged = data_valuation(
        ds, embedding_col="embedding", label_col=ctx["label_col"], key_cols=KEYS
    )
    out = attach_flags_by_key(
        ds,
        flagged,
        KEYS,
        {"data_valuation_score": 0.5, "is_data_valuation_issue": False},
    ).map_batches(
        lambda b: b.set_column(
            b.column_names.index("data_valuation_score"),
            "data_valuation_score",
            pc.cast(b["data_valuation_score"], pa.float32()),
        ),
        batch_format="pyarrow",
    )

    from ray.data.aggregate import Mean, Sum

    agg = out.aggregate(
        Sum("is_data_valuation_issue", alias_name="n"),
        Mean("data_valuation_score", alias_name="s"),
    )
    return out, {
        "issue_type": "data_valuation",
        "num_issues": int(agg["n"] or 0),
        "score": float(agg["s"]) if agg["s"] is not None else 0.5,
        "info": {"k": 10},
    }


def _drift_stage(ds, ctx):
    """Event-time drift KS per window (requires ``ts`` + a score col)."""
    names = ds.schema().names
    score_col = ctx.get("drift_score_col", "label_score")
    if "ts" not in names or score_col not in names:
        raise ValueError(f"drift requires 'ts' and '{score_col}' columns")
    from cleanlab_ray.stages.drift import drift_by_window

    windows = drift_by_window(ds, ts_col="ts", value_col=score_col,
                              window=ctx.get("drift_window", "hour"))
    return ds, {
        "issue_type": "drift",
        "num_issues": int((windows["ks_statistic"] > ctx.get("drift_ks_threshold", 0.3)).sum()),
        "score": float(windows.attrs["dataset_score"]),
        "info": {"window": ctx.get("drift_window", "hour"),
                 "ks_threshold": ctx.get("drift_ks_threshold", 0.3),
                 "num_windows": int(len(windows))},
    }


REGISTRY["data_valuation"] = _data_valuation_stage
REGISTRY["drift"] = _drift_stage


#: Per-issue report prose, reference issue-manager `description` class
#: attrs. verbosity=0 prints only the first paragraph (issue_manager.py
#: report(): description.split("\n\n")[0]).
DESCRIPTIONS = {
    "label": (
        "Examples whose given label appears incorrect based on the "
        "model's confident predictions.\n\n"
        "Flagged via the confident-learning mask over the confident "
        "joint; per-row quality is the self-confidence score."
    ),
    "outlier": (
        "Examples that look atypical relative to the rest of the "
        "dataset.\n\n"
        "Scored as 1 - normalized entropy of threshold-adjusted "
        "pred_probs; rows below the cutoff are flagged."
    ),
    "class_imbalance": (
        "The rarest class is severely under-represented.\n\n"
        "Flagged when the rarest class prior falls below "
        "threshold / num_classes; its rows score that prior."
    ),
    "null": (
        "Examples with missing values across the audited columns.\n\n"
        "Score is the non-null column fraction; all-null rows are "
        "flagged."
    ),
    "near_duplicate": (
        "Examples that are near-copies of other examples.\n\n"
        "Detected by MinHash-LSH over the text column at the configured "
        "Jaccard threshold."
    ),
    "data_valuation": (
        "Examples contributing little (or negatively) to model "
        "performance per KNN-Shapley valuation.\n\n"
        "Values are computed inside LSH buckets and rescaled to [0, 1]."
    ),
    "drift": (
        "Event-time windows whose score distribution drifts from the "
        "global distribution.\n\n"
        "Per-window KS statistic against the pooled histogram."
    ),
    "noniid": (
        "The dataset ordering looks non-IID (e.g. sorted or "
        "drifting).\n\n"
        "kNN permutation test over collection order; the minimum-score "
        "row is flagged when the p-value is significant."
    ),
}

#: Per-issue verbosity levels (issue_manager.py verbosity_levels class
#: var): info keys added to the report at each level; higher levels
#: include everything below them, and the top level prints every key in
#: the manager's info dict.
VERBOSITY_LEVELS = {
    "label": {1: ["num_classes"], 2: ["confident_joint"], 3: ["noise_diagonal"]},
    "outlier": {1: ["threshold"], 2: ["adjusted_by_thresholds"]},
    "class_imbalance": {1: ["rarest_class", "threshold"], 2: ["class_probs"]},
    "null": {1: ["audited_columns"]},
    "near_duplicate": {1: ["jaccard_threshold"]},
    "data_valuation": {1: ["k"]},
    "drift": {1: ["window", "ks_threshold"], 2: ["num_windows"]},
    "noniid": {1: ["p_value"], 2: ["ks", "num_permutations"]},
}

_MAX_VERBOSITY = 3


def report(result: AuditResult, max_rows: int = 5,
           verbosity: int = 1,
           include_description: bool = True,
           show_summary_score: bool = False,
           show_all_issues: bool = False) -> str:
    """Human-readable audit report (Reporter semantics,
    datalab/internal/report.py:76-200): a dataset-information header, a
    prevalence-sorted summary restricted to issue types that actually
    fired (``show_all_issues=True`` keeps zero-count rows), then
    per-issue sections — description (``include_description``; verbosity
    0 keeps only its first paragraph), counts, the worst ``max_rows``
    examples by ascending score, and the manager's info keys for the
    requested ``verbosity`` (levels accumulate; ``verbosity=4`` prints
    every info key, like the reference's top level)."""
    if verbosity not in range(_MAX_VERBOSITY + 2):
        raise ValueError(
            f"Verbosity level {verbosity} not supported. Supported: "
            f"0..{_MAX_VERBOSITY}; use {_MAX_VERBOSITY + 1} for all info."
        )
    cstats = result.info.get("confident_stats", {})
    header = f"Dataset Information: num_examples: {cstats.get('n', '?')}"
    if cstats.get("num_classes"):
        header += f", num_classes: {cstats['num_classes']}"
    frame = result.summary_frame()
    any_issues = (not frame.empty) and frame["num_issues"].sum() > 0
    if not (show_all_issues or any_issues):
        return (
            "No issues found in the data. Good job!\n\n"
            "Try re-running report() with show_summary_score=True "
            "and show_all_issues=True."
        )
    lines = [header, "", "Here is a summary of various issues found in your data:", ""]
    if not frame.empty:
        frame = frame.sort_values("num_issues", ascending=False)
        if not show_all_issues:
            frame = frame[frame["num_issues"] > 0]
        shown_frame = frame if show_summary_score else frame.drop(columns=["score"])
        lines.append(shown_frame.to_string(index=False))
        if show_summary_score:
            lines.append("")
            lines.append(
                "(Note: A lower score indicates a more severe issue "
                "across all examples in the dataset.)"
            )
        lines.append("")
        lines.append(
            "Rows flagged for each issue carry an is_<type>_issue column; "
            "per-row quality is in <type>_score (lower = worse)."
        )
        lines.append("")
    shown = set(frame["issue_type"]) if not frame.empty else set()
    for s in result.summaries:
        t = s["issue_type"]
        if t not in shown and not show_all_issues:
            continue
        col = f"{t}_score"
        lines.append(f"{' ' + t + ' issues ':-^60}")
        lines.append("")
        if include_description and t in DESCRIPTIONS:
            desc = DESCRIPTIONS[t]
            if verbosity == 0:
                desc = desc.split("\n\n", maxsplit=1)[0]
            lines.append("About this issue:\n\t" + desc.replace("\n\n", "\n\t"))
            lines.append("")
        lines.append(f"Number of examples with this issue: {s['num_issues']}")
        lines.append(f"Overall dataset quality in terms of this issue: {s['score']:.4f}")
        lines.append("")
        try:
            from cleanlab_ray.stages.topk import global_top_k

            worst = global_top_k(
                result.dataset.select_columns([*KEYS, col]), col, max_rows
            ).to_pandas()
            lines.append("Examples representing most severe instances of this issue:")
            lines.append(worst.to_string(index=False))
            lines.append("")
        except Exception:
            pass
        info = result.get_info(t)
        if info:
            levels = VERBOSITY_LEVELS.get(t, {})
            keys: list[str] = []
            for lvl in range(min(verbosity, _MAX_VERBOSITY) + 1):
                keys.extend(k for k in levels.get(lvl, []) if k in info)
            if verbosity > _MAX_VERBOSITY:
                keys.extend(k for k in sorted(info) if k not in keys)
            for k in keys:
                lines.append(f"Additional Information: {k}: {info[k]}")
            if keys:
                lines.append("")
    if result.errors:
        lines.append(f"Stages skipped with errors: {result.errors}")
    return "\n".join(lines)


def _noniid_stage(ds, ctx):
    """Index-order non-IID test (noniid.py:60-446 semantics). Requires an
    ``embedding`` column and ``ctx['noniid_key']`` naming a UNIQUE
    integer column that encodes collection order (there is no implicit
    row order in a shuffled Dataset — the caller must say what 'order'
    means). Failure isolation reports a clear error otherwise."""
    names = ds.schema().names
    if "embedding" not in names:
        raise ValueError("noniid requires an 'embedding' column")
    key = ctx.get("noniid_key")
    if not key or key not in names:
        raise ValueError(
            "noniid requires ctx['noniid_key'] naming a unique integer "
            "collection-order column"
        )
    from cleanlab_ray.stages.noniid import noniid_issues

    out, info = noniid_issues(
        ds,
        embedding_col="embedding",
        key_col=key,
        k=ctx.get("noniid_k", 10),
        num_permutations=ctx.get("noniid_permutations", 25),
        seed=ctx.get("noniid_seed", 0),
    )
    from ray.data.aggregate import Sum

    n_issues = 0
    if info["p_value"] < ctx.get("noniid_significance", 0.05):
        n_issues = int(out.aggregate(Sum("is_noniid_issue", alias_name="n"))["n"] or 0)
    return ds, {
        "issue_type": "noniid",
        "num_issues": n_issues,
        "score": float(info["p_value"]),
        "info": {"p_value": float(info["p_value"]), "ks": float(info["ks"]),
                 "num_permutations": info["num_permutations"]},
    }


REGISTRY["noniid"] = _noniid_stage
