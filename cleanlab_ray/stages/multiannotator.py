"""Multi-annotator consensus + annotator quality over LONG-format labels.

Reference semantics: /root/reference/cleanlab/multiannotator.py —
majority vote with tie-breaks (get_majority_vote_label, :897-1061) and
per-annotator agreement stats (:1181-1274). The reference takes a wide
(N, M) table; at engine scale the input is long
(conv_id, turn_idx, annotator_id, label) and the whole computation is
two groupbys (SURVEY.md §2.5 multi-annotator row):

  1. groupby(example).map_groups  -> consensus label + agreement, and
     per-annotator (agree, total) contribution rows from the SAME group
     (no join needed to score annotators);
  2. groupby(annotator_id).sum    -> annotator agreement stats.

Tie-breaks (majority-vote, pred_probs absent — the reference's
pred_probs=None path): (1) minority class by global class frequency
(multiannotator.py:996-1009), (2) lowest class index (deterministic
stand-in for the reference's final random choice, documented
divergence).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

EX_KEYS = ["conv_id", "turn_idx"]


def majority_vote_consensus(ds, num_classes: int):
    """Returns (consensus Dataset, annotator stats Dataset).

    consensus: conv_id, turn_idx, consensus_label, num_annotations,
               annotator_agreement (frac agreeing with consensus).
    annotator stats: annotator_id, num_labeled, agreement_with_consensus.
    """
    from ray.data.aggregate import Count, Sum

    # pass 0: global class frequencies (tiny) for tie-break 1
    freq_df = ds.groupby("label").count().to_pandas()
    class_freq = np.zeros(num_classes, dtype=np.int64)
    for _, row in freq_df.iterrows():
        class_freq[int(row["label"])] = int(row["count()"])

    def per_example(g: pd.DataFrame) -> pd.DataFrame:
        labels = g["label"].dropna().astype(int).to_numpy()
        counts = np.bincount(labels, minlength=num_classes)
        top = counts.max()
        modes = np.nonzero(counts == top)[0]
        if len(modes) > 1:  # tie-break 1: minority class by global frequency
            min_freq = class_freq[modes].min()
            modes = modes[class_freq[modes] == min_freq]
        consensus = int(modes[0])  # tie-break 2: lowest class index
        agreement = counts[consensus] / max(len(labels), 1)
        out = pd.DataFrame(
            {
                "conv_id": [g["conv_id"].iloc[0]],
                "turn_idx": [g["turn_idx"].iloc[0]],
                "annotator_id": ["__consensus__"],
                "consensus_label": [consensus],
                "num_annotations": [len(labels)],
                "annotator_agreement": [agreement],
                "agree": [0],
                "total": [0],
            }
        )
        # per-annotator contribution rows (same group, no join)
        ann = g.dropna(subset=["label"])
        contrib = pd.DataFrame(
            {
                "conv_id": ann["conv_id"],
                "turn_idx": ann["turn_idx"],
                "annotator_id": ann["annotator_id"],
                "consensus_label": -1,
                "num_annotations": 0,
                "annotator_agreement": 0.0,
                "agree": (ann["label"].astype(int) == consensus).astype(int),
                "total": 1,
            }
        )
        return pd.concat([out, contrib], ignore_index=True)

    combined = ds.groupby(EX_KEYS).map_groups(per_example, batch_format="pandas").materialize()

    consensus = combined.filter(
        lambda row: row["annotator_id"] == "__consensus__"
    ).select_columns(
        [*EX_KEYS, "consensus_label", "num_annotations", "annotator_agreement"]
    )
    annotator_stats = (
        combined.filter(lambda row: row["annotator_id"] != "__consensus__")
        .groupby("annotator_id")
        .aggregate(Sum("agree", alias_name="n_agree"), Count(alias_name="num_labeled"))
        .map_batches(_add_agreement, batch_format="pandas")
    )
    return consensus, annotator_stats


def _add_agreement(df: pd.DataFrame) -> pd.DataFrame:
    df["agreement_with_consensus"] = df["n_agree"] / df["num_labeled"].clip(lower=1)
    return df


def generate_annotations(transcripts_table, num_annotators: int = 5, seed: int = 42,
                         coverage: float = 0.5, num_classes: int = 3):
    """Deterministic long-format annotations fixture (FIXTURES.md §4):
    per-annotator accuracy varies; ~coverage of (example, annotator)
    pairs labeled."""
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    conv = transcripts_table["conv_id"].to_pylist()
    turn = transcripts_table["turn_idx"].to_pylist()
    true = np.asarray(transcripts_table["true_label"].combine_chunks())
    n = len(conv)
    acc = np.linspace(0.95, 0.55, num_annotators)
    rows = {"conv_id": [], "turn_idx": [], "annotator_id": [], "label": []}
    for a in range(num_annotators):
        labeled = rng.random(n) < coverage
        correct = rng.random(n) < acc[a]
        wrong = (true + 1 + rng.integers(0, num_classes - 1, size=n)) % num_classes
        lab = np.where(correct, true, wrong)
        idx = np.nonzero(labeled)[0]
        rows["conv_id"].extend(conv[i] for i in idx)
        rows["turn_idx"].extend(turn[i] for i in idx)
        rows["annotator_id"].extend([f"a{a}"] * len(idx))
        rows["label"].extend(lab[idx].tolist())
    return pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], type=pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], type=pa.int32()),
            "annotator_id": pa.array(rows["annotator_id"], type=pa.string()),
            "label": pa.array(rows["label"], type=pa.int32()),
        }
    )
