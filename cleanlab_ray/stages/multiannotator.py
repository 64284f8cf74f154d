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


# ---------------------------------------------------------------------------
# CROWDLAB — model-weighted consensus quality
# ---------------------------------------------------------------------------

def crowdlab_consensus(annotations_ds, examples_ds, num_classes: int,
                       num_join_partitions: int = 8):
    """CROWDLAB posterior label probabilities + weights, long-format.

    Reference semantics: /root/reference/cleanlab/multiannotator.py
    :1394-1526 (_get_post_pred_probs_and_weights, quality_method
    'crowdlab') and :1304-1393 (annotator-vs-annotator agreement):

      consensus_likelihood  = mean(annotator_agreement | n_annotations>1)
      most_likely_class_err = P(consensus != modal consensus class)
      annotator weight_j    = clip(1 - (1 - agreement_j)/mlc_err)
      model weight          = clip(1 - model_err/mlc_err)*sqrt(mean n)
      posterior             = weighted avg of model prior and per-
                              annotator (consensus/non-consensus
                              likelihood) votes, normalized.

    ``annotations_ds``: (conv_id, turn_idx, annotator_id, label);
    ``examples_ds``: (conv_id, turn_idx, pred_probs fixed_size_list[K]).
    All exchanges are groupbys/hash-joins on the example key; the only
    broadcast state is O(M + K) scalars.
    Returns (posterior Dataset keyed by example with post_pred_probs +
    crowdlab_label + consensus_quality, info dict with weights).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from cleanlab_ray.state.confident import pred_probs_to_numpy

    k = num_classes
    consensus, _stats = majority_vote_consensus(annotations_ds, num_classes=k)
    consensus = consensus.materialize()

    # --- scalar state (tiny aggregates over the consensus table)
    cons_df = consensus.to_pandas()  # one row per example; large-N path:
    # every quantity below is a sum/count -> Dataset.aggregate; pandas here
    # keeps the reference's exact edge-case handling readable.
    multi = cons_df["num_annotations"] != 1
    consensus_likelihood = float(cons_df.loc[multi, "annotator_agreement"].mean())
    non_consensus_likelihood = (1.0 - consensus_likelihood) / (k - 1)
    subset = cons_df.loc[multi, "consensus_label"].to_numpy()
    modal = int(np.bincount(subset, minlength=k).argmax())
    mlc_error = max(float((subset != modal).mean()), 1e-6)

    # --- per-annotator agreement-with-other-annotators (one groupby each way)
    def per_example_agreement(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n <= 1:
            return pd.DataFrame(columns=["annotator_id", "w_sum", "w_total"])
        counts = g["label"].value_counts()
        matches = g["label"].map(counts).to_numpy() - 1  # matches with others
        return pd.DataFrame(
            {
                "annotator_id": g["annotator_id"],
                "w_sum": matches.astype(float),
                "w_total": float(n - 1),
            }
        )

    from ray.data.aggregate import Sum

    contrib = annotations_ds.groupby(EX_KEYS).map_groups(
        per_example_agreement, batch_format="pandas"
    )
    agg = (
        contrib.groupby("annotator_id")
        .aggregate(Sum("w_sum", alias_name="s"), Sum("w_total", alias_name="t"))
        .to_pandas()
    )
    agg["agreement"] = agg["s"] / agg["t"].clip(lower=1e-12)
    # impute for non-overlapping annotators (reference :1337-1347)
    if agg["t"].eq(0).any():
        agg.loc[agg["t"] == 0, "agreement"] = agg.loc[agg["t"] > 0, "agreement"].mean()
    annotator_weight = {
        row["annotator_id"]: max(1.0 - (1.0 - row["agreement"]) / mlc_error, 1e-6)
        for _, row in agg.iterrows()
    }

    # --- model weight: hash-join consensus with the model priors
    # (normalize key dtypes — map_groups frames carry int64 — and explode
    # pred_probs into scalar columns: acero joins reject list payloads)
    def normalize_keys(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("turn_idx")
        return batch.set_column(i, "turn_idx", pc.cast(batch["turn_idx"], pa.int64()))

    prob_cols = [f"_p{i}" for i in range(k)]

    def explode_probs(batch: pa.Table) -> pa.Table:
        batch = normalize_keys(batch)
        probs = pred_probs_to_numpy(batch["pred_probs"]).astype(np.float64)
        batch = batch.drop_columns(["pred_probs"])
        for i in range(k):
            batch = batch.append_column(prob_cols[i], pa.array(probs[:, i]))
        return batch

    def reassemble_probs(batch: pa.Table) -> pa.Table:
        probs = np.stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in prob_cols], axis=1
        ).astype(np.float32)
        batch = batch.drop_columns(prob_cols)
        return batch.append_column(
            "pred_probs",
            pa.FixedSizeListArray.from_arrays(pa.array(probs.reshape(-1)), k),
        )

    examples_norm = examples_ds.map_batches(explode_probs, batch_format="pyarrow")
    joined = (
        examples_norm.join(
            consensus.map_batches(normalize_keys, batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_join_partitions,
            on=tuple(EX_KEYS),
        )
        .map_batches(reassemble_probs, batch_format="pyarrow")
        .materialize()
    )

    def model_err_partial(batch: pa.Table) -> pa.Table:
        probs = pred_probs_to_numpy(batch["pred_probs"]).astype(np.float64)
        cons = batch["consensus_label"].to_numpy(zero_copy_only=False)
        n_ann = batch["num_annotations"].to_numpy(zero_copy_only=False)
        m = n_ann != 1
        return pa.table(
            {
                "err": pa.array([float((probs.argmax(1)[m] != cons[m]).sum())]),
                "cnt": pa.array([float(m.sum())]),
                "n_sum": pa.array([float(n_ann.sum())]),
                "n_cnt": pa.array([float(len(n_ann))]),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    part = joined.map_batches(model_err_partial, batch_format="pyarrow").aggregate(
        _Sum("err", alias_name="err"), _Sum("cnt", alias_name="cnt"),
        _Sum("n_sum", alias_name="n_sum"), _Sum("n_cnt", alias_name="n_cnt"),
    )
    model_error = part["err"] / max(part["cnt"], 1.0)
    mean_annotations = part["n_sum"] / max(part["n_cnt"], 1.0)
    model_weight = max(1.0 - model_error / mlc_error, 1e-6) * float(np.sqrt(mean_annotations))

    # --- posterior per example: shuffle-join annotations onto the joined
    # example rows via a tagged union + groupby (annotations have no
    # pred_probs; example rows have annotator_id NULL)
    probs_type = pa.list_(pa.float32(), k)
    union_cols = [*EX_KEYS, "annotator_id", "label", "pred_probs", "is_example_row"]

    def tag_annotation(batch: pa.Table) -> pa.Table:
        batch = normalize_keys(batch)
        i = batch.column_names.index("label")
        batch = batch.set_column(i, "label", pc.cast(batch["label"], pa.int32()))
        batch = batch.append_column("pred_probs", pa.nulls(batch.num_rows, probs_type))
        batch = batch.append_column("is_example_row", pa.array([False] * batch.num_rows))
        return batch.select(union_cols)

    ann_tagged = annotations_ds.select_columns(
        [*EX_KEYS, "annotator_id", "label"]
    ).map_batches(tag_annotation, batch_format="pyarrow")

    def tag_example(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("annotator_id", pa.nulls(batch.num_rows, pa.string()))
        batch = batch.append_column("label", pa.nulls(batch.num_rows, pa.int32()))
        i = batch.column_names.index("pred_probs")
        batch = batch.set_column(i, "pred_probs", batch["pred_probs"].cast(probs_type))
        batch = batch.append_column("is_example_row", pa.array([True] * batch.num_rows))
        return batch.select(union_cols)

    ex_tagged = joined.select_columns([*EX_KEYS, "pred_probs"]).map_batches(
        tag_example, batch_format="pyarrow"
    )
    aw = annotator_weight
    cl, ncl, mw = consensus_likelihood, non_consensus_likelihood, model_weight

    def posterior(g: pd.DataFrame) -> pd.DataFrame:
        ex = g[g["is_example_row"]]
        ann = g[~g["is_example_row"]]
        if ex.empty:
            return pd.DataFrame(
                columns=[*EX_KEYS, "post_pred_probs", "crowdlab_label", "consensus_quality"]
            )
        prior = np.asarray(ex.iloc[0]["pred_probs"], dtype=np.float64)
        post = prior * mw
        total = mw
        for _, row in ann.iterrows():
            w = aw.get(row["annotator_id"], 1e-6)
            votes = np.full(len(prior), w * ncl)
            votes[int(row["label"])] = w * cl
            post += votes
            total += w
        post /= total
        lab = int(post.argmax())
        return pd.DataFrame(
            {
                EX_KEYS[0]: [ex.iloc[0][EX_KEYS[0]]],
                EX_KEYS[1]: [ex.iloc[0][EX_KEYS[1]]],
                "post_pred_probs": [post.tolist()],
                "crowdlab_label": [lab],
                "consensus_quality": [float(post[lab])],
            }
        )

    out = (
        ann_tagged.union(ex_tagged)
        .groupby(EX_KEYS)
        .map_groups(posterior, batch_format="pandas")
    )
    info = {
        "model_weight": float(model_weight),
        "annotator_weight": annotator_weight,
        "consensus_likelihood": consensus_likelihood,
        "most_likely_class_error": mlc_error,
    }
    return out, info
