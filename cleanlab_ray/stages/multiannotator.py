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

    Shape: ONE sort exchange on the example key + a whole-block
    vectorized run kernel (bincount over (run, class) cells) — NOT
    groupby().map_groups, whose one-pandas-frame-per-example cost is
    per-row Python at scale. The same kernel pre-aggregates the
    per-annotator (agree, total) contributions map-side, so the
    annotator-stats groupby sees O(annotators x blocks) rows, AND the
    CROWDLAB agreement-with-other-annotators partials (w_sum, w_total —
    reference multiannotator.py:1304-1393). (The CROWDLAB pipeline
    itself uses the fully fused :func:`_crowdlab_combined` path; this
    standalone surface serves the majority-vote queries.)"""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import AggregateFn, Sum

    from cleanlab_ray.stages.dedup import _run_starts, _sorted_block_map

    k = num_classes

    # pass 0: global class frequencies for tie-break 1 — a flat bincount
    # aggregate (tree reduce), NOT groupby(label).count() (which would
    # sort-exchange every annotation row for K counters)
    def freq_accumulate(acc, block: pa.Table):
        lab = pc.fill_null(
            pc.cast(block["label"], pa.int64()), -1
        ).to_numpy(zero_copy_only=False)
        v = lab[(lab >= 0) & (lab < k)]
        return np.asarray(acc, dtype=np.int64) + np.bincount(v, minlength=k)

    class_freq = np.asarray(ds.aggregate(AggregateFn(
        init=lambda _: np.zeros(k, dtype=np.int64),
        accumulate_block=freq_accumulate,
        merge=lambda a, b: np.asarray(a, dtype=np.int64) + np.asarray(b, dtype=np.int64),
        name="class_freq",
    ))["class_freq"], dtype=np.int64)
    # lexicographic (global freq ASC, class index ASC) tie-break key
    tie_key = class_freq * np.int64(k) + np.arange(k, dtype=np.int64)

    def block_kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        turn_t = batch["turn_idx"].type
        empty = pa.table({
            "conv_id": pa.array([], type=pa.string()),
            "turn_idx": pa.array([], type=turn_t),
            "annotator_id": pa.array([], type=pa.string()),
            "consensus_label": pa.array([], type=pa.int64()),
            "num_annotations": pa.array([], type=pa.int64()),
            "annotator_agreement": pa.array([], type=pa.float64()),
            "agree": pa.array([], type=pa.int64()),
            "total": pa.array([], type=pa.int64()),
            "w_sum": pa.array([], type=pa.float64()),
            "w_total": pa.array([], type=pa.float64()),
        })
        if n == 0:
            return empty
        conv = np.asarray(batch["conv_id"].to_pandas(), dtype=object)
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
        lab = pc.fill_null(
            pc.cast(batch["label"], pa.int64()), -1
        ).to_numpy(zero_copy_only=False)
        starts = _run_starts(conv, turn)
        n_runs = len(starts)
        sizes = np.diff(np.append(starts, n))
        run_of_row = np.repeat(np.arange(n_runs, dtype=np.int64), sizes)
        valid = lab >= 0
        C = np.bincount(
            run_of_row[valid] * k + lab[valid], minlength=n_runs * k
        ).reshape(n_runs, k)
        top = C.max(axis=1)
        # among modal classes, minimize (global freq, class index)
        key = np.where(C == top[:, None], tie_key[None, :], np.iinfo(np.int64).max)
        consensus = key.argmin(axis=1).astype(np.int64)
        n_ann = C.sum(axis=1).astype(np.int64)
        agreement = C[np.arange(n_runs), consensus] / np.maximum(n_ann, 1)

        starts_arr = pa.array(starts)
        cons_tbl = pa.table({
            "conv_id": pc.cast(batch["conv_id"].take(starts_arr), pa.string()),
            "turn_idx": batch["turn_idx"].take(starts_arr),
            "annotator_id": pa.array(["__consensus__"] * n_runs, type=pa.string()),
            "consensus_label": pa.array(consensus),
            "num_annotations": pa.array(n_ann),
            "annotator_agreement": pa.array(agreement),
            "agree": pa.array(np.zeros(n_runs, dtype=np.int64)),
            "total": pa.array(np.zeros(n_runs, dtype=np.int64)),
            "w_sum": pa.array(np.zeros(n_runs, dtype=np.float64)),
            "w_total": pa.array(np.zeros(n_runs, dtype=np.float64)),
        })

        # map-side-combined per-annotator contributions (one row per
        # annotator per block): agreement-with-consensus (agree, total)
        # AND CROWDLAB agreement-with-other-annotators (w_sum = matches
        # with other labelers of the same example, w_total = (n-1) per
        # labeled multi-annotated example — multiannotator.py:1304-1393)
        rows = np.flatnonzero(valid)
        if len(rows):
            ann_ids = np.asarray(batch["annotator_id"].to_pandas(), dtype=object)[rows]
            agree_vec = (lab[rows] == consensus[run_of_row[rows]]).astype(np.int64)
            # multi / denom count VALID annotations only (n_ann, not run
            # size): a null/out-of-range label is a missing annotation
            # (reference wide-table NaN) and must not inflate the
            # agreement-with-others denominator — same convention as the
            # fused _crowdlab_run_state path
            multi = n_ann[run_of_row[rows]] > 1
            matches = np.where(
                multi, C[run_of_row[rows], lab[rows]] - 1, 0
            ).astype(np.float64)
            denom = np.where(multi, n_ann[run_of_row[rows]] - 1, 0).astype(np.float64)
            codes, uniq = pd.factorize(ann_ids)
            m = len(uniq)
            ann_ids_out = uniq.astype(object)
            agree_out = np.bincount(codes, weights=agree_vec, minlength=m).astype(np.int64)
            total_out = np.bincount(codes, minlength=m).astype(np.int64)
            wsum_out = np.bincount(codes, weights=matches, minlength=m)
            wtot_out = np.bincount(codes, weights=denom, minlength=m)
        else:
            m = 0
            ann_ids_out = np.empty(0, dtype=object)
            agree_out = total_out = np.empty(0, dtype=np.int64)
            wsum_out = wtot_out = np.empty(0, dtype=np.float64)
        if m == 0:
            return cons_tbl
        ann_tbl = pa.table({
            "conv_id": pa.array([""] * m, type=pa.string()),
            "turn_idx": pa.array(np.zeros(m, dtype=np.int64)).cast(turn_t),
            "annotator_id": pa.array(ann_ids_out, type=pa.string()),
            "consensus_label": pa.array(np.full(m, -1, dtype=np.int64)),
            "num_annotations": pa.array(np.zeros(m, dtype=np.int64)),
            "annotator_agreement": pa.array(np.zeros(m, dtype=np.float64)),
            "agree": pa.array(agree_out),
            "total": pa.array(total_out),
            "w_sum": pa.array(wsum_out),
            "w_total": pa.array(wtot_out),
        })
        return pa.concat_tables([cons_tbl, ann_tbl])

    combined = _sorted_block_map(ds, EX_KEYS, block_kernel).materialize()

    import pyarrow as pa
    import pyarrow.compute as pc

    def keep_consensus(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["annotator_id"], "__consensus__"))

    def keep_annotators(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch["annotator_id"], "__consensus__"))

    consensus = combined.map_batches(
        keep_consensus, batch_format="pyarrow"
    ).select_columns([*EX_KEYS, "consensus_label", "num_annotations", "annotator_agreement"])
    annotator_stats = (
        combined.map_batches(keep_annotators, batch_format="pyarrow")
        .groupby("annotator_id")  # M annotators — tiny group count
        .aggregate(Sum("agree", alias_name="n_agree"),
                   Sum("total", alias_name="num_labeled"),
                   Sum("w_sum", alias_name="w_sum"),
                   Sum("w_total", alias_name="w_total"))
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

def _crowdlab_class_freq_blocks(k: int, *blocks) -> np.ndarray:
    """Per-block global class-frequency partial over the tagged union's
    annotation rows (example rows carry null labels and drop out) —
    tie-break input, reference multiannotator.py:996-1009."""
    import pyarrow as pa
    import pyarrow.compute as pc

    acc = np.zeros(k, dtype=np.int64)
    for block in blocks:
        if block.num_rows == 0:
            # Ray's sort emits schema-less empty blocks when rows <
            # partition count; same guard as _crowdlab_stats_block
            continue
        lab = pc.fill_null(
            pc.cast(block["label"], pa.int64()), -1
        ).to_numpy(zero_copy_only=False)
        v = lab[(lab >= 0) & (lab < k)]
        acc += np.bincount(v, minlength=k)
    return acc


def _crowdlab_run_state(block, k: int, tie_key: np.ndarray):
    """Shared per-block run decomposition + consensus for the sorted
    tagged union (annotation rows ∪ example rows, sorted on EX_KEYS so
    equal keys are block-local). Returns the intermediate arrays both
    the stats fan-out and the posterior map derive from — ONE
    deterministic formula, so the two passes always agree."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from cleanlab_ray.stages.dedup import _run_starts

    n = block.num_rows
    conv = np.asarray(block[EX_KEYS[0]].to_pandas(), dtype=object)
    turn = block[EX_KEYS[1]].to_numpy(zero_copy_only=False)
    if n > 1 and not bool(np.all(conv[1:] >= conv[:-1])):
        # same loud precondition _sorted_block_map guards: Ray's sort
        # must hand this kernel internally-sorted blocks
        raise AssertionError(
            "crowdlab: block not sorted on conv_id; run-colocation "
            "precondition violated"
        )
    is_ex = block["is_example_row"].to_numpy(zero_copy_only=False)
    lab = pc.fill_null(
        pc.cast(block["label"], pa.int64()), -1
    ).to_numpy(zero_copy_only=False)
    starts = _run_starts(conv, turn)
    n_runs = len(starts)
    sizes = np.diff(np.append(starts, n))
    run_of_row = np.repeat(np.arange(n_runs, dtype=np.int64), sizes)
    ann_mask = ~is_ex
    valid = ann_mask & (lab >= 0)
    # count VALID annotation rows only: a null/out-of-range label is a
    # missing annotation (reference wide-table NaN) and must drop out of
    # run counts, multi-annotation masks and weight denominators exactly
    # as it drops out of the consensus bincount
    n_rows_ann = np.bincount(run_of_row[valid], minlength=n_runs)
    C = np.bincount(
        run_of_row[valid] * k + lab[valid], minlength=n_runs * k
    ).reshape(n_runs, k)
    top = C.max(axis=1)
    # among modal classes, minimize (global freq, class index)
    key = np.where(C == top[:, None], tie_key[None, :], np.iinfo(np.int64).max)
    consensus = key.argmin(axis=1).astype(np.int64)
    n_ann = C.sum(axis=1).astype(np.int64)
    agreement = C[np.arange(n_runs), consensus] / np.maximum(n_ann, 1)
    ex_rows = np.flatnonzero(is_ex)
    has_ex = np.zeros(n_runs, dtype=bool)
    ex_of_run = np.zeros(n_runs, dtype=np.int64)
    has_ex[run_of_row[ex_rows]] = True
    ex_of_run[run_of_row[ex_rows]] = ex_rows
    return dict(
        conv=conv, turn=turn, is_ex=is_ex, lab=lab, run_of_row=run_of_row,
        n_runs=n_runs, n_rows_ann=n_rows_ann, valid=valid, C=C,
        consensus=consensus, n_ann=n_ann, agreement=agreement,
        has_ex=has_ex, ex_of_run=ex_of_run,
    )


def _crowdlab_stats_block(P: int, k: int, tie_key: np.ndarray, *blocks):
    """Per-block partials for every driver-side CROWDLAB scalar, fanned
    out over the materialized sorted union (no extra exchange):

    scal = [sum(agreement | multi ann-run), n_multi ann-runs,
            consensus-class bincount over multi ann-runs (k),
            model err_0..err_{P-1} over multi joined runs,
            n multi joined runs, Σ n_ann over joined runs,
            n joined runs]
    plus per-annotator (id, w_sum, w_total) partial rows
    (reference multiannotator.py:1304-1393 agreement-with-others and
    :1466-1476 / :1607-1613 ensemble model error). A "joined" run has
    both ≥1 annotation row and an example row — the inner-join
    semantics of the reference's example⋈consensus alignment."""
    scal = np.zeros(2 + k + P + 3, dtype=np.float64)
    ids_parts, wsum_parts, wtot_parts = [], [], []
    prob_cols = [f"_q{i}" for i in range(P * k)]
    for block in blocks:
        if block.num_rows == 0:
            continue
        st = _crowdlab_run_state(block, k, tie_key)
        run_of_row, n_rows_ann = st["run_of_row"], st["n_rows_ann"]
        consensus, n_ann, agreement = st["consensus"], st["n_ann"], st["agreement"]
        lab, valid, C = st["lab"], st["valid"], st["C"]
        has_ann = n_rows_ann > 0
        multi_run = (n_ann != 1) & has_ann
        scal[0] += float(agreement[multi_run].sum())
        scal[1] += float(multi_run.sum())
        scal[2 : 2 + k] += np.bincount(consensus[multi_run], minlength=k)
        rows = np.flatnonzero(valid)
        if len(rows):
            ann_ids = np.asarray(
                block["annotator_id"].to_pandas(), dtype=object
            )[rows]
            multi = n_rows_ann[run_of_row[rows]] > 1
            matches = np.where(
                multi, C[run_of_row[rows], lab[rows]] - 1, 0
            ).astype(np.float64)
            denom = np.where(
                multi, n_rows_ann[run_of_row[rows]] - 1, 0
            ).astype(np.float64)
            codes, uniq = pd.factorize(ann_ids)
            m = len(uniq)
            ids_parts.append(uniq.astype(object))
            wsum_parts.append(np.bincount(codes, weights=matches, minlength=m))
            wtot_parts.append(np.bincount(codes, weights=denom, minlength=m))
        joined = st["has_ex"] & has_ann
        if joined.any():
            m_mask = joined & (n_ann != 1)
            if m_mask.any():
                ex_idx = st["ex_of_run"][m_mask]
                probs = np.stack(
                    [block[c].to_numpy(zero_copy_only=False)[ex_idx]
                     for c in prob_cols], axis=1
                ).astype(np.float64)
                cons_m = consensus[m_mask]
                for p in range(P):
                    sub = probs[:, p * k : (p + 1) * k]
                    scal[2 + k + p] += float((sub.argmax(1) != cons_m).sum())
                scal[2 + k + P] += float(m_mask.sum())
            scal[2 + k + P + 1] += float(n_ann[joined].sum())
            scal[2 + k + P + 2] += float(joined.sum())
    if ids_parts:
        ann_part = (
            np.concatenate(ids_parts),
            np.concatenate(wsum_parts),
            np.concatenate(wtot_parts),
        )
    else:
        ann_part = (
            np.empty(0, dtype=object),
            np.empty(0, np.float64),
            np.empty(0, np.float64),
        )
    return scal, ann_part


def _crowdlab_combined(annotations_ds, examples_ds, num_classes: int,
                       num_join_partitions: int = 8, num_models: int = 1):
    """CROWDLAB posterior label probabilities + weights, long-format.

    ``num_models`` > 1 selects the ENSEMBLE variant (reference
    multiannotator.py:351-560 get_label_quality_multiannotator_ensemble
    via :1527-1643 _get_post_pred_probs_and_weights_ensemble):
    ``examples_ds.pred_probs`` is a fixed_size_list[P*K] holding P
    model priors back to back; each model gets its own weight
    mw_p = clip(1 - err_p/mlc_err) * sqrt(mean annotations) and the
    posterior numerator sums Σ_p mw_p · prior_p — the single-model math
    is the P=1 special case, bit-identical to before.

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

    Shape — ONE exchange total: tag annotation rows and example rows
    (model priors exploded to scalar prob columns) into a uniform
    schema, union, sort on the example key (Ray's sort range-partitions
    so equal keys are block-local — the _sorted_block_map guarantee),
    materialize. Consensus, per-annotator agreement, the CROWDLAB
    global scalars AND the per-model error are then raw-task fan-outs
    over the materialized sorted block refs (the _fanout_pass2
    pattern: only O(M + P + K) floats return per task), and the
    posterior is a lazy whole-block map over the SAME blocks that
    recomputes each run's consensus from the same broadcast tie-break
    state — deterministic, so the passes agree bit-for-bit. Replaces
    the previous consensus sort + examples⋈consensus hash join +
    posterior union-sort (three exchanges, five Dataset executions)
    with one exchange and one driver barrier; the annotation text and
    model priors ride the exchange exactly once.

    ``num_join_partitions`` is retained for API compatibility; the
    fused path has no hash join.

    ``annotations_ds``: (conv_id, turn_idx, annotator_id, label);
    ``examples_ds``: (conv_id, turn_idx, pred_probs fixed_size_list[K]).
    The only broadcast state is O(M + K) scalars.
    Returns (posterior Dataset keyed by example with post_pred_probs +
    crowdlab_label + consensus_quality, info dict with weights).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray as _ray

    from cleanlab_ray.state.confident import pred_probs_to_numpy

    k = num_classes
    P = int(num_models)
    pk = P * k
    prob_f64 = [f"_q{i}" for i in range(pk)]
    union_cols = [*EX_KEYS, "annotator_id", "label", *prob_f64, "is_example_row"]

    def tag_annotation(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            EX_KEYS[0]: pc.cast(batch[EX_KEYS[0]], pa.string()),
            EX_KEYS[1]: pc.cast(batch[EX_KEYS[1]], pa.int64()),
            "annotator_id": pc.cast(batch["annotator_id"], pa.string()),
            "label": pc.cast(batch["label"], pa.int64()),
        }
        for c in prob_f64:
            cols[c] = pa.nulls(n, pa.float64())
        cols["is_example_row"] = pa.array(np.zeros(n, dtype=bool))
        return pa.table(cols).select(union_cols)

    def tag_example(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        probs = pred_probs_to_numpy(batch["pred_probs"]).astype(np.float64)
        cols = {
            EX_KEYS[0]: pc.cast(batch[EX_KEYS[0]], pa.string()),
            EX_KEYS[1]: pc.cast(batch[EX_KEYS[1]], pa.int64()),
            "annotator_id": pa.nulls(n, pa.string()),
            "label": pa.nulls(n, pa.int64()),
        }
        for j, c in enumerate(prob_f64):
            cols[c] = pa.array(probs[:, j])
        cols["is_example_row"] = pa.array(np.ones(n, dtype=bool))
        return pa.table(cols).select(union_cols)

    ann_tagged = annotations_ds.select_columns(
        [*EX_KEYS, "annotator_id", "label"]
    ).map_batches(tag_annotation, batch_format="pyarrow")
    ex_tagged = examples_ds.select_columns(
        [*EX_KEYS, "pred_probs"]
    ).map_batches(tag_example, batch_format="pyarrow")

    sorted_union = ann_tagged.union(ex_tagged).sort(EX_KEYS).materialize()
    refs = sorted_union.to_arrow_refs()

    # fan-out 0: global class frequencies for tie-break 1 (a flat
    # bincount — cheap raw tasks, no Dataset-execution fixed cost)
    freq_task = _ray.remote(_crowdlab_class_freq_blocks)
    freq_parts = _ray.get([
        freq_task.remote(k, *refs[i : i + 8]) for i in range(0, len(refs), 8)
    ]) or [np.zeros(k, dtype=np.int64)]
    class_freq = np.sum(freq_parts, axis=0).astype(np.int64)
    # lexicographic (global freq ASC, class index ASC) tie-break key
    tie_key = class_freq * np.int64(k) + np.arange(k, dtype=np.int64)

    # fan-out 1: consensus-derived scalars + per-annotator agreement
    # partials + per-model error, all from the same sorted blocks
    stats_task = _ray.remote(_crowdlab_stats_block)
    raw = _ray.get([
        stats_task.remote(P, k, tie_key, *refs[i : i + 4])
        for i in range(0, len(refs), 4)
    ])
    scal = np.sum([r[0] for r in raw], axis=0) if raw else np.zeros(
        2 + k + P + 3, dtype=np.float64)

    sum_agree = float(scal[0])
    n_multi = max(float(scal[1]), 1.0)
    class_counts = scal[2 : 2 + k]
    consensus_likelihood = sum_agree / n_multi
    non_consensus_likelihood = (1.0 - consensus_likelihood) / (k - 1)
    modal = int(class_counts.argmax())
    mlc_error = max(float(1.0 - class_counts[modal] / n_multi), 1e-6)

    # per-annotator agreement-with-other-annotators (driver-sized: M
    # annotators). Annotators appearing ONLY in single-annotation
    # examples have w_total == 0 and are dropped (their posterior
    # weight falls back to 1e-6 below).
    if raw:
        agg = pd.DataFrame({
            "annotator_id": np.concatenate([r[1][0] for r in raw]),
            "s": np.concatenate([r[1][1] for r in raw]),
            "t": np.concatenate([r[1][2] for r in raw]),
        }).groupby("annotator_id", as_index=False).sum()
    else:
        agg = pd.DataFrame({"annotator_id": [], "s": [], "t": []})
    agg = agg[agg["t"] > 0].reset_index(drop=True)
    agg["agreement"] = agg["s"] / agg["t"].clip(lower=1e-12)
    annotator_weight = {
        row["annotator_id"]: max(1.0 - (1.0 - row["agreement"]) / mlc_error, 1e-6)
        for _, row in agg.iterrows()
    }

    # model weights (reference :1466-1476 / :1607-1613)
    err = scal[2 + k : 2 + k + P]
    m_multi = float(scal[2 + k + P])
    n_ann_sum = float(scal[2 + k + P + 1])
    n_joined = float(scal[2 + k + P + 2])
    mean_annotations = n_ann_sum / max(n_joined, 1.0)
    mw_vec = np.array([
        max(1.0 - (err[p] / max(m_multi, 1.0)) / mlc_error, 1e-6)
        * float(np.sqrt(mean_annotations))
        for p in range(P)
    ], dtype=np.float64)
    model_weight = float(mw_vec[0]) if P == 1 else mw_vec

    # --- posterior per example: lazy whole-block map over the SAME
    # materialized sorted blocks (no second exchange; no per-group
    # Python). post[k] = (Σ_p prior_p[k]*mw_p + ncl*W + (cl-ncl)*W_k)
    # / (Σ_p mw_p + W), where W = sum of labeling annotators' weights
    # and W_k the per-class part — the closed form of the reference's
    # per-vote accumulation (single- and ensemble-model).
    aw_keys = np.array(sorted(annotator_weight), dtype=object)
    aw_vals = np.array([annotator_weight[a] for a in aw_keys], dtype=np.float64)
    cl, ncl = consensus_likelihood, non_consensus_likelihood
    mw_sum = float(mw_vec.sum())

    def posterior_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out_schema = {
            EX_KEYS[0]: np.empty(0, object), EX_KEYS[1]: np.empty(0, np.int64),
            "row_type": np.empty(0, object), "annotator_id": np.empty(0, object),
            "post_pred_probs": np.empty((0, k)), "crowdlab_label": np.empty(0, np.int64),
            "consensus_quality": np.empty(0, np.float64),
            "consensus_quality_score": np.empty(0, np.float64),
            "consensus_label": np.empty(0, np.int64),
            "num_annotations": np.empty(0, np.int64),
            "annotator_agreement": np.empty(0, np.float64),
            "w_sum": np.empty(0, np.float64),
            "lq": np.empty(0, np.float64), "agree": np.empty(0, np.float64),
            "multi": np.empty(0, np.float64), "label": np.empty(0, np.int64),
        }

        def emit(d):
            probs_flat = np.ascontiguousarray(d.pop("post_pred_probs")).reshape(-1)
            t = {name: pa.array(v) for name, v in d.items()}
            t["post_pred_probs"] = pa.FixedSizeListArray.from_arrays(
                pa.array(probs_flat, type=pa.float64()), k
            )
            return pa.table(t)

        if n == 0:
            return emit(out_schema)
        st = _crowdlab_run_state(batch, k, tie_key)
        conv, turn, is_ex = st["conv"], st["turn"], st["is_ex"]
        run_of_row = st["run_of_row"]
        n_runs, ex_of_run, has_ex = st["n_runs"], st["ex_of_run"], st["has_ex"]
        consensus, n_ann, agreement = st["consensus"], st["n_ann"], st["agreement"]
        # inner-join semantics: a run contributes only with BOTH an
        # example row and ≥1 annotation row
        keep_mask = has_ex & (st["n_rows_ann"] > 0)
        prior = np.stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in prob_f64], axis=1
        ).astype(np.float64)[ex_of_run].reshape(n_runs, P, k)
        # Σ_p mw_p · prior_p — for P=1 a single multiply, identical to
        # the pre-ensemble prior*mw
        prior_term = np.einsum("rpk,p->rk", prior, mw_vec)
        # valid-label annotation rows only — mirrors the stats pass
        # (rows = flatnonzero(valid)); a null label would cast to a
        # negative int64 and crash the bincount below
        ann_rows = np.flatnonzero(st["valid"] & keep_mask[run_of_row])
        ann_run = run_of_row[ann_rows]
        ann_ids = np.asarray(batch["annotator_id"].to_pandas(), dtype=object)[ann_rows]
        ann_label = st["lab"][ann_rows]
        idx = np.clip(np.searchsorted(aw_keys, ann_ids), 0, max(len(aw_keys) - 1, 0))
        if len(aw_keys):
            w = np.where(aw_keys[idx] == ann_ids, aw_vals[idx], 1e-6)
        else:
            w = np.full(len(ann_rows), 1e-6)
        W = np.bincount(ann_run, weights=w, minlength=n_runs)
        Wk = np.bincount(ann_run * k + ann_label, weights=w, minlength=n_runs * k).reshape(
            n_runs, k
        )
        post = prior_term + ncl * W[:, None] + (cl - ncl) * Wk
        post /= (mw_sum + W)[:, None]
        crowd_lab = post.argmax(axis=1)
        keep = np.flatnonzero(keep_mask)
        r = np.arange(n_runs)
        ex_out = {
            EX_KEYS[0]: conv[ex_of_run[keep]],
            EX_KEYS[1]: turn[ex_of_run[keep]].astype(np.int64),
            "row_type": np.full(len(keep), "example", dtype=object),
            "annotator_id": np.full(len(keep), None, dtype=object),
            "post_pred_probs": post[keep],
            "crowdlab_label": crowd_lab[keep],
            "consensus_quality": post[r, crowd_lab][keep],
            "consensus_quality_score": post[r, consensus][keep],
            "consensus_label": consensus[keep],
            "num_annotations": n_ann[keep],
            "annotator_agreement": agreement[keep].astype(np.float64),
            "w_sum": W[keep],
            "lq": np.full(len(keep), np.nan),
            "agree": np.full(len(keep), np.nan),
            "multi": np.full(len(keep), np.nan),
            "label": np.full(len(keep), -1, dtype=np.int64),
        }
        ann_out = {
            EX_KEYS[0]: conv[ann_rows],
            EX_KEYS[1]: turn[ann_rows].astype(np.int64),
            "row_type": np.full(len(ann_rows), "annotation", dtype=object),
            "annotator_id": ann_ids,
            "post_pred_probs": np.zeros((len(ann_rows), k)),
            "crowdlab_label": np.full(len(ann_rows), -1, dtype=np.int64),
            "consensus_quality": np.full(len(ann_rows), np.nan),
            "consensus_quality_score": np.full(len(ann_rows), np.nan),
            "consensus_label": consensus[ann_run],
            "num_annotations": np.zeros(len(ann_rows), dtype=np.int64),
            "annotator_agreement": np.full(len(ann_rows), np.nan),
            "w_sum": np.zeros(len(ann_rows)),
            "lq": post[ann_run, ann_label],
            "agree": (ann_label == consensus[ann_run]).astype(np.float64),
            "multi": (n_ann[ann_run] != 1).astype(np.float64),
            "label": ann_label,
        }
        merged = {
            name: np.concatenate([ex_out[name], ann_out[name]])
            for name in out_schema
        }
        return emit(merged)

    combined_out = sorted_union.map_batches(
        posterior_block, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    info = {
        "model_weight": model_weight,  # scalar for P=1, (P,) ndarray else
        "annotator_weight": annotator_weight,
        "consensus_likelihood": consensus_likelihood,
        "most_likely_class_error": mlc_error,
        "mean_annotations": float(mean_annotations),
        "num_classes": k,
    }
    return combined_out, info


def _filter_row_type(ds, row_type: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["row_type"], row_type))

    return ds.map_batches(keep, batch_format="pyarrow")


def crowdlab_consensus(annotations_ds, examples_ds, num_classes: int,
                       num_join_partitions: int = 8):
    """CROWDLAB posteriors per example (back-compat surface): Dataset
    [conv_id, turn_idx, post_pred_probs, crowdlab_label,
    consensus_quality] + info dict with the fitted weights."""
    combined, info = _crowdlab_combined(
        annotations_ds, examples_ds, num_classes, num_join_partitions
    )
    out = _filter_row_type(combined, "example").select_columns(
        [*EX_KEYS, "post_pred_probs", "crowdlab_label", "consensus_quality"]
    )
    return out, info


def label_quality_multiannotator(annotations_ds, examples_ds, num_classes: int,
                                 num_join_partitions: int = 8,
                                 num_models: int = 1):
    """Full get_label_quality_multiannotator analogue (reference
    multiannotator.py:46-350, quality_method='crowdlab').

    ``num_models`` > 1 selects the ENSEMBLE variant (reference :351-560):
    pred_probs is fixed_size_list[P*K] and annotator stats use the MEAN
    model weight, as the reference does (:866 'use average model weight
    when scoring annotators').

    Returns (label_quality Dataset, annotator_stats DataFrame, info):
      label_quality: conv_id, turn_idx, consensus_label,
        consensus_quality_score (= posterior prob of the majority-vote
        consensus label), annotator_agreement, num_annotations,
        crowdlab_label, consensus_quality;
      annotator_stats (M rows, driver-sized): annotator_quality =
        w*mean(annotator label quality) + (1-w)*agreement-with-consensus
        on multi-annotated examples (reference :1722-1838), plus
        num_examples_labeled and worst_class (:1839-1905; ties broken by
        lowest class index, documented divergence from random choice).
    """
    import pandas as pd

    combined, info = _crowdlab_combined(
        annotations_ds, examples_ds, num_classes, num_join_partitions,
        num_models=num_models,
    )
    combined = combined.materialize()
    label_quality = _filter_row_type(combined, "example").select_columns(
        [*EX_KEYS, "consensus_label", "consensus_quality_score",
         "annotator_agreement", "num_annotations", "crowdlab_label",
         "consensus_quality"]
    )

    from ray.data.aggregate import Count, Sum

    ann_rows = _filter_row_type(combined, "annotation")

    # ONE fused (annotator, label)-grained aggregate carries every stat the
    # reference derives from the annotation rows (:1722-1905): per-class
    # sums roll up to per-annotator means on the driver (M*K rows, tiny),
    # and agreement-restricted-to-multi rides as a product column instead
    # of a second filtered pass. Replaces three sequential Dataset
    # executions with one.
    def add_agree_multi(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        return batch.append_column(
            "agree_multi", pc.multiply(batch["agree"], batch["multi"]))

    per_class = (
        ann_rows.map_batches(add_agree_multi, batch_format="pyarrow")
        .groupby(["annotator_id", "label"])
        .aggregate(
            Count(alias_name="cnt"),
            Sum("lq", alias_name="lq_sum"),
            Sum("agree", alias_name="agree_sum"),
            Sum("multi", alias_name="multi_sum"),
            Sum("agree_multi", alias_name="agree_multi_sum"),
        )
        .to_pandas()
    )
    if len(per_class) == 0:
        raise ValueError(
            "label_quality_multiannotator: empty input — no annotations "
            "to score"
        )
    per_ann = per_class.groupby("annotator_id", as_index=False).agg(
        num_examples_labeled=("cnt", "sum"),
        _lq_sum=("lq_sum", "sum"),
        _multi_sum=("multi_sum", "sum"),
        _agree_multi_sum=("agree_multi_sum", "sum"),
    )
    per_ann["mean_lq"] = per_ann["_lq_sum"] / per_ann["num_examples_labeled"]
    per_ann["agreement_multi"] = np.where(
        per_ann["_multi_sum"] > 0,
        per_ann["_agree_multi_sum"] / per_ann["_multi_sum"].clip(lower=1e-12),
        np.nan,
    )
    stats = per_ann[
        ["annotator_id", "mean_lq", "num_examples_labeled", "agreement_multi"]
    ]
    # worst class per annotator: lowest per-class agreement (ties broken by
    # lowest class index, as before)
    per_class["class_acc"] = per_class["agree_sum"] / per_class["cnt"]
    per_class = per_class.sort_values(
        ["annotator_id", "class_acc", "label"], kind="mergesort")
    worst = per_class.groupby("annotator_id").first().reset_index()[
        ["annotator_id", "label"]
    ].rename(columns={"label": "worst_class"})
    stats = stats.merge(worst, on="annotator_id", how="left")

    aw = info["annotator_weight"]
    # ensemble: mean model weight for annotator scoring (reference :866)
    mw = float(np.mean(info["model_weight"]))
    aw_adj = sum(aw.values()) * info["mean_annotations"] / max(len(aw), 1)
    w = mw / (mw + aw_adj)
    stats["annotator_quality"] = (
        w * stats["mean_lq"] + (1.0 - w) * stats["agreement_multi"].fillna(stats["mean_lq"])
    )
    stats = stats.sort_values("annotator_quality").reset_index(drop=True)[
        ["annotator_id", "annotator_quality", "mean_lq", "agreement_multi",
         "num_examples_labeled", "worst_class"]
    ]
    return label_quality, stats, info


def active_learning_scores(annotations_ds, examples_ds, num_classes: int,
                           unlabeled_examples_ds=None,
                           num_join_partitions: int = 8):
    """ActiveLab scores (reference multiannotator.py:564-728, temperature
    fixed at 1.0 — the temp-scaling grid search is a documented
    omission).

    labeled score_i = weighted_avg((consensus_quality_score_i, 1/K);
                      weights = (w_sum_i + model_weight,
                                 avg annotator weight));
    unlabeled score = weighted_avg((max prob, 1/K);
                      weights = (model_weight, avg annotator weight)).
    Returns (labeled_scores Dataset, unlabeled_scores Dataset | None).
    """
    import pyarrow as pa

    combined, info = _crowdlab_combined(
        annotations_ds, examples_ds, num_classes, num_join_partitions
    )
    aw = info["annotator_weight"]
    avg_aw = float(np.mean(list(aw.values()))) if aw else 1.0
    mw = info["model_weight"]
    k = num_classes

    def labeled_kernel(batch: pa.Table) -> pa.Table:
        q = batch["consensus_quality_score"].to_numpy(zero_copy_only=False)
        wsum = batch["w_sum"].to_numpy(zero_copy_only=False)
        wa = wsum + mw
        score = (q * wa + (1.0 / k) * avg_aw) / (wa + avg_aw)
        return pa.table(
            {
                EX_KEYS[0]: batch[EX_KEYS[0]],
                EX_KEYS[1]: batch[EX_KEYS[1]],
                "active_learning_score": pa.array(score),
            }
        )

    labeled = _filter_row_type(combined, "example").map_batches(
        labeled_kernel, batch_format="pyarrow"
    )
    if unlabeled_examples_ds is None:
        return labeled, None

    from cleanlab_ray.state.confident import pred_probs_to_numpy

    def unlabeled_kernel(batch: pa.Table) -> pa.Table:
        probs = pred_probs_to_numpy(batch["pred_probs"]).astype(np.float64)
        q = probs.max(axis=1)
        score = (q * mw + (1.0 / k) * avg_aw) / (mw + avg_aw)
        out = {c: batch[c] for c in batch.column_names if c != "pred_probs"}
        out["active_learning_score"] = pa.array(score)
        return pa.table(out)

    unlabeled = unlabeled_examples_ds.map_batches(unlabeled_kernel, batch_format="pyarrow")
    return labeled, unlabeled


# ---------------------------------------------------------------------------
# Ensemble variants (reference multiannotator.py:351-560, :729-895)
# ---------------------------------------------------------------------------

def crowdlab_ensemble_consensus(annotations_ds, examples_ds, num_classes: int,
                                num_models: int, num_join_partitions: int = 8):
    """get_label_quality_multiannotator_ensemble analogue (reference
    multiannotator.py:351-560): CROWDLAB posteriors where the model
    prior is an ensemble of P classifiers, each weighted by its own
    agreement-derived weight (:1527-1643). ``examples_ds.pred_probs``
    is fixed_size_list[P*K] (P priors back to back). Consensus is the
    engine's deterministic majority vote (documented divergence from
    the reference's posterior-relabel pass). Returns (Dataset
    [conv_id, turn_idx, post_pred_probs, crowdlab_label,
    consensus_quality, consensus_quality_score], info) with
    info['model_weight'] the (P,) weights."""
    combined, info = _crowdlab_combined(
        annotations_ds, examples_ds, num_classes, num_join_partitions,
        num_models=num_models,
    )
    out = _filter_row_type(combined, "example").select_columns(
        [*EX_KEYS, "post_pred_probs", "crowdlab_label", "consensus_quality",
         "consensus_quality_score"]
    )
    return out, info


def active_learning_scores_ensemble(annotations_ds, examples_ds,
                                    num_classes: int, num_models: int,
                                    unlabeled_examples_ds=None,
                                    num_join_partitions: int = 8):
    """get_active_learning_scores_ensemble analogue (reference
    multiannotator.py:729-895, temp scaling fixed at 1.0 — the
    per-model temp grid search is the same documented omission as the
    single-model path).

    labeled score_i = weighted_avg((consensus_quality_score_i, 1/K);
                      weights = (w_sum_i + Σ_p mw_p, avg annotator w));
    unlabeled score = self-confidence of the ensemble-averaged
                      posterior prior (Σ_p mw_p·prior_p + avg_aw/K) /
                      (Σ mw + avg_aw) at its majority-vote argmax class
                      (:865-889).
    """
    import pyarrow as pa

    combined, info = _crowdlab_combined(
        annotations_ds, examples_ds, num_classes, num_join_partitions,
        num_models=num_models,
    )
    aw = info["annotator_weight"]
    avg_aw = float(np.mean(list(aw.values()))) if aw else 1.0
    mw_vec = np.asarray(info["model_weight"], dtype=np.float64).reshape(-1)
    mw_sum = float(mw_vec.sum())
    k = num_classes
    P = int(num_models)

    def labeled_kernel(batch: pa.Table) -> pa.Table:
        q = batch["consensus_quality_score"].to_numpy(zero_copy_only=False)
        wsum = batch["w_sum"].to_numpy(zero_copy_only=False)
        wa = wsum + mw_sum
        score = (q * wa + (1.0 / k) * avg_aw) / (wa + avg_aw)
        return pa.table(
            {
                EX_KEYS[0]: batch[EX_KEYS[0]],
                EX_KEYS[1]: batch[EX_KEYS[1]],
                "active_learning_score": pa.array(score),
            }
        )

    labeled = _filter_row_type(combined, "example").map_batches(
        labeled_kernel, batch_format="pyarrow"
    )
    if unlabeled_examples_ds is None:
        return labeled, None

    from cleanlab_ray.state.confident import pred_probs_to_numpy

    def unlabeled_kernel(batch: pa.Table) -> pa.Table:
        probs = pred_probs_to_numpy(batch["pred_probs"]).astype(np.float64)
        n = len(probs)
        pr = probs.reshape(n, P, k)
        # reference :871-889: consensus = majority vote over per-model
        # argmaxes with avg-prob tie-break -> engine divergence: argmax
        # of the ensemble-average prior (deterministic, no vote matrix)
        avg_prior = pr.mean(axis=1)
        cons = avg_prior.argmax(axis=1)
        modified = (np.einsum("npk,p->nk", pr, mw_vec)
                    + (1.0 / k) * avg_aw) / (mw_sum + avg_aw)
        score = modified[np.arange(n), cons]
        out = {c: batch[c] for c in batch.column_names if c != "pred_probs"}
        out["active_learning_score"] = pa.array(score)
        return pa.table(out)

    unlabeled = unlabeled_examples_ds.map_batches(unlabeled_kernel, batch_format="pyarrow")
    return labeled, unlabeled


def detailed_label_quality(annotations_ds, examples_ds, num_classes: int,
                           num_models: int = 1, num_join_partitions: int = 8):
    """Per-annotation label-quality scores (reference
    multiannotator.py:304-316 / :545-557 detailed_label_quality: the
    posterior probability of each annotator's chosen label) — the
    reference pivots these into an (N, M) wide frame; at engine scale
    the LONG format is the product. Returns
    Dataset[(conv_id, turn_idx, annotator_id, label, quality_annotator)].
    The scores fall out of the posterior pass's annotation rows — no
    extra exchange."""
    combined, _info = _crowdlab_combined(
        annotations_ds, examples_ds, num_classes, num_join_partitions,
        num_models=num_models,
    )
    import pyarrow as pa

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            EX_KEYS[0]: batch[EX_KEYS[0]],
            EX_KEYS[1]: batch[EX_KEYS[1]],
            "annotator_id": batch["annotator_id"],
            "label": batch["label"],
            "quality_annotator": batch["lq"],
        })

    return _filter_row_type(combined, "annotation").map_batches(
        finalize, batch_format="pyarrow"
    )


def label_quality_multiannotator_ensemble(annotations_ds, examples_ds,
                                          num_classes: int, num_models: int,
                                          num_join_partitions: int = 8):
    """get_label_quality_multiannotator_ensemble analogue (reference
    multiannotator.py:351-560): the full label-quality + annotator-stats
    surface over P ensemble model priors (pred_probs
    fixed_size_list[P*K]). Same outputs as
    :func:`label_quality_multiannotator`."""
    return label_quality_multiannotator(
        annotations_ds, examples_ds, num_classes,
        num_join_partitions=num_join_partitions, num_models=num_models)
