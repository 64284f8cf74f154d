"""The flagship pipeline: language-ID + quality-filter + PII/toxicity
scrub over multi-turn transcript Parquet, with cleanlab's confident-joint
keep/drop decision.

Dataflow (all Ray Data, streaming executor):

  read_parquet(transcripts)
    -> map_batches(TurnScorer, actor pool)        # heuristics+scrub+langid+ppl
                                                  # +pred_probs+self-confidence
    -> aggregate pass 1: confident thresholds     # (K,) driver state
    -> aggregate pass 2: confident joint + T      # (K,K) driver state
    -> histogram aggregate + boundary pull        # exact bottom-T cutoff
    -> map_batches(issue mask + keep/drop)        # broadcast tiny state
    -> write_parquet (partitioned, lineage)       # resumable output

Decision semantics = filter_by='low_self_confidence'
(/root/reference/cleanlab/filter.py:321-337): T = num_label_issues
(off_diagonal, reduce-veto applied, /root/reference/cleanlab/count.py:129-143),
mask = bottom-T by self-confidence with deterministic (conv_id, turn_idx)
tie-break.

Two drivers:
- ``run_streaming``  — one shot, scored turns materialized in the object
  store (spills under pressure); used by bench and queries().
- ``run_resumable``  — three checkpointed phases under a work_dir with
  per-partition lineage; a killed run resumes by skipping completed
  partitions (north-rule resume contract).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from cleanlab_ray.sources import io as lio
from cleanlab_ray.stages.decision import make_issue_mask_kernel, resolve_bottom_t
from cleanlab_ray.stages.turn_scorer import TurnScorer
from cleanlab_ray.state.confident import ConfidentStats, compute_confident_stats

K = 3


def score_turns(
    ds,
    concurrency: int | tuple | None = 4,
    batch_size: int | None = None,
    keep_input_columns: bool = True,
):
    """The fused scoring stage.

    ``concurrency=None`` runs stateless tasks with a per-worker-process
    cached scorer (lowest overhead on one node); an int/tuple runs a
    bounded actor pool (the right shape when the model is heavy or
    per-stage resource isolation matters on a shared cluster).

    ``keep_input_columns=False`` drops the raw ``text``/``role``/
    ``tool``/``ts`` pass-through columns after scoring — halves the
    bytes every downstream exchange moves (scrubbed_text is kept).
    """
    from cleanlab_ray.stages.turn_scorer import turn_scorer_task

    if concurrency is None:
        scored = ds.map_batches(
            turn_scorer_task, batch_format="pyarrow", batch_size=batch_size
        )
    else:
        scored = ds.map_batches(
            TurnScorer,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    if not keep_input_columns:
        scored = scored.map_batches(
            lambda b: b.drop_columns(
                [c for c in ("text", "role", "tool", "ts") if c in b.column_names]
            ),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
    return scored


def _decision_columns(bin_lo: float, boundary_keys: set):
    mask_kernel = make_issue_mask_kernel(bin_lo, boundary_keys)

    def kernel(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = mask_kernel(batch)
        return batch.append_column("keep", pc.invert(batch["is_label_issue"]))

    return kernel


class _SideAccumulator:
    """Tiny zero-CPU actor collecting per-batch flat partials from map
    tasks (the 'side output' that lets pass 1 ride the scoring scan).
    Batches are deduped by a deterministic key so task retries cannot
    double-count. Senders fire-and-forget — no per-batch ray.get round
    trip serializing every scoring task through this actor — and the
    driver settles by row count: the partial layout's count component
    sums to the number of rows folded in, which must equal the
    materialized dataset's row count before the state is read."""

    def __init__(self, size: int):
        self.acc = np.zeros(size, dtype=np.float64)
        self.seen: set = set()

    def add(self, key, arr):
        if key in self.seen:
            return
        self.seen.add(key)
        self.acc += np.asarray(arr, dtype=np.float64)

    def get(self):
        return self.acc


def _settle_side_acc(acc_actor, expected_rows: int, k: int,
                     timeout_s: float = 30.0):
    """Read the accumulator once every fire-and-forget add has landed
    (counts sum == expected rows). Returns None on timeout — the caller
    falls back to a separate aggregate pass (correctness never depends
    on the side channel)."""
    import time

    import ray

    deadline = time.monotonic() + timeout_s
    while True:
        acc = np.asarray(ray.get(acc_actor.get.remote()))
        if int(round(acc[k:].sum())) == expected_rows:
            return acc
        if time.monotonic() > deadline:
            return None
        time.sleep(0.005)


def _make_scoring_with_side_pass1(acc_handle, k: int, drop_cols: tuple[str, ...]):
    """Scoring task that also pushes threshold partials (per-class sum /
    count of self-confidence) to the accumulator — fusing aggregate
    pass 1 into the scoring scan saves one full pass over the scored
    dataset."""
    import ray

    from cleanlab_ray.stages.turn_scorer import turn_scorer_task
    from cleanlab_ray.state.confident import (
        labels_to_numpy,
        pred_probs_to_numpy,
        threshold_partials,
    )

    def task(batch: pa.Table) -> pa.Table:
        out = turn_scorer_task(batch)
        labels = labels_to_numpy(out["label"])
        probs = pred_probs_to_numpy(out["pred_probs"]).astype(np.float64)
        sums, counts = threshold_partials(labels, probs, k)
        if out.num_rows:
            key = (str(out["conv_id"][0]), int(out["turn_idx"][0].as_py()), out.num_rows)
            # fire-and-forget: no ray.get — a blocking round trip here
            # serializes every concurrent scoring task through one actor
            acc_handle.add.remote(key, np.concatenate([sums, counts]))
        drop = [c for c in drop_cols if c in out.column_names]
        return out.drop_columns(drop) if drop else out

    return task


def _make_fused_pass2_aggfn(k: int, thresholds, num_bins: int, score_col: str):
    """Pass-2 aggregate fused with the decision histogram: one scan
    produces [cj (K,K) | n_issues | label_counts (K,) | score hist]."""
    import numpy as np
    from ray.data.aggregate import AggregateFn

    from cleanlab_ray.stages.decision import check_scores as _check_scores
    from cleanlab_ray.state.confident import cj_partials, labels_to_numpy, pred_probs_to_numpy

    thresholds = np.asarray(thresholds, dtype=np.float64)
    size = k * k + 1 + k + num_bins + 1

    def accumulate_block(acc, block):
        labels = labels_to_numpy(block["label"])
        probs = pred_probs_to_numpy(block["pred_probs"]).astype(np.float64)
        cj, n_issues, label_counts = cj_partials(labels, probs, thresholds, k)
        s = block[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        _check_scores(s, score_col)  # same loud guard as decision.py
        idx = np.clip((s * num_bins).astype(np.int64), 0, num_bins)
        hist = np.bincount(idx, minlength=num_bins + 1)
        partial = np.concatenate([cj.reshape(-1), [n_issues], label_counts, hist]).astype(
            np.float64
        )
        return np.asarray(acc, dtype=np.float64) + partial

    return AggregateFn(
        init=lambda _: np.zeros(size, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64),
        name="fused_pass2",
    )


def _pass2_block(thresholds: np.ndarray, k: int, num_bins: int, score_col: str,
                 *blocks) -> np.ndarray:
    """Per-block pass-2 partial [cj | n_issues | label_counts | hist] —
    the same math as _make_fused_pass2_aggfn.accumulate_block."""
    from cleanlab_ray.stages.decision import check_scores as _check_scores
    from cleanlab_ray.state.confident import cj_partials, labels_to_numpy, pred_probs_to_numpy

    acc = np.zeros(k * k + 1 + k + num_bins + 1, dtype=np.float64)
    for block in blocks:
        labels = labels_to_numpy(block["label"])
        probs = pred_probs_to_numpy(block["pred_probs"]).astype(np.float64)
        cj, n_issues, label_counts = cj_partials(labels, probs, thresholds, k)
        s = block[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        _check_scores(s, score_col)  # same loud guard as decision.py
        idx = np.clip((s * num_bins).astype(np.int64), 0, num_bins)
        hist = np.bincount(idx, minlength=num_bins + 1)
        acc += np.concatenate([cj.reshape(-1), [n_issues], label_counts, hist])
    return acc


def _subhist_block(b: int, num_bins: int, score_col: str, *blocks) -> np.ndarray:
    """Per-block sub-histogram partial of coarse bin ``b`` (decision
    refinement pass — see stages/decision.py subhist_block_counts)."""
    from cleanlab_ray.stages.decision import subhist_block_counts

    acc = np.zeros(num_bins, dtype=np.int64)
    for block in blocks:
        s = block[score_col].to_numpy(zero_copy_only=False)
        acc += subhist_block_counts(s, b, num_bins)
    return acc


def _boundary_block(bin_lo: float, bin_hi: float, need: int, score_col: str,
                    key_cols: tuple, *blocks) -> "pa.Table":
    import pyarrow.compute as pc

    outs = []
    for block in blocks:
        block = block.select([*key_cols, score_col])
        s = pc.cast(block[score_col], pa.float64())
        mask = pc.and_(pc.greater_equal(s, bin_lo), pc.less(s, bin_hi))
        outs.append(block.filter(mask))
    tb = pa.concat_tables(outs)
    if tb.num_rows > need:
        # map-side prune to the task's own bottom-`need` by (score,
        # keys): a boundary bin dominated by one exact tied score —
        # which refinement cannot split — returns O(tasks x need)
        # survivors to the driver, never the whole bin (same guarantee
        # decision.py gets from global_top_k)
        keys = [(score_col, "ascending")] + [(c, "ascending") for c in key_cols]
        tb = tb.take(pc.sort_indices(tb, sort_keys=keys)[:need])
    return tb


def _fanout_pass2(scored, k: int, thresholds, num_bins: int, score_col: str,
                  refs_per_task: int = 4) -> np.ndarray:
    """Raw-task pass 2 over a MATERIALIZED dataset's block refs."""
    import ray

    task = ray.remote(_pass2_block)
    refs = scored.to_arrow_refs()
    thr = np.asarray(thresholds, dtype=np.float64)
    parts = ray.get([
        task.remote(thr, k, num_bins, score_col, *refs[i : i + refs_per_task])
        for i in range(0, len(refs), refs_per_task)
    ])
    return np.sum(parts, axis=0)


def _fanout_boundary(scored, hist: np.ndarray, t: int,
                     score_col: str = "score_self_confidence",
                     key_cols: tuple = ("conv_id", "turn_idx"),
                     num_bins: int | None = None,
                     refs_per_task: int = 4):
    """resolve_bottom_t_from_hist with the boundary-bin pull as a raw
    task fan-out over the materialized block refs (same result set)."""
    import ray

    from cleanlab_ray.stages.decision import (
        DEFAULT_BINS,
        REFINE_PULL_THRESHOLD,
        refine_boundary,
    )

    num_bins = num_bins or DEFAULT_BINS
    if t <= 0:
        return 0.0, set()
    bin_lo, bin_hi, need = _resolve_boundary_bin(hist, t, num_bins)
    if need <= 0:
        return bin_lo, set()
    refs = scored.to_arrow_refs()
    b = int(round(bin_lo * num_bins))
    if b < num_bins and hist[b] > REFINE_PULL_THRESHOLD:
        # recursive histogram level: one more cheap fan-out over the
        # score column shrinks the key pull to O(N/num_bins^2)
        sub_task = ray.remote(_subhist_block)
        sub = np.sum(ray.get([
            sub_task.remote(b, num_bins, score_col, *refs[i : i + refs_per_task])
            for i in range(0, len(refs), refs_per_task)
        ]), axis=0)
        bin_lo, bin_hi, need = refine_boundary(sub, b, need, num_bins)
        if need <= 0:
            return bin_lo, set()
    task = ray.remote(_boundary_block)
    tables = ray.get([
        task.remote(bin_lo, bin_hi, need, score_col, key_cols,
                    *refs[i : i + refs_per_task])
        for i in range(0, len(refs), refs_per_task)
    ])
    boundary = pa.concat_tables([tb for tb in tables if tb.num_rows]).to_pandas()
    boundary = boundary.sort_values([score_col, *key_cols], kind="mergesort")
    chosen = boundary.head(need)
    return bin_lo, set(zip(chosen[key_cols[0]], chosen[key_cols[1]]))


def _stats_from_pass2(acc2: np.ndarray, thresholds: np.ndarray):
    """(ConfidentStats, decision histogram) from a fused-pass-2 partial
    vector [cj (K,K) | n_issues | label_counts (K,) | hist]."""
    from cleanlab_ray.state.confident import (
        ConfidentStats,
        calibrate_confident_joint,
        estimate_latent,
        finalize_confident_joint,
    )

    cj = finalize_confident_joint(acc2[: K * K].astype(np.int64).reshape(K, K))
    num_issues = int(acc2[K * K])
    label_counts = acc2[K * K + 1 : K * K + 1 + K].astype(np.int64)
    hist = acc2[K * K + 1 + K :].astype(np.int64)
    py, noise_matrix, inv_noise_matrix = estimate_latent(cj, label_counts)
    stats = ConfidentStats(
        num_classes=K,
        n=int(label_counts.sum()),
        thresholds=thresholds,
        label_counts=label_counts,
        confident_joint=cj,
        calibrated_joint=calibrate_confident_joint(cj, label_counts),
        num_issues=num_issues,
        py=py,
        noise_matrix=noise_matrix,
        inv_noise_matrix=inv_noise_matrix,
    )
    return stats, hist


def _run_checkpointed(ds, input_dir: str, concurrency, batch_size,
                      checkpoint_dir: str | None):
    """Checkpoint-mode body of run_streaming (see its docstring)."""
    import tempfile

    import numpy as np
    import ray
    import ray.data as rd

    from cleanlab_ray.stages.decision import DEFAULT_BINS
    from cleanlab_ray.state.confident import (
        make_threshold_aggfn,
        thresholds_from_partials,
    )

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="qf_scored_", dir="/tmp")
    if checkpoint_dir is None:
        # the scored corpus (~2.5x the input parquet bytes) lives here
        # until the caller is done with the returned lazy Dataset —
        # record + log the path and leave deletion to
        # cleanup_checkpoint() (auto-deleting would break the result)
        global LAST_CHECKPOINT_DIR
        LAST_CHECKPOINT_DIR = ckpt
        import logging

        logging.getLogger(__name__).info(
            "quality_filter checkpoint mode: scored corpus at %s "
            "(call cleanup_checkpoint() after consuming the result)", ckpt
        )
    side = concurrency is None
    if side:
        acc_actor = ray.remote(num_cpus=0)(_SideAccumulator).remote(2 * K)
        pipe = ds.map_batches(
            _make_scoring_with_side_pass1(
                acc_actor, K, ("text", "role", "tool", "ts")
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    else:
        pipe = score_turns(ds, concurrency, batch_size, keep_input_columns=False)
    # read -> score -> write fuses into ONE task per input block: the
    # scored corpus streams to disk, the store holds only in-flight blocks
    pipe.write_parquet(ckpt)

    n_rows = rd.read_parquet(ckpt).count()  # parquet metadata only
    acc1 = _settle_side_acc(acc_actor, n_rows, K) if side else None
    if acc1 is None:
        acc1 = np.asarray(
            rd.read_parquet(ckpt, columns=["label", "pred_probs"])
            .aggregate(make_threshold_aggfn(K))["threshold_partials"]
        )
    thresholds = thresholds_from_partials(acc1[:K], acc1[K:].astype(np.int64))

    slim = rd.read_parquet(
        ckpt, columns=["label", "pred_probs", "score_self_confidence"]
    )
    acc2 = np.asarray(
        slim.aggregate(
            _make_fused_pass2_aggfn(K, thresholds, DEFAULT_BINS,
                                    "score_self_confidence")
        )["fused_pass2"]
    )
    stats, hist = _stats_from_pass2(acc2, thresholds)

    bin_lo, boundary = _boundary_from_parquet(ckpt, hist, stats.num_issues)
    contract = [
        "conv_id", "turn_idx", "lang", "scrubbed_text",
        "score_self_confidence", "is_label_issue", "keep",
    ]
    final = rd.read_parquet(
        ckpt,
        columns=["conv_id", "turn_idx", "lang", "scrubbed_text",
                 "score_self_confidence"],
    ).map_batches(
        _decision_columns(bin_lo, boundary), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True,
    ).select_columns(contract)
    return final, stats


def _resolve_boundary_bin(hist: np.ndarray, t: int, num_bins: int):
    """Shared histogram math: which score bin holds the T-th lowest
    score, and how many rows of that bin are still needed."""
    hist = np.asarray(hist, dtype=np.int64)
    cum = np.cumsum(hist)
    b = int(np.searchsorted(cum, t))
    count_below = int(cum[b - 1]) if b > 0 else 0
    return b / num_bins, (b + 1) / num_bins, t - count_below


def _boundary_from_parquet(ckpt: str, hist: np.ndarray, t: int,
                           score_col: str = "score_self_confidence",
                           key_cols: tuple = ("conv_id", "turn_idx"),
                           num_bins: int | None = None):
    """Checkpoint-backed twin of _fanout_boundary: a column-pruned
    parquet read + one filter pass pulls only the boundary bin's rows
    (~N/num_bins of the keys, never the text)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from cleanlab_ray.stages.decision import (
        DEFAULT_BINS,
        REFINE_PULL_THRESHOLD,
        refine_boundary,
    )

    num_bins = num_bins or DEFAULT_BINS
    if t <= 0:
        return 0.0, set()
    bin_lo, bin_hi, need = _resolve_boundary_bin(hist, t, num_bins)
    if need <= 0:
        return bin_lo, set()

    b = int(round(bin_lo * num_bins))
    if b < num_bins and hist[b] > REFINE_PULL_THRESHOLD:
        # recursive histogram level over a score-only column-pruned
        # read: key pull drops to O(N/num_bins^2)
        from cleanlab_ray.stages.decision import make_subhist_aggfn

        sub = np.asarray(
            rd.read_parquet(ckpt, columns=[score_col])
            .aggregate(make_subhist_aggfn(score_col, b, num_bins))["score_subhist"],
            dtype=np.int64,
        )
        bin_lo, bin_hi, need = refine_boundary(sub, b, need, num_bins)
        if need <= 0:
            return bin_lo, set()

    def in_bin(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch[score_col], pa.float64())
        return batch.filter(pc.and_(pc.greater_equal(s, bin_lo), pc.less(s, bin_hi)))

    from cleanlab_ray.stages.topk import global_top_k

    # map-side pruned exact bottom-`need` (tie-mass-safe; see
    # stages/decision.py resolve_bottom_t_from_hist)
    chosen = global_top_k(
        rd.read_parquet(ckpt, columns=[*key_cols, score_col])
        .map_batches(in_bin, batch_format="pyarrow"),
        [score_col, *key_cols], need,
    ).to_pandas()
    return bin_lo, set(zip(chosen[key_cols[0]], chosen[key_cols[1]]))


#: scored Arrow bytes per input parquet byte (measured on the bench
#: corpus: 9.4 GB parquet -> 21.5 GB slim scored Arrow).
_SCORED_BYTES_FACTOR = 2.5


def _input_parquet_bytes(input_dir: str) -> int:
    import os

    if os.path.isfile(input_dir):
        return os.path.getsize(input_dir)
    total = 0
    # recursive: partitioned datasets nest parquet under key directories —
    # a top-level-only scan would undercount and silently skip checkpoint
    # mode on exactly the inputs that need it most
    for root, _dirs, files in os.walk(input_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


#: path of the most recent auto-created checkpoint directory (None when
#: the caller passed checkpoint_dir explicitly). The returned Dataset
#: reads the checkpoint lazily, so it CANNOT be deleted until the caller
#: has consumed the result — call cleanup_checkpoint() afterwards.
LAST_CHECKPOINT_DIR: str | None = None


def cleanup_checkpoint(path: str | None = None) -> None:
    """Delete an auto-created scored-corpus checkpoint directory (the
    one logged by run_streaming / recorded in LAST_CHECKPOINT_DIR).
    Only valid AFTER the returned Dataset has been fully consumed."""
    import shutil

    global LAST_CHECKPOINT_DIR
    target = path or LAST_CHECKPOINT_DIR
    if target and os.path.isdir(target):
        shutil.rmtree(target, ignore_errors=True)
    if target == LAST_CHECKPOINT_DIR:
        LAST_CHECKPOINT_DIR = None


def run_streaming(
    input_dir: str,
    concurrency: int | tuple = 4,
    batch_size: int | None = None,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
):
    """Returns (final Dataset with keep/drop + scrubbed_text, ConfidentStats).

    When the scored output would crowd the object store (estimated
    scored bytes > half the store's capacity), or when
    ``checkpoint_dir`` is passed explicitly, the pipeline switches to
    CHECKPOINT mode: the scoring scan streams straight to partitioned
    parquet (read->score->write fuse into one task; the store only ever
    holds in-flight blocks), and the decision passes run over
    column-pruned reads of the checkpoint (pass 2 touches only
    label/pred_probs/score — a few % of the bytes; the text is re-read
    exactly once, by the final consumer). Measured at 100M turns
    (9.4 GB input, 21.5 GB scored): materializing stalled the scoring
    scan ~2x via allocation backpressure (zero spills, pure pressure);
    checkpointing restores the linear per-row rate. This is also the
    100-TB shape — at cluster scale the scored corpus NEVER fits the
    aggregate store, so the materialize() fast path is strictly a
    small-input optimization."""
    import numpy as np
    import ray.data as rd

    from cleanlab_ray.stages.decision import DEFAULT_BINS
    from cleanlab_ray.state.confident import (
        make_threshold_aggfn,
        thresholds_from_partials,
    )

    ds = rd.read_parquet(input_dir, columns=columns, override_num_blocks=override_num_blocks)

    large = checkpoint_dir is not None
    if not large:
        import ray

        store_cap = float(ray.cluster_resources().get("object_store_memory", 0.0))
        try:
            in_bytes = _input_parquet_bytes(input_dir)
        except OSError:
            in_bytes = 0
        large = store_cap > 0 and in_bytes * _SCORED_BYTES_FACTOR > 0.5 * store_cap
    if large:
        return _run_checkpointed(
            ds, input_dir, concurrency, batch_size, checkpoint_dir
        )

    # Drop raw pass-through columns before materializing: the flagship
    # output contract is (keys, scrubbed_text, scores, keep) — halving
    # the materialized bytes keeps two consecutive runs out of
    # object-store eviction territory.
    if concurrency is None:
        # stateless-task path: aggregate pass 1 rides the scoring scan as
        # a side output (one fewer full pass over the scored dataset)
        import ray

        acc_actor = ray.remote(num_cpus=0)(_SideAccumulator).remote(2 * K)
        scored = ds.map_batches(
            _make_scoring_with_side_pass1(
                acc_actor, K, ("text", "role", "tool", "ts")
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
        ).materialize()
        acc1 = _settle_side_acc(acc_actor, scored.count(), K)
        if acc1 is None:  # side channel lost (never observed) — re-scan
            acc1 = np.asarray(
                scored.aggregate(make_threshold_aggfn(K))["threshold_partials"]
            )
    else:
        scored = score_turns(
            ds, concurrency, batch_size, keep_input_columns=False
        ).materialize()
        # pass 1: confident thresholds
        acc1 = np.asarray(scored.aggregate(make_threshold_aggfn(K))["threshold_partials"])
    thresholds = thresholds_from_partials(acc1[:K], acc1[K:].astype(np.int64))

    # pass 2 (fused): confident joint + issue count + decision histogram.
    # `scored` is already materialized, so the pass runs as a raw task
    # fan-out over its block refs — bit-identical partials to the
    # AggregateFn (same accumulate/merge), minus one Dataset-execution
    # fixed startup (~0.4 s measured; 3 post passes paid it 3x). Blocks
    # never leave the object store; only (K*K + bins) floats return.
    acc2 = _fanout_pass2(scored, K, thresholds, DEFAULT_BINS, "score_self_confidence")
    stats, hist = _stats_from_pass2(acc2, thresholds)

    # boundary-bin pull (tiny filter fan-out over the materialized block
    # refs) + final mask pass, projected to the flagship output contract
    # (keys, lang, scrubbed_text, score, keep/drop) — the diagnostic
    # columns stay queryable on `scored` but don't ride the final copy
    bin_lo, boundary = _fanout_boundary(scored, hist, stats.num_issues)
    contract = [
        "conv_id", "turn_idx", "lang", "scrubbed_text",
        "score_self_confidence", "is_label_issue", "keep",
    ]
    final = scored.map_batches(
        _decision_columns(bin_lo, boundary), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True,
    ).select_columns(contract)
    return final, stats


# ---------------------------------------------------------------------------
# Resumable three-phase driver
# ---------------------------------------------------------------------------

def _score_histogram(part_dir: str, num_bins: int = 64) -> list[int]:
    """Cheap columnar re-read of one column for the lineage record."""
    import pyarrow.parquet as pq

    counts = np.zeros(num_bins + 1, dtype=np.int64)
    for f in os.listdir(part_dir):
        if f.endswith(".parquet"):
            col = pq.read_table(
                os.path.join(part_dir, f), columns=["score_self_confidence"]
            )["score_self_confidence"]
            s = col.to_numpy(zero_copy_only=False).astype(np.float64)
            idx = np.clip((s * num_bins).astype(np.int64), 0, num_bins)
            counts += np.bincount(idx, minlength=num_bins + 1)
    return counts.tolist()


def run_resumable(
    input_dir: str,
    work_dir: str,
    num_groups: int = 8,
    concurrency: int | tuple = 4,
    batch_size: int | None = None,
):
    """Checkpointed flagship run. Safe to re-invoke after a kill: completed
    partitions (marked by _lineage.json) are skipped; the stats phase is
    skipped when stats.json exists."""
    import ray.data as rd

    scored_dir = os.path.join(work_dir, "scored")
    final_dir = os.path.join(work_dir, "final")
    stats_path = os.path.join(work_dir, "stats.json")
    groups = lio.shard_input_files(input_dir, num_groups)

    # Phase 1 — score per partition group (resumable unit = group).
    done = lio.completed_partitions(scored_dir)
    for g, files in enumerate(groups):
        if g in done:
            continue
        ds = rd.read_parquet(files)
        scored = score_turns(ds, concurrency, batch_size)
        lio.write_partition(scored, scored_dir, g, files)
        # lineage score histogram (cheap single-column re-read)
        rec_path = lio.lineage_path(scored_dir, g)
        with open(rec_path) as f:
            rec = json.load(f)
        rec["score_histogram"] = _score_histogram(lio.partition_dir(scored_dir, g))
        with open(rec_path, "w") as f:
            json.dump(rec, f, indent=1)

    # Phase 2 — global aggregates (tiny state, cached as JSON).
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            saved = json.load(f)
        stats = ConfidentStats(
            num_classes=saved["num_classes"],
            n=saved["n"],
            thresholds=np.array(saved["thresholds"]),
            label_counts=np.array(saved["label_counts"]),
            confident_joint=np.array(saved["confident_joint"]),
            calibrated_joint=np.array(saved["calibrated_joint"]),
            num_issues=saved["num_issues"],
            py=np.array(saved["py"]),
            noise_matrix=np.array(saved["noise_matrix"]),
            inv_noise_matrix=np.array(saved["inv_noise_matrix"]),
        )
        bin_lo = saved["bin_lo"]
        boundary = set(map(tuple, saved["boundary_keys"]))
    else:
        scored_all = rd.read_parquet(scored_dir)
        stats = compute_confident_stats(scored_all, K)
        bin_lo, boundary = resolve_bottom_t(scored_all, stats.num_issues)
        payload = stats.to_json_dict()
        payload["bin_lo"] = bin_lo
        payload["boundary_keys"] = [list(k) for k in boundary]
        with open(stats_path, "w") as f:
            json.dump(payload, f)

    # Phase 3 — decision + final output per partition (resumable).
    done = lio.completed_partitions(final_dir)
    for g in range(len(groups)):
        if g in done:
            continue
        part = rd.read_parquet(lio.partition_dir(scored_dir, g))
        final = part.map_batches(
            _decision_columns(bin_lo, boundary), batch_format="pyarrow",
            batch_size=None, zero_copy_batch=True,
        )
        lio.write_partition(
            final, final_dir, g, [lio.partition_dir(scored_dir, g)],
            extra={"num_issues_total": stats.num_issues},
        )
    return final_dir, stats
