"""Job-submission CLI: the ``ray job submit`` entry surface.

The north-rule deployment shape is ``ray job submit -- python -m
cleanlab_ray <subcommand> ...`` against a running cluster; locally the
same commands run standalone (the CLI owns the Ray session — it inits
only if no session exists, so it also composes with a caller-managed
session, e.g. the test fixture).

Subcommands
-----------
quality-filter   resumable flagship run (score → global stats →
                 keep/drop decision), per-partition parquet + lineage;
                 re-invoking after a kill skips finished partitions
                 (pipelines/quality_filter.run_resumable).
curate           end-to-end document curation flags
                 (pipelines/corpus_curation.curate_documents).
dedup-state      persisted-state incremental ingestion
                 (stages/incremental): build / update / flags / compact.

Every subcommand prints ONE summary JSON line to stdout and (with
``--metrics-out``) writes the same payload to a file — the metrics
artifact the north rule asks a submitted job to leave behind.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _ray_session(args):
    """Init Ray only if the process has no session; return whether we
    own it (and must shut it down)."""
    import ray

    if ray.is_initialized():
        return False
    kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
    if args.num_cpus is not None:
        kwargs["num_cpus"] = args.num_cpus
    ray.init(address=args.address, **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return True


def _emit(payload: dict, metrics_out: str | None):
    line = json.dumps(payload)
    print(line)
    if metrics_out:
        with open(metrics_out, "w") as f:
            f.write(line + "\n")


def _cmd_quality_filter(args) -> dict:
    from cleanlab_ray.pipelines.quality_filter import run_resumable
    from cleanlab_ray.sources import io as lio

    t0 = time.perf_counter()
    final_dir, stats = run_resumable(
        args.input, args.work_dir,
        num_groups=args.num_groups,
        concurrency=args.concurrency,
        batch_size=args.batch_size,
    )
    lineage = lio.read_lineage(final_dir)
    return {
        "command": "quality-filter",
        "final_dir": final_dir,
        "partitions": len(lineage),
        "rows": int(sum(r.get("rows_written", 0) for r in lineage)),
        "num_issues": int(stats.num_issues),
        "num_classes": int(stats.num_classes),
        "wall_sec": round(time.perf_counter() - t0, 3),
    }


def _cmd_curate(args) -> dict:
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.pipelines.corpus_curation import curate_documents

    t0 = time.perf_counter()
    ds = rd.read_parquet(args.input, columns=[args.key_col, args.text_col])
    out = curate_documents(ds, text_col=args.text_col, key_col=args.key_col)
    out = out.materialize()
    out.write_parquet(args.output)

    flag_cols = ["lang_ok", "quality_ok", "canonical", "dup_ok", "keep"]

    def to_counts(batch: pa.Table) -> pa.Table:
        return pa.table({
            c: pa.array([int(np.count_nonzero(
                batch[c].to_numpy(zero_copy_only=False)))], type=pa.int64())
            for c in flag_cols
        })

    counts = (
        out.map_batches(to_counts, batch_format="pyarrow", batch_size=None)
        .sum(flag_cols)
    )
    return {
        "command": "curate",
        "output": args.output,
        "rows": out.count(),
        **{f"n_{c}": int(counts[f"sum({c})"]) for c in flag_cols},
        "wall_sec": round(time.perf_counter() - t0, 3),
    }


def _cmd_remove_substrings(args) -> dict:
    import ray.data as rd

    from cleanlab_ray.stages.substr_removal import remove_dup_substrings

    t0 = time.perf_counter()
    ds = rd.read_parquet(args.input, columns=[args.key_col, args.text_col])
    out = remove_dup_substrings(
        ds, text_col=args.text_col, key_col=args.key_col,
        span_k=args.span_k).materialize()
    out.write_parquet(args.output)
    removed = int(out.sum("n_removed_bytes") or 0)
    return {
        "command": "remove-substrings",
        "output": args.output,
        "rows": out.count(),
        "removed_bytes": removed,
        "wall_sec": round(time.perf_counter() - t0, 3),
    }


def _cmd_transcript_audit(args) -> dict:
    """Run the per-conversation audit family over a transcript corpus,
    one parquet directory per audit under --output. Audits whose
    required columns are missing from the input schema are skipped
    (reported in the summary) — the corpus decides, not a flag."""
    import ray.data as rd

    from cleanlab_ray.stages import transcripts as tr

    t0 = time.perf_counter()
    ds = rd.read_parquet(args.input)
    cols = set(ds.schema().names)
    c, t = args.conv_col, args.turn_col

    audits = {
        "structure": (
            {c, t, "role", "tool", "text", "ts"},
            lambda d: tr.conv_structure_stats(d, conv_col=c, turn_col=t)),
        "latency": (
            {c, t, "role", "ts"},
            lambda d: tr.turn_latency(d, conv_col=c, turn_col=t)),
        "sessions": (
            {c, t, "ts"},
            lambda d: tr.latency_sessions(d, conv_col=c, turn_col=t,
                                          gap_us=args.session_gap_us)),
        "tool_loops": (
            {c, t, "tool"},
            lambda d: tr.tool_loops(d, conv_col=c, turn_col=t)),
        "refusals": (
            {c, t, "role", "text"},
            lambda d: tr.refusal_rate(d, conv_col=c, turn_col=t)),
        "pii": (
            {c, "text"},
            lambda d: tr.pii_density(d, conv_col=c)),
        "context": (
            {c, t, "text"},
            lambda d: tr.context_growth(d, conv_col=c, turn_col=t,
                                        budget_chars=args.budget_chars)),
        "lang_mix": (
            {c, t, "lang"},
            lambda d: tr.conv_lang_mix(d, conv_col=c, turn_col=t)),
    }
    def write_atomic(result_ds, dest: str) -> int:
        """write_parquet into a tmp dir + rename: a kill mid-write
        leaves only the tmp dir, so an existing ``dest`` is always a
        COMPLETE audit — the invariant --skip-existing relies on.
        Re-runs without --skip-existing replace (never append into)
        a prior dest."""
        import shutil

        tmp = dest + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        out = result_ds.materialize()
        out.write_parquet(tmp)
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        os.rename(tmp, dest)
        return out.count()

    def done(dest: str) -> bool:
        return (args.skip_existing and os.path.isdir(dest)
                and bool(os.listdir(dest)))

    ran, skipped, not_fused = {}, [], []
    if args.fused:
        # one sort exchange for the whole family (conv_audit_full);
        # requires the full transcript schema
        need = {c, t, "role", "text", "tool", "ts"}
        if not need <= cols:
            missing = sorted(need - cols)
            raise SystemExit(f"--fused needs columns {missing}")
        dest = f"{args.output.rstrip('/')}/full"
        if done(dest):
            ran["full"] = "kept"
        else:
            ran["full"] = write_atomic(
                tr.conv_audit_full(
                    ds, conv_col=c, turn_col=t,
                    session_gap_us=args.session_gap_us,
                    budget_chars=args.budget_chars), dest)
        # lang_mix is outside the fused family — report it as
        # not-fused (if runnable) or missing-columns (if not), never
        # conflating the two
        if audits["lang_mix"][0] <= cols:
            not_fused.append("lang_mix")
        else:
            skipped.append("lang_mix")
    else:
        for name, (need, fn) in audits.items():
            if not need <= cols:
                skipped.append(name)
                continue
            dest = f"{args.output.rstrip('/')}/{name}"
            if done(dest):
                ran[name] = "kept"  # resumed run: audit already on disk
                continue
            ran[name] = write_atomic(fn(ds), dest)
    payload = {
        "command": "transcript-audit",
        "output": args.output,
        "audits": ran,
        "skipped_missing_columns": skipped,
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    if not_fused:
        payload["not_in_fused_mode"] = not_fused
    return payload


def _cmd_conv_split(args) -> dict:
    """Near-dup-aware conversation train/holdout split: one row per
    conversation (conv_id, group_root, split), written as parquet."""
    import ray.data as rd

    from cleanlab_ray.stages.transcripts import conv_dedup_safe_split

    t0 = time.perf_counter()
    ds = rd.read_parquet(args.input, columns=[args.conv_col, args.text_col])
    out = conv_dedup_safe_split(
        ds, train_frac=args.train_frac, conv_col=args.conv_col,
        text_col=args.text_col).materialize()
    out.write_parquet(args.output)
    import pyarrow as pa

    def counts(batch: pa.Table) -> pa.Table:
        import numpy as np
        s = batch["split"].to_numpy(zero_copy_only=False)
        return pa.table({
            "train": pa.array([int((s == "train").sum())], pa.int64()),
            "holdout": pa.array([int((s == "holdout").sum())], pa.int64()),
        })

    agg = out.map_batches(counts, batch_format="pyarrow",
                          batch_size=None).sum(["train", "holdout"])
    return {
        "command": "conv-split",
        "output": args.output,
        "convs": out.count(),
        "n_train": int(agg["sum(train)"]),
        "n_holdout": int(agg["sum(holdout)"]),
        "wall_sec": round(time.perf_counter() - t0, 3),
    }


def _cmd_dedup_state(args) -> dict:
    import ray.data as rd

    from cleanlab_ray.stages import incremental as inc

    t0 = time.perf_counter()
    payload: dict = {"command": f"dedup-state {args.action}",
                     "state": args.state}
    if args.action == "build":
        ds = rd.read_parquet(args.input,
                             columns=[args.key_col, args.text_col])
        inc.build_dedup_state(ds, args.state, text_col=args.text_col,
                              num_perm=args.num_perm, bands=args.bands,
                              shingle_k=args.shingle_k,
                              overwrite=args.overwrite)
        payload["docs"] = ds.count()
    elif args.action == "update":
        ds = rd.read_parquet(args.input,
                             columns=[args.key_col, args.text_col])
        inc.update_dedup_state(ds, args.state, text_col=args.text_col)
        payload["docs"] = ds.count()
    elif args.action == "flags":
        ds = rd.read_parquet(args.input,
                             columns=[args.key_col, args.text_col])
        flags = inc.incremental_flags(ds, args.state, key_col=args.key_col,
                                      text_col=args.text_col).materialize()
        flags.write_parquet(args.output)
        if args.and_update:
            # the daily-ingest one-liner: after flagging, fold the
            # delta's keys into the state (order matters — flags first,
            # so the delta is judged against the PRE-delta corpus)
            inc.update_dedup_state(ds, args.state, text_col=args.text_col)
            payload["updated"] = True
        payload["output"] = args.output
        payload["rows"] = flags.count()
        import numpy as np
        import pyarrow as pa

        flag_cols = ["exact_dup_corpus", "exact_dup_new",
                     "near_dup_corpus", "keep"]

        def to_counts(batch: pa.Table) -> pa.Table:
            return pa.table({
                c: pa.array([int(np.count_nonzero(
                    batch[c].to_numpy(zero_copy_only=False)))],
                    type=pa.int64())
                for c in flag_cols
            })

        agg = flags.map_batches(to_counts, batch_format="pyarrow",
                                batch_size=None).sum(flag_cols)
        for c in flag_cols:
            payload[f"n_{c}"] = int(agg[f"sum({c})"])
    else:  # compact
        inc.compact_dedup_state(args.state)
    payload["wall_sec"] = round(time.perf_counter() - t0, 3)
    return payload


def build_parser() -> argparse.ArgumentParser:
    # the shared flags are valid before OR after the subcommand; they
    # default to SUPPRESS so a subparser never overwrites a value the
    # root already parsed (the classic argparse-parents pitfall — note
    # set_defaults would ALSO clobber this, it mutates the action
    # objects the parsers share, so the real defaults are filled in
    # main() after parsing)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--address", default=argparse.SUPPRESS,
                        help="Ray address ('local' starts a local cluster; "
                             "'auto' joins the cluster a ray job runs in)")
    common.add_argument("--num-cpus", type=int, default=argparse.SUPPRESS,
                        help="num_cpus for a locally started session")
    common.add_argument("--metrics-out", default=argparse.SUPPRESS,
                        help="also write the summary JSON line to this file")
    p = argparse.ArgumentParser(
        prog="python -m cleanlab_ray",
        description="Ray-Data quality-filter / curation / dedup jobs",
        parents=[common],
    )
    sub = p.add_subparsers(dest="command", required=True)

    qf = sub.add_parser("quality-filter", help="resumable flagship run",
                        parents=[common])
    qf.add_argument("--input", required=True,
                    help="parquet dir of transcripts (conv_id, turn_idx, "
                         "role, text, tool, ts)")
    qf.add_argument("--work-dir", required=True,
                    help="checkpoint root: scored/ final/ stats.json")
    qf.add_argument("--num-groups", type=int, default=8,
                    help="resumable partition count (one lineage record "
                         "+ parquet dir each)")
    qf.add_argument("--concurrency", type=int, default=None,
                    help="scorer actor-pool size; default: stateless "
                         "tasks (no pool — deadlock-proof on small "
                         "clusters, lowest overhead on one node). Set "
                         "an int only when the cluster has CPUs to "
                         "spare beyond the pool (each actor holds its "
                         "CPU for the pool's lifetime).")
    qf.add_argument("--batch-size", type=int, default=None)
    qf.set_defaults(fn=_cmd_quality_filter)

    cu = sub.add_parser("curate", help="document curation flags",
                        parents=[common])
    cu.add_argument("--input", required=True)
    cu.add_argument("--output", required=True)
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--key-col", default="doc_id")
    cu.set_defaults(fn=_cmd_curate)

    rs = sub.add_parser("remove-substrings",
                        help="cut cross-document duplicated substrings "
                             "(Lee et al. ExactSubstr)",
                        parents=[common])
    rs.add_argument("--input", required=True)
    rs.add_argument("--output", required=True)
    rs.add_argument("--text-col", default="text")
    rs.add_argument("--key-col", default="doc_id")
    rs.add_argument("--span-k", type=int, default=50,
                    help="window size in bytes (50 = Lee et al. default)")
    rs.set_defaults(fn=_cmd_remove_substrings)

    ta = sub.add_parser("transcript-audit",
                        help="per-conversation audit family (structure, "
                             "latency, sessions, tool loops, refusals, "
                             "PII, context growth, language mix)",
                        parents=[common])
    ta.add_argument("--input", required=True,
                    help="parquet dir of transcripts")
    ta.add_argument("--output", required=True,
                    help="root dir: one parquet dir per audit")
    ta.add_argument("--conv-col", default="conv_id")
    ta.add_argument("--turn-col", default="turn_idx")
    ta.add_argument("--session-gap-us", type=int, default=5_000_000)
    ta.add_argument("--budget-chars", type=int, default=1500)
    ta.add_argument("--skip-existing", action="store_true",
                    help="resume: skip audits whose output dir already "
                         "has files (a killed multi-audit run re-runs "
                         "only the missing audits)")
    ta.add_argument("--fused", action="store_true",
                    help="run all seven conv-keyed audits in ONE sort "
                         "exchange (conv_audit_full) and write a single "
                         "wide parquet — the 10^12-turn shape (7 "
                         "exchanges -> 1; measured 4.6x at 1M turns)")
    ta.set_defaults(fn=_cmd_transcript_audit)

    cs = sub.add_parser("conv-split",
                        help="near-dup-aware conversation train/holdout "
                             "split (transitive candidate groups land on "
                             "one side — no train->eval leakage through "
                             "re-dumped threads)",
                        parents=[common])
    cs.add_argument("--input", required=True,
                    help="parquet dir of transcripts")
    cs.add_argument("--output", required=True,
                    help="output parquet: (conv_id, group_root, split)")
    cs.add_argument("--train-frac", type=float, default=0.9)
    cs.add_argument("--conv-col", default="conv_id")
    cs.add_argument("--text-col", default="text")
    cs.set_defaults(fn=_cmd_conv_split)

    dd = sub.add_parser("dedup-state", help="incremental-ingestion state ops",
                        parents=[common])
    dd.add_argument("action", choices=["build", "update", "flags", "compact"])
    dd.add_argument("--state", required=True, help="state directory")
    dd.add_argument("--input", help="parquet dir (build/update/flags)")
    dd.add_argument("--output", help="flags output dir (flags)")
    dd.add_argument("--and-update", action="store_true",
                    help="after flagging, append the delta's keys to the "
                         "state (the daily-ingest one-liner)")
    dd.add_argument("--overwrite", action="store_true",
                    help="build: replace an existing keys/ dir instead of "
                         "refusing (appending into stale state is never "
                         "done silently)")
    dd.add_argument("--text-col", default="text")
    dd.add_argument("--key-col", default="doc_id")
    dd.add_argument("--num-perm", type=int, default=64)
    dd.add_argument("--bands", type=int, default=8)
    dd.add_argument("--shingle-k", type=int, default=5)
    dd.set_defaults(fn=_cmd_dedup_state)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    for dest, default in (("address", "local"), ("num_cpus", None),
                          ("metrics_out", None)):
        if not hasattr(args, dest):
            setattr(args, dest, default)
    if args.command == "dedup-state":
        if args.action in ("build", "update", "flags") and not args.input:
            print("error: --input required for build/update/flags",
                  file=sys.stderr)
            return 2
        if args.action == "flags" and not args.output:
            print("error: --output required for flags", file=sys.stderr)
            return 2
    import ray

    owns = _ray_session(args)
    try:
        payload = args.fn(args)
        _emit(payload, args.metrics_out)
        return 0
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
