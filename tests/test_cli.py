"""python -m cleanlab_ray job CLI (cleanlab_ray/cli.py): subcommands run
in-process against the test Ray session (the CLI inits Ray only when no
session exists, so it composes with the fixture)."""

import json

import pyarrow.parquet as pq
import pytest

from cleanlab_ray.cli import main


@pytest.fixture(scope="module")
def docs_file(tmp_path_factory):
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(5)
    words = np.array(["data", "model", "train", "filter", "ray", "arrow",
                      "batch", "shard", "quality", "corpus"])
    texts = [" ".join(rng.choice(words, size=20)) for _ in range(200)]
    texts += texts[:40]  # exact dups
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })
    d = tmp_path_factory.mktemp("docs")
    pq.write_table(t, str(d / "part-0.parquet"))
    return str(d)


def test_cli_dedup_state_roundtrip(ray_session, tmp_path, docs_file):
    state = str(tmp_path / "state")
    out = str(tmp_path / "flags")
    metrics = str(tmp_path / "m.json")
    assert main(["dedup-state", "build", "--state", state,
                 "--input", docs_file]) == 0
    assert main(["dedup-state", "flags", "--state", state,
                 "--input", docs_file, "--output", out,
                 "--metrics-out", metrics]) == 0
    m = json.loads(open(metrics).read())
    assert m["rows"] == 240
    # the entire input was the corpus → every doc is an exact corpus dup
    assert m["n_exact_dup_corpus"] == 240
    assert m["n_keep"] == 0
    flags = pq.read_table(out)
    assert flags.num_rows == 240
    assert main(["dedup-state", "compact", "--state", state]) == 0
    # update is idempotent (same corpus again) and flags are unchanged
    assert main(["dedup-state", "update", "--state", state,
                 "--input", docs_file]) == 0
    out2 = str(tmp_path / "flags2")
    # global flag BEFORE the subcommand must also stick (argparse
    # parents pitfall: a subparser default must not clobber it)
    assert main(["--metrics-out", metrics,
                 "dedup-state", "flags", "--state", state,
                 "--input", docs_file, "--output", out2]) == 0
    m2 = json.loads(open(metrics).read())
    assert m2["n_exact_dup_corpus"] == 240 and m2["n_keep"] == 0


def test_cli_dedup_state_flags_and_update(ray_session, tmp_path, docs_file):
    """--and-update flags against the PRE-delta state, then folds the
    delta in: a fresh corpus is all-keep on the first ingest and
    all-dup when re-flagged."""
    state = str(tmp_path / "state")
    metrics = str(tmp_path / "m.json")
    # empty-corpus state
    import pyarrow as pa
    import pyarrow.parquet as pq2
    import ray.data as rd

    from cleanlab_ray.stages.incremental import build_dedup_state

    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    build_dedup_state(rd.from_arrow(empty), state)
    assert main(["dedup-state", "flags", "--state", state,
                 "--input", docs_file, "--output", str(tmp_path / "f1"),
                 "--and-update", "--metrics-out", metrics]) == 0
    m1 = json.loads(open(metrics).read())
    assert m1["updated"] and m1["n_exact_dup_corpus"] == 0
    assert m1["n_keep"] == 200  # 240 docs − 40 within-batch dups keep=200
    assert main(["dedup-state", "flags", "--state", state,
                 "--input", docs_file, "--output", str(tmp_path / "f2"),
                 "--metrics-out", metrics]) == 0
    m2 = json.loads(open(metrics).read())
    assert m2["n_exact_dup_corpus"] == 240 and m2["n_keep"] == 0


def test_cli_dedup_state_missing_args(ray_session, tmp_path):
    assert main(["dedup-state", "build",
                 "--state", str(tmp_path / "s")]) == 2
    assert main(["dedup-state", "flags", "--state", str(tmp_path / "s"),
                 "--input", "x"]) == 2


def test_cli_curate(ray_session, tmp_path, docs_file):
    out = str(tmp_path / "curated")
    metrics = str(tmp_path / "m.json")
    assert main(["curate", "--input", docs_file, "--output", out,
                 "--metrics-out", metrics]) == 0
    m = json.loads(open(metrics).read())
    assert m["rows"] == 240
    # 40 planted exact dups → exactly 200 canonical docs
    assert m["n_canonical"] == 200
    assert set(pq.read_table(out).column_names) >= {
        "doc_id", "lang_ok", "quality_ok", "canonical", "dup_ok", "keep"}


def test_cli_remove_substrings(ray_session, tmp_path, docs_file):
    out = str(tmp_path / "cleaned")
    metrics = str(tmp_path / "m.json")
    assert main(["remove-substrings", "--input", docs_file,
                 "--output", out, "--span-k", "12",
                 "--metrics-out", metrics]) == 0
    m = json.loads(open(metrics).read())
    assert m["rows"] == 240
    # the 40 planted exact-dup docs guarantee removed bytes
    assert m["removed_bytes"] > 0


def test_cli_quality_filter_resumes(ray_session, tmp_path, corpus_dir):
    work = str(tmp_path / "qf")
    metrics = str(tmp_path / "m.json")
    # default concurrency = stateless tasks: must not deadlock even on
    # the shared 4-CPU test session (an actor pool of 4 would)
    assert main(["quality-filter", "--input", corpus_dir,
                 "--work-dir", work, "--num-groups", "3",
                 "--metrics-out", metrics]) == 0
    m1 = json.loads(open(metrics).read())
    assert m1["partitions"] == 3 and m1["rows"] > 0
    # second invocation resumes: all partitions marked done, near-zero wall
    assert main(["quality-filter", "--input", corpus_dir,
                 "--work-dir", work, "--num-groups", "3",
                 "--metrics-out", metrics]) == 0
    m2 = json.loads(open(metrics).read())
    assert m2["rows"] == m1["rows"]
    assert m2["num_issues"] == m1["num_issues"]
    assert m2["wall_sec"] < 1.0


def test_cli_transcript_audit(ray_session, tmp_path, corpus_dir):
    out = str(tmp_path / "audit")
    metrics = str(tmp_path / "m.json")
    assert main(["transcript-audit", "--input", corpus_dir,
                 "--output", out, "--metrics-out", metrics]) == 0
    m = json.loads(open(metrics).read())
    ran = m["audits"]
    # the fixture corpus has conv/turn/role/text/tool/ts but no lang
    assert m["skipped_missing_columns"] == ["lang_mix"]
    assert set(ran) == {"structure", "latency", "sessions", "tool_loops",
                        "refusals", "pii", "context"}
    n_convs = ran["structure"]
    assert n_convs > 0
    # one row per conversation for the conv-keyed audits
    assert ran["latency"] == ran["sessions"] == ran["pii"] == n_convs
    assert ran["context"] == ran["refusals"] == n_convs
    assert 0 < ran["tool_loops"] <= n_convs  # only convs with tool calls
    # each audit wrote a readable parquet dir with the conv key
    for name in ran:
        t = pq.read_table(f"{out}/{name}")
        assert t.num_rows == ran[name]
        assert "conv_id" in t.column_names
    # per-audit outputs agree with direct library calls on row counts
    from cleanlab_ray.stages.transcripts import tool_loops as tl_op
    import ray.data as rd
    direct = tl_op(rd.read_parquet(corpus_dir)).count()
    assert ran["tool_loops"] == direct


def test_cli_transcript_audit_fused(ray_session, tmp_path, corpus_dir):
    out = str(tmp_path / "audit_fused")
    metrics = str(tmp_path / "m.json")
    assert main(["transcript-audit", "--input", corpus_dir,
                 "--output", out, "--fused", "--metrics-out", metrics]) == 0
    m = json.loads(open(metrics).read())
    assert set(m["audits"]) == {"full"}
    t = pq.read_table(f"{out}/full")
    assert t.num_rows == m["audits"]["full"] > 0
    # the fused row carries every family's columns
    assert {"conv_id", "n_turns", "n_gaps", "n_sessions", "max_tool_run",
            "n_refusals", "n_matches", "first_overflow_turn"} <= set(
        t.column_names)


def test_cli_transcript_audit_skip_existing(ray_session, tmp_path,
                                            corpus_dir):
    """--skip-existing resumes a killed multi-audit run: audits whose
    output dirs already have files are kept, missing ones run."""
    import shutil

    out = str(tmp_path / "audit_resume")
    metrics = str(tmp_path / "m.json")
    assert main(["transcript-audit", "--input", corpus_dir,
                 "--output", out, "--metrics-out", metrics]) == 0
    # simulate a kill that lost two audits
    shutil.rmtree(f"{out}/sessions")
    shutil.rmtree(f"{out}/pii")
    import os
    mtime_before = os.path.getmtime(f"{out}/structure")
    assert main(["transcript-audit", "--input", corpus_dir,
                 "--output", out, "--skip-existing",
                 "--metrics-out", metrics]) == 0
    m = json.loads(open(metrics).read())
    assert m["audits"]["structure"] == "kept"       # untouched
    assert isinstance(m["audits"]["sessions"], int)  # re-ran
    assert isinstance(m["audits"]["pii"], int)
    assert os.path.getmtime(f"{out}/structure") == mtime_before
    assert pq.read_table(f"{out}/sessions").num_rows == m["audits"]["sessions"]


def test_cli_conv_split(ray_session, tmp_path, corpus_dir):
    out = str(tmp_path / "conv_split")
    metrics = str(tmp_path / "m.json")
    assert main(["conv-split", "--input", corpus_dir,
                 "--output", out, "--metrics-out", metrics]) == 0
    m = json.loads(open(metrics).read())
    assert m["convs"] == m["n_train"] + m["n_holdout"]
    assert m["n_train"] > 0 and m["n_holdout"] > 0
    t = pq.read_table(out)
    assert t.num_rows == m["convs"]
    assert set(t.column_names) == {"conv_id", "group_root", "split"}
    # CLI output matches the library call exactly
    import ray.data as rd
    from cleanlab_ray.stages.transcripts import conv_dedup_safe_split
    lib = {r["conv_id"]: r["split"] for r in
           conv_dedup_safe_split(rd.read_parquet(corpus_dir)).take_all()}
    cli = dict(zip(t["conv_id"].to_pylist(), t["split"].to_pylist()))
    assert cli == lib
