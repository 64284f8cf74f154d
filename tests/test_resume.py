"""Resumable three-phase flagship run: kill-and-resume completes only the
missing partitions and the union equals a single clean run (FIXTURES §6.7)."""

import json
import os
import shutil

import pytest


def _run(corpus_dir, work_dir):
    from cleanlab_ray.pipelines.quality_filter import run_resumable

    return run_resumable(corpus_dir, work_dir, num_groups=3, concurrency=2, batch_size=2048)


def _load_final(final_dir):
    import pandas as pd
    import pyarrow.parquet as pq

    frames = []
    for part in sorted(os.listdir(final_dir)):
        pdir = os.path.join(final_dir, part)
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                frames.append(pq.read_table(os.path.join(pdir, f)).to_pandas())
    return (
        pd.concat(frames)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_resume_completes_missing_partitions(ray_session, corpus_dir, tmp_path):
    clean_dir = str(tmp_path / "clean")
    final_dir, stats = _run(corpus_dir, clean_dir)
    clean = _load_final(final_dir)

    # lineage accounting: every partition has a record w/ histogram
    from cleanlab_ray.sources.io import read_lineage

    recs = read_lineage(os.path.join(clean_dir, "scored"))
    assert len(recs) == 3
    assert all("score_histogram" in r and sum(r["score_histogram"]) == r["rows_written"] for r in recs)
    assert sum(r["rows_written"] for r in recs) == len(clean)

    # simulate a kill: drop one scored partition + its final, and stats
    killed_dir = str(tmp_path / "killed")
    shutil.copytree(clean_dir, killed_dir)
    shutil.rmtree(os.path.join(killed_dir, "scored", "part=00001"))
    shutil.rmtree(os.path.join(killed_dir, "final", "part=00001"))
    os.remove(os.path.join(killed_dir, "stats.json"))

    final_dir2, stats2 = _run(corpus_dir, killed_dir)
    resumed = _load_final(final_dir2)
    assert stats2.num_issues == stats.num_issues
    import pandas as pd

    pd.testing.assert_frame_equal(resumed, clean)


def test_resume_noop_when_complete(ray_session, corpus_dir, tmp_path):
    work = str(tmp_path / "w")
    final_dir, _ = _run(corpus_dir, work)
    mtimes = {
        p: os.path.getmtime(os.path.join(final_dir, p))
        for p in os.listdir(final_dir)
    }
    _run(corpus_dir, work)  # second invocation: all partitions skipped
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(final_dir, p)) == m
