"""Checkpoint-mode run_streaming ≡ materialize-mode run_streaming.

The large-input path (score scan streams to parquet, decision passes
over column-pruned reads) must produce the identical contract —
same keep/drop per turn, byte-identical scrubbed text, same
ConfidentStats — as the in-memory path on the same corpus.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def both_modes(ray_session, corpus_dir, tmp_path_factory):
    from cleanlab_ray.pipelines.quality_filter import run_streaming

    mem_final, mem_stats = run_streaming(corpus_dir, concurrency=None)
    ckpt = str(tmp_path_factory.mktemp("qf_ckpt"))
    ck_final, ck_stats = run_streaming(
        corpus_dir, concurrency=None, checkpoint_dir=ckpt
    )
    key = ["conv_id", "turn_idx"]
    mem = mem_final.to_pandas().sort_values(key).reset_index(drop=True)
    ck = ck_final.to_pandas().sort_values(key).reset_index(drop=True)
    return mem, mem_stats, ck, ck_stats


def test_stats_identical(both_modes):
    mem, ms, ck, cs = both_modes
    assert ms.num_issues == cs.num_issues
    assert ms.n == cs.n
    np.testing.assert_array_equal(ms.confident_joint, cs.confident_joint)
    np.testing.assert_allclose(ms.thresholds, cs.thresholds, atol=0)
    np.testing.assert_array_equal(ms.label_counts, cs.label_counts)


def test_rows_identical(both_modes):
    mem, ms, ck, cs = both_modes
    assert len(mem) == len(ck)
    assert list(mem.columns) == list(ck.columns)
    np.testing.assert_array_equal(mem["keep"].to_numpy(), ck["keep"].to_numpy())
    np.testing.assert_array_equal(
        mem["is_label_issue"].to_numpy(), ck["is_label_issue"].to_numpy()
    )
    assert (mem["scrubbed_text"] == ck["scrubbed_text"]).all()
    np.testing.assert_allclose(
        mem["score_self_confidence"].to_numpy(),
        ck["score_self_confidence"].to_numpy(),
        atol=0,
    )


def test_actor_pool_checkpoint_mode(ray_session, corpus_dir, tmp_path_factory):
    """concurrency != None: actor-pool scoring also streams to the
    checkpoint and settles pass 1 via the column-pruned aggregate."""
    from cleanlab_ray.pipelines.quality_filter import run_streaming

    ckpt = str(tmp_path_factory.mktemp("qf_ckpt_pool"))
    final, stats = run_streaming(corpus_dir, concurrency=2,
                                 checkpoint_dir=ckpt)
    mem_final, mem_stats = run_streaming(corpus_dir, concurrency=2)
    key = ["conv_id", "turn_idx"]
    a = final.to_pandas().sort_values(key).reset_index(drop=True)
    b = mem_final.to_pandas().sort_values(key).reset_index(drop=True)
    assert stats.num_issues == mem_stats.num_issues
    np.testing.assert_array_equal(a["keep"].to_numpy(), b["keep"].to_numpy())
    assert (a["scrubbed_text"] == b["scrubbed_text"]).all()
