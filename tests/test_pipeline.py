"""End-to-end flagship pipeline vs the single-process NumPy oracle.

The oracle path recomputes pred_probs with the same deterministic fused
head in one process, then applies the reference decision semantics
directly (full-array argsort). The engine must match: per-turn scores
(atol 1e-6), keep/drop F1 >= 0.99 (FIXTURES.md §6.3 — exact match modulo
boundary ties), byte-identical scrubbed text."""

import numpy as np
import pandas as pd
import pytest

from cleanlab_ray.fixtures.oracle import (
    oracle_low_self_confidence_mask,
    oracle_num_label_issues,
    oracle_self_confidence,
)
from cleanlab_ray.stages.scrub import scrub_text_py


@pytest.fixture(scope="module")
def flagship(ray_session, corpus_dir):
    from cleanlab_ray.pipelines.quality_filter import run_streaming

    final, stats = run_streaming(corpus_dir, concurrency=2, batch_size=2048)
    df = final.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return df, stats


@pytest.fixture(scope="module")
def oracle_frame(small_corpus):
    """Single-process oracle: same fused scoring functions, full-array."""
    from cleanlab_ray.stages.turn_scorer import TurnScorer

    scored = TurnScorer()(small_corpus)
    df = scored.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return df


def test_scores_match_oracle(flagship, oracle_frame):
    df, stats = flagship
    assert len(df) == len(oracle_frame)
    labels = oracle_frame["label"].to_numpy()
    probs = np.stack(oracle_frame["pred_probs"].to_numpy()).astype(np.float64)
    expected = oracle_self_confidence(labels, probs)
    np.testing.assert_allclose(
        df["score_self_confidence"].to_numpy(), expected, atol=1e-6
    )


def test_num_issues_matches_oracle(flagship, oracle_frame):
    df, stats = flagship
    labels = oracle_frame["label"].to_numpy()
    probs = np.stack(oracle_frame["pred_probs"].to_numpy()).astype(np.float64)
    assert stats.num_issues == oracle_num_label_issues(labels, probs)
    assert int(df["is_label_issue"].sum()) == stats.num_issues


def test_keep_drop_f1(flagship, oracle_frame):
    df, stats = flagship
    labels = oracle_frame["label"].to_numpy()
    probs = np.stack(oracle_frame["pred_probs"].to_numpy()).astype(np.float64)
    tie = np.arange(len(labels))  # oracle frame already (conv_id, turn_idx)-sorted
    expected_mask = oracle_low_self_confidence_mask(labels, probs, tie_break=tie)
    got = df["is_label_issue"].to_numpy()
    tp = int((expected_mask & got).sum())
    fp = int((~expected_mask & got).sum())
    fn = int((expected_mask & ~got).sum())
    f1 = 2 * tp / max(2 * tp + fp + fn, 1)
    assert f1 >= 0.99, (tp, fp, fn)


def test_scrubbed_text_exact(flagship, oracle_frame):
    df, _ = flagship
    expected = [scrub_text_py(t) for t in oracle_frame["text"].tolist()]
    assert df["scrubbed_text"].tolist() == expected


def test_scrub_idempotent(oracle_frame):
    once = oracle_frame["scrubbed_text"].tolist()
    assert [scrub_text_py(t) for t in once] == once


def test_noise_recovery(flagship, oracle_frame):
    """Flagged turns should be enriched in actually-corrupted labels."""
    df, _ = flagship
    corrupted = (oracle_frame["label"] != oracle_frame["true_label"]).to_numpy()
    flagged = df["is_label_issue"].to_numpy()
    base_rate = corrupted.mean()
    flagged_rate = corrupted[flagged].mean()
    assert flagged_rate > 2 * base_rate
