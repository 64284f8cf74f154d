"""Batched ≡ full equivalence (FIXTURES.md §6.2, the reference's
test_batched_label_issues pattern): the flagship output must be
identical across batch sizes and block layouts."""

import pandas as pd
import pytest


def _run(corpus_dir, batch_size, blocks):
    from cleanlab_ray.pipelines.quality_filter import run_streaming

    final, stats = run_streaming(
        corpus_dir,
        concurrency=None,
        batch_size=batch_size,
        override_num_blocks=blocks,
    )
    df = (
        final.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    return df, stats


def test_flagship_invariant_to_batching(ray_session, corpus_dir):
    base_df, base_stats = _run(corpus_dir, 4096, None)
    for batch_size, blocks in ((512, 7), (8192, 2)):
        df, stats = _run(corpus_dir, batch_size, blocks)
        assert stats.num_issues == base_stats.num_issues
        import numpy as np

        np.testing.assert_array_equal(
            stats.confident_joint, base_stats.confident_joint
        )
        pd.testing.assert_frame_equal(df, base_df)
