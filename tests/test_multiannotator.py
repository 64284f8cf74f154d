"""Long-format majority-vote consensus vs a wide-format oracle."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def annotations(small_corpus):
    from cleanlab_ray.stages.multiannotator import generate_annotations

    return generate_annotations(small_corpus, num_annotators=5, seed=7)


def _oracle_consensus(df: pd.DataFrame, num_classes: int):
    """Wide-pivot oracle (the reference's own input format)."""
    class_freq = df["label"].value_counts().reindex(range(num_classes), fill_value=0).to_numpy()
    out = {}
    for (c, t), g in df.groupby(["conv_id", "turn_idx"]):
        labels = g["label"].to_numpy()
        counts = np.bincount(labels, minlength=num_classes)
        top = counts.max()
        modes = np.nonzero(counts == top)[0]
        if len(modes) > 1:
            min_freq = class_freq[modes].min()
            modes = modes[class_freq[modes] == min_freq]
        consensus = int(modes[0])
        out[(c, t)] = (consensus, len(labels), counts[consensus] / len(labels))
    return out


def test_consensus_matches_oracle(ray_session, annotations):
    import ray.data as rd

    from cleanlab_ray.stages.multiannotator import majority_vote_consensus

    ds = rd.from_arrow(annotations)
    consensus, annotator_stats = majority_vote_consensus(ds, num_classes=3)
    got = consensus.to_pandas().set_index(["conv_id", "turn_idx"])
    expected = _oracle_consensus(annotations.to_pandas(), 3)
    assert len(got) == len(expected)
    for key, (lab, n, agree) in expected.items():
        row = got.loc[key]
        assert int(row["consensus_label"]) == lab
        assert int(row["num_annotations"]) == n
        np.testing.assert_allclose(row["annotator_agreement"], agree, atol=1e-9)


def test_annotator_stats(ray_session, annotations):
    import ray.data as rd

    from cleanlab_ray.stages.multiannotator import majority_vote_consensus

    ds = rd.from_arrow(annotations)
    _, annotator_stats = majority_vote_consensus(ds, num_classes=3)
    stats = annotator_stats.to_pandas().set_index("annotator_id")
    assert len(stats) == 5
    # generated accuracies decrease a0 -> a4, so agreement should too
    agree = [stats.loc[f"a{i}", "agreement_with_consensus"] for i in range(5)]
    assert agree[0] > agree[4]
    total = int(stats["num_labeled"].sum())
    assert total == len(annotations)
