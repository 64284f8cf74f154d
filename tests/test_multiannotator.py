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


def test_majority_vote_hot_key(ray_session):
    """One example with 50k annotations (a hot key after the sort
    exchange) must pool in one oversized block without per-group
    Python cost blowup and produce the exact mode."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.multiannotator import majority_vote_consensus

    n_hot = 50_000
    rng = np.random.default_rng(0)
    hot_labels = rng.choice([0, 1, 2], size=n_hot, p=[0.5, 0.3, 0.2])
    conv = ["hot"] * n_hot + [f"c{i}" for i in range(500)]
    turn = np.zeros(n_hot + 500, dtype=np.int32)
    ann = [f"a{i % 7}" for i in range(n_hot)] + ["a0"] * 500
    lab = np.concatenate([hot_labels, np.ones(500, dtype=np.int64)])
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array(conv, type=pa.string()),
        "turn_idx": pa.array(turn),
        "annotator_id": pa.array(ann, type=pa.string()),
        "label": pa.array(lab.astype(np.int32)),
    })).repartition(16)
    consensus, stats = majority_vote_consensus(ds, num_classes=3)
    df = consensus.to_pandas().set_index("conv_id")
    assert int(df.loc["hot", "consensus_label"]) == int(
        np.bincount(hot_labels).argmax())
    assert int(df.loc["hot", "num_annotations"]) == n_hot
    assert len(df) == 501
    sdf = stats.to_pandas()
    assert int(sdf["num_labeled"].sum()) == n_hot + 500


def test_detailed_label_quality_long_format(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.multiannotator import (
        crowdlab_consensus, detailed_label_quality,
    )

    rng = np.random.default_rng(4)
    n_ex, K = 30, 3
    ann_rows = {"conv_id": [], "turn_idx": [], "annotator_id": [], "label": []}
    for i in range(n_ex):
        for a in range(3):
            ann_rows["conv_id"].append(str(i))
            ann_rows["turn_idx"].append(0)
            ann_rows["annotator_id"].append(f"a{a}")
            ann_rows["label"].append(int(rng.integers(0, K)))
    ann = rd.from_arrow(pa.table({
        "conv_id": pa.array(ann_rows["conv_id"], type=pa.string()),
        "turn_idx": pa.array(ann_rows["turn_idx"], type=pa.int32()),
        "annotator_id": pa.array(ann_rows["annotator_id"], type=pa.string()),
        "label": pa.array(ann_rows["label"], type=pa.int32()),
    }))
    probs = rng.dirichlet(np.ones(K), size=n_ex).astype(np.float32)
    examples = rd.from_arrow(pa.table({
        "conv_id": pa.array([str(i) for i in range(n_ex)], type=pa.string()),
        "turn_idx": pa.array(np.zeros(n_ex, dtype=np.int32)),
        "pred_probs": pa.FixedSizeListArray.from_arrays(
            pa.array(probs.reshape(-1)), K),
    }))
    detail = detailed_label_quality(ann, examples, num_classes=K).to_pandas()
    assert len(detail) == n_ex * 3
    # each annotation's quality == posterior prob of its chosen label
    post, _info = crowdlab_consensus(ann, examples, num_classes=K)
    pp = post.to_pandas().set_index("conv_id")["post_pred_probs"]
    for _, r in detail.iterrows():
        np.testing.assert_allclose(
            r["quality_annotator"], pp.loc[r["conv_id"]][int(r["label"])],
            atol=1e-12)


def test_null_labels_excluded_from_other_agreement_denominators(ray_session):
    """A null label is a MISSING annotation (reference wide-table NaN):
    it must not count toward the agreement-with-others denominator
    (w_total = n_valid - 1 per multi-annotated example, NOT run size -
    1), matching the fused _crowdlab_run_state convention."""
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.multiannotator import majority_vote_consensus

    tbl = pa.table({
        "conv_id": pa.array(
            ["e1", "e1", "e1", "e2", "e2", "e3", "e3"], type=pa.string()),
        "turn_idx": pa.array([0] * 7, type=pa.int32()),
        "annotator_id": pa.array(
            ["a0", "a1", "a2", "a0", "a1", "a0", "a1"], type=pa.string()),
        # e1: a0=0, a1=1, a2=NULL (2 valid); e2: a0=1, a1=NULL (1 valid
        # -> NOT multi-annotated); e3: a0=2, a1=2 (2 valid, agreeing)
        "label": pa.array([0, 1, None, 1, None, 2, 2], type=pa.int32()),
    })
    consensus, stats = majority_vote_consensus(
        rd.from_arrow(tbl), num_classes=3)
    cons = consensus.to_pandas().set_index("conv_id")
    # num_annotations counts VALID labels only
    assert int(cons.loc["e1", "num_annotations"]) == 2
    assert int(cons.loc["e2", "num_annotations"]) == 1
    sdf = stats.to_pandas().set_index("annotator_id")
    # a2 labeled nothing valid -> absent entirely
    assert "a2" not in sdf.index
    # a0: e1 multi (denom 1, 0 matches), e2 single-valid (denom 0),
    #     e3 multi (denom 1, 1 match)
    assert float(sdf.loc["a0", "w_total"]) == 2.0
    assert float(sdf.loc["a0", "w_sum"]) == 1.0
    assert int(sdf.loc["a0", "num_labeled"]) == 3
    # a1: e1 multi (denom 1, 0 matches), e3 multi (denom 1, 1 match);
    #     the null on e2 contributes nothing
    assert float(sdf.loc["a1", "w_total"]) == 2.0
    assert float(sdf.loc["a1", "w_sum"]) == 1.0
    assert int(sdf.loc["a1", "num_labeled"]) == 2
