"""CROWDLAB model-weighted consensus."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def crowd_setup(ray_session, small_corpus):
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.multiannotator import generate_annotations

    ann = generate_annotations(small_corpus, num_annotators=5, seed=7)
    # model priors: noisy-sharp probs centered on true labels
    rng = np.random.default_rng(3)
    true = np.asarray(small_corpus["true_label"].combine_chunks())
    n = len(true)
    logits = rng.normal(0, 1, (n, 3))
    logits[np.arange(n), true] += 2.5
    e = np.exp(logits - logits.max(1, keepdims=True))
    probs = (e / e.sum(1, keepdims=True)).astype(np.float32)
    examples = pa.table(
        {
            "conv_id": small_corpus["conv_id"],
            "turn_idx": small_corpus["turn_idx"],
            "pred_probs": pa.FixedSizeListArray.from_arrays(pa.array(probs.reshape(-1)), 3),
        }
    )
    return rd.from_arrow(ann), rd.from_arrow(examples), true, small_corpus


def test_crowdlab(crowd_setup):
    from cleanlab_ray.stages.multiannotator import crowdlab_consensus

    ann_ds, ex_ds, true, corpus = crowd_setup
    out, info = crowdlab_consensus(ann_ds, ex_ds, num_classes=3)
    df = out.to_pandas().set_index(["conv_id", "turn_idx"])

    # weights sane: good annotator (a0, acc .95) outweighs bad (a4, acc .55)
    assert info["annotator_weight"]["a0"] > info["annotator_weight"]["a4"]
    assert info["model_weight"] > 0
    assert 0 < info["consensus_likelihood"] <= 1

    # posterior labels should recover true labels better than any single
    # annotator (the point of CROWDLAB)
    key_df = corpus.to_pandas()[["conv_id", "turn_idx", "true_label"]]
    merged = key_df.merge(df.reset_index(), on=["conv_id", "turn_idx"], how="inner")
    acc = (merged["crowdlab_label"] == merged["true_label"]).mean()
    assert acc > 0.9, acc

    # posterior probs are valid distributions
    probs = np.stack(merged["post_pred_probs"].to_numpy())
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-9)


def test_label_quality_multiannotator(crowd_setup):
    from cleanlab_ray.stages.multiannotator import label_quality_multiannotator

    ann, examples, _true, _corpus = crowd_setup
    lq, stats, info = label_quality_multiannotator(ann, examples, num_classes=3)
    lqdf = lq.to_pandas()
    assert {"consensus_label", "consensus_quality_score", "crowdlab_label",
            "num_annotations", "annotator_agreement"} <= set(lqdf.columns)
    assert lqdf["consensus_quality_score"].between(0, 1).all()
    # annotator stats: one row per annotator, qualities ordered ascending
    assert {"annotator_quality", "num_examples_labeled", "worst_class"} <= set(stats.columns)
    assert stats["annotator_quality"].between(0, 1).all()
    assert stats["annotator_quality"].is_monotonic_increasing
    # the deliberately-noisy last annotator (a4, acc .55) ranks below the
    # best one (a0, acc .95)
    q = stats.set_index("annotator_id")["annotator_quality"]
    assert q["a4"] < q["a0"]


def test_active_learning_scores(crowd_setup):
    import ray.data as rd

    from cleanlab_ray.stages.multiannotator import active_learning_scores

    ann, examples, _true, _corpus = crowd_setup
    unlabeled = rd.from_items(
        [
            {"conv_id": f"u{i}", "turn_idx": 0,
             "pred_probs": [0.34, 0.33, 0.33] if i % 2 else [0.98, 0.01, 0.01]}
            for i in range(10)
        ]
    )
    labeled, unl = active_learning_scores(ann, examples, 3, unlabeled_examples_ds=unlabeled)
    ldf = labeled.to_pandas()
    assert ldf["active_learning_score"].between(0, 1).all()
    udf = unl.to_pandas()
    assert udf["active_learning_score"].between(0, 1).all()
    even = udf[udf["conv_id"].str[1:].astype(int) % 2 == 0]["active_learning_score"]
    odd = udf[udf["conv_id"].str[1:].astype(int) % 2 == 1]["active_learning_score"]
    # confident unlabeled rows score higher than near-uniform ones
    assert even.mean() > odd.mean()
