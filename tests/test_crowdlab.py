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


# ---------------------------------------------------------------------------
# Ensemble variants
# ---------------------------------------------------------------------------

def _ens_inputs():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(3)
    n_ex, M, K, P = 40, 4, 3, 2
    true = rng.integers(0, K, n_ex)
    ann_rows = {"conv_id": [], "turn_idx": [], "annotator_id": [], "label": []}
    for i in range(n_ex):
        for a in range(M):
            if rng.random() < 0.7:
                lab = true[i] if rng.random() < 0.8 else int(rng.integers(0, K))
                ann_rows["conv_id"].append(str(i))
                ann_rows["turn_idx"].append(0)
                ann_rows["annotator_id"].append(f"a{a}")
                ann_rows["label"].append(lab)
    ann = rd.from_arrow(pa.table({
        "conv_id": pa.array(ann_rows["conv_id"], type=pa.string()),
        "turn_idx": pa.array(ann_rows["turn_idx"], type=pa.int32()),
        "annotator_id": pa.array(ann_rows["annotator_id"], type=pa.string()),
        "label": pa.array(ann_rows["label"], type=pa.int32()),
    }))
    priors = rng.dirichlet(np.ones(K), size=(P, n_ex)).astype(np.float32)
    # model 0 leans toward the truth, model 1 is noisier
    for i in range(n_ex):
        priors[0, i, true[i]] += 1.0
    priors[0] /= priors[0].sum(axis=1, keepdims=True)
    flat = np.transpose(priors, (1, 0, 2)).reshape(n_ex, P * K)
    examples = rd.from_arrow(pa.table({
        "conv_id": pa.array([str(i) for i in range(n_ex)], type=pa.string()),
        "turn_idx": pa.array(np.zeros(n_ex, dtype=np.int32)),
        "pred_probs": pa.FixedSizeListArray.from_arrays(
            pa.array(flat.reshape(-1)), P * K),
    }))
    return ann, examples, flat, true


def test_crowdlab_ensemble_posterior_math(ray_session):
    """Ensemble posterior == closed form with per-model weights."""
    import numpy as np

    from cleanlab_ray.stages.multiannotator import crowdlab_ensemble_consensus

    ann, examples, flat, _true = _ens_inputs()
    out, info = crowdlab_ensemble_consensus(ann, examples, num_classes=3,
                                            num_models=2)
    mw = np.asarray(info["model_weight"], dtype=np.float64)
    assert mw.shape == (2,)
    assert (mw > 0).all()
    # model 0 tracks the consensus better -> larger weight
    assert mw[0] > mw[1]

    aw = info["annotator_weight"]
    cl = info["consensus_likelihood"]
    ncl = (1 - cl) / 2
    df = out.to_pandas().set_index("conv_id")
    ann_df = ann.to_pandas()
    K = 3
    for ex, grp in ann_df.groupby("conv_id"):
        prior = flat[int(ex)].astype(np.float64).reshape(2, K)
        W = sum(aw[a] for a in grp["annotator_id"])
        Wk = np.zeros(K)
        for _, r in grp.iterrows():
            Wk[int(r["label"])] += aw[r["annotator_id"]]
        post = (mw @ prior + ncl * W + (cl - ncl) * Wk) / (mw.sum() + W)
        got = np.asarray(df.loc[ex, "post_pred_probs"], dtype=np.float64)
        np.testing.assert_allclose(got, post, atol=1e-9)
        assert int(df.loc[ex, "crowdlab_label"]) == int(post.argmax())


def test_crowdlab_single_model_unchanged_by_generalization(ray_session):
    """P=1 path still produces the same posteriors as before the
    ensemble generalization (guard against regression)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.multiannotator import crowdlab_consensus

    ann, examples, flat, _ = _ens_inputs()

    def first_model(batch: pa.Table) -> pa.Table:
        import numpy as np

        from cleanlab_ray.state.confident import pred_probs_to_numpy

        probs = pred_probs_to_numpy(batch["pred_probs"])[:, :3]
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "pred_probs": pa.FixedSizeListArray.from_arrays(
                pa.array(probs.reshape(-1)), 3),
        })

    ex1 = examples.map_batches(first_model, batch_format="pyarrow")
    out, info = crowdlab_consensus(ann, ex1, num_classes=3)
    assert np.isscalar(info["model_weight"]) or isinstance(info["model_weight"], float)
    df = out.to_pandas()
    # examples without any annotation are dropped by the inner join
    n_annotated = ann.to_pandas()["conv_id"].nunique()
    assert len(df) == n_annotated
    assert df["post_pred_probs"].map(lambda p: abs(sum(p) - 1) < 1e-6).all()


def test_active_learning_ensemble(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.multiannotator import active_learning_scores_ensemble

    ann, examples, flat, _ = _ens_inputs()
    unl_flat = flat[:10]
    unlabeled = rd.from_arrow(pa.table({
        "conv_id": pa.array([f"u{i}" for i in range(10)], type=pa.string()),
        "turn_idx": pa.array(np.zeros(10, dtype=np.int32)),
        "pred_probs": pa.FixedSizeListArray.from_arrays(
            pa.array(unl_flat.reshape(-1)), 6),
    }))
    labeled, unl = active_learning_scores_ensemble(
        ann, examples, num_classes=3, num_models=2,
        unlabeled_examples_ds=unlabeled)
    ldf = labeled.to_pandas()
    udf = unl.to_pandas()
    n_annotated = ann.to_pandas()["conv_id"].nunique()
    assert len(ldf) == n_annotated and len(udf) == 10
    assert ((ldf["active_learning_score"] >= 0)
            & (ldf["active_learning_score"] <= 1)).all()
    assert ((udf["active_learning_score"] >= 0)
            & (udf["active_learning_score"] <= 1)).all()


def test_label_quality_multiannotator_ensemble(ray_session):
    import numpy as np

    from cleanlab_ray.stages.multiannotator import (
        label_quality_multiannotator_ensemble,
    )

    ann, examples, flat, true = _ens_inputs()
    lq, stats, info = label_quality_multiannotator_ensemble(
        ann, examples, num_classes=3, num_models=2)
    df = lq.to_pandas()
    n_annotated = ann.to_pandas()["conv_id"].nunique()
    assert len(df) == n_annotated
    assert {"consensus_label", "consensus_quality_score",
            "annotator_agreement", "num_annotations"} <= set(df.columns)
    assert ((df["consensus_quality_score"] >= 0)
            & (df["consensus_quality_score"] <= 1)).all()
    # consensus should mostly match truth (model 0 leans toward it)
    acc = (df.set_index("conv_id")["consensus_label"]
           .reindex([str(i) for i in range(40)])
           .dropna().astype(int)
           == [true[int(i)] for i in df["conv_id"].astype(int).sort_values()]).mean
    sdf = stats
    assert len(sdf) == 4 and "annotator_quality" in sdf.columns
    assert np.asarray(info["model_weight"]).shape == (2,)


def test_crowdlab_tiny_input_empty_sort_blocks(ray_session):
    """rows < sort-partition count makes Ray's sort emit schema-less
    empty blocks; every fan-out kernel must skip them (regression:
    _crowdlab_class_freq_blocks raised KeyError 'label')."""
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.multiannotator import crowdlab_consensus

    ann = pa.table(
        {
            "conv_id": ["c0", "c0", "c1", "c1"],
            "turn_idx": [0, 0, 0, 0],
            "annotator_id": ["a0", "a1", "a0", "a1"],
            "label": [0, 0, 1, 1],
        }
    )
    probs = np.array([[0.8, 0.1, 0.1], [0.1, 0.8, 0.1]], dtype=np.float32)
    ex = pa.table(
        {
            "conv_id": ["c0", "c1"],
            "turn_idx": [0, 0],
            "pred_probs": pa.FixedSizeListArray.from_arrays(
                pa.array(probs.reshape(-1)), 3
            ),
        }
    )
    out, info = crowdlab_consensus(rd.from_arrow(ann), rd.from_arrow(ex), num_classes=3)
    df = out.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert len(df) == 2
    assert list(df["crowdlab_label"]) == [0, 1]


def test_crowdlab_null_label_rows_tolerated(ray_session):
    """A NULL label on an annotation row must drop out of the posterior
    weighting exactly as it drops out of the stats pass (regression:
    NaN->int64 cast produced a negative bincount index)."""
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.multiannotator import crowdlab_consensus

    ann = pa.table(
        {
            "conv_id": ["c0", "c0", "c0", "c1", "c1"],
            "turn_idx": [0, 0, 0, 0, 0],
            "annotator_id": ["a0", "a1", "a2", "a0", "a1"],
            "label": pa.array([0, None, 0, 1, 1], type=pa.int64()),
        }
    )
    probs = np.array([[0.8, 0.1, 0.1], [0.1, 0.8, 0.1]], dtype=np.float32)
    ex = pa.table(
        {
            "conv_id": ["c0", "c1"],
            "turn_idx": [0, 0],
            "pred_probs": pa.FixedSizeListArray.from_arrays(
                pa.array(probs.reshape(-1)), 3
            ),
        }
    )
    out_n, _ = crowdlab_consensus(rd.from_arrow(ann), rd.from_arrow(ex), num_classes=3)
    df_n = out_n.to_pandas().sort_values("conv_id").reset_index(drop=True)
    # identical result to the same input with the null row removed
    out_d, _ = crowdlab_consensus(
        rd.from_arrow(ann.filter(pa.compute.is_valid(ann["label"]))),
        rd.from_arrow(ex),
        num_classes=3,
    )
    df_d = out_d.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert list(df_n["crowdlab_label"]) == list(df_d["crowdlab_label"]) == [0, 1]
    np.testing.assert_allclose(
        np.stack(df_n["post_pred_probs"].to_numpy()),
        np.stack(df_d["post_pred_probs"].to_numpy()),
        atol=1e-12,
    )
