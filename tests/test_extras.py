"""Null patterns, underperforming groups, token flatten/unflatten,
segmentation downsample, sources, LabelInspector."""

import numpy as np
import pyarrow as pa
import pytest


def test_null_patterns(ray_session, corpus_dir):
    import ray.data as rd

    from cleanlab_ray.stages.datalab_extras import most_common_null_pattern

    ds = rd.read_parquet(corpus_dir, columns=["conv_id", "role", "text", "tool"])
    pattern, count = most_common_null_pattern(ds, ["conv_id", "role", "text", "tool"])
    # fixture: `tool` (4th col) is null on non-tool turns -> pattern 0001
    assert pattern == "0001"
    df = ds.to_pandas()
    assert count == int(df["tool"].isna().sum())


def test_underperforming_groups(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.datalab_extras import underperforming_groups

    rows = []
    for c in range(4):
        for i in range(50):
            score = 0.02 if c == 3 else 0.8 + 0.001 * i  # cluster 3 is terrible
            rows.append({"cluster": c, "score_self_confidence": score})
    out = underperforming_groups(
        rd.from_items(rows), "cluster", threshold=0.1
    ).to_pandas().set_index("cluster")
    assert bool(out.loc[3, "is_underperforming"])
    assert not out.loc[[0, 1, 2], "is_underperforming"].any()
    assert (out["n"] == 50).all()


def test_token_flatten_unflatten(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.tokens import flatten_token_scores, unflatten_token_scores

    t = pa.table(
        {
            "conv_id": ["a", "a", "b"],
            "turn_idx": [0, 1, 0],
            "token_scores": [[0.9, 0.1, 0.5], [0.3], [0.7, 0.8]],
        }
    )
    flat = flatten_token_scores(t)
    assert flat.num_rows == 6
    nested = unflatten_token_scores(rd.from_arrow(flat)).to_pandas()
    nested = nested.set_index(["conv_id", "turn_idx"])["token_scores"]
    assert list(nested.loc[("a", 0)]) == [0.9, 0.1, 0.5]
    assert list(nested.loc[("a", 1)]) == [0.3]
    assert list(nested.loc[("b", 0)]) == [0.7, 0.8]


def test_segmentation_downsample():
    from cleanlab_ray.stages.tokens import downsample_prob_tensor

    k, h, w = 2, 4, 4
    rng = np.random.default_rng(0)
    probs = rng.dirichlet([1, 1], size=(3, h, w)).transpose(0, 3, 1, 2)  # (3,K,H,W)
    t = pa.table(
        {
            "id": [0, 1, 2],
            "probs": pa.FixedSizeListArray.from_arrays(
                pa.array(probs.reshape(-1).astype(np.float32)), k * h * w
            ),
        }
    )
    out = downsample_prob_tensor(t, "probs", k, h, w, factor=2)
    ds_col = np.asarray(out["probs_ds2"].combine_chunks().values).reshape(3, k, 2, 2)
    np.testing.assert_allclose(ds_col.sum(axis=1), 1.0, atol=1e-5)
    # block mean of the top-left 2x2 block, renormalized
    manual = probs[0, :, :2, :2].mean(axis=(1, 2))
    manual = manual / manual.sum()
    np.testing.assert_allclose(ds_col[0, :, 0, 0], manual, atol=1e-5)


def test_read_any_and_format_labels(ray_session, tmp_path):
    import pandas as pd

    from cleanlab_ray.sources.readers import format_labels, read_any, validate_schema

    df = pd.DataFrame({"label": ["cat", "dog", "cat", "bird"], "x": [1, 2, 3, 4]})
    ds = read_any(df)
    coded, inv_map = format_labels(ds, "label")
    out = coded.to_pandas().sort_values("x")
    assert out["label"].tolist() == [1, 2, 1, 0]  # bird=0, cat=1, dog=2
    assert inv_map == {0: "bird", 1: "cat", 2: "dog"}

    p = tmp_path / "t.csv"
    df.to_csv(p, index=False)
    assert read_any(str(p)).count() == 4

    with pytest.raises(ValueError, match="missing column"):
        validate_schema(ds, {"nope": None})


def test_save_load_audit(ray_session, corpus_dir, tmp_path):
    import ray.data as rd

    from cleanlab_ray.pipelines.audit import find_issues
    from cleanlab_ray.sources.readers import load_audit, save_audit

    ds = rd.read_parquet(corpus_dir).materialize()
    result = find_issues(ds, ["label", "class_imbalance"])
    out = save_audit(result, str(tmp_path / "audit"))
    issues, side = load_audit(out)
    assert issues.count() == ds.count()
    assert [s["issue_type"] for s in side["summaries"]] == ["label", "class_imbalance"]


def test_label_inspector_matches_distributed(ray_session, corpus_dir):
    import ray.data as rd

    from cleanlab_ray.pipelines.inspector import LabelInspector
    from cleanlab_ray.state.confident import compute_confident_stats

    ds = rd.read_parquet(corpus_dir, columns=["label", "pred_probs"]).materialize()
    insp = LabelInspector.from_dataset(ds, num_class=3, batch_size=997)
    stats = compute_confident_stats(ds, 3)
    from cleanlab_ray.state.confident import finalize_confident_joint

    np.testing.assert_allclose(insp.get_confident_thresholds(), stats.thresholds, atol=1e-9)
    assert insp.get_num_issues() == stats.num_issues
    np.testing.assert_array_equal(
        finalize_confident_joint(insp.get_confident_joint()), stats.confident_joint
    )


def test_langid_scorer_overwrites_existing_lang_column(ray_session):
    """An input that already carries a lang column must not gain a
    duplicate field (later batch['lang'] lookups would raise)."""
    import pyarrow as pa

    from cleanlab_ray.stages.langid import LangIdScorer, PplScorer

    batch = pa.table({
        "text": pa.array(["the quick brown fox jumps over the lazy dog"]),
        "lang": pa.array(["xx"]),
    })
    out = LangIdScorer()(batch)
    assert out.column_names.count("lang") == 1
    assert out["lang"][0].as_py() != "xx"  # recomputed, not passed through
    out2 = PplScorer()(batch)
    assert out2.column_names.count("lang") == 1
