"""Audit framework + health report over the fixture corpus."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def audited(ray_session, corpus_dir):
    import ray.data as rd

    from cleanlab_ray.pipelines.audit import find_issues

    ds = rd.read_parquet(corpus_dir).materialize()
    return find_issues(ds, ["label", "outlier", "class_imbalance", "null"]), ds


def test_audit_runs_all_stages(audited):
    result, ds = audited
    assert result.errors == {}
    types = [s["issue_type"] for s in result.summaries]
    assert types == ["label", "outlier", "class_imbalance", "null"]
    df = result.dataset.to_pandas()
    for t in types:
        assert f"is_{t}_issue" in df.columns
        assert f"{t}_score" in df.columns


def test_audit_label_matches_oracle(audited, small_corpus):
    from cleanlab_ray.fixtures.oracle import oracle_confident_learning_mask
    from cleanlab_ray.state.confident import labels_to_numpy, pred_probs_to_numpy

    result, ds = audited
    df = result.dataset.to_pandas().sort_values(["conv_id", "turn_idx"])
    labels = labels_to_numpy(small_corpus["label"])
    probs = pred_probs_to_numpy(small_corpus["pred_probs"]).astype(np.float64)
    order = small_corpus.to_pandas().sort_values(["conv_id", "turn_idx"]).index
    expected = oracle_confident_learning_mask(labels[order], probs[order])
    np.testing.assert_array_equal(df["is_label_issue"].to_numpy(), expected)


def test_audit_null_scores(audited):
    result, ds = audited
    df = result.dataset.to_pandas()
    # fixture: tool is null on non-tool turns; no row is fully null
    assert df["is_null_issue"].sum() == 0
    assert (df.loc[df["tool"].isna(), "null_score"] < 1.0).all()


def test_audit_unknown_type_isolated(ray_session, corpus_dir):
    import ray.data as rd

    from cleanlab_ray.pipelines.audit import find_issues

    ds = rd.read_parquet(corpus_dir).materialize()
    result = find_issues(ds, ["label", "nope"])
    assert "nope" in result.errors
    assert [s["issue_type"] for s in result.summaries] == ["label"]


def test_health_report(ray_session, corpus_dir):
    import ray.data as rd

    from cleanlab_ray.pipelines.health import health_summary
    from cleanlab_ray.state.confident import compute_confident_stats

    ds = rd.read_parquet(corpus_dir, columns=["label", "pred_probs"])
    stats = compute_confident_stats(ds, 3)
    rep = health_summary(stats, class_names=["clean", "low_quality", "non_target"])
    assert 0.0 <= rep["overall_label_health_score"] <= 1.0
    assert rep["num_examples"] == stats.n
    ranked = rep["classes_by_label_quality"]
    assert list(ranked["Label Quality Score"]) == sorted(ranked["Label Quality Score"])
    # joint sums to 1
    np.testing.assert_allclose(np.sum(rep["joint"]), 1.0, atol=1e-9)
    # overlapping classes: K*(K-1)/2 symmetric pairs
    assert len(rep["overlapping_classes"]) == 3


def test_report_renders(audited):
    from cleanlab_ray.pipelines.audit import report

    result, ds = audited
    text = report(result)
    assert "Dataset Information" in text and "label" in text and "outlier" in text


def test_drift_and_valuation_stages_guarded(ray_session, corpus_dir):
    import ray.data as rd

    from cleanlab_ray.pipelines.audit import find_issues

    ds = rd.read_parquet(corpus_dir).materialize()
    result = find_issues(ds, ["label", "drift", "data_valuation"])
    # label works; drift works (ts + label_score present after label stage);
    # data_valuation errors cleanly (no embedding column)
    types = [s["issue_type"] for s in result.summaries]
    assert "label" in types and "drift" in types
    assert "data_valuation" in result.errors


def test_report_verbosity_levels(audited):
    from cleanlab_ray.pipelines.audit import report

    result, ds = audited
    # verbosity 0: only the first description paragraph, no info keys
    v0 = report(result, verbosity=0)
    assert "About this issue" in v0
    # verbosity 1+: layered info keys appear
    v1 = report(result, verbosity=1)
    assert "Additional Information" in v1
    v2 = report(result, verbosity=2)
    assert len(v2) >= len(v1)
    # top level prints every info key
    v4 = report(result, verbosity=4)
    assert "confident_joint" in v4
    assert v4.count("Additional Information") >= v1.count("Additional Information")
    # reference Reporter section header shape
    assert " label issues " in v1
    with pytest.raises(ValueError, match="Verbosity"):
        report(result, verbosity=9)
    # include_description=False drops the prose
    nod = report(result, include_description=False)
    assert "About this issue" not in nod
    # show_summary_score keeps the score column + note
    wss = report(result, show_summary_score=True)
    assert "lower score indicates" in wss


def test_report_info_dicts(audited):
    result, _ = audited
    assert result.get_info("label").get("num_classes") == 3
    assert "confident_joint" in result.get_info("label")
