"""Token-classification pipeline vs a direct NumPy port of the
reference rank.py/filter.py flatten->score->pool semantics."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def token_ds(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(17)
    sentences = []
    for i in range(80):
        T = int(rng.integers(1, 7))
        labels = rng.integers(0, 3, T)
        logits = rng.normal(0, 1, (T, 3))
        logits[np.arange(T), labels] += rng.normal(1.5, 1.0, T)
        e = np.exp(logits - logits.max(1, keepdims=True))
        probs = (e / e.sum(1, keepdims=True)).astype(np.float32)
        sentences.append((i, labels, probs))
    tbl = pa.table(
        {
            "sentence_id": pa.array([s[0] for s in sentences], type=pa.int64()),
            "token_labels": pa.array([s[1].tolist() for s in sentences]),
            "token_pred_probs": pa.array([s[2].reshape(-1).tolist() for s in sentences],
                                         type=pa.list_(pa.float32())),
        }
    )
    return rd.from_arrow(tbl), sentences


def _expected(sentences, method="min", temp=0.05):
    rows = {}
    for sid, labels, probs in sentences:
        p64 = probs.astype(np.float64)
        sc = p64[np.arange(len(labels)), labels]
        if method == "min":
            sent = sc.min()
        else:
            e = np.exp((1.0 - sc) / temp)
            sent = float((sc * e).sum() / e.sum())
        for j in range(len(labels)):
            rows[(sid, j)] = (sc[j], sent)
    return rows


@pytest.mark.parametrize("method", ["min", "softmin"])
def test_token_quality_scores(token_ds, method):
    from cleanlab_ray.pipelines.token_classification import token_label_quality_scores

    ds, sentences = token_ds
    out = token_label_quality_scores(ds, sentence_score_method=method).to_pandas()
    exp = _expected(sentences, method)
    assert len(out) == len(exp)
    for _, r in out.iterrows():
        e_tok, e_sent = exp[(int(r["sentence_id"]), int(r["token_pos"]))]
        assert r["token_score"] == pytest.approx(e_tok, rel=1e-12)
        assert r["sentence_score"] == pytest.approx(e_sent, rel=1e-9)
        assert bool(r["is_token_issue"]) == (e_tok < 0.1)


def test_token_cl_issues_runs(token_ds):
    from cleanlab_ray.pipelines.token_classification import token_find_label_issues

    ds, sentences = token_ds
    out = token_find_label_issues(ds).to_pandas()
    total_tokens = sum(len(s[1]) for s in sentences)
    assert len(out) == total_tokens
    assert {"sentence_id", "token_pos", "is_label_issue"} <= set(out.columns)
    # mostly-correct synthetic labels: only a minority should be flagged
    assert 0 <= out["is_label_issue"].sum() <= 0.3 * total_tokens


# ---------------------------------------------------------------------------
# Span classification (K=2 wrapper)
# ---------------------------------------------------------------------------

def test_span_label_quality_matches_manual_expansion(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.pipelines.span_classification import span_label_quality_scores

    rng = np.random.default_rng(5)
    rows = []
    for i in range(25):
        t = int(rng.integers(1, 6))
        rows.append({
            "sentence_id": i,
            "token_labels": rng.integers(0, 2, t).tolist(),
            "span_probs": rng.uniform(0, 1, t).round(3).tolist(),
        })
    out = span_label_quality_scores(rd.from_items(rows)).to_pandas()
    out = out.set_index(["sentence_id", "token_pos"]).sort_index()
    # oracle: score = float32(p) if label==1 else float32(1-p); sentence min
    for r in rows:
        p = np.asarray(r["span_probs"], dtype=np.float64)
        lab = np.asarray(r["token_labels"])
        sc = np.where(lab == 1, np.float32(p), (1.0 - p).astype(np.float32)).astype(np.float64)
        for j in range(len(p)):
            row = out.loc[(str(r["sentence_id"]), j)]
            np.testing.assert_allclose(row["token_score"], sc[j], atol=1e-7)
            np.testing.assert_allclose(row["sentence_score"], sc.min(), atol=1e-7)
            assert bool(row["is_token_issue"]) == bool(sc[j] < 0.1)


def test_span_find_label_issues_flags_planted_errors(ray_session):
    import numpy as np
    import ray.data as rd

    from cleanlab_ray.pipelines.span_classification import span_find_label_issues

    rng = np.random.default_rng(9)
    rows, planted = [], set()
    for i in range(60):
        t = 4
        true = rng.integers(0, 2, t)
        p = np.where(true == 1, 0.9, 0.1) + rng.normal(0, 0.03, t)
        lab = true.copy()
        if i % 6 == 0:  # plant a wrong label
            lab[0] = 1 - lab[0]
            planted.add((str(i), 0))
        rows.append({
            "sentence_id": i,
            "token_labels": lab.tolist(),
            "span_probs": np.clip(p, 0.01, 0.99).tolist(),
        })
    out = span_find_label_issues(rd.from_items(rows)).to_pandas()
    flagged = set(zip(out.loc[out["is_label_issue"], "sentence_id"],
                      out.loc[out["is_label_issue"], "token_pos"]))
    hit = len(planted & flagged) / len(planted)
    assert hit >= 0.8   # confident learning recovers planted errors
