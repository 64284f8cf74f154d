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
