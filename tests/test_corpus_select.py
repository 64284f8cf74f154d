"""DSIR importance weights, distributed prefix-sum packing, TF-IDF.

NumPy-oracle parity for the paths the SQL gate can't express (hashed
DSIR buckets, multi-block scan stability); the exact paths are also
DuckDB-checked via queries()/oracle_sql() (dsir_weights,
pack_sequences, tfidf_terms).
"""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def doc_table():
    rng = np.random.default_rng(23)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "eps", "zeta",
                      "the", "a", "kappa", "mu"])
    rows = []
    for i in range(200):
        n = int(rng.integers(3, 40))
        words = vocab[rng.integers(0, len(vocab), size=n)]
        rows.append(" ".join(words))
    lang = np.where(rng.random(200) < 0.4, "en", "de")
    return pa.table({
        "doc_id": pa.array(np.arange(200, dtype=np.int64)),
        "text": pa.array(rows),
        "lang": pa.array(lang),
    })


def _np_dsir_exact(table):
    """Brute-force exact-unigram DSIR LLR per doc."""
    texts = table["text"].to_pylist()
    langs = table["lang"].to_pylist()
    toks = [t.lower().split() for t in texts]
    from collections import Counter

    raw, tgt = Counter(), Counter()
    for ws, lg in zip(toks, langs):
        raw.update(ws)
        if lg == "en":
            tgt.update(ws)
    v = len(raw)
    r_tot = sum(raw.values())
    t_tot = sum(tgt.values())
    lr = {
        w: np.log((tgt.get(w, 0) + 1.0) / (t_tot + v))
        - np.log((raw[w] + 1.0) / (r_tot + v))
        for w in raw
    }
    return np.array([sum(lr[w] for w in ws) for ws in toks])


def test_dsir_exact_matches_numpy(ray_session, doc_table):
    import ray.data as rd

    from cleanlab_ray.stages.importance import dsir_weights

    ds = rd.from_arrow(doc_table).repartition(5)
    out = (
        dsir_weights(ds, target_col="lang", target_value="en")
        .to_pandas()
        .sort_values("doc_id")
    )
    exp = _np_dsir_exact(doc_table)
    np.testing.assert_array_equal(
        out["llr_e6"].to_numpy(), np.floor(exp * 1e6 + 0.5).astype(np.int64)
    )
    # en docs should score higher on average than non-en (sanity of sign)
    langs = np.array(doc_table["lang"].to_pylist())
    assert exp[langs == "en"].mean() > exp[langs != "en"].mean()


def test_dsir_hashed_matches_numpy(ray_session, doc_table):
    import ray.data as rd

    from cleanlab_ray.stages.importance import (
        HashedImportanceScorer,
        _fnv1a_bucket,
        hashed_llr_table,
    )

    nb = 64  # force collisions so the bucketed path is exercised
    ds = rd.from_arrow(doc_table).repartition(4)
    lr = hashed_llr_table(ds, "lang", "en", n_buckets=nb)

    # numpy oracle for the bucketed table
    texts = doc_table["text"].to_pylist()
    langs = doc_table["lang"].to_pylist()
    raw = np.zeros(nb)
    tgt = np.zeros(nb)
    for t, lg in zip(texts, langs):
        ws = np.array(t.lower().split(), dtype=object)
        b = _fnv1a_bucket(ws, nb)
        raw += np.bincount(b, minlength=nb)
        if lg == "en":
            tgt += np.bincount(b, minlength=nb)
    exp_lr = np.log((tgt + 1.0) / (tgt.sum() + nb)) - np.log(
        (raw + 1.0) / (raw.sum() + nb)
    )
    np.testing.assert_allclose(lr, exp_lr, rtol=0, atol=1e-12)

    scored = ds.map_batches(
        HashedImportanceScorer,
        fn_constructor_kwargs={"llr_ref": lr, "n_buckets": nb},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas().sort_values("doc_id")
    exp_llr = np.array(
        [exp_lr[_fnv1a_bucket(np.array(t.lower().split(), dtype=object), nb)].sum()
         for t in texts]
    )
    np.testing.assert_array_equal(
        scored["llr_e6"].to_numpy(), np.floor(exp_llr * 1e6 + 0.5).astype(np.int64)
    )


def test_prefix_sum_multiblock(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.prefix import exclusive_prefix_sum, pack_sequences

    rng = np.random.default_rng(5)
    n = 3000
    keys = rng.permutation(n).astype(np.int64)  # unsorted input order
    vals = rng.integers(1, 100, size=n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(7)
    scanned, total = exclusive_prefix_sum(ds, "k", "v", out_col="p")
    got = scanned.to_pandas().sort_values("k")
    v_sorted = vals[np.argsort(keys)]
    exp = np.concatenate([[0], v_sorted.cumsum()[:-1]])
    np.testing.assert_array_equal(got["p"].to_numpy(), exp)
    assert total == int(vals.sum())

    packed = pack_sequences(ds, "k", "v", budget=500).to_pandas().sort_values("k")
    np.testing.assert_array_equal(packed["seq_id"].to_numpy(), exp // 500)
    # contiguous-fill invariant: seq ids are non-decreasing in key order
    assert (np.diff(packed["seq_id"].to_numpy()) >= 0).all()


def test_tfidf_matches_numpy(ray_session, doc_table):
    import ray.data as rd

    from cleanlab_ray.stages.tfidf import tfidf_topk

    ds = rd.from_arrow(doc_table.select(["doc_id", "text"])).repartition(5)
    out = tfidf_topk(ds, k=2).to_pandas()

    texts = doc_table["text"].to_pylist()
    from collections import Counter

    docsets = [set(t.lower().split()) for t in texts]
    df = Counter(w for s in docsets for w in s)
    n = float(len(texts))
    for i in [0, 7, 42, 199]:
        tf = Counter(texts[i].lower().split())
        ranked = sorted(tf, key=lambda w: (-tf[w], df[w], w))[:2]
        sub = out[out.doc_id == i].sort_values("rank")
        assert list(sub["term"]) == ranked
        exp_scores = [tf[w] * np.log(n / df[w]) for w in ranked]
        np.testing.assert_array_equal(
            sub["score_e6"].to_numpy(),
            np.floor(np.array(exp_scores) * 1e6 + 0.5).astype(np.int64),
        )
