"""Decontamination + chunking kernels vs pure-Python oracles."""

import numpy as np
import pyarrow as pa

from cleanlab_ray.stages.corpus_prep import (
    ContaminationScorer,
    chunk_documents_kernel,
    collect_benchmark_grams,
    word_ngrams,
)

TEXTS = [
    "The quick brown fox jumps over the lazy dog today",   # doc 0: benchmark (0 % 5 == 0)
    "the quick brown fox jumps over a sleeping cat",        # doc 1: shares 5-gram w/ 0
    "completely different words nothing shared here at all",
    "short doc",                                            # < 5 words -> 0 grams
    "",                                                     # empty
    "the QUICK Brown FOX jumps over the lazy dog again",    # doc 5: benchmark too
    None,                                                   # null text
    "unique content that overlaps with no benchmark document text",
]
IDS = list(range(len(TEXTS)))
MOD = 5  # docs 0 and 5 are "benchmark"


def _batch():
    return pa.table({"doc_id": pa.array(IDS, type=pa.int64()), "text": TEXTS})


def _py_grams(text, n=5):
    toks = (text or "").lower().split()
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_word_ngrams_matches_python():
    grams, rows, nr = word_ngrams(_batch(), n=5)
    assert nr == len(TEXTS)
    got = {}
    for g, r in zip(grams.to_pylist(), rows):
        got.setdefault(int(r), []).append(g)
    for i, t in enumerate(TEXTS):
        assert got.get(i, []) == _py_grams(t), f"doc {i}"


def test_contamination_scorer_matches_python():
    bench = set()
    for i, t in enumerate(TEXTS):
        if i % MOD == 0:
            bench.update(_py_grams(t))
    out = ContaminationScorer(frozenset(bench), "text", 5, MOD)(_batch())
    df = {r["doc_id"]: r for r in out.to_pylist()}
    assert set(df) == {i for i in IDS if i % MOD != 0}
    for i in df:
        grams = _py_grams(TEXTS[i])
        matched = sum(g in bench for g in grams)
        assert df[i]["n_grams"] == len(grams)
        assert df[i]["n_matched"] == matched
        assert df[i]["contaminated"] == int(matched > 0)
        assert np.isclose(df[i]["contam_frac"], matched / max(len(grams), 1))
    assert df[1]["contaminated"] == 1  # shares "quick brown fox jumps over"
    assert df[2]["contaminated"] == 0


def test_collect_benchmark_grams(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_batch())
    bench = collect_benchmark_grams(ds, n=5, bench_mod=MOD)
    exp = set()
    for i, t in enumerate(TEXTS):
        if i % MOD == 0:
            exp.update(_py_grams(t))
    assert bench == exp


def test_chunk_documents_matches_python():
    c = 3
    out = chunk_documents_kernel(_batch(), chunk_words=c).to_pylist()
    exp = []
    for i, t in enumerate(TEXTS):
        toks = (t or "").split()
        for j in range(0, -(-len(toks) // c)):
            piece = toks[j * c : (j + 1) * c]
            exp.append((i, j, " ".join(piece), len(piece)))
    got = [(r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_words"]) for r in out]
    assert got == exp
    # chunks reassemble the original token stream exactly
    for i, t in enumerate(TEXTS):
        joined = " ".join(r["chunk_text"] for r in out if r["doc_id"] == i)
        assert joined == " ".join((t or "").split())


def test_chunk_empty_batch():
    b = pa.table({"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())})
    out = chunk_documents_kernel(b)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "chunk_idx", "chunk_text", "n_words"]


def test_chunk_exact_multiple_boundary():
    b = pa.table({"doc_id": pa.array([7], type=pa.int64()), "text": ["a b c d e f"]})
    out = chunk_documents_kernel(b, chunk_words=3).to_pylist()
    assert [(r["chunk_idx"], r["chunk_text"], r["n_words"]) for r in out] == [
        (0, "a b c", 3),
        (1, "d e f", 3),
    ]


def test_prefix_sum_rejects_nulls(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from cleanlab_ray.stages.prefix import exclusive_prefix_sum

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "n": pa.array([5, None, 7], type=pa.int64()),
    })
    with pytest.raises(Exception, match="null"):
        ds, _total = exclusive_prefix_sum(rd.from_arrow(tbl), "doc_id", "n")
        ds.to_pandas()
