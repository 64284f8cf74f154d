"""Gopher-style quality signals + vocab counts vs a pure-Python oracle."""

from collections import Counter

import numpy as np
import pyarrow as pa

from cleanlab_ray.stages.quality_signals import (
    STOPWORDS,
    quality_signals_kernel,
    vocab_partial_counts,
)

TEXTS = [
    "the cat sat on the mat the cat",
    "a a a a",
    "word",
    "",
    "  spaced   out  tokens ",
    "x y x y x y x y",
    None,
]


def _oracle_row(text):
    toks = (text or "").split()
    n = len(toks)
    if n == 0:
        return (0, 0.0, 0.0, 0.0, 0.0)
    mean_len = sum(len(t) for t in toks) / n
    stop = sum(t in STOPWORDS for t in toks) / n
    top = max(Counter(toks).values()) / n
    pairs = list(zip(toks, toks[1:]))
    dup = (len(pairs) - len(set(pairs))) / len(pairs) if pairs else 0.0
    return (n, mean_len, stop, top, dup)


def test_quality_signals_kernel_matches_python_oracle():
    batch = pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    out = quality_signals_kernel(batch).to_pydict()
    for i, text in enumerate(TEXTS):
        n, mean_len, stop, top, dup = _oracle_row(text)
        assert out["n_words"][i] == n, (i, text)
        np.testing.assert_allclose(out["mean_word_len"][i], mean_len, atol=0)
        np.testing.assert_allclose(out["stopword_frac"][i], stop, atol=0)
        np.testing.assert_allclose(out["top_word_frac"][i], top, atol=0)
        np.testing.assert_allclose(out["dup_2gram_frac"][i], dup, atol=0)


def test_vocab_partial_counts_matches_counter():
    batch = pa.table({"text": TEXTS})
    out = vocab_partial_counts(batch).to_pydict()
    got = dict(zip(out["word"], out["cnt"]))
    want = Counter(t for s in TEXTS for t in (s or "").split())
    assert got == dict(want)


def test_quality_signals_all_empty_batch():
    batch = pa.table({"doc_id": [0, 1], "text": ["", None]})
    out = quality_signals_kernel(batch).to_pydict()
    assert out["n_words"] == [0, 0]
    assert out["dup_2gram_frac"] == [0.0, 0.0]


def test_kernel_honors_id_col(ray_session):
    """quality_signals_kernel hardcoded doc_id; curate_documents'
    key_col parameter must reach it."""
    import pyarrow as pa

    batch = pa.table({
        "my_id": pa.array([7, 8], type=pa.int64()),
        "text": pa.array(["a b c", "x x x x"]),
    })
    out = quality_signals_kernel(batch, "text", id_col="my_id").to_pydict()
    assert out["my_id"] == [7, 8]
    assert out["n_words"] == [3, 4]
