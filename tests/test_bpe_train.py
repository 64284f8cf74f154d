"""BPE trainer vs an independent from-scratch reference.

The reference here counts pairs over the EXPANDED token stream (one
entry per word occurrence) instead of the frequency table, so agreement
is a real cross-check of the weighted-table formulation.
"""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from cleanlab_ray.stages.bpe_train import (
    EOW,
    encode_word,
    train_bpe_from_counts,
)


def _ref_train(corpus_words: list[str], num_merges: int):
    """Naive reference: merge loop over every word OCCURRENCE."""
    seqs = [list(w) + [EOW] for w in corpus_words]
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for s in seqs:
            pc.update(zip(s, s[1:]))
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for s in seqs:
            i = 0
            while i < len(s) - 1:
                if s[i] == best[0] and s[i + 1] == best[1]:
                    s[i:i + 2] = [s[i] + s[i + 1]]
                else:
                    i += 1
    return merges


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(41)
    words = ["lower", "lowest", "newer", "newest", "wider", "low", "new"]
    return [words[i] for i in rng.integers(0, len(words), size=400)]


def test_merges_match_reference(corpus):
    counts = Counter(corpus)
    items = sorted(counts.items())
    got = train_bpe_from_counts([w for w, _ in items], [c for _, c in items], 20)
    exp = _ref_train(corpus, 20)
    assert got == exp


def test_encode_equals_sequential_merge_application(corpus):
    counts = Counter(corpus)
    items = sorted(counts.items())
    merges = train_bpe_from_counts([w for w, _ in items], [c for _, c in items], 15)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in set(corpus) | {"slowest", "renewed", "a"}:
        seq = list(w) + [EOW]
        for a, b in merges:  # sequential application, in merge order
            i = 0
            while i < len(seq) - 1:
                if seq[i] == a and seq[i + 1] == b:
                    seq[i:i + 2] = [seq[i] + seq[i + 1]]
                else:
                    i += 1
        assert encode_word(w, ranks) == seq, w


def test_distributed_train_encode(ray_session, corpus):
    import ray.data as rd

    from cleanlab_ray.stages.bpe_train import bpe_train_encode, train_bpe

    docs = [" ".join(corpus[i:i + 8]) for i in range(0, len(corpus), 8)]
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
         "text": pa.array(docs)}
    )
    ds = rd.from_arrow(tbl).repartition(4)
    merges = train_bpe(ds, num_merges=20)
    assert merges == _ref_train(corpus, 20)

    out = bpe_train_encode(ds, num_merges=20).to_pandas().sort_values("doc_id")
    ranks = {p: i for i, p in enumerate(merges)}
    exp_tokens = [
        sum(len(encode_word(w, ranks)) for w in d.split()) for d in docs
    ]
    np.testing.assert_array_equal(out["n_bpe_tokens"].to_numpy(), exp_tokens)
    np.testing.assert_array_equal(
        out["n_words"].to_numpy(), [len(d.split()) for d in docs]
    )
