"""Inverted index: brute-force parity + map-side prefilter soundness."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    vocab = np.array([f"t{i:03d}" for i in range(120)])
    p = 1.0 / np.arange(1, 121) ** 1.1
    p /= p.sum()
    docs = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(5, 25), p=p)))
        for i in range(200)
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                  "text": pa.array([t for _, t in docs])})
    ).repartition(6)
    truth = {}
    for d, t in docs:
        for w in set(t.split()):
            truth.setdefault(w, set()).add(d)
    return ds, truth


def _to_set(out):
    df = out.to_pandas()
    return set(zip(df["word"], df["df"], df["doc_id"]))


def test_matches_bruteforce(corpus):
    from cleanlab_ray.stages.index import inverted_index

    ds, truth = corpus
    lo, hi = 3, 30
    got = _to_set(inverted_index(ds, df_range=(lo, hi)))
    exp = set()
    for w, docs in truth.items():
        if lo <= len(docs) <= hi:
            for d in docs:
                exp.add((w, len(docs), d))
    assert got == exp


def test_prefilter_cap_is_sound(corpus):
    """cap == hi drops only terms that the df filter would drop anyway
    (per-block df <= global df), so output is identical."""
    from cleanlab_ray.stages.index import inverted_index

    ds, _ = corpus
    lo, hi = 3, 30
    plain = _to_set(inverted_index(ds, df_range=(lo, hi)))
    pre = _to_set(inverted_index(ds, df_range=(lo, hi), prefilter_cap=hi))
    assert plain == pre
