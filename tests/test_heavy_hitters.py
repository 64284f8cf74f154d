"""Misra–Gries heavy hitters: exact regime + lossy-regime error bound."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _zipf_corpus(n_docs=300, vocab=400, seed=13):
    rng = np.random.default_rng(seed)
    words = np.array([f"w{i:04d}" for i in range(vocab)])
    p = 1.0 / np.arange(1, vocab + 1) ** 1.3
    p /= p.sum()
    docs = [
        " ".join(rng.choice(words, size=rng.integers(10, 60), p=p))
        for _ in range(n_docs)
    ]
    return docs


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray.data as rd

    docs = _zipf_corpus()
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)})).repartition(6)
    true = Counter(w for d in docs for w in d.split())
    return ds, true


def test_exact_regime(corpus_ds):
    from cleanlab_ray.stages.heavy_hitters import heavy_hitters

    ds, true = corpus_ds
    out = heavy_hitters(ds, k=10, capacity=10_000).to_pandas()
    exp = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(out["word"], out["weight"])) == exp


def test_lossy_regime_error_bound(corpus_ds):
    from cleanlab_ray.stages.heavy_hitters import (
        _unpack,
        heavy_hitters,
        make_mg_aggfn,
    )

    ds, true = corpus_ds
    capacity = 64
    acc = ds.aggregate(make_mg_aggfn(capacity))["mg_summary"]
    words, counts = _unpack(np.asarray(acc))
    est = dict(zip(words, counts))
    n_total = sum(true.values())
    retained = sum(est.values())
    bound = (n_total - retained) / (capacity + 1)
    assert len(est) <= capacity
    for w, c in true.items():
        e = est.get(w, 0)
        assert e <= c, (w, e, c)  # never overestimates
        assert c - e <= bound + 1e-9, (w, c, e, bound)  # MG guarantee
    # every word with true count above the bound must be present
    for w, c in true.items():
        if c > bound:
            assert w in est

    # top-k from the sketch finds the true heavy head
    out = heavy_hitters(ds, k=5, capacity=capacity).to_pandas()
    true_top5 = [w for w, _ in sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
    assert list(out["word"]) == true_top5
