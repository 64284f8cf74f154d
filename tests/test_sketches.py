"""KMV distinct-count sketch: exact regime + lossy-regime error bound."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(41)
    n_distinct = 20_000
    words = np.array([f"tok{i:05d}" for i in range(n_distinct)])
    docs = [
        " ".join(rng.choice(words, size=rng.integers(20, 80)))
        for _ in range(600)
    ]
    true_distinct = len(set(w for d in docs for w in d.split()))
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)})).repartition(5)
    return ds, true_distinct


def test_exact_regime(corpus):
    from cleanlab_ray.stages.sketches import distinct_tokens

    ds, true_distinct = corpus
    assert distinct_tokens(ds, k=1 << 17) == true_distinct


def test_lossy_regime_error_bound(corpus):
    from cleanlab_ray.stages.sketches import distinct_tokens

    ds, true_distinct = corpus
    k = 1024
    est = distinct_tokens(ds, k=k)
    # relative std error ~ 1/sqrt(k-2); allow 5 sigma
    rel = abs(est - true_distinct) / true_distinct
    assert rel < 5.0 / np.sqrt(k - 2), (est, true_distinct, rel)
    # deterministic: same input -> same estimate
    assert distinct_tokens(ds, k=k) == est


def test_grouped_exact(corpus, ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.sketches import distinct_tokens_by

    rng = np.random.default_rng(7)
    words = np.array([f"w{i:04d}" for i in range(500)])
    rows = []
    for g in ("a", "b", "c"):
        for _ in range(50):
            rows.append((g, " ".join(rng.choice(words, size=30))))
    tbl = pa.table({"grp": pa.array([r[0] for r in rows]),
                    "text": pa.array([r[1] for r in rows])})
    ds = rd.from_arrow(tbl).repartition(4)
    got = distinct_tokens_by(ds, "grp", k=4096).to_pandas()
    exp = {}
    for g, t in rows:
        exp.setdefault(g, set()).update(t.split())
    assert list(got["grp"]) == ["a", "b", "c"]
    assert list(got["distinct_tokens"]) == [len(exp[g]) for g in ("a", "b", "c")]


def test_merge_is_order_independent():
    from cleanlab_ray.stages.sketches import _kmv_merge, kmv_estimate

    rng = np.random.default_rng(3)
    parts = [
        np.sort(rng.integers(0, 1 << 63, size=40).astype(np.uint64))
        for _ in range(6)
    ]
    k = 32
    fwd = np.empty(0, dtype=np.uint64)
    for p in parts:
        fwd = _kmv_merge(fwd, p, k)
    rev = np.empty(0, dtype=np.uint64)
    for p in reversed(parts):
        rev = _kmv_merge(rev, p, k)
    assert np.array_equal(fwd, rev)
    assert kmv_estimate(fwd, k) == kmv_estimate(rev, k)


def test_distinct_tokens_ignores_empty_pseudo_token(ray_session):
    """Trailing/repeated whitespace puts an empty pseudo-token in the
    Arrow dictionary; it must not count toward DISTINCT words."""
    import ray.data as rd

    from cleanlab_ray.stages.sketches import distinct_tokens

    ds = rd.from_items([
        {"text": "hello world"},
        {"text": "hello  world "},   # double + trailing space
        {"text": ""},                 # empty doc
    ])
    assert distinct_tokens(ds, k=1 << 10) == 2

    all_empty = rd.from_items([{"text": ""}, {"text": "   "}])
    assert distinct_tokens(all_empty, k=1 << 10) == 0


def test_distinct_tokens_by_handles_empty_blocks(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.sketches import distinct_tokens_by

    ds = rd.from_items([
        {"g": "a", "text": "x y z"},
        {"g": "b", "text": "x x"},
    ]).repartition(8)  # force empty blocks
    out = distinct_tokens_by(ds, "g", k=1 << 10).to_pandas()
    got = dict(zip(out["g"], out["distinct_tokens"]))
    assert got == {"a": 3, "b": 1}
