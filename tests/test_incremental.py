"""Incremental corpus ingestion (stages/incremental.py): flag a delta
batch against a persisted text-free dedup state.

Oracle: the SAME hash/bucket kernels applied locally in-process —
exact membership by 64-bit content hash, near membership by shared
LSH band bucket — so the test checks the distributed exchanges, the
state round-trip, and the within-batch semantics, not the hash math
(covered by test_dedup)."""

import numpy as np
import pyarrow as pa
import pytest

from cleanlab_ray.stages.incremental import (
    build_dedup_state,
    compact_dedup_state,
    incremental_flags,
    update_dedup_state,
)


def _mk_docs(ids, texts):
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)}
    )


_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _sentence(rng, n=40):
    return " ".join(rng.choice(_WORDS, size=n))


@pytest.fixture(scope="module")
def corpus_and_delta():
    rng = np.random.default_rng(11)
    corpus_texts = [_sentence(rng) for _ in range(60)]
    corpus = _mk_docs(range(60), corpus_texts)

    delta_texts = []
    # 0-9: exact copies of corpus docs
    delta_texts += [corpus_texts[i] for i in range(10)]
    # 10-19: near-dups — one word changed in a corpus doc
    for i in range(10, 20):
        words = corpus_texts[i].split()
        words[3] = "zulu"
        delta_texts.append(" ".join(words))
    # 20-39: fresh docs
    delta_texts += [_sentence(rng) for _ in range(20)]
    # 40-44: exact copies of delta docs 20-24 (within-batch dups)
    delta_texts += [delta_texts[20 + i] for i in range(5)]
    delta = _mk_docs(range(1000, 1000 + len(delta_texts)), delta_texts)
    return corpus, delta


def _local_oracle(corpus: pa.Table, delta: pa.Table):
    """Expected flags computed with the same kernels, locally."""
    from cleanlab_ray.stages.dedup import (
        make_minhash_kernel,
        polynomial_string_hashes,
    )

    ch = set(polynomial_string_hashes(corpus["text"]).tolist())
    dh = polynomial_string_hashes(delta["text"])
    kern = make_minhash_kernel(text_col="text", key_cols=("doc_id",))
    cb = set(kern(corpus)["bucket"].to_pylist())
    db = kern(delta)
    did = np.asarray(db["doc_id"])
    dbk = np.asarray(db["bucket"])

    ids = delta["doc_id"].to_numpy()
    exact_corpus = np.array([h in ch for h in dh.tolist()])
    seen: dict[int, int] = {}
    exact_new = np.zeros(len(ids), dtype=bool)
    for i in np.argsort(ids, kind="stable"):
        h = int(dh[i])
        exact_new[i] = h in seen
        seen.setdefault(h, int(ids[i]))
    near = np.zeros(len(ids), dtype=bool)
    pos = {int(d): i for i, d in enumerate(ids)}
    for d, b in zip(did.tolist(), dbk.tolist()):
        if b in cb:
            near[pos[d]] = True
    return exact_corpus, exact_new, near


def _flags_frame(corpus, delta, tmp, **kw):
    import ray.data as rd

    state = str(tmp / "state")
    build_dedup_state(rd.from_arrow(corpus), state, **kw)
    out = incremental_flags(rd.from_arrow(delta), state).to_pandas()
    return state, out.set_index("doc_id").sort_index()


def test_incremental_flags_match_local_oracle(
    ray_session, tmp_path, corpus_and_delta
):
    corpus, delta = corpus_and_delta
    _, got = _flags_frame(corpus, delta, tmp_path)
    ec, en, near = _local_oracle(corpus, delta)
    order = np.argsort(delta["doc_id"].to_numpy())
    assert got.shape[0] == delta.num_rows
    np.testing.assert_array_equal(got["exact_dup_corpus"].to_numpy(), ec[order])
    np.testing.assert_array_equal(got["exact_dup_new"].to_numpy(), en[order])
    np.testing.assert_array_equal(got["near_dup_corpus"].to_numpy(), near[order])
    np.testing.assert_array_equal(
        got["keep"].to_numpy(), ~(ec | en | near)[order]
    )
    # the fixture planted each regime; make sure none is vacuous
    assert got["exact_dup_corpus"].sum() >= 10
    assert got["exact_dup_new"].sum() >= 5
    assert near.sum() >= 10
    assert got["keep"].sum() >= 1


def test_update_then_reflag_marks_everything_dup(
    ray_session, tmp_path, corpus_and_delta
):
    import ray.data as rd

    corpus, delta = corpus_and_delta
    state, _ = _flags_frame(corpus, delta, tmp_path)
    update_dedup_state(rd.from_arrow(delta), state)
    again = (
        incremental_flags(rd.from_arrow(delta), state)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(again["exact_dup_corpus"].all())
    assert not bool(again["keep"].any())


def test_update_idempotent_and_compact_preserves_membership(
    ray_session, tmp_path, corpus_and_delta
):
    import os

    import ray.data as rd

    corpus, delta = corpus_and_delta
    state, base = _flags_frame(corpus, delta, tmp_path)
    # appending the SAME corpus again must not change any flag
    update_dedup_state(rd.from_arrow(corpus), state)
    twice = (
        incremental_flags(rd.from_arrow(delta), state)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert twice.equals(base)
    # compaction folds duplicate files without changing membership
    n_before = len(os.listdir(os.path.join(state, "keys")))
    compact_dedup_state(state)
    n_after = len(os.listdir(os.path.join(state, "keys")))
    assert n_after <= n_before
    after = (
        incremental_flags(rd.from_arrow(delta), state)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert after.equals(base)


def test_empty_and_unicode_edges(ray_session, tmp_path):
    import ray.data as rd

    corpus = _mk_docs([0, 1], ["héllo wörld ünïcode text here",
                               "plain ascii text document"])
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    delta = _mk_docs([10], ["héllo wörld ünïcode text here"])

    state = str(tmp_path / "s1")
    build_dedup_state(rd.from_arrow(corpus), state)
    # empty delta → empty result, no crash
    assert incremental_flags(rd.from_arrow(empty), state).count() == 0
    # unicode exact copy flags both exact and near (shares all buckets)
    row = (incremental_flags(rd.from_arrow(delta), state)
           .to_pandas().iloc[0])
    assert bool(row.exact_dup_corpus) and bool(row.near_dup_corpus)
    assert not bool(row.keep)
    # empty corpus → schema'd empty state; everything keeps
    state2 = str(tmp_path / "s2")
    build_dedup_state(rd.from_arrow(empty), state2)
    row = (incremental_flags(rd.from_arrow(delta), state2)
           .to_pandas().iloc[0])
    assert bool(row.keep)


def test_hot_key_and_partitioning_independence(ray_session, tmp_path):
    """One text shared by the WHOLE corpus and much of the delta → a
    single giant equal-key run in the membership sort (the skew case);
    flags must be identical across input partitionings."""
    import ray.data as rd

    hot = "the exact same boilerplate text appears everywhere here"
    corpus = _mk_docs(range(80), [hot] * 80)
    delta_texts = [hot] * 50 + [f"unique delta document {i}" for i in range(30)]
    delta = _mk_docs(range(500, 500 + 80), delta_texts)

    state = str(tmp_path / "state")
    build_dedup_state(rd.from_arrow(corpus).repartition(7), state)

    results = []
    for parts in (1, 5, 13):
        df = (
            incremental_flags(rd.from_arrow(delta).repartition(parts), state)
            .to_pandas().set_index("doc_id").sort_index()
        )
        results.append(df)
    assert results[0].equals(results[1]) and results[1].equals(results[2])
    got = results[0]
    # all 50 hot-copy rows: exact corpus dup; none is a within-batch
    # first (the corpus match fires first), but rows after the smallest
    # id are within-batch dups too
    hot_rows = got.loc[500:549]
    assert bool(hot_rows.exact_dup_corpus.all())
    assert not bool(hot_rows.exact_dup_new.iloc[0])
    assert bool(hot_rows.exact_dup_new.iloc[1:].all())
    fresh = got.loc[550:]
    assert bool(fresh.keep.all())


def test_manifest_version_guard(ray_session, tmp_path, corpus_and_delta):
    import json
    import os

    import ray.data as rd

    corpus, delta = corpus_and_delta
    state, _ = _flags_frame(corpus, delta, tmp_path)
    with open(os.path.join(state, "state.json")) as f:
        m = json.load(f)
    m["version"] = 99
    with open(os.path.join(state, "state.json"), "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="version"):
        incremental_flags(rd.from_arrow(delta), state)


def test_build_refuses_nonempty_state_unless_overwrite(
        ray_session, tmp_path, corpus_and_delta):
    """write_parquet appends into keys/, so a silent rebuild would union
    stale keys (possibly a different hash family) with the new corpus —
    build must refuse unless overwrite=True."""
    import os

    import ray.data as rd

    corpus, delta = corpus_and_delta
    state = str(tmp_path / "state_rebuild")
    build_dedup_state(rd.from_arrow(corpus), state)
    n_files = len(os.listdir(os.path.join(state, "keys")))
    with pytest.raises(ValueError, match="overwrite"):
        build_dedup_state(rd.from_arrow(corpus), state)
    # overwrite replaces, never appends
    build_dedup_state(rd.from_arrow(corpus), state, overwrite=True)
    flags = incremental_flags(
        rd.from_arrow(delta), state).to_pandas().set_index("doc_id")
    assert bool(flags.loc[1000, "exact_dup_corpus"])  # still a valid state
    assert len(os.listdir(os.path.join(state, "keys"))) <= n_files + 1


def test_flags_reject_non_integer_key(ray_session, tmp_path, corpus_and_delta):
    import pyarrow as pa
    import ray.data as rd

    corpus, _ = corpus_and_delta
    state = str(tmp_path / "state_strkey")
    build_dedup_state(rd.from_arrow(corpus), state)
    bad = pa.table({
        "doc_id": pa.array(["u-1", "u-2"]),
        "text": pa.array(["some text here", "other text here"]),
    })
    with pytest.raises(Exception, match="integer column"):
        incremental_flags(rd.from_arrow(bad), state).to_pandas()


def test_compact_tolerates_crash_leftovers(
        ray_session, tmp_path, corpus_and_delta):
    """A half-written keys.compact (crash mid-compact) and a keys.old
    (crash mid-swap) must not corrupt the next compact."""
    import os
    import shutil

    import ray.data as rd

    corpus, delta = corpus_and_delta
    state = str(tmp_path / "state_crashy")
    build_dedup_state(rd.from_arrow(corpus), state)
    before = incremental_flags(rd.from_arrow(delta), state).to_pandas()
    # simulate both crash leftovers
    keys = os.path.join(state, "keys")
    shutil.copytree(keys, keys + ".compact")
    os.makedirs(keys + ".old", exist_ok=True)
    compact_dedup_state(state)
    assert not os.path.isdir(keys + ".compact")
    assert not os.path.isdir(keys + ".old")
    after = incremental_flags(rd.from_arrow(delta), state).to_pandas()
    pd_before = before.sort_values("doc_id").reset_index(drop=True)
    pd_after = after.sort_values("doc_id").reset_index(drop=True)
    assert pd_before.equals(pd_after)
