"""Duplicate-substring removal (stages/substr_removal.py): distributed
result == a pure-python oracle that enumerates raw k-byte windows,
marks those appearing in >= 2 distinct docs, merges and cuts."""

import numpy as np
import pyarrow as pa
import pytest

from cleanlab_ray.stages.substr_removal import remove_dup_substrings

K = 12


def _oracle(texts, k=K):
    padded = [t if len(t.encode()) >= k else t + " " * (k - len(t.encode()))
              for t in texts]
    bts = [p.encode() for p in padded]
    owners = {}
    for i, b in enumerate(bts):
        for p in range(len(b) - k + 1):
            owners.setdefault(b[p:p + k], set()).add(i)
    dup = {w for w, o in owners.items() if len(o) >= 2}
    out, removed = [], []
    for i, b in enumerate(bts):
        true_len = len(texts[i].encode())
        covered = np.zeros(len(b), dtype=bool)
        for p in range(len(b) - k + 1):
            if b[p:p + k] in dup:
                covered[p:p + k] = True
        keep = ~covered[:true_len]
        out.append(bytes(np.frombuffer(b[:true_len], np.uint8)[keep]).decode())
        removed.append(int((~keep).sum()))
    return out, removed


def _run(texts, parts=3):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    out = (
        remove_dup_substrings(rd.from_arrow(t).repartition(parts),
                              span_k=K)
        .to_pandas().set_index("doc_id").sort_index()
    )
    return out


def test_matches_python_oracle(ray_session):
    boiler = "SHARED BOILERPLATE SENTENCE THAT REPEATS ACROSS DOCS."
    texts = [
        f"unique preamble {i:03d} | {boiler} | unique tail {i:03d}"
        for i in range(4)
    ] + [
        "totally unique document body with no repeats at all 001",
        "another fully unique body, nothing shared here either 002",
        "tiny6",         # shorter than k, unique -> kept
        "tiny",          # exact short dup pair -> both removed to empty
        "tiny",
    ]
    got = _run(texts)
    want_texts, want_removed = _oracle(texts)
    assert got["text"].tolist() == want_texts
    assert got["n_removed_bytes"].tolist() == want_removed
    # the boilerplate is actually gone and uniques survive
    assert all(boiler not in t for t in got["text"].tolist()[:4])
    assert got.loc[4, "text"] == texts[4]
    assert got.loc[6, "text"] == "tiny6"         # unique short doc kept
    assert got.loc[7, "text"] == "" and got.loc[8, "text"] == ""


def test_partitioning_independent(ray_session):
    texts = ["common segment here!! plus suffix %d" % i for i in range(6)]
    a = _run(texts, parts=1)
    b = _run(texts, parts=5)
    assert a.equals(b)


def test_utf8_safe_cuts(ray_session):
    # duplicated window lands adjacent to multibyte chars; output must
    # decode (pyarrow cast to utf8 validates) and match the oracle up
    # to the documented inward snap
    boiler = "=== DUPLICATED RUN OF BYTES ==="
    texts = [f"caféé曦 {boiler} naïveé曦", f"résumé曦 {boiler} 曦öö end",
             "nothing shared ünïcode doc"]
    got = _run(texts)
    for t in got["text"].tolist():
        t.encode()  # round-trips; pa already validated on cast
    assert all(boiler not in t for t in got["text"].tolist())
    assert got.loc[2, "text"] == texts[2]


def test_keep_first_exempts_min_doc(ray_session):
    """keep_first=True: the smallest doc_id keeps each duplicated
    window; oracle = per-(doc, window) exemption of the min owner."""
    import ray.data as rd

    boiler = "SHARED BOILERPLATE SENTENCE THAT REPEATS."
    texts = [f"prefix {i} | {boiler} | tail {i}" for i in range(4)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    got = (
        remove_dup_substrings(rd.from_arrow(t).repartition(3), span_k=K,
                              keep_first=True)
        .to_pandas().set_index("doc_id").sort_index()
    )

    # python oracle with the same per-window min-owner exemption
    bts = [x.encode() for x in texts]
    owners: dict = {}
    for i, b in enumerate(bts):
        for p in range(len(b) - K + 1):
            owners.setdefault(b[p:p + K], set()).add(i)
    out = []
    for i, b in enumerate(bts):
        covered = np.zeros(len(b), dtype=bool)
        for p in range(len(b) - K + 1):
            o = owners[b[p:p + K]]
            if len(o) >= 2 and i != min(o):
                covered[p:p + K] = True
        out.append(bytes(np.frombuffer(b, np.uint8)[~covered]).decode())
    assert got["text"].tolist() == out
    # doc 0 keeps the boilerplate, the rest lose it
    assert boiler in got.loc[0, "text"]
    assert all(boiler not in got.loc[i, "text"] for i in (1, 2, 3))


def test_empty_and_null(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["", None], type=pa.string())})
    out = (remove_dup_substrings(rd.from_arrow(t), span_k=K)
           .to_pandas().set_index("doc_id").sort_index())
    # "" and null both normalize to the empty padded window -> the two
    # rows share it -> removed to empty; no crash either way
    assert out["text"].tolist() == ["", ""]


def test_keep_first_rejects_string_key(ray_session):
    """keep_first's min-key exemption is numeric; a string key must be
    rejected loudly, not silently compared as numbers."""
    import pytest
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(["a", "b"], type=pa.string()),
                  "text": pa.array(["x" * K, "x" * K])})
    with pytest.raises(ValueError, match="integer key"):
        remove_dup_substrings(rd.from_arrow(t), span_k=K, keep_first=True)
    # default remove-everywhere path still accepts string keys
    out = (remove_dup_substrings(rd.from_arrow(t), span_k=K)
           .to_pandas().set_index("doc_id").sort_index())
    assert out["text"].tolist() == ["", ""]


def test_large_string_input(ray_session):
    """A large_string text column (big-writer parquet) must produce the
    same cuts — the union's dup-side placeholder must match the input's
    string type or the doc sort fails on schema mismatch."""
    import ray.data as rd

    texts = [
        "the shared duplicated span appears here verbatim, plus tail one",
        "the shared duplicated span appears here verbatim, plus tail two",
        "a totally different document with no overlap at all in it",
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.large_string()),
    })
    out = (
        remove_dup_substrings(rd.from_arrow(t).repartition(2), span_k=K)
        .to_pandas().set_index("doc_id").sort_index()
    )
    exp_texts, exp_removed = _oracle(texts)
    assert list(out["text"]) == exp_texts
    assert list(out["n_removed_bytes"]) == exp_removed
