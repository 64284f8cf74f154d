"""Dedup: exact keep-first semantics and MinHash-LSH near-dup recovery."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def dup_corpus(ray_session):
    """Corpus with planted exact and near duplicates."""
    import ray.data as rd

    from cleanlab_ray.fixtures.transcripts import DE_WORDS, EN_WORDS, FR_WORDS

    vocab = np.array(EN_WORDS + DE_WORDS + FR_WORDS)
    rng = np.random.default_rng(3)
    base = [" ".join(rng.choice(vocab, 30)) for _ in range(50)]
    rows = []
    for i, t in enumerate(base):
        rows.append({"conv_id": f"c{i:04d}", "turn_idx": 0, "text": t})
    # exact duplicates of doc 0 (should keep only c0000/0)
    for j in range(3):
        rows.append({"conv_id": f"d{j:04d}", "turn_idx": j, "text": base[0]})
    # near duplicates of doc 1 (one word changed)
    nd = base[1].split()
    nd[5] = "CHANGED"
    rows.append({"conv_id": "n0000", "turn_idx": 0, "text": " ".join(nd)})
    return rd.from_items(rows), base


def test_exact_dedup(dup_corpus):
    from cleanlab_ray.stages.dedup import exact_dedup

    ds, base = dup_corpus
    out = exact_dedup(ds).to_pandas()
    # 50 distinct base texts + 1 near-dup text = 51 distinct contents
    assert len(out) == 51
    kept_for_base0 = out[out["text"] == base[0]]
    assert len(kept_for_base0) == 1
    assert kept_for_base0.iloc[0]["conv_id"] == "c0000"  # stable minimal key


def test_exact_dedup_oracle_equivalence(dup_corpus):
    from cleanlab_ray.stages.dedup import exact_dedup

    ds, _ = dup_corpus
    out = (
        exact_dedup(ds).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    df = ds.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    expected = (
        df.drop_duplicates(subset=["text"], keep="first")
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[expected.columns], expected)


def test_near_dup(dup_corpus):
    from cleanlab_ray.stages.dedup import near_dup_groups

    ds, base = dup_corpus
    flagged = near_dup_groups(ds, jaccard_threshold=0.7).to_pandas()
    flagged_keys = set(zip(flagged["conv_id"], flagged["turn_idx"]))
    # the exact dups and near-dup should be flagged along with their bases
    assert ("d0000", 0) in flagged_keys
    assert ("c0000", 0) in flagged_keys
    assert ("n0000", 0) in flagged_keys and ("c0001", 0) in flagged_keys
    # unrelated docs should not be flagged en masse
    assert len(flagged) < 15


def test_simhash_near_dup(dup_corpus):
    from cleanlab_ray.stages.dedup import simhash_near_dup

    ds, base = dup_corpus
    flagged = simhash_near_dup(ds).to_pandas()
    keys = set(zip(flagged["conv_id"], flagged["turn_idx"]))
    # exact duplicates share identical simhash -> must be flagged
    assert ("c0000", 0) in keys and ("d0000", 0) in keys
    assert len(flagged) < 20


def test_embedding_near_dup(ray_session):
    import ray.data as rd
    import numpy as np

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((100, 16)).astype(np.float32)
    vecs[50] = vecs[0] + 0.001 * rng.standard_normal(16)  # planted near-dup
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(100)]
    ds = rd.from_items(rows)

    from cleanlab_ray.stages.dedup import embedding_near_dup

    flagged = embedding_near_dup(ds, cosine_threshold=0.98).to_pandas()
    ids = set(flagged["vec_id"])
    assert 0 in ids and 50 in ids
    assert len(ids) < 10


def test_fingerprint_deterministic(dup_corpus):
    import ray.data as rd

    from cleanlab_ray.stages.dedup import add_fingerprint

    ds, base = dup_corpus
    out = ds.map_batches(add_fingerprint, batch_format="pyarrow").to_pandas()
    by_text = out.groupby("text")["fingerprint"].nunique()
    assert (by_text == 1).all()  # same text -> same fingerprint
    assert out["fingerprint"].nunique() == out["text"].nunique()


def test_hot_key_run_does_not_straddle_blocks(ray_session):
    """A single key whose run is far larger than any input block must
    still land in ONE sorted block (the _sorted_block_map colocation
    guarantee) — and exact_dedup must therefore keep exactly one copy.
    edge_run_report fails loudly if Ray ever splits the run."""
    import ray.data as rd

    from cleanlab_ray.stages.dedup import (
        add_content_hash,
        edge_run_report,
        exact_dedup,
    )

    hot = "the same hot text repeated everywhere " * 4
    rows = [
        {"conv_id": f"h{i:05d}", "turn_idx": i, "text": hot} for i in range(4000)
    ] + [
        {"conv_id": f"u{i:05d}", "turn_idx": 0, "text": f"unique text {i}"}
        for i in range(500)
    ]
    # 45 input blocks of ~100 rows: the hot run spans ~40 of them pre-sort.
    ds = rd.from_items(rows).repartition(45)

    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow")
    straddles = edge_run_report(hashed, "content_hash")
    assert straddles.empty, f"hot key split across blocks: {straddles}"

    out = exact_dedup(ds).to_pandas()
    assert len(out) == 501
    kept_hot = out[out["text"] == hot]
    assert len(kept_hot) == 1
    assert kept_hot.iloc[0]["conv_id"] == "h00000"


def test_ngram_jaccard_pairs_matches_set_oracle(ray_session):
    """Exact inverted-index Jaccard == per-pair python set Jaccard."""
    import ray.data as rd

    from cleanlab_ray.stages.dedup import ngram_jaccard_pairs

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumped over the lazy dog",   # near-dup of 0
        "completely different content about databases",
        "the quick brown fox jumps over the lazy dog",    # exact dup of 0
        "completely different content about database systems",  # near 2
        "xy",                                             # shorter than k
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ds = rd.from_items(rows)
    got = ngram_jaccard_pairs(ds, threshold=0.3).to_pandas()
    got = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    def shingles(t, k=5):
        t = t.lower()
        if len(t) < k:
            t = t + " " * (k - len(t))
        return {t[i : i + k] for i in range(len(t) - k + 1)}

    expect = []
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = shingles(texts[a]), shingles(texts[b])
            inter = len(sa & sb)
            if inter == 0:
                continue
            jac = inter / len(sa | sb)
            if jac >= 0.3:
                expect.append((a, b, int(np.floor(jac * 1e6 + 0.5))))
    assert list(map(tuple, got.itertuples(index=False))) == sorted(expect)


def test_ngram_jaccard_df_cap_drops_stop_shingles(ray_session):
    """df_cap bounds the quadratic pair blowup: a shingle shared by all
    docs stops generating pairs when the cap excludes its run."""
    import ray.data as rd

    from cleanlab_ray.stages.dedup import ngram_jaccard_pairs

    # every doc shares the ' stop' shingle; distinct tails otherwise
    rows = [{"doc_id": i, "text": f"stopw unique tail {i:04d}"} for i in range(20)]
    ds = rd.from_items(rows)
    exact = ngram_jaccard_pairs(ds, threshold=0.0).to_pandas()
    capped = ngram_jaccard_pairs(ds, threshold=0.0, df_cap=5).to_pandas()
    assert len(capped) < len(exact)


def test_ngram_jaccard_max_pairs_guard(ray_session):
    """The loud-failure guard: an exact run whose df profile would emit
    more than max_pairs co-occurrence pairs raises BEFORE the quadratic
    exchange; df_cap or a raised bound lets it proceed."""
    import pytest
    import ray.data as rd

    from cleanlab_ray.stages.dedup import ngram_jaccard_pairs

    # 40 docs all sharing the 'stopw' shingles → C(40,2)-scale emissions
    rows = [{"doc_id": i, "text": f"stopw unique tail {i:04d}"} for i in range(40)]
    ds = rd.from_items(rows)
    with pytest.raises(ValueError, match="max_pairs"):
        ngram_jaccard_pairs(ds, threshold=0.0, max_pairs=100)
    # the same bound passes when df_cap excludes the hot runs
    out = ngram_jaccard_pairs(ds, threshold=0.0, df_cap=5,
                              max_pairs=100).to_pandas()
    assert len(out) >= 0  # executed without raising
    # and max_pairs=None disables the guard entirely
    full = ngram_jaccard_pairs(ds, threshold=0.0, max_pairs=None).to_pandas()
    assert len(full) > 0


def test_dup_span_counts(ray_session):
    """Cross-doc duplicate windows: shared spans counted per position,
    within-doc repeats don't count without a second doc, short docs get
    the single padded window."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.dedup import dup_span_counts

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = [
        (0, shared + " alpha unique tail zero zero zero"),
        (1, shared + " beta different ending entirely here"),
        (2, "completely unrelated text with no overlap at all okay"),
        (3, "tiny"),  # shorter than span_k -> one padded window
        (4, "tiny"),  # identical short doc -> that window is duplicated
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                  "text": pa.array([t for _, t in docs])})
    ).repartition(3)
    out = dup_span_counts(ds, span_k=20).to_pandas().set_index("doc_id").sort_index()

    k = 20
    # brute-force oracle
    def windows(t):
        t = t.lower()
        if len(t) < k:
            t = t + " " * (k - len(t))
        return [t[i:i + k] for i in range(len(t) - k + 1)]

    wins = {d: windows(t) for d, t in docs}
    from collections import Counter
    owner = {}
    for d, ws in wins.items():
        for w in set(ws):
            owner.setdefault(w, set()).add(d)
    for d, ws in wins.items():
        ndup = sum(1 for w in ws if len(owner[w]) >= 2)
        assert out.loc[d, "n_spans"] == len(ws)
        assert out.loc[d, "n_dup_spans"] == ndup, (d, out.loc[d], ndup)
    assert out.loc[2, "n_dup_spans"] == 0
    assert out.loc[3, "n_spans"] == 1 and out.loc[3, "n_dup_spans"] == 1


def test_dup_span_counts_boilerplate_hot_key(ray_session):
    """A substring shared by EVERY doc (boilerplate header) creates one
    giant equal-hash run in the exchange; counts must stay exact and
    the stage must not silently drop or split the run."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.dedup import dup_span_counts

    rng = np.random.default_rng(8)
    header = "standard legal disclaimer text"   # > span_k chars, shared
    docs = [
        (i, header + " " + " ".join(
            f"u{i:04d}w{j}" for j in range(rng.integers(8, 16))))
        for i in range(2000)
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([t for _, t in docs]),
    })).repartition(8)
    k = 20
    out = dup_span_counts(ds, span_k=k).to_pandas().set_index("doc_id")
    assert len(out) == 2000
    # every doc's header windows (positions fully inside the shared
    # prefix+space) are duplicated; per-doc tails are unique-ish but the
    # suffix "uNNNNw0" windows may overlap header boundary — just check
    # the guaranteed lower bound: the len(header)+1-k+1 header windows
    lower = len(header) + 1 - k + 1
    assert (out["n_dup_spans"] >= lower).all()
    # and a doc's dup spans never exceed its total spans
    assert (out["n_dup_spans"] <= out["n_spans"]).all()


# ---------------------------------------------------------------------------
# CCNet-style cross-document line dedup
# ---------------------------------------------------------------------------

def test_line_dedup_matches_oracle(ray_session):
    import numpy as np
    import ray.data as rd

    from cleanlab_ray.stages.dedup import line_dedup_documents

    docs = {
        0: "COOKIE BANNER\nunique prose zero\nfooter text",
        1: "COOKIE BANNER\nunique prose one\nfooter text",
        2: "COOKIE BANNER\nCOOKIE BANNER\nonly here",   # within-doc repeat
        3: "COOKIE BANNER\nfooter text",                 # all lines removed
        4: "",                                           # empty doc
        5: "totally unique document",                    # untouched
    }
    rows = [{"doc_id": k, "text": v} for k, v in docs.items()]
    out = (
        line_dedup_documents(rd.from_items(rows), min_docs=2)
        .to_pandas().set_index("doc_id").sort_index()
    )
    # oracle: line -> distinct docs
    from collections import defaultdict
    seen = defaultdict(set)
    for k, v in docs.items():
        for ln in v.split("\n"):
            seen[ln].add(k)
    dup = {ln for ln, s in seen.items() if len(s) >= 2}
    for k, v in docs.items():
        lines = v.split("\n")
        kept = [ln for ln in lines if ln not in dup]
        row = out.loc[k]
        assert row["text_dedup"] == "\n".join(kept), (k, row["text_dedup"])
        assert row["n_lines"] == len(lines)
        assert row["n_removed"] == len(lines) - len(kept)
    # doc 3 fully boilerplate, doc 4's single empty line is unique ('' in
    # one doc only), doc 5 untouched
    assert out.loc[3, "text_dedup"] == ""
    assert out.loc[5, "n_removed"] == 0


def test_line_dedup_random_vs_oracle(ray_session):
    import numpy as np
    import ray.data as rd

    from cleanlab_ray.stages.dedup import line_dedup_documents

    rng = np.random.default_rng(12)
    vocab = [f"w{i}" for i in range(12)]
    docs = {}
    for d in range(80):
        lines = [
            " ".join(rng.choice(vocab, size=2))
            for _ in range(int(rng.integers(1, 8)))
        ]
        docs[d] = "\n".join(lines)
    rows = [{"doc_id": k, "text": v} for k, v in docs.items()]
    out = (
        line_dedup_documents(
            rd.from_items(rows).repartition(8), min_docs=3
        ).to_pandas().set_index("doc_id").sort_index()
    )
    from collections import defaultdict
    seen = defaultdict(set)
    for k, v in docs.items():
        for ln in v.split("\n"):
            seen[ln].add(k)
    dup = {ln for ln, s in seen.items() if len(s) >= 3}
    assert len(out) == len(docs)
    for k, v in docs.items():
        kept = [ln for ln in v.split("\n") if ln not in dup]
        assert out.loc[k, "text_dedup"] == "\n".join(kept)


def test_ngram_jaccard_empty_input_with_guard(ray_session):
    """max_pairs guard on a zero-row corpus: sum() returns None — the
    guard must treat it as 0 pairs and return an empty result."""
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.dedup import ngram_jaccard_pairs

    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    out = ngram_jaccard_pairs(rd.from_arrow(t), threshold=0.0,
                              max_pairs=100).to_pandas()
    assert len(out) == 0


def test_ngram_jaccard_on_excess_cap_degrades(ray_session):
    """on_excess='cap': a guard-tripping corpus degrades to the largest
    in-budget df_cap instead of raising; result equals the explicit
    df_cap run; non-tripping corpora stay exact."""
    import warnings

    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.dedup import ngram_jaccard_pairs

    # every doc shares the same text -> one fat shingle run per shingle
    t = pa.table({"doc_id": pa.array(range(40), type=pa.int64()),
                  "text": pa.array(["common shared boilerplate"] * 40)})
    ds = rd.from_arrow(t)
    with pytest.raises(ValueError):
        ngram_jaccard_pairs(ds, threshold=0.0, max_pairs=100)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        capped = ngram_jaccard_pairs(ds, threshold=0.0, max_pairs=100,
                                     on_excess="cap").to_pandas()
    assert any("df_cap" in str(x.message) for x in w)
    # all shingles have df=40 > any in-budget cap -> no pairs survive
    assert len(capped) == 0

    # a corpus under the budget is untouched (exact semantics)
    t2 = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                   "text": pa.array([f"doc number {i} text" for i in range(4)])})
    exact = ngram_jaccard_pairs(rd.from_arrow(t2), threshold=0.0,
                                max_pairs=None).to_pandas()
    auto = ngram_jaccard_pairs(rd.from_arrow(t2), threshold=0.0,
                               max_pairs=1e6, on_excess="cap").to_pandas()
    key = ["doc_a", "doc_b"]
    assert exact.sort_values(key).reset_index(drop=True).equals(
        auto.sort_values(key).reset_index(drop=True))


def test_ngram_jaccard_cap_keeps_planted_dups(ray_session):
    """Stop-shingle-removal semantics: duplicates whose shingles are
    mostly corpus-common still score ~1.0 under a df cap, because the
    denominators shrink to the surviving universe too."""
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.dedup import ngram_jaccard_pairs

    boiler = "common boilerplate every document repeats verbatim"
    texts = [f"{boiler} unique tail {i:04d}" for i in range(30)]
    texts.append(texts[7])  # planted exact duplicate of doc 7
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    got = ngram_jaccard_pairs(rd.from_arrow(t), threshold=0.9,
                              df_cap=5).to_pandas()
    assert [(r.doc_a, r.doc_b) for r in got.itertuples()] == [(7, 30)]
    assert got["jaccard_e6"].iloc[0] == 1_000_000


def test_connected_components_empty_edges(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.components import connected_components

    edges = rd.from_arrow(pa.table({
        "doc_a": pa.array([], type=pa.int64()),
        "doc_b": pa.array([], type=pa.int64())}))
    out = connected_components(edges, src_col="doc_a", dst_col="doc_b")
    assert out.count() == 0


def test_leakage_safe_split_groups_stay_together(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from cleanlab_ray.stages.dedup import leakage_safe_split

    # 40 unique texts + two duplicate groups whose copies land in
    # different input blocks
    texts = [f"unique document number {i} with words" for i in range(40)]
    texts += ["duplicated payload alpha"] * 3 + ["duplicated payload beta"] * 4
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts)})
    out = leakage_safe_split(
        rd.from_arrow(t).repartition(5), train_frac=0.5).to_pandas()
    assert len(out) == len(texts)
    by_text = {}
    for did, tx in zip(ids, texts):
        by_text.setdefault(tx, []).append(did)
    side = dict(zip(out["doc_id"], out["split"]))
    for tx, group in by_text.items():
        assert len({side[d] for d in group}) == 1, tx
    # split is a pure function of the group min key: repartitioning
    # cannot change the assignment
    out2 = leakage_safe_split(
        rd.from_arrow(t).repartition(2), train_frac=0.5).to_pandas()
    assert dict(zip(out2["doc_id"], out2["split"])) == side
    # both sides populated at frac=0.5 over 42 groups
    assert set(out["split"]) == {"train", "holdout"}

    assert set(leakage_safe_split(rd.from_arrow(t), train_frac=1.0)
               .to_pandas()["split"]) == {"train"}
    assert set(leakage_safe_split(rd.from_arrow(t), train_frac=0.0)
               .to_pandas()["split"]) == {"holdout"}
    with pytest.raises(ValueError):
        leakage_safe_split(rd.from_arrow(t), train_frac=1.5)


def test_leakage_safe_split_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.dedup import leakage_safe_split

    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    assert leakage_safe_split(rd.from_arrow(t)).count() == 0


def test_near_dup_safe_split_components_stay_together(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.dedup import (
        leakage_safe_split, make_band_bucket_fn, near_dup_safe_split)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    texts = [f"unique number {i} document with several words {i}" for i in range(30)]
    texts += [base, base, base + " extra", base.replace("quick", "swift")]
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts)})

    out = near_dup_safe_split(
        rd.from_arrow(t).repartition(4), train_frac=0.5).to_pandas()
    assert sorted(out["doc_id"]) == ids
    side = dict(zip(out["doc_id"], out["split"]))

    # derive the expected candidate components from the SAME banding
    # kernel (itself oracle-checked via near_dup_documents /
    # incremental_ingest) + a python union-find
    buckets = make_band_bucket_fn(64, 8, 5)(pa.array(texts))
    parent = list(ids)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_bucket = {}
    for i in ids:
        for bkt in buckets[i]:
            by_bucket.setdefault(int(bkt), []).append(i)
    for members in by_bucket.values():
        for m in members[1:]:
            parent[find(m)] = find(members[0])
    comps = {}
    for i in ids:
        comps.setdefault(find(i), []).append(i)
    # every candidate component on one side, singletons included
    for members in comps.values():
        assert len({side[m] for m in members}) == 1
    # the planted near-dup family must actually be one component
    fam = {find(i) for i in (30, 31, 32, 33)}
    assert len(fam) == 1
    # singleton docs agree with the exact-dup split (same salt, min=self)
    exact = dict(zip(*[leakage_safe_split(
        rd.from_arrow(t), train_frac=0.5).to_pandas()[c]
        for c in ("doc_id", "split")]))
    for members in comps.values():
        if len(members) == 1:
            assert side[members[0]] == exact[members[0]]
    # partitioning invariance
    out2 = near_dup_safe_split(
        rd.from_arrow(t).repartition(7), train_frac=0.5).to_pandas()
    assert dict(zip(out2["doc_id"], out2["split"])) == side


def test_near_dup_safe_split_empty_and_frac(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from cleanlab_ray.stages.dedup import near_dup_safe_split

    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    assert near_dup_safe_split(rd.from_arrow(empty)).count() == 0
    with pytest.raises(ValueError):
        near_dup_safe_split(rd.from_arrow(empty), train_frac=-0.1)
    t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "text": pa.array(["aaaa bbbb", "cccc dddd", "eeee ffff"])})
    got = near_dup_safe_split(rd.from_arrow(t), train_frac=1.0).to_pandas()
    assert set(got["split"]) == {"train"} and len(got) == 3
