"""curate_documents: each flag kills exactly its target docs."""

import numpy as np
import pyarrow as pa


def test_curation_flags(ray_session):
    import ray.data as rd

    from cleanlab_ray.pipelines.corpus_curation import curate_documents

    good = ("the quick brown fox jumps over the lazy dog and then walks "
            "back home through the quiet garden before dinner time")
    docs = [
        (0, good),                                # keep
        (1, good),                                # exact dup of 0 -> dropped (not canonical)
        (2, "der schnelle braune fuchs springt über den faulen hund und "
            "läuft dann durch den stillen garten nach hause zurück"),  # German
        (3, "word word word word word word word word"),  # top_word_frac = 1
        (4, "hi"),                                # too few words
        (5, good + " with a fresh unique ending that nobody else shares "
            "anywhere in this corpus at all today"),  # shares >30% spans with 0/1
        (6, "when people look for water they will find more than one way "
            "to make time for their work and could then write about it"),
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([t for _, t in docs]),
    })).repartition(3)
    out = curate_documents(ds).to_pandas().set_index("doc_id").sort_index()

    assert out.loc[0, "keep"] == 0 or out.loc[0, "dup_ok"] == 0
    # doc 0 is canonical but fully span-duplicated by doc 1
    assert out.loc[0, "canonical"] == 1 and out.loc[0, "dup_ok"] == 0
    assert out.loc[1, "canonical"] == 0
    assert out.loc[2, "lang_ok"] == 0          # German
    assert out.loc[3, "quality_ok"] == 0       # dominated by one token
    assert out.loc[4, "quality_ok"] == 0       # too short
    assert out.loc[6, "keep"] == 1             # clean original doc
    assert (out["keep"] == (out[["lang_ok", "quality_ok", "canonical",
                                 "dup_ok"]].min(axis=1))).all()
