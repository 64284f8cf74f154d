"""Distributed TF-IDF top-terms per document.

Corpus indexing / keyword-extraction primitive: for every document,
the k terms with the highest tf·idf. Because one document is one row,
document frequency is exactly computable with a map-side combine —
each batch emits (word, #docs-in-batch-containing-word) and a single
small ``groupby(word).sum`` finishes the global df vector; the corpus
never shuffles. The df table is broadcast (``ray.put``) and one
stateless scoring pass ranks terms per document fully vectorized
(dictionary-encode → unique (row, word) pair counts → one
``np.lexsort`` per batch).

Ranking is by the integer-exact key (tf DESC, df ASC, term ASC) — a
tf-idf-monotone ordering wherever idf agrees (same tf: rarer term
wins), chosen so engine and SQL oracle rank on integers and never on
float ties. The reported ``score_e6`` is tf·ln(N/df) in 1e-6 units.

Scale note: the broadcast df table is O(vocab). At 100-TB scale cap it
to terms with df ≥ min_df (rare terms score ≈ tf·ln N anyway and the
long tail is hapax noise) or hash terms into buckets as in
``stages/importance.py:hashed_llr_table``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cleanlab_ray.stages.corpus_prep import _flat_tokens


def df_partials(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch document-frequency partials: (word, n docs in this
    batch containing it). Exact globally because a document is a row."""
    flat, row_ids, _nr = _flat_tokens(batch, text_col, lower=True)
    if len(flat) == 0:
        return pa.table(
            {"word": pa.array([], type=pa.string()),
             "df": pa.array([], type=pa.int64())}
        )
    enc = flat.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, dtype=np.int64)
    v = len(enc.dictionary)
    pair = np.unique(row_ids * v + codes)
    df = np.bincount((pair % v).astype(np.int64), minlength=v)
    return pa.table(
        {"word": enc.dictionary, "df": pa.array(df, type=pa.int64())}
    )


class TfIdfTopK:
    """Scoring stage: broadcast (sorted words, df, N) held once per
    worker; per batch one lexsort ranks every document's terms."""

    def __init__(self, df_ref, k: int = 3, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        words, df, n_docs = df_ref if isinstance(df_ref, tuple) else ray.get(df_ref)
        self.words = words
        self.df = df
        self.n_docs = float(n_docs)
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, row_ids, _nr = _flat_tokens(batch, self.text_col, lower=True)
        empty = pa.table(
            {
                self.id_col: pa.array([], type=batch[self.id_col].type),
                "term": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
                "df": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
                "score_e6": pa.array([], type=pa.int64()),
            }
        )
        if len(flat) == 0:
            return empty
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        v = len(enc.dictionary)
        pair, tf = np.unique(row_ids * v + codes, return_counts=True)
        prow = (pair // v).astype(np.int64)
        pcode = (pair % v).astype(np.int64)
        vocab = np.asarray(enc.dictionary.to_numpy(zero_copy_only=False))
        wpos = np.searchsorted(self.words, vocab)  # global term order + df lookup
        pdf = self.df[wpos[pcode]]
        order = np.lexsort((wpos[pcode], pdf, -tf, prow))
        prow_s = prow[order]
        first = np.concatenate([[0], 1 + np.flatnonzero(prow_s[1:] != prow_s[:-1])])
        starts = np.zeros(len(prow_s), dtype=np.int64)
        starts[first] = first
        np.maximum.accumulate(starts, out=starts)
        rank = np.arange(len(prow_s), dtype=np.int64) - starts + 1
        keep = rank <= self.k
        sel = order[keep]
        score = tf[sel] * np.log(self.n_docs / self.df[wpos[pcode[sel]]])
        return pa.table(
            {
                self.id_col: batch[self.id_col].take(pa.array(prow[sel])),
                "term": enc.dictionary.take(pa.array(pcode[sel])),
                "tf": pa.array(tf[sel].astype(np.int64), type=pa.int64()),
                "df": pa.array(pdf[sel].astype(np.int64), type=pa.int64()),
                "rank": pa.array(rank[keep], type=pa.int64()),
                "score_e6": pa.array(
                    np.floor(score * 1e6 + 0.5).astype(np.int64), type=pa.int64()
                ),
            }
        )


def tfidf_topk(ds, k: int = 3, text_col: str = "text", id_col: str = "doc_id"):
    """Full TF-IDF pass: df combine → broadcast → rank. Returns a
    Dataset of (id, term, tf, df, rank, score_e6)."""
    import ray

    from cleanlab_ray.functions.frames import typed_pandas

    n_docs = ds.count()
    dft = typed_pandas(
        ds.map_batches(lambda b: df_partials(b, text_col), batch_format="pyarrow")
        .groupby("word")
        .sum("df"),
        {"word": object, "sum(df)": "int64"},
    )
    words = dft["word"].to_numpy()
    order = np.argsort(words)
    ref = ray.put((words[order], dft["sum(df)"].to_numpy()[order].astype(np.int64), n_docs))
    return ds.map_batches(
        TfIdfTopK,
        fn_constructor_kwargs={"df_ref": ref, "k": k, "text_col": text_col,
                               "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
