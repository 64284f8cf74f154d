"""Distributed inverted index (term -> document-frequency + postings).

The classic IR build, Ray-Data-shaped: one vectorized map emits each
document's DISTINCT terms as (term, doc) postings (a document is one
row, so postings are globally distinct by construction — no pre-shuffle
dedup pass is needed), then ONE sort exchange on the term co-locates
each term's postings and a whole-block kernel computes df and emits the
posting rows. Text never shuffles; the exchange moves exactly
sum(distinct terms per doc) small rows.

Scale notes: stop-word terms (df ~ corpus size) produce oversized runs;
``df_range`` bounds what the index RETURNS, and because df is computed
before emission, runs outside the range are dropped inside the block
kernel — the full posting lists of stop words are never materialized
into the output. The sort itself still moves their postings; a
production variant would pre-drop terms whose per-block df already
exceeds the cap (a strict superset of the final drop, applied
map-side). That map-side guard is ``prefilter_cap``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def doc_term_postings(batch: pa.Table, text_col: str, key_col: str) -> pa.Table:
    """(term, doc) rows, distinct per document, fully vectorized."""
    from cleanlab_ray.stages.quality_signals import _tokens

    codes, row_ids, _lens, vocab, _n = _tokens(batch, text_col)
    keys = batch[key_col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if len(codes) == 0:
        return pa.table({"word": pa.array([], type=pa.string()),
                         "doc_id": keys.slice(0, 0)})
    width = int(codes.max()) + 1
    pair = np.unique(row_ids * width + codes)
    rows = (pair // width).astype(np.int64)
    terms = (pair % width).astype(np.int64)
    return pa.table({
        "word": pa.chunked_array([vocab]).combine_chunks().take(pa.array(terms)),
        "doc_id": keys.take(pa.array(rows)),
    })


def inverted_index(
    ds,
    text_col: str = "text",
    key_col: str = "doc_id",
    df_range: tuple[int, int] = (2, 1 << 62),
    prefilter_cap: int | None = None,
):
    """Dataset[(word, df, doc_id)] for terms with df in ``df_range``
    (inclusive). ``prefilter_cap``: map-side drop of terms whose
    distinct-doc count within a single block already exceeds the upper
    bound — sound (per-block df <= global df) and keeps stop-word
    postings out of the exchange."""
    from cleanlab_ray.stages.dedup import _sorted_block_map

    lo, hi = df_range

    def postings(batch: pa.Table) -> pa.Table:
        out = doc_term_postings(batch, text_col, key_col)
        if prefilter_cap is not None and out.num_rows:
            import pyarrow.compute as pc

            enc = out["word"].combine_chunks() if isinstance(
                out["word"], pa.ChunkedArray
            ) else out["word"]
            enc = enc.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            df_block = np.bincount(codes)
            out = out.filter(pa.array(df_block[codes] <= prefilter_cap))
        return out

    def per_term(batch: pa.Table) -> pa.Table:
        w = batch["word"]
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        n = len(w)
        if n == 0:
            return pa.table({"word": w, "df": pa.array([], type=pa.int64()),
                             "doc_id": batch["doc_id"]})
        # block is sorted by word (the _sorted_block_map guarantee)
        arr = np.asarray(w.to_pandas(), dtype=object)
        change = np.ones(n, dtype=bool)
        change[1:] = arr[1:] != arr[:-1]
        run_id = np.cumsum(change) - 1
        df = np.bincount(run_id).astype(np.int64)
        row_df = df[run_id]
        keep = (row_df >= lo) & (row_df <= hi)
        out = batch.filter(pa.array(keep))
        return pa.table({
            "word": out["word"],
            "df": pa.array(row_df[keep]),
            "doc_id": out["doc_id"],
        })

    base = ds.select_columns([key_col, text_col]).map_batches(
        postings, batch_format="pyarrow"
    )
    return _sorted_block_map(base, "word", per_term)
