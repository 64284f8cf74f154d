"""Gopher-style per-document quality signals + corpus vocabulary stats.

Web-scale training-data pipelines gate documents on word-level quality
rules (Rae et al. 2021 "Scaling Language Models" §A1.1: word counts,
mean word length, stop-word presence, duplicate n-gram fractions) and
build corpus vocabularies (heavy-hitter word counts) before tokenizer
training. Both are per-batch Arrow/numpy kernels here:

- ``quality_signals_kernel``: one batch pass computing n_words,
  mean_word_len, stopword_frac, top_word_frac (most frequent word's
  share) and dup_2gram_frac (1 - distinct/total adjacent word pairs)
  for every document. Tokens come straight from the Arrow list array
  of a regex split — per-row stats are bincounts over the flattened
  token stream, never a Python loop over rows.
- ``vocab_partial_counts``: per-batch partial word counts (dictionary
  encode + bincount) to pre-aggregate before the small global groupby,
  so the shuffle moves one row per DISTINCT word per batch instead of
  one per token (the map-side combine the north rule requires of
  wide aggregations).

Stop-word list is fixed and tiny (function words of the synthetic
corpus); swap for a real list at deployment — the kernel is a set
lookup against the batch dictionary, O(V) per batch either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a")


def _tokens(batch: pa.Table, text_col: str):
    """Flattened token codes + row ids from one regex split.

    Returns (codes int64 (M,), row_ids int64 (M,), token_lens int64
    (M,), vocab StringArray (V,), n_rows). Empty tokens (leading /
    trailing / repeated whitespace) are dropped, preserving within-row
    order so adjacency-based n-grams stay correct.
    """
    n = batch.num_rows
    filled = pc.fill_null(batch[text_col], "")
    toks = pc.split_pattern_regex(filled, r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    row_ids = np.repeat(
        np.arange(n, dtype=np.int64), pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    )
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = lens > 0
    enc = flat.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    if not keep.all():
        codes, row_ids, lens = codes[keep], row_ids[keep], lens[keep]
    return codes, row_ids, lens, vocab, n


def quality_signals_kernel(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    codes, row_ids, lens, vocab, n = _tokens(batch, text_col)
    n_words = np.bincount(row_ids, minlength=n).astype(np.int64)
    char_sum = np.bincount(row_ids, weights=lens, minlength=n)
    safe = np.maximum(n_words, 1).astype(np.float64)
    mean_word_len = np.where(n_words > 0, char_sum / safe, 0.0)

    stop_mask = (
        pc.is_in(vocab, value_set=pa.array(list(STOPWORDS)))
        .to_numpy(zero_copy_only=False)
        if len(vocab) else np.zeros(0, dtype=bool)
    )
    stop_cnt = np.bincount(row_ids[stop_mask[codes]], minlength=n)
    stopword_frac = np.where(n_words > 0, stop_cnt / safe, 0.0)

    # per-row word histogram: sort (row, code) once, count runs (NO
    # composite row*v+code keys anywhere in this kernel — they overflow
    # int64 at large block x vocab sizes and corrupt silently)
    if len(codes):
        order = np.lexsort((codes, row_ids))
        rr, cc = row_ids[order], codes[order]
        first = np.ones(len(rr), dtype=bool)
        first[1:] = (rr[1:] != rr[:-1]) | (cc[1:] != cc[:-1])
        starts = np.flatnonzero(first)
        run_cnt = np.diff(np.append(starts, len(rr)))
        top_cnt = np.zeros(n, dtype=np.int64)
        np.maximum.at(top_cnt, rr[starts], run_cnt)
    else:
        top_cnt = np.zeros(n, dtype=np.int64)
    top_word_frac = np.where(n_words > 0, top_cnt / safe, 0.0)

    # adjacent 2-grams within a row: positions j, j+1 with equal row id;
    # distinct pairs per row via one lexsort + first-occurrence mask
    adj = row_ids[:-1] == row_ids[1:] if len(row_ids) else np.zeros(0, bool)
    prow = row_ids[:-1][adj]
    pa_, pb = codes[:-1][adj], codes[1:][adj]
    n_pairs = np.bincount(prow, minlength=n).astype(np.int64)
    if len(prow):
        order = np.lexsort((pb, pa_, prow))
        pr, x, y = prow[order], pa_[order], pb[order]
        first = np.ones(len(pr), dtype=bool)
        first[1:] = (pr[1:] != pr[:-1]) | (x[1:] != x[:-1]) | (y[1:] != y[:-1])
        distinct = np.bincount(pr[first], minlength=n)
    else:
        distinct = np.zeros(n, dtype=np.int64)
    psafe = np.maximum(n_pairs, 1).astype(np.float64)
    dup_2gram_frac = np.where(n_pairs > 0, (n_pairs - distinct) / psafe, 0.0)

    return pa.table(
        {
            id_col: batch[id_col],
            "n_words": pa.array(n_words, type=pa.int64()),
            "mean_word_len": pa.array(mean_word_len, type=pa.float64()),
            "stopword_frac": pa.array(stopword_frac, type=pa.float64()),
            "top_word_frac": pa.array(top_word_frac, type=pa.float64()),
            "dup_2gram_frac": pa.array(dup_2gram_frac, type=pa.float64()),
        }
    )


def vocab_partial_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Map-side combine for the corpus vocabulary count: one output row
    per distinct word in the batch (the global groupby then moves
    O(V x batches) rows, not O(total tokens))."""
    codes, _row_ids, _lens, vocab, _n = _tokens(batch, text_col)
    cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
    keep = cnt > 0
    return pa.table(
        {
            "word": vocab.filter(pa.array(keep)) if len(vocab) else vocab,
            "cnt": pa.array(cnt[keep], type=pa.int64()),
        }
    )
