"""Stateless per-turn heuristic quality features (vectorized).

The north rule's heuristic rules — length, repetition ratio,
symbol/word ratio — computed over Arrow string batches with
pyarrow.compute kernels plus one factorize-based vectorized
unique-token count (no per-row Python loops).

Output columns (all float32 unless noted):
  n_chars int32, n_tokens int32, repetition_ratio, symbol_ratio,
  short_flag (bool), empty_flag (bool)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[^\s]+"
SYMBOL_RE = r"[^A-Za-z0-9\s]"


def _unique_token_ratio(col) -> np.ndarray:
    """Per-row distinct/total token ratio, fully vectorized:
    split -> flat token array + parent row ids -> pandas factorize ->
    np.unique over (row, code) pairs.

    ascii_split_whitespace splits on the same class as the regex
    ``\\s+`` (space, TAB..CR) but runs ~9x faster than the RE2 kernel;
    empty tokens from leading/trailing whitespace are filtered below
    either way."""
    import pandas as pd

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tokens = pc.ascii_split_whitespace(pc.fill_null(col, ""))
    n = len(tokens)
    flat = tokens.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
    # Arrow dictionary_encode replaces flatten->numpy-object + pandas
    # factorize (one C++ hash pass instead of two Python-object passes)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # drop empty tokens produced by splitting empty/whitespace strings
    empty_idx = pc.index_in(pa.array([""]), enc.dictionary)[0].as_py()
    if empty_idx is not None:
        nonempty = codes != empty_idx
        codes, row_ids = codes[nonempty], row_ids[nonempty]
    total = np.bincount(row_ids, minlength=n).astype(np.float64)
    if len(codes):
        width = int(codes.max()) + 1
        pair = row_ids * width + codes
        uniq_pairs = np.unique(pair)
        uniq_rows = uniq_pairs // width
        distinct = np.bincount(uniq_rows, minlength=n).astype(np.float64)
    else:
        distinct = np.zeros(n)
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = np.where(total > 0, distinct / np.maximum(total, 1.0), 1.0)
    return ratio, total


def heuristic_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    col = batch[text_col]
    filled = pc.fill_null(col, "")
    n_chars = pc.utf8_length(filled)
    n_symbols = pc.count_substring_regex(filled, SYMBOL_RE)
    nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
    ns = n_symbols.to_numpy(zero_copy_only=False).astype(np.float64)
    # n_tokens (== count of \S+ runs) falls out of the whitespace split
    # already needed for the uniqueness ratio — one regex pass saved
    uniq_ratio, token_total = _unique_token_ratio(filled)
    nt = token_total
    n_tokens = pa.array(token_total.astype(np.int64))
    repetition_ratio = 1.0 - uniq_ratio
    symbol_ratio = np.where(nc > 0, ns / np.maximum(nc, 1.0), 0.0)
    batch = batch.append_column("n_chars", n_chars.cast(pa.int32()))
    batch = batch.append_column("n_tokens", n_tokens.cast(pa.int32()))
    batch = batch.append_column(
        "repetition_ratio", pa.array(repetition_ratio, type=pa.float32())
    )
    batch = batch.append_column("symbol_ratio", pa.array(symbol_ratio, type=pa.float32()))
    batch = batch.append_column("short_flag", pa.array(nt < 3, type=pa.bool_()))
    batch = batch.append_column("empty_flag", pa.array(nt == 0, type=pa.bool_()))
    return batch
