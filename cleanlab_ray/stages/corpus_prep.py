"""Benchmark decontamination + token-budget document chunking.

Two training-corpus-preparation operators that large-scale LLM data
pipelines run alongside cleanlab-style quality filtering (public
practice: GPT-3 Appendix C / Llama-2 §A.6 n-gram decontamination;
fixed-token-window chunking before tokenization):

- **Decontamination**: flag corpus documents sharing any word n-gram
  with a benchmark/eval set. The benchmark side is tiny by construction
  (eval sets are thousands of docs vs a 100-TB corpus), so its distinct
  gram set is collected once and BROADCAST via ``ray.put``; the corpus
  side is a single stateless ``map_batches`` pass — no shuffle touches
  the big table. Here the "benchmark" is the deterministic slice
  ``doc_id % BENCH_MOD == 0`` of the synthetic documents table.
- **Chunking**: split every document into consecutive ``chunk_words``
  word windows, emitting one row per chunk. One vectorized batch
  kernel: the chunk boundaries tile the flattened token stream, so the
  chunk texts come from a single ``pc.binary_join`` over a
  LargeListArray re-slicing of the token buffer — no per-row Python.

Both kernels share the vectorized ``word_ngrams`` /
:func:`_flat_tokens` machinery (same whitespace tokenization as
``stages/quality_signals.py``, cf. cleanlab's per-batch token utils at
/root/reference/cleanlab/internal/token_classification_utils.py:10-120).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: documents with doc_id % BENCH_MOD == 0 form the synthetic benchmark.
BENCH_MOD = 37


def _flat_tokens(batch: pa.Table, text_col: str, lower: bool):
    """(tokens StringArray (M,), row_ids int64 (M,), n_rows) with empty
    tokens dropped, within-row order preserved (matches DuckDB
    ``regexp_extract_all(text, '[^\\s]+')``)."""
    nr = batch.num_rows
    filled = pc.fill_null(batch[text_col], "")
    if lower:
        filled = pc.utf8_lower(filled)
    toks = pc.split_pattern_regex(filled, r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    row_ids = np.repeat(
        np.arange(nr, dtype=np.int64),
        pc.list_value_length(toks).to_numpy(zero_copy_only=False),
    )
    keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    if not bool(keep.all()):
        flat = flat.filter(pa.array(keep))
        row_ids = row_ids[keep]
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, row_ids, nr


def word_ngrams(batch: pa.Table, text_col: str = "text", n: int = 5, lower: bool = True):
    """Flattened word n-gram strings for a batch, fully vectorized.

    Returns (grams StringArray (G,), row_ids int64 (G,), n_rows).
    Grams are built by joining ``n`` zero-copy slices of the flat token
    array element-wise — one Arrow kernel call, no row loop.
    """
    flat, row_ids, nr = _flat_tokens(batch, text_col, lower)
    m = len(flat)
    if m < n:
        return pa.array([], type=pa.string()), np.empty(0, np.int64), nr
    valid = row_ids[: m - n + 1] == row_ids[n - 1 :]
    parts = [flat.slice(j, m - n + 1) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    grams = grams.filter(pa.array(valid))
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    return grams, row_ids[: m - n + 1][valid], nr


def benchmark_gram_partials(
    batch: pa.Table, text_col: str = "text", n: int = 5, bench_mod: int = BENCH_MOD
) -> pa.Table:
    """Per-batch DISTINCT benchmark grams (map-side combine for the tiny
    broadcast side)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    sub = batch.filter(pa.array(ids % bench_mod == 0))
    grams, _rows, _nr = word_ngrams(sub, text_col, n)
    return pa.table({"gram": pc.unique(grams)})


def collect_benchmark_grams(ds, text_col: str = "text", n: int = 5,
                            bench_mod: int = BENCH_MOD) -> frozenset:
    """Distinct word n-grams of the benchmark slice, driver-collected.

    The benchmark set is small by definition (an eval suite), so
    collecting its distinct grams to the driver and broadcasting is the
    scale-correct plan — the alternative (shuffle-join 100 TB of corpus
    grams against it) moves the big side.
    """
    parts = ds.map_batches(
        lambda b: benchmark_gram_partials(b, text_col, n, bench_mod),
        batch_format="pyarrow",
    )
    return frozenset(r["gram"] for r in parts.take_all())


class ContaminationScorer:
    """Actor-pool stage: broadcast benchmark gram set held once per
    actor (``ray.get`` in ``__init__``), per-batch vectorized overlap
    counting (dictionary-encode grams, set-test the V distinct grams,
    map back through codes)."""

    def __init__(self, gram_ref, text_col: str = "text", n: int = 5,
                 bench_mod: int = BENCH_MOD):
        import ray

        bench = gram_ref if isinstance(gram_ref, frozenset) else ray.get(gram_ref)
        # sorted array ONCE per actor: per-batch membership is then a
        # vectorized searchsorted, not a Python set probe per distinct
        # gram (same pattern as ImportanceScorer._weights)
        self.bench_sorted = np.sort(np.asarray(list(bench), dtype=object))
        self.text_col = text_col
        self.n = n
        self.bench_mod = bench_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % self.bench_mod != 0))
        grams, row_ids, nr = word_ngrams(batch, self.text_col, self.n)
        n_grams = np.bincount(row_ids, minlength=nr).astype(np.int64)
        if len(grams):
            enc = grams.dictionary_encode()
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = np.asarray(enc.indices)
            vocab = np.asarray(enc.dictionary.to_numpy(zero_copy_only=False))
            if len(self.bench_sorted):
                pos = np.searchsorted(self.bench_sorted, vocab)
                pos_c = np.minimum(pos, len(self.bench_sorted) - 1)
                hit = self.bench_sorted[pos_c] == vocab
            else:
                hit = np.zeros(len(vocab), dtype=bool)
            n_matched = np.bincount(row_ids[hit[codes]], minlength=nr).astype(np.int64)
        else:
            n_matched = np.zeros(nr, dtype=np.int64)
        frac = n_matched / np.maximum(n_grams, 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_grams": pa.array(n_grams, type=pa.int64()),
                "n_matched": pa.array(n_matched, type=pa.int64()),
                "contam_frac": pa.array(frac, type=pa.float64()),
                "contaminated": pa.array((n_matched > 0).astype(np.int64), type=pa.int64()),
            }
        )


def chunk_documents_kernel(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id",
    chunk_words: int = 50,
) -> pa.Table:
    """One row per ``chunk_words``-word window of each document.

    Chunks partition each row's kept tokens and rows are adjacent in
    the flat token stream, so the chunk start offsets are a valid
    monotone offsets vector over that stream: the chunk texts are one
    ``pc.binary_join`` over a LargeListArray view — zero copies of the
    token data, no per-row loop. Documents with no words emit nothing.
    """
    flat, row_ids, nr = _flat_tokens(batch, text_col, lower=False)
    n_words = np.bincount(row_ids, minlength=nr).astype(np.int64)
    n_chunks = -(-n_words // chunk_words)  # ceil; 0 words -> 0 chunks
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table(
            {
                id_col: pa.array([], type=batch[id_col].type),
                "chunk_idx": pa.array([], type=pa.int64()),
                "chunk_text": pa.array([], type=pa.string()),
                "n_words": pa.array([], type=pa.int64()),
            }
        )
    row_starts = np.zeros(nr, dtype=np.int64)
    first_chunk = np.zeros(nr, dtype=np.int64)
    if nr > 1:
        np.cumsum(n_words[:-1], out=row_starts[1:])
        np.cumsum(n_chunks[:-1], out=first_chunk[1:])
    crow = np.repeat(np.arange(nr, dtype=np.int64), n_chunks)
    within = np.arange(total, dtype=np.int64) - first_chunk[crow]
    starts = row_starts[crow] + within * chunk_words
    ends = np.minimum(starts + chunk_words, (row_starts + n_words)[crow])
    offsets = np.append(starts, len(flat))  # ends[k] == starts[k+1]: chunks tile
    lists = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), flat)
    chunk_text = pc.binary_join(lists, " ")
    return pa.table(
        {
            id_col: batch[id_col].take(pa.array(crow)),
            "chunk_idx": pa.array(within, type=pa.int64()),
            "chunk_text": chunk_text,
            "n_words": pa.array(ends - starts, type=pa.int64()),
        }
    )
