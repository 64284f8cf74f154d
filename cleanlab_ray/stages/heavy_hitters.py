"""Misra–Gries heavy-hitter sketch over a token stream.

The exact corpus vocabulary count (``stages/quality_signals.py:
vocab_partial_counts`` + global groupby) shuffles O(distinct words ×
batches) rows. At 100-TB scale, when only the top-k matters, the
Misra–Gries summary (Misra & Gries 1982; merge rule per Agarwal et al.
2013 "Mergeable Summaries") bounds EVERY moving part at O(capacity):

- each block folds its token counts into a capacity-``c`` MG summary
  (vectorized: exact per-block bincount first — a block's distinct set
  fits memory — then a single decrement-and-trim);
- summaries are merged pairwise (sum counters, subtract the
  (c+1)-largest weight, drop ≤0) — the standard mergeable-summary rule;
- the result overestimates nothing and underestimates any word's true
  count by at most (total_tokens − retained_mass) / (c + 1); every word
  with true count above that bound is GUARANTEED present.

The driver receives one O(c) summary. When ``c`` ≥ the corpus distinct
count, no trim ever fires and the sketch is EXACT — the regime the SQL
oracle checks; the error bound itself is pytest-checked in the lossy
regime against brute-force counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cleanlab_ray.stages.quality_signals import _tokens


def _mg_trim(words: np.ndarray, counts: np.ndarray, capacity: int):
    """Keep ≤ capacity entries: subtract the (capacity+1)-largest count
    from all, drop ≤ 0 (one vectorized partition, no per-entry loop)."""
    if len(words) <= capacity:
        return words, counts
    kth = np.partition(counts, len(counts) - capacity - 1)[len(counts) - capacity - 1]
    counts = counts - kth
    keep = counts > 0
    return words[keep], counts[keep]


def _mg_merge(wa, ca, wb, cb, capacity: int):
    """Merge two MG summaries: sum counters on the union, then trim."""
    words = np.concatenate([wa, wb])
    counts = np.concatenate([ca, cb])
    uniq, inv = np.unique(words, return_inverse=True)
    summed = np.bincount(inv, weights=counts, minlength=len(uniq)).astype(np.int64)
    return _mg_trim(uniq, summed, capacity)


def _pack(words: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Flat uint8 accumulator: [n, blob_len] int64 header + int64
    counts + '\\n'-joined utf-8 words (tokens are whitespace-split, so
    words never contain '\\n'). A flat numeric ndarray serializes
    zero-copy through Arrow — object arrays hit Ray's pickle fallback
    with a per-block traceback."""
    blob = "\n".join([str(w) for w in words]).encode() if len(words) else b""
    header = np.array([len(words), len(blob)], dtype=np.int64).tobytes()
    buf = header + np.ascontiguousarray(counts, dtype=np.int64).tobytes() + blob
    return np.frombuffer(buf, dtype=np.uint8).copy()


def _unpack(acc: np.ndarray):
    buf = np.ascontiguousarray(acc, dtype=np.uint8).tobytes()
    n, blen = np.frombuffer(buf[:16], dtype=np.int64)
    n, blen = int(n), int(blen)
    counts = np.frombuffer(buf[16 : 16 + 8 * n], dtype=np.int64).copy()
    words = (
        np.array(buf[16 + 8 * n : 16 + 8 * n + blen].decode().split("\n"), dtype=object)
        if n
        else np.array([], dtype=object)
    )
    return words, counts


def make_mg_aggfn(capacity: int, text_col: str = "text"):
    """AggregateFn computing a Misra–Gries summary of the corpus word
    stream. Accumulator = one flat uint8 ndarray (see ``_pack``) — the
    engine's flat-ndarray accumulator contract (tests/conftest)."""
    from ray.data.aggregate import AggregateFn

    empty = _pack(np.array([], dtype=object), np.array([], dtype=np.int64))

    def accumulate_block(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        codes, _rows, _lens, vocab, _n = _tokens(block, text_col)
        if len(vocab) == 0:
            return acc
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        keep = cnt > 0
        bw = np.asarray(vocab.to_numpy(zero_copy_only=False), dtype=object)[keep]
        bc = cnt[keep]
        aw, ac = _unpack(acc)
        w, c = _mg_merge(aw, ac, bw, bc, capacity)
        return _pack(w, c)

    def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        aw, ac = _unpack(a)
        bw, bc = _unpack(b)
        w, c = _mg_merge(aw, ac, bw, bc, capacity)
        return _pack(w, c)

    return AggregateFn(
        init=lambda _k: empty.copy(),
        accumulate_block=accumulate_block,
        merge=merge,
        name="mg_summary",
    )


def heavy_hitters(ds, k: int, capacity: int | None = None,
                  text_col: str = "text") -> pa.Table:
    """Top-k words by MG summary weight (deterministic tie-break:
    weight DESC, word ASC). ``capacity`` defaults to 8·k (a standard
    slack so true heavy hitters keep most of their mass)."""
    if capacity is None:
        capacity = 8 * k
    acc = ds.aggregate(make_mg_aggfn(capacity, text_col))["mg_summary"]
    words, counts = _unpack(np.asarray(acc))
    order = np.lexsort((words, -counts))[:k]
    return pa.table(
        {
            "word": pa.array(list(words[order]), type=pa.string()),
            "weight": pa.array(counts[order], type=pa.int64()),
        }
    )
