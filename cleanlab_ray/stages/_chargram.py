"""Vectorized byte-trigram extraction + tiny n-gram models.

Shared machinery for the language-ID and perplexity scorer stages
(the engine's from-scratch stand-ins for fastText / KenLM, per
BASELINE.json north_star — the container has neither, so both models
are small deterministic byte-trigram models trained from the fixed
public wordlists in ``cleanlab_ray.fixtures.transcripts``).

Everything here is batch-vectorized numpy: a whole Arrow string column
is processed as one contiguous byte buffer — no per-row Python loop in
the hot path.
"""

from __future__ import annotations

import numpy as np

SEP = 0  # NUL byte separates rows in the concatenated buffer


def batch_trigrams(texts: list[bytes]):
    """Extract byte trigram codes for a batch of byte strings.

    Returns (codes: uint32 (M,), row_ids: int64 (M,)) where codes are
    ``b0*65536 + b1*256 + b2`` for every trigram not crossing a row
    boundary and row_ids maps each trigram to its source row.
    """
    n = len(texts)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    buf = np.frombuffer(b"\x00".join(texts), dtype=np.uint8) if n else np.empty(0, np.uint8)
    if buf.size < 3:
        return np.empty(0, np.uint32), np.empty(0, np.int64)
    a, b, c = buf[:-2], buf[1:-1], buf[2:]
    valid = (a != SEP) & (b != SEP) & (c != SEP)
    codes = (
        a.astype(np.uint32) * 65536 + b.astype(np.uint32) * 256 + c.astype(np.uint32)
    )[valid]
    # row id of trigram starting at global position p: number of separators before p
    starts = np.nonzero(valid)[0]
    # positions of separators = cumulative row boundaries
    row_of_pos = np.zeros(buf.size, dtype=np.int64)
    if n > 1:
        sep_pos = np.cumsum(lens[:-1] + 1) - 1
        bump = sep_pos + 1
        row_of_pos[bump[bump < buf.size]] = 1
        row_of_pos = np.cumsum(row_of_pos)
    row_ids = row_of_pos[starts]
    return codes, row_ids


def batch_trigrams_arrow(col):
    """Zero-copy trigram extraction straight from an Arrow string column.

    Reads the UTF-8 data buffer + offsets of the (large_)string array —
    no per-row Python, no buffer copies. Returns (codes, row_ids).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    if not pa.types.is_large_string(col.type):
        col = col.cast(pa.large_string())
    buffers = col.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64)[
        col.offset : col.offset + len(col) + 1
    ]
    data = np.frombuffer(buffers[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    lens = np.diff(offsets)
    n = len(col)
    if data.size < 3:
        return np.empty(0, np.uint32), np.empty(0, np.int64)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    valid = row_of[:-2] == row_of[2:]
    a, b, c = data[:-2], data[1:-1], data[2:]
    codes = (
        a.astype(np.uint32) * 65536 + b.astype(np.uint32) * 256 + c.astype(np.uint32)
    )[valid]
    return codes, row_of[:-2][valid]


class TrigramTable:
    """Sorted-lookup table: trigram code -> per-model log-probabilities."""

    def __init__(self, codes: np.ndarray, logprobs: np.ndarray, oov_logprob: np.ndarray):
        order = np.argsort(codes)
        self.codes = codes[order]
        self.logprobs = logprobs[order]          # (V, L)
        self.oov = oov_logprob                   # (L,)

    def lookup(self, query: np.ndarray) -> np.ndarray:
        """(M,) codes -> (M, L) log-probs (OOV row for unknown codes)."""
        idx = np.searchsorted(self.codes, query)
        idx_c = np.clip(idx, 0, len(self.codes) - 1)
        hit = self.codes[idx_c] == query
        out = np.where(hit[:, None], self.logprobs[idx_c], self.oov[None, :])
        return out


def train_trigram_table(corpora: list[bytes], alpha: float = 0.5) -> TrigramTable:
    """Laplace-smoothed trigram log-prob table, one column per corpus."""
    count_maps = []
    all_codes = set()
    for corpus in corpora:
        codes, _ = batch_trigrams([corpus])
        uniq, cnt = np.unique(codes, return_counts=True)
        count_maps.append((uniq, cnt))
        all_codes.update(uniq.tolist())
    vocab = np.array(sorted(all_codes), dtype=np.uint32)
    v = len(vocab)
    logprobs = np.zeros((v, len(corpora)))
    oov = np.zeros(len(corpora))
    for j, (uniq, cnt) in enumerate(count_maps):
        total = cnt.sum() + alpha * (v + 1)
        col = np.full(v, alpha)
        pos = np.searchsorted(vocab, uniq)
        col[pos] += cnt
        logprobs[:, j] = np.log(col / total)
        oov[j] = np.log(alpha / total)
    return TrigramTable(vocab, logprobs, oov)


def _accumulate(table: TrigramTable, codes, row_ids, n_rows):
    lp = table.lookup(codes)                      # (M, L)
    out = np.zeros((n_rows, lp.shape[1]))
    counts = np.zeros(n_rows)
    if len(codes):
        np.add.at(out, row_ids, lp)
        np.add.at(counts, row_ids, 1.0)
    return out, counts


def score_batch(
    table: TrigramTable, texts: list[bytes], n_rows: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row summed log-probs (B, L) and trigram counts (B,)."""
    codes, row_ids = batch_trigrams(texts)
    return _accumulate(table, codes, row_ids, n_rows)


def score_arrow_column(table: TrigramTable, col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy variant of ``score_batch`` over an Arrow string column."""
    codes, row_ids = batch_trigrams_arrow(col)
    return _accumulate(table, codes, row_ids, len(col))
