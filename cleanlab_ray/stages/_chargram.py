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


def _arrow_offsets(col):
    """(data bytes, row offsets, n_rows) zero-copy from an Arrow string
    column — no per-byte arrays are materialized."""
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
    return data, offsets - offsets[0], len(col)


def _arrow_bytes(col):
    """(data bytes, per-byte row ids, n_rows) zero-copy from an Arrow
    string column."""
    data, offsets, n = _arrow_offsets(col)
    row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    return data, row_of, n


def batch_trigrams_arrow(col):
    """Zero-copy trigram extraction straight from an Arrow string column.

    Reads the UTF-8 data buffer + offsets of the (large_)string array —
    no per-row Python, no buffer copies. Returns (codes, row_ids).
    """
    data, row_of, n = _arrow_bytes(col)
    if data.size < 3:
        return np.empty(0, np.uint32), np.empty(0, np.int64)
    valid = row_of[:-2] == row_of[2:]
    a, b, c = data[:-2], data[1:-1], data[2:]
    codes = (
        a.astype(np.uint32) * 65536 + b.astype(np.uint32) * 256 + c.astype(np.uint32)
    )[valid]
    return codes, row_of[:-2][valid]


# 256-entry byte remap: space->0, a-z->1..26, digits/punct folded into
# 27..31. Dense trigram space = 32^3 = 32768 -> direct table indexing
# (no searchsorted); rare byte collisions just merge model bins.
# uint16: the shifted-or code (max 32767) fits, halving temporaries.
_BYTE_REMAP = np.full(256, 27, dtype=np.uint16)
_BYTE_REMAP[ord(" ")] = 0
for _c in range(ord("a"), ord("z") + 1):
    _BYTE_REMAP[_c] = _c - ord("a") + 1
for _c in range(ord("0"), ord("9") + 1):
    _BYTE_REMAP[_c] = 28
for _c in b".,;:!?'\"":
    _BYTE_REMAP[_c] = 29
for _c in range(0x80, 0x100):  # non-ASCII (utf-8 continuation/lead bytes)
    _BYTE_REMAP[_c] = 30 if _c < 0xC0 else 31

_DENSE_SIZE = 32 * 32 * 32

#: log-probs are rounded to the 1/2048 grid at TRAIN time. Each table
#: entry is then an exact small rational k/2048 (k an int16-range
#: integer), so per-row sums can run in integer arithmetic: exact,
#: order-independent, and bit-equal to the float64 sums the DuckDB
#: oracles compute over the same grid values (every partial sum m/2048
#: with |m| < 2^31 is exactly representable in float64).
QUANT = 2048.0
_BIAS = 32768  # biased-unsigned field encoding for the packed gathers


class DenseTrigramTable:
    """Dense (32768, L) log-prob table over remapped byte trigrams —
    lookup is a single gather, no binary search.

    The scoring hot path does not gather the (M, L) float64 matrix:
    the quantized integer log-probs are packed two languages per int64
    (32-bit biased fields), so a batch needs ceil(L/2) integer gathers
    + native int64 ``np.add.reduceat`` — half the memory traffic of
    the float64 gather, with exact integer sums."""

    def __init__(self, logprobs: np.ndarray):
        self.logprobs = logprobs  # (32768, L) float64, on the 1/QUANT grid
        self.oov = logprobs.min(axis=0)  # only used for empty rows
        q = np.floor(logprobs * QUANT + 0.5).astype(np.int64)  # exact ints
        L = logprobs.shape[1]
        self.packs = []
        for p in range((L + 1) // 2):
            lo = q[:, 2 * p] + _BIAS
            if 2 * p + 1 < L:
                hi = q[:, 2 * p + 1] + _BIAS
            else:
                hi = np.zeros(len(q), dtype=np.int64)
            self.packs.append(lo | (hi << 32))

    def lookup(self, codes: np.ndarray) -> np.ndarray:
        return self.logprobs[codes]


def dense_codes(data: np.ndarray, row_of: np.ndarray):
    """Remapped trigram codes + validity from a byte buffer."""
    m = _BYTE_REMAP[data]
    valid = row_of[:-2] == row_of[2:]
    codes = (m[:-2] * 1024 + m[1:-1] * 32 + m[2:])[valid]
    return codes, row_of[:-2][valid]


def train_dense_table(corpora: list[bytes], alpha: float = 0.5) -> DenseTrigramTable:
    logprobs = np.zeros((_DENSE_SIZE, len(corpora)))
    for j, corpus in enumerate(corpora):
        buf = np.frombuffer(corpus, dtype=np.uint8)
        if buf.size >= 3:
            row_of = np.zeros(buf.size, dtype=np.int64)
            codes, _ = dense_codes(buf, row_of)
            counts = np.bincount(codes, minlength=_DENSE_SIZE).astype(np.float64)
        else:
            counts = np.zeros(_DENSE_SIZE)
        total = counts.sum() + alpha * _DENSE_SIZE
        logprobs[:, j] = np.log((counts + alpha) / total)
    # snap to the 1/QUANT grid (see QUANT above; the SQL oracles apply
    # the same floor(x*QUANT + 0.5)/QUANT to their ln() expressions)
    logprobs = np.floor(logprobs * QUANT + 0.5) / QUANT
    return DenseTrigramTable(logprobs)


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
    n_cols = lp.shape[1]
    out = np.zeros((n_rows, n_cols))
    if len(codes):
        # bincount-with-weights is several times faster than np.add.at
        for col in range(n_cols):
            out[:, col] = np.bincount(row_ids, weights=lp[:, col], minlength=n_rows)
        counts = np.bincount(row_ids, minlength=n_rows).astype(np.float64)
    else:
        counts = np.zeros(n_rows)
    return out, counts


def score_batch(
    table: TrigramTable, texts: list[bytes], n_rows: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row summed log-probs (B, L) and trigram counts (B,)."""
    codes, row_ids = batch_trigrams(texts)
    return _accumulate(table, codes, row_ids, n_rows)


def score_arrow_column(table, col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy variant of ``score_batch`` over an Arrow string column.

    Dense tables take the fast path: remapped direct-index codes +
    segment-sum via np.add.reduceat (row_ids are nondecreasing by
    construction)."""
    if isinstance(table, DenseTrigramTable):
        # Offsets-only path: trigram validity and per-row segment starts
        # both fall out of the Arrow offsets (a trigram at byte p of row
        # [s, e) is valid iff p <= e-3, so each row kills exactly its
        # last two positions; valid count per row = max(len-2, 0)).
        # The per-byte int64 row_of array the generic path builds is
        # never materialized — at 32-way parallelism its ~24 B/byte of
        # bus traffic was a measurable share of the kernel's DRAM load.
        data, offsets, n = _arrow_offsets(col)
        n_cols = table.logprobs.shape[1]
        if data.size < 3:
            return np.zeros((n, n_cols)), np.zeros(n)
        mm = _BYTE_REMAP[data]
        valid = np.ones(data.size - 2, dtype=bool)
        ends = offsets[1:]
        kill = np.concatenate([ends - 1, ends - 2])
        row_lo = np.concatenate([offsets[:-1], offsets[:-1]])
        inb = (kill >= row_lo) & (kill < valid.size)
        valid[kill[inb]] = False
        codes = (mm[:-2] * 1024 + mm[1:-1] * 32 + mm[2:])[valid]
        m = len(codes)
        seg_counts = np.maximum(np.diff(offsets) - 2, 0)
        out = np.zeros((n, n_cols))
        counts = np.zeros(n)
        if m:
            starts = np.empty(n, dtype=np.int64)
            starts[0] = 0
            np.cumsum(seg_counts[:-1], out=starts[1:])
            nonempty = seg_counts > 0
            ne_starts = starts[nonempty]
            if seg_counts.max() <= 65536 and nonempty.any():
                # packed-integer fast path: ceil(L/2) int64 gathers +
                # native int64 reduceat (exact sums; each 32-bit field
                # holds <= 65536 biased 16-bit terms without carry)
                cnt_ne = seg_counts[nonempty].astype(np.int64)
                for p, pack in enumerate(table.packs):
                    s = np.add.reduceat(pack[codes], ne_starts)
                    lo = (s & 0xFFFFFFFF) - cnt_ne * _BIAS
                    out[nonempty, 2 * p] = lo / QUANT
                    if 2 * p + 1 < n_cols:
                        hi = (s >> 32) - cnt_ne * _BIAS
                        out[nonempty, 2 * p + 1] = hi / QUANT
            elif nonempty.any():
                lp = table.lookup(codes)  # (M, L) gather (overflow guard)
                out[nonempty] = np.add.reduceat(lp, ne_starts, axis=0)
            counts = seg_counts.astype(np.float64)
        return out, counts
    codes, row_ids = batch_trigrams_arrow(col)
    return _accumulate(table, codes, row_ids, len(col))
