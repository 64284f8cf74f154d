"""K-minimum-values (KMV) distinct-count sketch — mergeable, O(k).

An exact ``count(DISTINCT word)`` over a 100-TB corpus is a
vocabulary-sized shuffle (every distinct token crosses the wire at
least once). The KMV sketch (Bar-Yossef et al. 2002; mergeable-summary
treatment in Beyer et al. 2007 "On Synopses for Distinct-Value
Estimation") bounds every moving part at O(k):

- each block hashes its distinct tokens (64-bit polynomial fold,
  :func:`cleanlab_ray.stages.dedup.polynomial_string_hashes`) and keeps
  the k smallest hash values;
- summaries merge by sorted-union-truncate (the k smallest of a union
  of k-smallest sets is the k smallest of the union — exactly
  mergeable, order-independent);
- the driver receives ONE (k,) uint64 vector. If it holds fewer than k
  values the count is EXACT (every distinct hash is present) — the
  regime the SQL oracle checks with a plain ``count(DISTINCT ...)``.
  Otherwise the unbiased estimate is ``(k-1) / h_(k)`` rescaled to the
  hash space, with relative std error ~ 1/sqrt(k-2) (pytest-checked in
  the lossy regime).

Exactness caveat (documented): "distinct hashes" stands in for
"distinct tokens"; a 64-bit collision between two distinct corpus
tokens would undercount by one. The fold is deterministic, so the
correctness gate is stable either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: Sentinel standing in for a NULL group key inside sort exchanges
#: (Ray's sort cannot compare None with str); restored to null on emit.
_NULL_GROUP = "\x00__null_group__"

#: hash space size as float (2^64) for the lossy-regime estimator
_SPACE = float(1 << 64)

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64/murmur3 finalizer (vectorized, uint64 wraparound).

    The raw polynomial fold is distinct-preserving but its high bits
    are structured (short same-length tokens share most of the P^j
    terms), which biases KMV's order statistics badly (+36% measured).
    The finalizer is a BIJECTION on 2^64, so distinctness — and with it
    the exact regime — is untouched, while the value distribution
    becomes uniform enough for the (k-1)/h_(k) estimator."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= _MIX1
    h ^= h >> np.uint64(29)
    h *= _MIX2
    h ^= h >> np.uint64(32)
    return h


def _kmv_from_tokens(block: pa.Table, text_col: str, k: int) -> np.ndarray:
    """k smallest distinct token hashes of one block (sorted uint64)."""
    from cleanlab_ray.stages.dedup import polynomial_string_hashes
    from cleanlab_ray.stages.quality_signals import _tokens

    codes, _rows, _lens, vocab, _n = _tokens(block, text_col)
    if len(vocab) == 0 or len(codes) == 0:
        return np.empty(0, dtype=np.uint64)
    # the dictionary can hold zero-count entries (the empty pseudo-token
    # from repeated/leading/trailing whitespace) — hash only tokens that
    # actually occur, same cnt>0 filter as heavy_hitters, or the
    # distinct count overcounts by one vs a count(DISTINCT word) oracle
    cnt = np.bincount(codes, minlength=len(vocab))
    vocab = vocab.filter(pa.array(cnt > 0))
    h = np.unique(_mix64(polynomial_string_hashes(vocab)))
    return h[:k]


def _kmv_merge(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    u = np.union1d(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    return u[:k]


def make_kmv_aggfn(k: int, text_col: str = "text", name: str = "kmv"):
    """AggregateFn producing the KMV summary (flat uint64 ndarray,
    ascending, length <= k) of a text column's token stream."""
    from ray.data.aggregate import AggregateFn

    return AggregateFn(
        init=lambda _key: np.empty(0, dtype=np.uint64),
        accumulate_block=lambda acc, block: _kmv_merge(
            acc, _kmv_from_tokens(block, text_col, k), k
        ),
        merge=lambda a, b: _kmv_merge(a, b, k),
        name=name,
    )


def kmv_estimate(summary: np.ndarray, k: int) -> int:
    """Distinct-count estimate from a KMV summary: exact when the
    summary is not full, else the Beyer et al. unbiased (k-1)/h_(k)."""
    summary = np.asarray(summary, dtype=np.uint64)
    if len(summary) < k:
        return int(len(summary))
    # +1 because hash values are in [0, 2^64): normalize to (0, 1]
    frac = (float(summary[-1]) + 1.0) / _SPACE
    return int(round((k - 1) / frac))


def distinct_tokens(ds, k: int = 16384, text_col: str = "text") -> int:
    """Corpus-wide distinct-token estimate (one O(k) driver payload)."""
    acc = ds.aggregate(make_kmv_aggfn(k, text_col))["kmv"]
    return kmv_estimate(np.asarray(acc), k)


def distinct_tokens_by(ds, group_col: str, k: int = 16384,
                       text_col: str = "text"):
    """Per-group distinct-token estimates, map-side combined.

    The raw text NEVER shuffles: each block folds its rows into one
    O(k) summary per group it contains (binary-packed), and only those
    (group, summary) rows — O(blocks x groups x 8k bytes) — cross the
    exchange; the per-group merge is a sorted-union over tiny rows.
    Returns a Dataset (group_col, distinct_tokens) sorted by group.
    """
    def partials(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({
                group_col: pa.array(
                    [], type=block.schema.field(group_col).type),
                "kmv_summary": pa.array([], type=pa.large_binary()),
            })
        groups = block[group_col]
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        # null group keys form their own group: encode as a sentinel so
        # dictionary codes stay dense ints (null indices would surface
        # as NaN / -1 and break the sort-slice), restore None on emit.
        # Ray's own sort exchange cannot compare None with str either,
        # so the sentinel also rides the downstream groupby.
        if groups.null_count:
            groups = pc.fill_null(groups, _NULL_GROUP)
        enc = groups.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        # one stable sort groups the block's rows; each group is then a
        # contiguous slice (no O(N) filter pass per group)
        order = np.argsort(codes, kind="stable")
        sorted_block = block.take(pa.array(order))
        cs = codes[order]
        starts = np.flatnonzero(np.concatenate([[True], cs[1:] != cs[:-1]]))
        ends = np.append(starts[1:], len(cs))
        out_g, out_s = [], []
        for s, e in zip(starts, ends):
            out_g.append(enc.dictionary[cs[s]].as_py())
            out_s.append(
                _kmv_from_tokens(sorted_block.slice(s, e - s), text_col, k).tobytes()
            )
        return pa.table({group_col: pa.array(out_g),
                         "kmv_summary": pa.array(out_s, type=pa.large_binary())})

    def merge_runs(batch: pa.Table) -> pa.Table:
        # sorted-run merge (see stages/topk.sorted_group_agg's rationale:
        # the native per-group path costs ~0.3 ms/group) — one block pass,
        # groups are contiguous runs after the sort exchange
        if batch.num_rows == 0:
            return pa.table({
                group_col: pa.array(
                    [], type=batch.schema.field(group_col).type),
                "distinct_tokens": pa.array([], type=pa.int64()),
            })
        from cleanlab_ray.stages.dedup import _run_starts

        groups = batch[group_col]
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        gv = groups.to_numpy(zero_copy_only=False)
        starts = _run_starts(gv)
        ends = np.append(starts[1:], len(gv))
        raws = batch["kmv_summary"].to_pylist()
        ests = np.empty(len(starts), dtype=np.int64)
        for i, (s, e) in enumerate(zip(starts, ends)):
            acc = np.frombuffer(raws[s], dtype=np.uint64)
            for j in range(s + 1, e):
                acc = _kmv_merge(acc, np.frombuffer(raws[j], dtype=np.uint64), k)
            ests[i] = kmv_estimate(acc, k)
        heads = groups.take(pa.array(starts))
        if pa.types.is_string(heads.type) or pa.types.is_large_string(heads.type):
            is_sent = pc.equal(heads, _NULL_GROUP)  # restore the null group
            heads = pc.if_else(is_sent, pa.nulls(len(heads), heads.type), heads)
        return pa.table({group_col: heads,
                         "distinct_tokens": pa.array(ests)})

    from cleanlab_ray.stages.dedup import _sorted_block_map

    return _sorted_block_map(
        ds.select_columns([group_col, text_col])
        .map_batches(partials, batch_format="pyarrow"),
        group_col, merge_runs,
    )
