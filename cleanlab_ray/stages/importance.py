"""DSIR-style data-selection importance weights.

Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) scores every raw-corpus document by the
log-likelihood ratio of its tokens under a *target*-domain unigram
model vs the *raw*-corpus unigram model, then resamples the raw corpus
proportionally. The Ray-Data-native plan:

1. **One counting pass** over the corpus builds BOTH models at once:
   per-batch partial word counts carry a raw count and a target count
   (the target subset is a predicate on the batch), pre-aggregated
   per batch so the shuffle moves one row per distinct word per batch
   (map-side combine), then one small ``groupby(word).sum`` finishes
   the two count vectors.
2. The vocabulary table (word, raw_cnt, target_cnt) is collected to
   the driver, turned into a sorted word array + add-1-smoothed
   log-ratio vector, and **broadcast** via ``ray.put`` — the corpus
   side never shuffles.
3. **One scoring pass**: a stateless ``map_batches`` kernel
   dictionary-encodes each batch's tokens, looks the V distinct words
   up with one ``np.searchsorted`` against the broadcast vocab, and
   per-doc sums via ``np.bincount`` — no Python loop over rows or
   tokens.

At 100-TB scale an exact vocabulary can exceed a broadcast budget;
:func:`hashed_llr_table` is the standard DSIR answer — hash words into
``n_buckets`` (FNV-1a) so the broadcast side is O(buckets) regardless
of corpus size. The exact path is the SQL-oracled one (DuckDB can
replicate exact unigram counts but not our bucket hash); the hashed
path is pytest-checked against a NumPy oracle.

Reference semantics kinship: cleanlab ranks examples by model-based
label quality (/root/reference/cleanlab/rank.py:24-90); DSIR is the
corpus-level analogue ranking documents by domain fit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cleanlab_ray.stages.corpus_prep import _flat_tokens


def unigram_count_partials(
    batch: pa.Table, target_mask: np.ndarray, text_col: str = "text"
) -> pa.Table:
    """Per-batch partial unigram counts, split raw vs target.

    ``target_mask`` is a boolean (n_rows,) array marking the batch rows
    that belong to the target domain. Emits one row per distinct word
    in the batch: (word, raw_cnt, target_cnt).
    """
    flat, row_ids, _nr = _flat_tokens(batch, text_col, lower=True)
    if len(flat) == 0:
        return pa.table(
            {
                "word": pa.array([], type=pa.string()),
                "raw_cnt": pa.array([], type=pa.int64()),
                "target_cnt": pa.array([], type=pa.int64()),
            }
        )
    enc = flat.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, dtype=np.int64)
    v = len(enc.dictionary)
    raw = np.bincount(codes, minlength=v)
    tgt = np.bincount(codes[target_mask[row_ids]], minlength=v)
    return pa.table(
        {
            "word": enc.dictionary,
            "raw_cnt": pa.array(raw, type=pa.int64()),
            "target_cnt": pa.array(tgt, type=pa.int64()),
        }
    )


def collect_unigram_llr(ds, target_col: str, target_value, text_col: str = "text"):
    """Build the broadcast LLR table: (sorted words, logratio vector).

    One ``map_batches`` counting pass + one vocabulary-sized
    ``groupby(word).sum`` — the only shuffle, and it moves pre-combined
    (word, cnt) rows, not tokens. Add-1 smoothing over the joint
    vocabulary so unseen-in-target words get finite weight:

        logratio(w) = ln((tgt_w + 1) / (T + V)) - ln((raw_w + 1) / (R + V))
    """

    def partials(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch[target_col], target_value)
        return unigram_count_partials(
            batch, np.asarray(mask.to_numpy(zero_copy_only=False), dtype=bool), text_col
        )

    from cleanlab_ray.functions.frames import typed_pandas

    counts = typed_pandas(
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("word")
        .sum(["raw_cnt", "target_cnt"]),
        {"word": object, "sum(raw_cnt)": "int64", "sum(target_cnt)": "int64"},
    )
    words = counts["word"].to_numpy()
    order = np.argsort(words)
    words = words[order]
    raw = counts["sum(raw_cnt)"].to_numpy()[order].astype(np.float64)
    tgt = counts["sum(target_cnt)"].to_numpy()[order].astype(np.float64)
    v = float(len(words))
    t_tot, r_tot = tgt.sum(), raw.sum()
    logratio = np.log((tgt + 1.0) / (t_tot + v)) - np.log((raw + 1.0) / (r_tot + v))
    return words, logratio


def _llr_score_table(batch: pa.Table, text_col: str, id_col: str,
                     weight_of) -> pa.Table:
    """Shared scorer body for ImportanceScorer / HashedImportanceScorer:
    tokenize, dictionary-encode, per-word weight lookup via
    ``weight_of(vocab) -> (V,) float64``, weighted per-row bincount."""
    flat, row_ids, nr = _flat_tokens(batch, text_col, lower=True)
    n_tokens = np.bincount(row_ids, minlength=nr).astype(np.int64)
    llr = np.zeros(nr, dtype=np.float64)
    if len(flat):
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        vocab = np.asarray(enc.dictionary.to_numpy(zero_copy_only=False))
        per_word = np.asarray(weight_of(vocab), dtype=np.float64)
        llr = np.bincount(row_ids, weights=per_word[codes], minlength=nr)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "llr_e6": pa.array(
                np.floor(llr * 1e6 + 0.5).astype(np.int64), type=pa.int64()
            ),
        }
    )


class ImportanceScorer:
    """Actor-pool / task stage: broadcast (words, logratio) held once
    per worker, per-batch vectorized lookup + per-doc sum."""

    def __init__(self, llr_ref, text_col: str = "text", id_col: str = "doc_id"):
        import ray

        words, logratio = (
            llr_ref if isinstance(llr_ref, tuple) else ray.get(llr_ref)
        )
        self.words = words
        self.logratio = logratio
        self.text_col = text_col
        self.id_col = id_col

    def _weights(self, vocab: np.ndarray) -> np.ndarray:
        if len(self.words) == 0:  # empty LLR table: every word unknown
            return np.zeros(len(vocab), dtype=np.float64)
        pos = np.searchsorted(self.words, vocab)
        pos_c = np.minimum(pos, len(self.words) - 1)
        known = self.words[pos_c] == vocab
        return np.where(known, self.logratio[pos_c], 0.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _llr_score_table(batch, self.text_col, self.id_col,
                                self._weights)


def dsir_weights(ds, target_col: str, target_value, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Full DSIR pass: count → broadcast → score. Returns a Dataset of
    (id, n_tokens, llr_e6), llr in 1e-6 units for hash-stable compare."""
    import ray

    table = collect_unigram_llr(ds, target_col, target_value, text_col)
    ref = ray.put(table)
    return ds.map_batches(
        ImportanceScorer,
        fn_constructor_kwargs={"llr_ref": ref, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


# ----------------------------------------------------------------------
# hashed-bucket scale path (broadcast side O(n_buckets), not O(vocab))
# ----------------------------------------------------------------------


def _fnv1a_bucket(words: np.ndarray, n_buckets: int) -> np.ndarray:
    """FNV-1a over utf8 bytes per word → bucket id. Runs once per
    DISTINCT word (V per batch), not per token."""
    out = np.empty(len(words), dtype=np.int64)
    mask = (1 << 64) - 1  # Python ints: explicit 64-bit wraparound, no overflow warnings
    for i, w in enumerate(words):
        h = 0xCBF29CE484222325
        for b in w.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & mask
        out[i] = h % n_buckets
    return out


def hashed_llr_table(ds, target_col: str, target_value, text_col: str = "text",
                     n_buckets: int = 4096):
    """Bucketed DSIR models: same counting pass, words hashed into
    ``n_buckets`` before the groupby, so the shuffle AND the broadcast
    are O(n_buckets). Returns a (n_buckets,) logratio vector."""

    def partials(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch[target_col], target_value)
        t = unigram_count_partials(
            batch, np.asarray(mask.to_numpy(zero_copy_only=False), dtype=bool), text_col
        )
        words = np.asarray(t["word"].to_numpy(zero_copy_only=False))
        bucket = _fnv1a_bucket(words, n_buckets)
        raw = np.bincount(bucket, weights=np.asarray(t["raw_cnt"]), minlength=n_buckets)
        tgt = np.bincount(
            bucket, weights=np.asarray(t["target_cnt"]), minlength=n_buckets
        )
        nz = (raw > 0) | (tgt > 0)
        return pa.table(
            {
                "bucket": pa.array(np.flatnonzero(nz), type=pa.int64()),
                "raw_cnt": pa.array(raw[nz].astype(np.int64), type=pa.int64()),
                "target_cnt": pa.array(tgt[nz].astype(np.int64), type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .sum(["raw_cnt", "target_cnt"])
        .to_pandas()
    )
    raw = np.zeros(n_buckets, dtype=np.float64)
    tgt = np.zeros(n_buckets, dtype=np.float64)
    raw[counts["bucket"].to_numpy()] = counts["sum(raw_cnt)"].to_numpy()
    tgt[counts["bucket"].to_numpy()] = counts["sum(target_cnt)"].to_numpy()
    b = float(n_buckets)
    return np.log((tgt + 1.0) / (tgt.sum() + b)) - np.log((raw + 1.0) / (raw.sum() + b))


class HashedImportanceScorer:
    """Hashed-bucket scoring twin of :class:`ImportanceScorer`."""

    def __init__(self, llr_ref, n_buckets: int = 4096, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        self.logratio = llr_ref if isinstance(llr_ref, np.ndarray) else ray.get(llr_ref)
        self.n_buckets = n_buckets
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _llr_score_table(
            batch, self.text_col, self.id_col,
            lambda vocab: self.logratio[_fnv1a_bucket(vocab, self.n_buckets)])
