"""Distributed BPE tokenizer training + corpus encoding.

Byte-pair-encoding training (Sennrich et al. 2016) the way production
tokenizer trainers structure it at corpus scale:

- the CORPUS-sized work — counting word frequencies — is one
  map-side-combined ``groupby(word).sum`` (the shuffle moves one row
  per distinct word per batch, not one per token);
- the merge loop runs on the (word, count) VOCABULARY table, which is
  O(distinct words) regardless of corpus bytes — this is the standard
  trainer design (count once, train on the frequency table), not a
  shortcut; 100 TB of text changes the counts, not the table size;
- encoding applies the learned merge ranks back over the corpus as a
  stateless ``map_batches`` stage with the merge table broadcast via
  ``ray.put`` — per batch, only the DISTINCT words are encoded
  (dictionary-encode first), then per-row token counts come from one
  bincount over codes.

The merge loop itself is the textbook algorithm (adjacent-pair counts
weighted by word frequency, greedy best pair, deterministic
lexicographic tie-break) — verified against a from-scratch Python
reference in tests/test_bpe_train.py.

Reference kinship: cleanlab's token-classification utilities tokenize
per batch (/root/reference/cleanlab/internal/token_classification_
utils.py:10-120); training the tokenizer itself is the corpus-prep
step upstream of every such pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cleanlab_ray.stages.corpus_prep import _flat_tokens

#: end-of-word marker (keeps merges from crossing word boundaries and
#: makes the encoding reversible), per the original BPE formulation.
EOW = "</w>"


def word_count_partials(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial word counts (map-side combine)."""
    flat, _row_ids, _nr = _flat_tokens(batch, text_col, lower=True)
    if len(flat) == 0:
        return pa.table(
            {"word": pa.array([], type=pa.string()),
             "cnt": pa.array([], type=pa.int64())}
        )
    enc = flat.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, dtype=np.int64)
    return pa.table(
        {
            "word": enc.dictionary,
            "cnt": pa.array(
                np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64),
                type=pa.int64(),
            ),
        }
    )


def train_bpe_from_counts(words: list[str], counts: list[int],
                          num_merges: int) -> list[tuple[str, str]]:
    """Greedy BPE merge learning over a (word, count) frequency table.

    Deterministic: the best pair is the (count DESC, pair ASC) argmax.
    O(V · num_merges) — V is the distinct-word count, never the corpus.
    """
    seqs = [tuple(w) + (EOW,) for w in words]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, c in zip(seqs, counts):
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_seqs = []
        for seq in seqs:
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == best[0] and seq[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs.append(tuple(out))
        seqs = new_seqs
    return merges


def train_bpe(ds, text_col: str = "text", num_merges: int = 50):
    """Distributed word count → driver merge loop. Returns the ordered
    merge list (the tokenizer)."""
    from cleanlab_ray.functions.frames import typed_pandas

    wc = typed_pandas(
        ds.map_batches(lambda b: word_count_partials(b, text_col),
                       batch_format="pyarrow")
        .groupby("word")
        .sum("cnt"),
        {"word": object, "sum(cnt)": "int64"},
    )
    wc = wc.sort_values("word")  # deterministic merge-loop input order
    return train_bpe_from_counts(
        wc["word"].tolist(), wc["sum(cnt)"].tolist(), num_merges
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, best-rank-first (standard BPE encode)."""
    seq = list(word) + [EOW]
    while len(seq) > 1:
        pairs = [(ranks.get((a, b), 1 << 60), i)
                 for i, (a, b) in enumerate(zip(seq, seq[1:]))]
        rank, i = min(pairs)
        if rank >= 1 << 60:
            break
        seq[i:i + 2] = [seq[i] + seq[i + 1]]
    return seq


class BpeEncoder:
    """Encoding stage: broadcast merge ranks held once per worker;
    per batch only the DISTINCT words are encoded (dictionary-encode
    first), per-row token counts via one bincount."""

    def __init__(self, merges_ref, text_col: str = "text", id_col: str = "doc_id"):
        import ray

        merges = merges_ref if isinstance(merges_ref, list) else ray.get(merges_ref)
        self.ranks = {p: i for i, p in enumerate(merges)}
        self.text_col = text_col
        self.id_col = id_col
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, row_ids, nr = _flat_tokens(batch, self.text_col, lower=True)
        n_words = np.bincount(row_ids, minlength=nr).astype(np.int64)
        n_tokens = np.zeros(nr, dtype=np.int64)
        if len(flat):
            enc = flat.dictionary_encode()
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = np.asarray(enc.indices, dtype=np.int64)
            per_word = np.empty(len(enc.dictionary), dtype=np.int64)
            for i, w in enumerate(enc.dictionary.to_pylist()):
                got = self._cache.get(w)
                if got is None:
                    got = len(encode_word(w, self.ranks))
                    self._cache[w] = got
                per_word[i] = got
            n_tokens = np.bincount(row_ids, weights=per_word[codes],
                                   minlength=nr).astype(np.int64)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_words": pa.array(n_words, type=pa.int64()),
                "n_bpe_tokens": pa.array(n_tokens, type=pa.int64()),
            }
        )


def bpe_train_encode(ds, text_col: str = "text", id_col: str = "doc_id",
                     num_merges: int = 50):
    """Train a BPE tokenizer on the corpus, then encode the corpus with
    it: per-doc word + BPE-token counts."""
    import ray

    merges = train_bpe(ds, text_col, num_merges)
    ref = ray.put(merges)
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={"merges_ref": ref, "text_col": text_col,
                               "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
