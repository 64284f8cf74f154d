"""Language-ID scorer — a fastText-style byte-trigram classifier hosted
on a Ray Data actor pool.

Stage shape mirrors cleanlab's stateful-scorer pattern (model built once
per worker, applied per batch — cf. ``OutOfDistribution`` fit/score,
/root/reference/cleanlab/outlier.py:26-370): pass the CLASS to
``map_batches(LangIdScorer, concurrency=N, batch_format="pyarrow")`` so
the trigram table is built once in ``__init__`` and reused per batch.
The batch path is zero-copy: trigrams are read straight out of the
Arrow string buffers (no per-row Python).

Output columns: ``lang`` (argmax language code) and ``lang_prob_<code>``
(posterior per language; uniform when a row has no trigrams).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cleanlab_ray.fixtures.transcripts import DE_WORDS, EN_WORDS, FR_WORDS, GIB_WORDS
from cleanlab_ray.stages._chargram import score_arrow_column, train_dense_table

LANGS = ["en", "de", "fr", "und"]


def build_langid_table():
    """Deterministic training from the fixed public wordlists."""
    corpora = [
        (" ".join(EN_WORDS)).encode("utf-8"),
        (" ".join(DE_WORDS)).encode("utf-8"),
        (" ".join(FR_WORDS)).encode("utf-8"),
        (" ".join(GIB_WORDS)).encode("utf-8"),
    ]
    return train_dense_table(corpora)


def langid_probs_from_loglik(loglik: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """(B, L) posterior from summed log-liks + trigram counts
    (length-normalized log-lik, sharp softmax)."""
    denom = np.maximum(counts, 1.0)[:, None]
    z = loglik / denom
    z[counts == 0] = 0.0  # no evidence -> uniform posterior
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z / 0.1)
    return e / e.sum(axis=1, keepdims=True)


def langid_probs_arrow(table, col) -> np.ndarray:
    """(B, L) posterior over LANGS for an Arrow string column."""
    loglik, counts = score_arrow_column(table, col)
    return langid_probs_from_loglik(loglik, counts)


def _replace_column(batch: pa.Table, name: str, arr) -> pa.Table:
    """append_column that OVERWRITES an existing column of the same name
    (an input that already carries e.g. ``lang`` would otherwise gain a
    duplicate field, making every later batch[name] lookup raise)."""
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, arr)
    return batch.append_column(name, arr)


class LangIdScorer:
    """Actor-pool callable: appends ``lang`` + per-language prob columns."""

    def __init__(self, text_col: str = "text"):
        self.table = build_langid_table()
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(batch[self.text_col])
        probs = langid_probs_arrow(self.table, lowered)
        top = np.argmax(probs, axis=1)
        lang_codes = np.array(LANGS, dtype=object)
        batch = _replace_column(
            batch, "lang", pa.array(lang_codes[top], type=pa.string()))
        for j, code in enumerate(LANGS):
            batch = _replace_column(
                batch, f"lang_prob_{code}",
                pa.array(probs[:, j], type=pa.float32()))
        return batch


class PplScorer:
    """Actor-pool callable: appends ``lang`` (argmax language) and
    ``ppl`` (English-LM byte-trigram perplexity, float32) per document —
    the per-record scoring stage of the CCNet head/middle/tail
    partitioner (see stages/rank_buckets.py). Same ppl definition as
    the flagship TurnScorer: exp(-loglik_en / trigram_count), OOV
    fallback for rows with no trigrams."""

    def __init__(self, text_col: str = "text"):
        self.table = build_langid_table()
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(batch[self.text_col])
        loglik, counts = score_arrow_column(self.table, lowered)
        probs = langid_probs_from_loglik(loglik, counts)
        top = np.argmax(probs, axis=1)
        lang_codes = np.array(LANGS, dtype=object)
        ppl = np.exp(-loglik[:, 0] / np.maximum(counts, 1.0))
        ppl[counts == 0] = float(np.exp(-self.table.oov[0]))
        batch = _replace_column(
            batch, "lang", pa.array(lang_codes[top], type=pa.string()))
        return _replace_column(batch, "ppl", pa.array(ppl, type=pa.float32()))
