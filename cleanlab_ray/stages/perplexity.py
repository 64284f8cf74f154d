"""Perplexity scorer — a KenLM-style byte-trigram language model hosted
on a Ray Data actor pool.

Same stateful-stage shape as ``LangIdScorer``: the Laplace-smoothed
trigram LM (trained deterministically on the clean-English wordlist
corpus) is built once per actor in ``__init__``; ``__call__`` scores a
whole Arrow batch zero-copy from the string buffers. Output column:
``ppl`` (float32; rows with no trigrams get the worst-case OOV value).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cleanlab_ray.fixtures.transcripts import EN_WORDS
from cleanlab_ray.stages._chargram import score_arrow_column, train_dense_table


def build_lm_table():
    return train_dense_table([(" ".join(EN_WORDS)).encode("utf-8")])


def perplexity_arrow(table, col) -> np.ndarray:
    loglik, counts = score_arrow_column(table, col)
    denom = np.maximum(counts, 1.0)
    ppl = np.exp(-loglik[:, 0] / denom)
    ppl[counts == 0] = float(np.exp(-table.oov[0]))
    return ppl


class PerplexityScorer:
    def __init__(self, text_col: str = "text"):
        self.table = build_lm_table()
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lowered = pc.utf8_lower(batch[self.text_col])
        ppl = perplexity_arrow(self.table, lowered)
        return batch.append_column("ppl", pa.array(ppl, type=pa.float32()))
