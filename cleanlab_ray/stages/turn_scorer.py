"""Fused per-turn scoring actor — the flagship pipeline's hot stage.

One actor-pool ``map_batches`` pass that applies, in order: heuristic
features -> PII/toxicity scrub -> language-ID -> perplexity -> fused
pred_probs -> self-confidence score. Fusing everything into a single
stateful stage means each Arrow batch crosses the object store once and
both trigram tables are built once per actor (the cleanlab stateful
pattern, cf. /root/reference/cleanlab/outlier.py:26-370), instead of
five separate map stages re-shipping ever-wider batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cleanlab_ray.functions.rank import self_confidence
from cleanlab_ray.stages.heuristics import heuristic_features
from cleanlab_ray.stages.langid import (
    LANGS,
    build_langid_table,
    langid_probs_from_loglik,
)
from cleanlab_ray.stages.scoring import K, fused_pred_probs
from cleanlab_ray.stages.scrub import scrub_batch
from cleanlab_ray.state.confident import labels_to_numpy


_PROCESS_SCORER: "TurnScorer | None" = None

#: internal kernel batch: the trigram scorer's (M, L) float64
#: intermediates stay cache-resident up to ~8k rows; beyond that the
#: per-row rate drops 30%+ single-core and far more under 32-way
#: memory-bus contention. Callers pass WHOLE BLOCKS (batch_size=None —
#: required for ReadParquet->MapBatches operator fusion, which keeps the
#: raw text out of the object store entirely); the slicing happens here.
SLICE_ROWS = 8192


def turn_scorer_task(batch: pa.Table) -> pa.Table:
    """Stateless-task variant: the scorer is cached per worker PROCESS
    (module global), so tasks get actor-style state amortization without
    the actor pool's queue hop — Ray reuses worker processes across
    tasks of one stage. Large blocks are processed in zero-copy
    SLICE_ROWS slices so the kernel stays cache-resident regardless of
    block size."""
    global _PROCESS_SCORER
    if _PROCESS_SCORER is None:
        _PROCESS_SCORER = TurnScorer()
    return _PROCESS_SCORER(batch)


class TurnScorer:
    """Callable class for ``map_batches(TurnScorer, concurrency=N,
    batch_format="pyarrow")``. Emits all scoring columns plus
    ``pred_probs`` and (when a ``label`` column is present)
    ``score_self_confidence``."""

    def __init__(self, text_col: str = "text", label_col: str = "label"):
        # One fused trigram table: the langid posteriors and the
        # perplexity both come from a single lookup pass (the LM is the
        # English column of the langid table — one searchsorted + one
        # accumulation per batch instead of two).
        self.langid_table = build_langid_table()
        self.text_col = text_col
        self.label_col = label_col

    #: columns this stage owns — dropped from the input if present so the
    #: pipeline is re-runnable over already-scored data
    OUTPUT_COLS = (
        "n_chars", "n_tokens", "repetition_ratio", "symbol_ratio", "short_flag",
        "empty_flag", "scrubbed_text", "lang", "lang_prob_en", "lang_prob_de",
        "lang_prob_fr", "lang_prob_und", "ppl", "pred_probs", "score_self_confidence",
    )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows > SLICE_ROWS:
            # zero-copy slices keep the kernel cache-resident when the
            # caller hands us whole blocks (batch_size=None fusion path)
            return pa.concat_tables(
                self(batch.slice(off, SLICE_ROWS))
                for off in range(0, batch.num_rows, SLICE_ROWS)
            )
        stale = [c for c in self.OUTPUT_COLS if c in batch.column_names]
        if stale:
            batch = batch.drop_columns(stale)
        batch = heuristic_features(batch, self.text_col)
        batch = scrub_batch(batch, self.text_col)
        # Language-ID / perplexity saturate well before 160 chars — slice
        # before trigram extraction (3x fewer trigrams on long turns).
        lowered = pc.utf8_slice_codeunits(
            pc.utf8_lower(pc.fill_null(batch[self.text_col], "")), 0, 160
        )
        from cleanlab_ray.stages._chargram import score_arrow_column

        loglik, counts = score_arrow_column(self.langid_table, lowered)
        probs_lang = langid_probs_from_loglik(loglik, counts)
        denom = np.maximum(counts, 1.0)[:, None]
        top = np.argmax(probs_lang, axis=1)
        lang_codes = np.array(LANGS, dtype=object)
        batch = batch.append_column("lang", pa.array(lang_codes[top], type=pa.string()))
        for j, code in enumerate(LANGS):
            batch = batch.append_column(
                f"lang_prob_{code}", pa.array(probs_lang[:, j], type=pa.float32())
            )
        # perplexity from the English column of the same lookup
        ppl = np.exp(-loglik[:, 0] / denom[:, 0])
        ppl[counts == 0] = float(np.exp(-self.langid_table.oov[0]))
        batch = batch.append_column("ppl", pa.array(ppl, type=pa.float32()))

        probs = fused_pred_probs(batch).astype(np.float32)
        batch = batch.append_column(
            "pred_probs",
            pa.FixedSizeListArray.from_arrays(pa.array(probs.reshape(-1)), K),
        )
        if self.label_col in batch.column_names:
            labels = labels_to_numpy(batch[self.label_col])
            sc = self_confidence(labels, probs.astype(np.float64))
            batch = batch.append_column(
                "score_self_confidence", pa.array(sc.astype(np.float32), type=pa.float32())
            )
        return batch
