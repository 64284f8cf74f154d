"""End-to-end document-corpus curation — the web-pipeline composition.

One keep/drop decision per document from four independently-verified
signals, composed WITHOUT a single join operator (every flow emits
zero-filled flag rows for the docs it scores and ONE
``groupby(doc).max`` merges them — the same union-aggregate shape that
replaced dup_spans' hash join):

- **language**: dense-trigram language-ID (stages/langid.py) — keep
  English;
- **quality**: word-level signals (stages/quality_signals.py) — keep
  docs with enough words and no single dominating token;
- **exact-dup canonicalization**: content-hash exchange, the minimal
  doc_id of each distinct text is canonical (collision-checked on the
  actual text, like stages/dedup.exact_dedup);
- **substring duplication**: Lee-et-al duplicate-span coverage
  (stages/dedup.dup_span_counts) under a threshold.

Flows (1), (2) are map-only; (3) is one content-hash exchange; (4) is
one window-hash exchange + the shared aggregate. Text crosses the wire
only inside flow (3) (needed for hash-collision checks) — every other
exchange moves hashes, counts and flags.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FLAGS = ("lang_ok", "quality_ok", "canonical", "dup_ok")

#: per-worker-process scorer cache (the trigram tables build once per
#: process, not once per task — the stateless-task twin of an actor
#: pool, same pattern as stages/turn_scorer.turn_scorer_task)
_LANG_SCORER = None


def _lang_scorer(text_col: str):
    global _LANG_SCORER
    if _LANG_SCORER is None or _LANG_SCORER.text_col != text_col:
        from cleanlab_ray.stages.langid import LangIdScorer

        _LANG_SCORER = LangIdScorer(text_col)
    return _LANG_SCORER


def _flag_table(key_col, keys, **cols) -> pa.Table:
    n = len(keys)
    out = {key_col: keys}
    for f in FLAGS:
        out[f] = pa.array(
            cols.get(f, np.zeros(n, dtype=np.int64)).astype(np.int64)
            if isinstance(cols.get(f, None), np.ndarray)
            else np.zeros(n, dtype=np.int64)
        )
    return pa.table(out)


def curate_documents(
    ds,
    text_col: str = "text",
    key_col: str = "doc_id",
    min_words: int = 5,
    top_word_frac_max: float = 0.25,
    span_k: int = 20,
    dup_frac_max_e6: int = 300_000,
):
    """Dataset[(key, lang_ok, quality_ok, canonical, dup_ok, keep)]."""
    from cleanlab_ray.stages.dedup import (
        _sorted_block_map,
        add_content_hash,
        dup_span_counts,
    )
    from cleanlab_ray.stages.quality_signals import quality_signals_kernel

    base = ds.select_columns([key_col, text_col])

    # flow 1+2 (map-only): language + quality in one pass
    def map_flags(batch: pa.Table) -> pa.Table:
        scored = _lang_scorer(text_col)(batch)
        lang_ok = pc.equal(scored["lang"], "en").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        q = quality_signals_kernel(batch, text_col, id_col=key_col)
        nw = q["n_words"].to_numpy(zero_copy_only=False)
        twf = q["top_word_frac"].to_numpy(zero_copy_only=False)
        quality_ok = ((nw >= min_words) & (twf <= top_word_frac_max)).astype(np.int64)
        return _flag_table(key_col, batch[key_col],
                           lang_ok=lang_ok, quality_ok=quality_ok)

    flow_a = base.map_batches(map_flags, batch_format="pyarrow")

    # flow 3: exact-dup canonical (content-hash exchange); text is
    # only compared inside multi-row hash runs (dedup.first_per_distinct_text)
    def canon_block(batch: pa.Table) -> pa.Table:
        from cleanlab_ray.stages.dedup import first_per_distinct_text

        h = batch["content_hash"].to_numpy(zero_copy_only=False)
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if len(h) == 0:
            return _flag_table(key_col, keys)
        firsts = first_per_distinct_text(h, batch, text_col, key_col)
        canonical = np.zeros(len(h), dtype=np.int64)
        canonical[firsts] = 1
        return _flag_table(key_col, keys, canonical=canonical)

    flow_b = _sorted_block_map(
        base.map_batches(
            lambda b: add_content_hash(b, text_col), batch_format="pyarrow"
        ),
        "content_hash",
        canon_block,
    )

    # flow 4: substring-duplication coverage
    spans = dup_span_counts(base, text_col, key_col, span_k)

    def span_flags(batch: pa.Table) -> pa.Table:
        frac = batch["dup_frac_e6"].to_numpy(zero_copy_only=False)
        return _flag_table(key_col, batch[key_col],
                           dup_ok=(frac <= dup_frac_max_e6).astype(np.int64))

    flow_c = spans.map_batches(span_flags, batch_format="pyarrow")

    from cleanlab_ray.stages.topk import sorted_group_agg

    merged = sorted_group_agg(
        flow_a.union(flow_b).union(flow_c), key_col,
        {f: "max" for f in FLAGS},
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch[key_col]}
        keep = np.ones(batch.num_rows, dtype=np.int64)
        for f in FLAGS:
            v = batch[f"max({f})"].to_numpy(zero_copy_only=False).astype(np.int64)
            cols[f] = pa.array(v)
            keep &= v
        cols["keep"] = pa.array(keep)
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")
