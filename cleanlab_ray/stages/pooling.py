"""Per-conversation score pooling (min / mean / softmin) with salted
two-level aggregation for mega-conversation skew.

Pooling semantics are the reference's sentence-score pooling
(/root/reference/cleanlab/token_classification/rank.py:121-126, 231-274:
min pooling and softmin = <s, softmax((1-s)/T)>), applied per
conversation instead of per sentence.

All three pools decompose into commutative partials
(min -> min; mean -> (sum, n); softmin -> (sum s·e^{(1-s)/T}, sum e^{(1-s)/T}))
so the salted path — groupby((conv_id, turn_idx // salt)) partials, then
groupby(conv_id) merge — is exact, not approximate (SURVEY.md §4.2 skew
row). With s in [0,1] and T >= 0.05 the exponent is <= 20, so the
unshifted exponentials are numerically safe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TEMPERATURE = 0.05


def _partials(scores: np.ndarray, temperature: float):
    e = np.exp((1.0 - scores) / temperature)
    return (
        float(np.min(scores)),
        float(np.sum(scores)),
        int(len(scores)),
        float(np.sum(scores * e)),
        float(np.sum(e)),
    )


def pool_conversations(
    ds,
    score_col: str = "score_self_confidence",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    temperature: float = TEMPERATURE,
    salt: int | None = None,
):
    """Dataset[(conv_id, turn_idx, score)] -> Dataset[(conv_id, n_turns,
    min_score, mean_score, softmin_score)].

    ``salt``: if set, adds a first-level groupby on
    (conv_id, turn_idx // salt) computing partials, then a second
    groupby(conv_id) merging them — bounding any single group to
    ``salt`` rows regardless of conversation length.
    """

    def pool_direct(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(turn_col)
        s = g[score_col].to_numpy(dtype=np.float64)
        mn, sm, n, a, b = _partials(s, temperature)
        return pd.DataFrame(
            {
                conv_col: [g[conv_col].iloc[0]],
                "n_turns": [n],
                "min_score": [mn],
                "mean_score": [sm / n],
                "softmin_score": [a / b],
            }
        )

    if salt is None:
        return ds.groupby(conv_col).map_groups(pool_direct, batch_format="pandas")

    def add_salt(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_salt"] = batch[turn_col] // salt
        return batch

    def pool_partial(g: pd.DataFrame) -> pd.DataFrame:
        s = g[score_col].to_numpy(dtype=np.float64)
        mn, sm, n, a, b = _partials(s, temperature)
        return pd.DataFrame(
            {
                conv_col: [g[conv_col].iloc[0]],
                "_min": [mn],
                "_sum": [sm],
                "_n": [n],
                "_a": [a],
                "_b": [b],
            }
        )

    def pool_merge(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["_n"].sum())
        return pd.DataFrame(
            {
                conv_col: [g[conv_col].iloc[0]],
                "n_turns": [n],
                "min_score": [float(g["_min"].min())],
                "mean_score": [float(g["_sum"].sum()) / n],
                "softmin_score": [float(g["_a"].sum()) / float(g["_b"].sum())],
            }
        )

    partials = (
        ds.map_batches(add_salt, batch_format="pandas")
        .groupby([conv_col, "_salt"])
        .map_groups(pool_partial, batch_format="pandas")
    )
    return partials.groupby(conv_col).map_groups(pool_merge, batch_format="pandas")
