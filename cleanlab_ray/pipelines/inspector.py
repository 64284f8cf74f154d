"""LabelInspector — the reference's streaming two-pass mini-batch
protocol (/root/reference/cleanlab/experimental/label_issues_batched.py:
230-673), API-compatible shape over either raw mini-batches or a
Dataset.

Pass 1 (``update_confident_thresholds``): accumulate per-class
(sum of self-confidence, count) — commutative/associative, so batches
may arrive in any order (label_issues_batched.py:487-516).
Pass 2 (``score_label_quality``): freeze thresholds, score batches,
accumulate the off-diagonal issue count (:518-673).

This class IS the engine's aggregate decomposition run eagerly on the
driver; ``from_dataset`` runs the same math as the distributed
aggregates — their equivalence is what tests/test_confident.py pins.
"""

from __future__ import annotations

import numpy as np

from cleanlab_ray.state.confident import (
    cj_partials,
    threshold_partials,
    thresholds_from_partials,
)


class LabelInspector:
    def __init__(self, *, num_class: int):
        self.num_class = num_class
        self._sums = np.zeros(num_class)
        self._counts = np.zeros(num_class, dtype=np.int64)
        self._thresholds: np.ndarray | None = None
        self._cj = np.zeros((num_class, num_class), dtype=np.int64)
        self._num_issues = 0
        self._n_scored = 0

    # -- pass 1 -------------------------------------------------------
    def update_confident_thresholds(self, labels: np.ndarray, pred_probs: np.ndarray):
        if self._thresholds is not None:
            raise RuntimeError("thresholds already frozen; pass 1 is over")
        s, c = threshold_partials(np.asarray(labels), np.asarray(pred_probs), self.num_class)
        self._sums += s
        self._counts += c

    def get_confident_thresholds(self) -> np.ndarray:
        if self._thresholds is None:
            self._thresholds = thresholds_from_partials(self._sums, self._counts)
        return self._thresholds

    # -- pass 2 -------------------------------------------------------
    def score_label_quality(self, labels: np.ndarray, pred_probs: np.ndarray) -> np.ndarray:
        thresholds = self.get_confident_thresholds()
        labels = np.asarray(labels)
        pred_probs = np.asarray(pred_probs, dtype=np.float64)
        cj, n_issues, _ = cj_partials(labels, pred_probs, thresholds, self.num_class)
        self._cj += cj
        self._num_issues += n_issues
        self._n_scored += len(labels)
        return pred_probs[np.arange(len(labels)), labels]

    def get_num_issues(self) -> int:
        return int(self._num_issues)

    def get_confident_joint(self) -> np.ndarray:
        return self._cj.copy()

    # -- Dataset convenience ------------------------------------------
    @classmethod
    def from_dataset(
        cls,
        ds,
        num_class: int,
        label_col: str = "label",
        probs_col: str = "pred_probs",
        batch_size: int = 8192,
    ) -> "LabelInspector":
        """Drive both passes by streaming ``iter_batches`` on the driver
        (the reference's mmap loop shape); for distributed execution use
        ``cleanlab_ray.state.confident.compute_confident_stats``."""
        from cleanlab_ray.state.confident import labels_to_numpy, pred_probs_to_numpy

        insp = cls(num_class=num_class)
        for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
            insp.update_confident_thresholds(
                labels_to_numpy(batch[label_col]), pred_probs_to_numpy(batch[probs_col])
            )
        for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
            insp.score_label_quality(
                labels_to_numpy(batch[label_col]), pred_probs_to_numpy(batch[probs_col])
            )
        return insp


def order_label_issues(ds, score_col: str = "score_self_confidence",
                       issue_col: str = "is_label_issue"):
    """filter -> sort ascending by quality score (rank.py:398-461)."""
    import pyarrow.compute as pc

    flagged = ds.map_batches(
        lambda b: b.filter(pc.equal(b[issue_col], True)), batch_format="pyarrow"
    )
    return flagged.sort(score_col)


def find_top_issues(ds, top: int, score_col: str = "score_self_confidence"):
    """The ``top`` lowest-scored rows (rank.py:369-395) — exchange-free
    per-block top-k + driver merge (stages/topk.global_top_k), not a
    full sort for ``top`` rows."""
    from cleanlab_ray.stages.topk import global_top_k

    return global_top_k(ds, score_col, top)
