"""Confident-joint / confident-threshold estimation as Ray Data aggregates.

Reproduces the aggregation mathematics of cleanlab's confident learning
(semantics: cleanlab/count.py:1407-1458 get_confident_thresholds,
count.py:445-622 compute_confident_joint, count.py:221-291
calibrate_confident_joint, count.py:715-796 estimate_latent,
count.py:50-173 num_label_issues, count.py:211-218 _reduce_issues)
re-expressed as mergeable per-block partials:

- pass 1: per-class (sum, count) of self-confidence  -> thresholds (K,)
- pass 2: per-block (K,K) confident-joint counts + issue counts -> CJ

Both passes are exact (the partials are commutative/associative sums,
the same decomposition the reference itself proves sound for its
streaming path, cleanlab/experimental/label_issues_batched.py:487-516).
All reduced state is tiny (O(K^2)) and lives on the driver; downstream
stages receive it via closure broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from cleanlab_ray import (
    CLIPPING_LOWER_BOUND,
    CONFIDENT_THRESHOLDS_LOWER_BOUND,
    FLOATING_POINT_COMPARISON,
    TINY_VALUE,
)
from cleanlab_ray.functions.numerics import (
    clip_values,
    round_preserving_row_totals,
    value_counts_fill_missing,
)

BIG_VALUE = 2.0  # sentinel threshold for classes absent from labels


# ---------------------------------------------------------------------------
# Arrow column extraction (zero-copy where possible)
# ---------------------------------------------------------------------------

def pred_probs_to_numpy(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(B,) fixed_size_list<float>[K] or list<float> column -> (B, K) ndarray."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.FixedSizeListArray):
        k = col.type.list_size
        return np.asarray(col.values).reshape(-1, k)
    # variable-size list: rely on uniform lengths
    arr = col.flatten()
    n = len(col)
    return np.asarray(arr).reshape(n, -1)


def labels_to_numpy(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Class labels as an int ndarray — validated (reference
    assert_valid_inputs semantics): a null would surface as NaN in a
    float array and crash fancy indexing obscurely; a negative label
    would silently index pred_probs from the END (wrong score, no
    error)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(
            f"label column contains {col.null_count} null(s); labels "
            "must be integers in [0, num_classes)"
        )
    arr = np.asarray(col)
    if len(arr) and arr.min() < 0:
        raise ValueError(
            "label column contains negative value(s); labels must be "
            "integers in [0, num_classes)"
        )
    return arr


# ---------------------------------------------------------------------------
# Per-block partials (pure numpy; used by both the Ray aggregates and tests)
# ---------------------------------------------------------------------------

def threshold_partials(labels: np.ndarray, pred_probs: np.ndarray, k: int):
    """Per-class (sum of self-confidence, count) — the mergeable state of
    cleanlab/experimental/label_issues_batched.py:487-516."""
    sc = pred_probs[np.arange(labels.shape[0]), labels].astype(np.float64)
    sums = np.bincount(labels, weights=sc, minlength=k)
    counts = np.bincount(labels, minlength=k).astype(np.int64)
    return sums, counts


def thresholds_from_partials(sums: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Finalize pass-1 state into confident thresholds
    (cleanlab/count.py:1444-1458: missing classes -> BIG_VALUE=2, clip below)."""
    with np.errstate(invalid="ignore"):
        t = np.where(counts > 0, sums / np.maximum(counts, 1), BIG_VALUE)
    return np.clip(t, CONFIDENT_THRESHOLDS_LOWER_BOUND, None)


def confident_rows(
    labels: np.ndarray, pred_probs: np.ndarray, thresholds: np.ndarray
):
    """Vectorized confident-counting rule of cleanlab/count.py:577-614.

    Returns (at_least_one_confident mask, true_label_guess) per row."""
    pp_bool = pred_probs >= thresholds - FLOATING_POINT_COMPARISON
    num_conf = pp_bool.sum(axis=1)
    at_least_one = num_conf > 0
    more_than_one = num_conf > 1
    guess = np.where(more_than_one, pred_probs.argmax(axis=1), pp_bool.argmax(axis=1))
    return at_least_one, guess


def reduce_issues_mask(labels: np.ndarray, pred_probs: np.ndarray) -> np.ndarray:
    """True where the (tie-nudged) argmax prediction equals the given label
    (cleanlab/count.py:211-218) — such rows are never issues."""
    nudged = pred_probs.copy()
    nudged[np.arange(labels.shape[0]), labels] += FLOATING_POINT_COMPARISON
    return nudged.argmax(axis=1) == labels


def cj_partials(labels: np.ndarray, pred_probs: np.ndarray, thresholds: np.ndarray, k: int):
    """Per-block (confident_joint (K,K), num_off_diag_issues, label_counts (K,)).

    num_off_diag_issues = rows confidently counted off-diagonal minus the
    reduce-veto — summed over blocks it equals
    cleanlab/count.py num_label_issues(estimation_method='off_diagonal').
    """
    at_least_one, guess = confident_rows(labels, pred_probs, thresholds)
    lab_c = labels[at_least_one]
    guess_c = guess[at_least_one]
    cj = np.zeros((k, k), dtype=np.int64)
    np.add.at(cj, (lab_c, guess_c), 1)
    off_diag = at_least_one & (guess != labels)
    n_issues = int((off_diag & ~reduce_issues_mask(labels, pred_probs)).sum())
    label_counts = np.bincount(labels, minlength=k).astype(np.int64)
    return cj, n_issues, label_counts


# ---------------------------------------------------------------------------
# Driver-side finalization math (all O(K^2))
# ---------------------------------------------------------------------------

def finalize_confident_joint(cj: np.ndarray) -> np.ndarray:
    """Diagonal clipped to >=1 (cleanlab/count.py:608-609)."""
    cj = cj.copy()
    np.fill_diagonal(cj, cj.diagonal().clip(min=1))
    return cj


def calibrate_confident_joint(cj: np.ndarray, label_counts: np.ndarray) -> np.ndarray:
    """Row sums -> bincount(labels), total -> N, integer-rounded
    (cleanlab/count.py:221-291)."""
    calibrated = (
        cj.T / np.clip(cj.sum(axis=1), TINY_VALUE, None) * label_counts
    ).T
    calibrated = calibrated / np.clip(np.sum(calibrated), TINY_VALUE, None) * label_counts.sum()
    return round_preserving_row_totals(calibrated)


def estimate_joint(cj: np.ndarray, label_counts: np.ndarray) -> np.ndarray:
    """Calibrated CJ normalized to a distribution (cleanlab/count.py:329-399)."""
    calibrated = calibrate_confident_joint(cj, label_counts)
    return calibrated / np.clip(float(np.sum(calibrated)), TINY_VALUE, None)


def clip_noise_rates(noise_matrix: np.ndarray) -> np.ndarray:
    """Clip off-diagonal rates, renormalize columns (cleanlab/internal/util.py:49-75)."""
    diagonal = np.diagonal(noise_matrix)
    noise_matrix = np.clip(noise_matrix, 0, 0.9999)
    np.fill_diagonal(noise_matrix, diagonal)
    return noise_matrix / np.clip(noise_matrix.sum(axis=0), TINY_VALUE, None)


def estimate_latent(cj: np.ndarray, label_counts: np.ndarray,
                    converge_latent_estimates: bool = False):
    """(py, noise_matrix, inv_noise_matrix) from the confident joint
    (cleanlab/count.py:715-796, py_method='cnt' per
    cleanlab/internal/latent_algebra.py:176-257). With
    ``converge_latent_estimates`` the estimates are iteratively refined
    into mutual consistency (count.py:1331-1404)."""
    n = float(label_counts.sum())
    ps = label_counts / n
    labels_cc = cj.sum(axis=1).astype(float)
    true_cc = cj.sum(axis=0).astype(float)
    noise_matrix = cj / np.clip(true_cc, TINY_VALUE, None)
    inv_noise_matrix = cj.T / np.clip(labels_cc, TINY_VALUE, None)
    py = (
        inv_noise_matrix.diagonal()
        / np.clip(noise_matrix.diagonal(), TINY_VALUE, None)
        * ps
    )
    py = clip_values(py, low=CLIPPING_LOWER_BOUND, high=1.0, new_sum=1.0)
    noise_matrix = clip_noise_rates(noise_matrix)
    inv_noise_matrix = clip_noise_rates(inv_noise_matrix)
    if converge_latent_estimates:
        py, noise_matrix, inv_noise_matrix = converge_estimates(
            ps, py, noise_matrix, inv_noise_matrix
        )
    return py, noise_matrix, inv_noise_matrix


def num_label_issues_off_diagonal(total_off_diag_issues: int) -> int:
    """off_diagonal estimation: sum of per-block counts (already veto'd)."""
    return int(total_off_diag_issues)


def num_label_issues_calibrated(cj: np.ndarray, label_counts: np.ndarray) -> int:
    """off_diagonal_calibrated estimation (cleanlab/count.py:144-151)."""
    joint = estimate_joint(cj, label_counts)
    frac_issues = 1.0 - joint.trace()
    return int(np.rint(frac_issues * label_counts.sum()))


@dataclass
class ConfidentStats:
    """Reduced state of the two aggregation passes (broadcast downstream)."""

    num_classes: int
    n: int
    thresholds: np.ndarray          # (K,)
    label_counts: np.ndarray        # (K,)
    confident_joint: np.ndarray     # (K,K) uncalibrated, diag>=1
    calibrated_joint: np.ndarray    # (K,K) int, sums to N
    num_issues: int                 # off_diagonal estimate (reduce-veto applied)
    py: np.ndarray                  # (K,)
    noise_matrix: np.ndarray        # (K,K)
    inv_noise_matrix: np.ndarray    # (K,K)

    def to_json_dict(self) -> dict:
        return {
            "num_classes": self.num_classes,
            "n": self.n,
            "thresholds": self.thresholds.tolist(),
            "label_counts": self.label_counts.tolist(),
            "confident_joint": self.confident_joint.tolist(),
            "calibrated_joint": self.calibrated_joint.tolist(),
            "num_issues": self.num_issues,
            "py": self.py.tolist(),
            "noise_matrix": self.noise_matrix.tolist(),
            "inv_noise_matrix": self.inv_noise_matrix.tolist(),
        }


# ---------------------------------------------------------------------------
# Ray Data aggregates
# ---------------------------------------------------------------------------

def _batch_cols(block: pa.Table, label_col: str, probs_col: str):
    labels = labels_to_numpy(block[label_col])
    probs = pred_probs_to_numpy(block[probs_col])
    return labels, probs


def make_threshold_aggfn(k: int, label_col: str = "label", probs_col: str = "pred_probs"):
    """Ray AggregateFn for pass 1 — per-class (sum, count) partials."""
    from ray.data.aggregate import AggregateFn

    # The accumulator is a single flat float64 array [sums(K), counts(K)] so
    # Ray can ship it between map and reduce as a plain Arrow list column
    # (tuples of ndarrays would fall back to pickle); re-coerce on every
    # combine because the Arrow round-trip may hand back a Python list.
    def accumulate_block(acc, block: pa.Table):
        labels, probs = _batch_cols(block, label_col, probs_col)
        sums, counts = threshold_partials(labels, probs, k)
        return np.asarray(acc, dtype=np.float64) + np.concatenate([sums, counts])

    def merge(a, b):
        return np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64)

    return AggregateFn(
        init=lambda _: np.zeros(2 * k, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=merge,
        name="threshold_partials",
    )


def make_cj_aggfn(
    k: int, thresholds: np.ndarray, label_col: str = "label", probs_col: str = "pred_probs"
):
    """Ray AggregateFn for pass 2 — (K,K) CJ + issue count + bincount partials."""
    from ray.data.aggregate import AggregateFn

    thresholds = np.asarray(thresholds, dtype=np.float64)

    # Flat float64 accumulator: [cj(K*K) | n_issues(1) | label_counts(K)].
    def accumulate_block(acc, block: pa.Table):
        labels, probs = _batch_cols(block, label_col, probs_col)
        cj, n_issues, label_counts = cj_partials(labels, probs, thresholds, k)
        partial = np.concatenate([cj.reshape(-1), [n_issues], label_counts]).astype(np.float64)
        return np.asarray(acc, dtype=np.float64) + partial

    def merge(a, b):
        return np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64)

    return AggregateFn(
        init=lambda _: np.zeros(k * k + 1 + k, dtype=np.float64),
        accumulate_block=accumulate_block,
        merge=merge,
        name="cj_partials",
    )


def compute_confident_stats(
    ds,
    num_classes: int,
    label_col: str = "label",
    probs_col: str = "pred_probs",
) -> ConfidentStats:
    """Run the two aggregation passes over a Dataset and finalize.

    ``ds`` should already carry ``label`` (int) and ``pred_probs``
    (fixed_size_list<float>[K]) columns. Two full scans of those two
    columns only — select before calling to prune I/O.
    """
    k = num_classes
    # Flat accumulators come back through Arrow as lists — unpack.
    acc1 = np.asarray(
        ds.aggregate(make_threshold_aggfn(k, label_col, probs_col))["threshold_partials"],
        dtype=np.float64,
    )
    sums, counts = acc1[:k], acc1[k:].astype(np.int64)
    thresholds = thresholds_from_partials(sums, counts)
    acc2 = np.asarray(
        ds.aggregate(make_cj_aggfn(k, thresholds, label_col, probs_col))["cj_partials"],
        dtype=np.float64,
    )
    cj_raw = acc2[: k * k].astype(np.int64).reshape(k, k)
    num_issues = int(acc2[k * k])
    label_counts = acc2[k * k + 1 :].astype(np.int64)
    cj = finalize_confident_joint(cj_raw)
    calibrated = calibrate_confident_joint(cj, label_counts)
    py, noise_matrix, inv_noise_matrix = estimate_latent(cj, label_counts)
    return ConfidentStats(
        num_classes=num_classes,
        n=int(label_counts.sum()),
        thresholds=thresholds,
        label_counts=label_counts,
        confident_joint=cj,
        calibrated_joint=calibrated,
        num_issues=num_issues,
        py=py,
        noise_matrix=noise_matrix,
        inv_noise_matrix=inv_noise_matrix,
    )


def converge_estimates(
    ps: np.ndarray,
    py: np.ndarray,
    noise_matrix: np.ndarray,
    inv_noise_matrix: np.ndarray,
    *,
    inv_noise_matrix_iterations: int = 5,
    noise_matrix_iterations: int = 3,
):
    """Iterative latent refinement (cleanlab/count.py:1331-1404
    _converge_estimates + internal/latent_algebra.py:66-257): make py,
    the noise matrix and its inverse mutually consistent by alternating
    their closed-form relations. Driver-side O(K^2) state only.

    Relations (latent_algebra.py):
      inv = clip_cols((noise_matrix * py).T / ps)
      py  = clip(inv_diag / noise_diag * ps, renormalized)  # 'cnt'
      noise_matrix = clip_cols((inv * ps).T / py)
    """
    from cleanlab_ray.functions.numerics import clip_values

    ps = np.asarray(ps, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    noise_matrix = np.asarray(noise_matrix, dtype=np.float64)
    inv_noise_matrix = np.asarray(inv_noise_matrix, dtype=np.float64)
    for _ in range(noise_matrix_iterations):
        for _ in range(inv_noise_matrix_iterations):
            joint = noise_matrix * py
            inv_noise_matrix = clip_noise_rates(
                joint.T / np.clip(ps, TINY_VALUE, None)
            )
            py = (
                inv_noise_matrix.diagonal()
                / np.clip(noise_matrix.diagonal(), TINY_VALUE, None)
                * ps
            )
            py = clip_values(py, low=CLIPPING_LOWER_BOUND, high=1.0, new_sum=1.0)
        joint_t = (inv_noise_matrix * ps).T
        noise_matrix = clip_noise_rates(joint_t / np.clip(py, TINY_VALUE, None))
    return py, noise_matrix, inv_noise_matrix
