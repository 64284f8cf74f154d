"""Driver-side prune-count matrix math for the per-class prune filters.

Reproduces /root/reference/cleanlab/filter.py:539-635
(`_keep_at_least_n_per_class`, `_reduce_prune_counts`) — all O(K^2) on
the aggregated confident joint, so it runs on the driver and is
broadcast into the flagging passes.
"""

from __future__ import annotations

import numpy as np

from cleanlab_ray.functions.numerics import round_preserving_row_totals


def reduce_prune_counts(prune_count_matrix: np.ndarray, frac_noise: float = 1.0) -> np.ndarray:
    """Scale off-diagonals by frac_noise, add the removed mass back to the
    diagonal (column totals preserved) — filter.py:608-635."""
    new_mat = prune_count_matrix * frac_noise
    np.fill_diagonal(new_mat, prune_count_matrix.diagonal())
    np.fill_diagonal(
        new_mat,
        prune_count_matrix.diagonal() + np.sum(prune_count_matrix - new_mat, axis=0),
    )
    return new_mat.astype(int)


def keep_at_least_n_per_class(
    prune_count_matrix: np.ndarray, n: int, *, frac_noise: float = 1.0
) -> np.ndarray:
    """Adjust the (transposed-CJ) prune-count matrix so every class keeps
    >= n examples — filter.py:539-605. NOTE: input is confident_joint.T."""
    diag = np.diagonal(prune_count_matrix)
    new_diagonal = np.maximum(diag, n)
    diff_per_col = new_diagonal - diag
    num_noise_rates_per_col = np.maximum(
        np.count_nonzero(prune_count_matrix, axis=0) - 1.0, 1.0
    )
    new_mat = prune_count_matrix - diff_per_col / num_noise_rates_per_col
    new_mat[new_mat < 0] = 0
    np.fill_diagonal(new_mat, new_diagonal)
    new_mat = reduce_prune_counts(new_mat, frac_noise)
    return round_preserving_row_totals(new_mat).astype(int)
