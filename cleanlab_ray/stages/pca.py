"""Distributed PCA over an embedding column — one streaming moment pass.

At 100-TB scale the (N, D) embedding matrix can never be centralized;
PCA only needs the (D, D) second-moment matrix, which is a mergeable
sum. Shape:

1. ONE AggregateFn pass computes the flat moment vector
   [n | sum_x (D) | sum_xxT (D*D)] — each block contributes a single
   fused GEMM (``x.T @ x``), partials merge by addition, and only
   O(D^2) floats ever reach the driver;
2. the driver forms the population covariance
   ``E[xx^T] - mean mean^T``, runs ``numpy.linalg.eigh`` on (D, D), and
   fixes each component's sign deterministically (largest-|loading|
   coordinate made positive) so results are reproducible across runs
   and block orders;
3. ``pca_transform`` broadcasts the (D, k) component matrix once
   (``ray.put`` via closure capture) and projects each batch with one
   GEMM — a stateless, fusable map.

The covariance step is SQL-checkable (``embedding_covariance`` query:
DuckDB covar_pop over unnested coordinates); the eigen step is verified
against the NumPy oracle in tests/test_pca.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cleanlab_ray.state.confident import pred_probs_to_numpy


def _block_matrix(block: pa.Table, col: str) -> np.ndarray:
    return pred_probs_to_numpy(block[col]).astype(np.float64)


def make_moments_aggfn(dim: int, col: str = "embedding", name: str = "moments"):
    """AggregateFn: flat [n, sum_x (D), sum_xxT (D*D)] accumulator."""
    from ray.data.aggregate import AggregateFn

    size = 1 + dim + dim * dim

    def accumulate_block(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        x = _block_matrix(block, col)
        out = acc.copy()
        out[0] += len(x)
        out[1 : 1 + dim] += x.sum(axis=0)
        out[1 + dim :] += (x.T @ x).reshape(-1)
        return out

    return AggregateFn(
        init=lambda _k: np.zeros(size),
        accumulate_block=accumulate_block,
        merge=lambda a, b: a + b,
        name=name,
    )


def embedding_covariance(ds, col: str = "embedding", dim: int | None = None):
    """Population covariance (D, D) + mean (D,) + n from one pass."""
    if dim is None:
        first = ds.take(1)[0][col]
        dim = len(np.asarray(first))
    acc = np.asarray(ds.aggregate(make_moments_aggfn(dim, col))["moments"])
    n = acc[0]
    if n == 0:
        raise ValueError(
            "embedding_covariance: empty input — covariance is undefined "
            "over zero rows"
        )
    mean = acc[1 : 1 + dim] / n
    exx = acc[1 + dim :].reshape(dim, dim) / n
    cov = exx - np.outer(mean, mean)
    return cov, mean, int(n)


class PCAModel:
    """components (D, k) column-major eigenvectors (descending variance),
    explained_variance (k,), mean (D,)."""

    def __init__(self, components: np.ndarray, explained_variance: np.ndarray,
                 mean: np.ndarray):
        self.components = components
        self.explained_variance = explained_variance
        self.mean = mean


def pca_fit(ds, col: str = "embedding", n_components: int = 2,
            dim: int | None = None) -> PCAModel:
    cov, mean, _n = embedding_covariance(ds, col, dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    vals, vecs = vals[order], vecs[:, order]
    # deterministic sign: the largest-|loading| coordinate is positive
    for j in range(vecs.shape[1]):
        i = int(np.argmax(np.abs(vecs[:, j])))
        if vecs[i, j] < 0:
            vecs[:, j] = -vecs[:, j]
    return PCAModel(vecs, vals, mean)


def pca_transform(ds, model: PCAModel, col: str = "embedding",
                  out_col: str = "pca"):
    """Append the projected coordinates as a fixed-size list column."""
    comps = model.components
    mean = model.mean
    k = comps.shape[1]

    def project(batch: pa.Table) -> pa.Table:
        x = _block_matrix(batch, col)
        z = (x - mean) @ comps
        return batch.append_column(
            out_col,
            pa.FixedSizeListArray.from_arrays(
                pa.array(z.reshape(-1).astype(np.float32)), k
            ),
        )

    return ds.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# int8 embedding quantization (scale path for ANN / storage)
# ---------------------------------------------------------------------------

def make_minmax_aggfn(dim: int, col: str = "embedding", name: str = "minmax"):
    """AggregateFn: flat [min_x (D) | max_x (D)] accumulator."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        x = _block_matrix(block, col)
        if len(x) == 0:
            return acc
        out = acc.copy()
        out[:dim] = np.minimum(out[:dim], x.min(axis=0))
        out[dim:] = np.maximum(out[dim:], x.max(axis=0))
        return out

    def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.concatenate([
            np.minimum(a[:dim], b[:dim]), np.maximum(a[dim:], b[dim:])
        ])

    return AggregateFn(
        init=lambda _k: np.concatenate([
            np.full(dim, np.inf), np.full(dim, -np.inf)
        ]),
        accumulate_block=accumulate_block,
        merge=merge,
        name=name,
    )


def quantize_embeddings(ds, col: str = "embedding", dim: int | None = None,
                        out_col: str = "q", levels: int = 255):
    """Per-dimension affine int8 quantization: ONE streaming min/max
    aggregate fixes the per-dim scale, then a broadcast stateless map
    emits ``q = floor((x - min) / (max - min) * levels + 0.5)`` (0 when
    the dim is constant). 4x smaller vectors for the ANN scale path with
    a deterministic, SQL-replicable rule. Returns (dataset with int8
    fixed-size-list ``out_col``, mins (D,), scales (D,))."""
    if dim is None:
        first = ds.take(1)[0][col]
        dim = len(np.asarray(first))
    acc = np.asarray(ds.aggregate(make_minmax_aggfn(dim, col))["minmax"])
    mins, maxs = acc[:dim], acc[dim:]
    span = maxs - mins
    scale = np.where(span > 0, span / levels, 1.0)

    def quant(batch: pa.Table) -> pa.Table:
        x = _block_matrix(batch, col)
        q = np.floor((x - mins) / scale + 0.5).astype(np.int64)
        q = np.clip(q, 0, levels)
        return batch.append_column(
            out_col,
            pa.FixedSizeListArray.from_arrays(
                pa.array((q - 128).reshape(-1).astype(np.int8)), dim
            ),
        )

    return ds.map_batches(quant, batch_format="pyarrow"), mins, scale


# ---------------------------------------------------------------------------
# Covariance-based OOD distances (moments pass -> broadcast map)
# ---------------------------------------------------------------------------

def mahalanobis_scores(ds, col: str = "embedding", dim: int | None = None,
                       out_col: str = "mahalanobis", reg: float = 1e-6):
    """Per-row Mahalanobis distance to the corpus distribution:
    sqrt((x-mu)^T Sigma^-1 (x-mu)), with Sigma from the SAME one-pass
    moment aggregate as PCA and a driver-side regularized eigh inverse
    (O(D^3) once, D ~ embedding width). The map broadcasts only the
    (D, D) whitening matrix. NumPy-oracle-tested; for the
    SQL-checkable diagonal restriction see
    :func:`standardized_distance_scores`."""
    cov, mean, _n = embedding_covariance(ds, col, dim)
    vals, vecs = np.linalg.eigh(cov)
    inv_half = vecs * (1.0 / np.sqrt(np.maximum(vals, reg)))  # (D, D)

    def kernel(batch: pa.Table) -> pa.Table:
        x = _block_matrix(batch, col)
        z = (x - mean) @ inv_half
        d = np.sqrt(np.einsum("ij,ij->i", z, z))
        return batch.append_column(out_col, pa.array(d))

    return ds.map_batches(kernel, batch_format="pyarrow")


def standardized_distance_scores(ds, col: str = "embedding",
                                 dim: int | None = None,
                                 out_col: str = "std_distance"):
    """Diagonal-covariance Mahalanobis (standardized euclidean):
    sqrt(sum_i (x_i - mean_i)^2 / var_i) — the SQL-replicable OOD
    distance (per-dim mean/var come from the one-pass moment
    aggregate; constant dims contribute 0)."""
    cov, mean, _n = embedding_covariance(ds, col, dim)
    var = np.diag(cov).copy()
    inv = np.where(var > 0, 1.0 / var, 0.0)

    def kernel(batch: pa.Table) -> pa.Table:
        x = _block_matrix(batch, col)
        d = np.sqrt(((x - mean) ** 2 * inv).sum(axis=1))
        return batch.append_column(out_col, pa.array(d))

    return ds.map_batches(kernel, batch_format="pyarrow")
