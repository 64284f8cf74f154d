"""Distributed PCA vs the NumPy oracle."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    d = 12
    # anisotropic gaussian with known principal axes
    scales = np.array([5.0, 3.0, 2.0] + [0.5] * (d - 3))
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    x = rng.standard_normal((400, d)) * scales @ q.T + rng.standard_normal(d)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(400, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1).astype(np.float32)), d
        ),
    })
    ds = rd.from_arrow(tbl).repartition(5)
    return ds, x.astype(np.float32).astype(np.float64), d


def test_covariance_matches_numpy(emb_ds):
    from cleanlab_ray.stages.pca import embedding_covariance

    ds, x, d = emb_ds
    cov, mean, n = embedding_covariance(ds, dim=d)
    assert n == len(x)
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=0, atol=1e-9)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), rtol=0, atol=1e-8)


def test_fit_matches_numpy_eig(emb_ds):
    from cleanlab_ray.stages.pca import pca_fit

    ds, x, d = emb_ds
    k = 3
    model = pca_fit(ds, n_components=k, dim=d)
    vals, vecs = np.linalg.eigh(np.cov(x.T, bias=True))
    order = np.argsort(vals)[::-1][:k]
    np.testing.assert_allclose(
        model.explained_variance, vals[order], rtol=1e-9, atol=1e-10
    )
    # components match up to (fixed) sign
    for j in range(k):
        ref = vecs[:, order[j]]
        got = model.components[:, j]
        assert min(np.abs(got - ref).max(), np.abs(got + ref).max()) < 1e-8
        # deterministic sign rule: largest-|loading| coordinate positive
        assert got[int(np.argmax(np.abs(got)))] > 0
    # orthonormal
    np.testing.assert_allclose(
        model.components.T @ model.components, np.eye(k), atol=1e-10
    )


def test_transform_projects(emb_ds):
    from cleanlab_ray.stages.pca import pca_fit, pca_transform

    ds, x, d = emb_ds
    model = pca_fit(ds, n_components=2, dim=d)
    out = pca_transform(ds, model).to_pandas().sort_values("vec_id")
    z = np.stack(out["pca"].to_numpy())
    exp = ((x - x.mean(axis=0)) @ model.components).astype(np.float32)
    np.testing.assert_allclose(z, exp, rtol=1e-4, atol=1e-4)
    # projected variance equals explained variance
    np.testing.assert_allclose(
        z.astype(np.float64).var(axis=0), model.explained_variance,
        rtol=1e-3,
    )


def test_quantize_embeddings_roundtrip(emb_ds, ray_session):
    """Dequantized vectors are within half a quantization step per dim;
    constant dims quantize to the zero level."""
    import ray.data as rd

    from cleanlab_ray.stages.pca import quantize_embeddings

    ds, x, d = emb_ds
    # add a constant dimension
    xc = np.hstack([x.astype(np.float32), np.full((len(x), 1), 3.25, np.float32)])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(xc.reshape(-1)), d + 1
        ),
    })
    qds, mins, scale = quantize_embeddings(
        rd.from_arrow(tbl).repartition(4), dim=d + 1
    )
    out = qds.to_pandas().sort_values("vec_id")
    q = np.stack(out["q"].to_numpy()).astype(np.int64) + 128
    deq = q * scale + mins
    xf = xc.astype(np.float64)
    assert np.abs(deq - xf).max() <= (scale / 2 + 1e-9).max()
    assert (q[:, -1] == 0).all()  # constant dim
    assert q.min() >= 0 and q.max() <= 255


def test_mahalanobis_matches_numpy(emb_ds):
    from cleanlab_ray.stages.pca import mahalanobis_scores

    ds, x, d = emb_ds
    out = mahalanobis_scores(ds, dim=d).to_pandas().sort_values("vec_id")
    cov = np.cov(x.T, bias=True)
    mu = x.mean(axis=0)
    # reference with the same eigen regularization
    vals, vecs = np.linalg.eigh(cov)
    inv = vecs @ np.diag(1.0 / np.maximum(vals, 1e-6)) @ vecs.T
    exp = np.sqrt(np.einsum("ij,jk,ik->i", x - mu, inv, x - mu))
    np.testing.assert_allclose(out["mahalanobis"].to_numpy(), exp, rtol=1e-8)


def test_std_distance_matches_numpy(emb_ds):
    from cleanlab_ray.stages.pca import standardized_distance_scores

    ds, x, d = emb_ds
    out = standardized_distance_scores(ds, dim=d).to_pandas().sort_values("vec_id")
    mu, var = x.mean(axis=0), x.var(axis=0)
    exp = np.sqrt((((x - mu) ** 2) / var).sum(axis=1))
    np.testing.assert_allclose(out["std_distance"].to_numpy(), exp, rtol=1e-9)
