"""Synthetic label-noise generation: matrix generator contracts +
distributed count-exact flipping vs a NumPy rank oracle."""

import numpy as np
import pyarrow as pa
import pytest

from cleanlab_ray.stages.noise_gen import (
    count_joint_from_matrix,
    distribute_balls,
    generate_n_rand_probabilities,
    generate_noise_matrix_from_trace,
    generate_noisy_labels,
    noise_matrix_is_valid,
    salt_for_seed,
    _hash_ids,
)


def _numpy_flip_oracle(labels: np.ndarray, nm: np.ndarray, seed: int) -> np.ndarray:
    """Reference semantics of generate_noisy_labels: rank within class
    by the id hash, flip the first count_joint[j,k] ranks to each j."""
    k = len(nm)
    h = _hash_ids(np.arange(len(labels), dtype=np.int64), salt_for_seed(seed))
    cj = count_joint_from_matrix(nm, np.bincount(labels, minlength=k))
    out = labels.copy()
    for kk in range(k):
        idx = np.flatnonzero(labels == kk)
        order = idx[np.argsort(h[idx])]
        pos = 0
        for j in range(k):
            if j == kk or cj[j, kk] == 0:
                continue
            out[order[pos : pos + cj[j, kk]]] = j
            pos += cj[j, kk]
    return out


def test_rand_probabilities_contract():
    rng = np.random.default_rng(0)
    p = generate_n_rand_probabilities(5, 2.0, rng, max_prob=0.9, min_prob=0.1)
    assert p.shape == (5,)
    assert abs(p.sum() - 2.0) < 1e-9
    assert (p <= 0.9 + 1e-6).all() and (p >= 0.1 - 1e-6).all()
    with pytest.raises(ValueError):
        generate_n_rand_probabilities(2, 2.0, rng, max_prob=0.5)


def test_distribute_balls():
    rng = np.random.default_rng(0)
    out = distribute_balls(7, 4, rng, max_balls_per_bin=3)
    assert out.sum() == 7 and (out <= 3).all() and (out >= 0).all()


def test_noise_matrix_generator_valid_and_trace():
    py = np.array([0.5, 0.3, 0.2])
    for seed in range(5):
        nm = generate_noise_matrix_from_trace(3, 2.0, py=py, seed=seed)
        assert nm is not None
        assert abs(np.trace(nm) - 2.0) < 1e-8
        np.testing.assert_allclose(nm.sum(axis=0), 1.0, atol=1e-8)
        assert noise_matrix_is_valid(nm, py)
    with pytest.raises(ValueError):
        generate_noise_matrix_from_trace(3, 0.9, py=py)
    # K=2 fast path needs no py
    nm2 = generate_noise_matrix_from_trace(2, 1.6, seed=1)
    assert abs(np.trace(nm2) - 1.6) < 1e-8
    np.testing.assert_allclose(nm2.sum(axis=0), 1.0, atol=1e-8)


def test_noise_matrix_is_valid_rejects_unlearnable():
    py = np.ones(2) / 2
    # uniform flipping: p(label=i, true=i) == product of marginals
    assert not noise_matrix_is_valid(np.array([[0.5, 0.5], [0.5, 0.5]]), py)
    assert noise_matrix_is_valid(np.array([[0.9, 0.1], [0.1, 0.9]]), py)


@pytest.fixture(scope="module")
def label_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    labels = rng.integers(0, 4, 8000).astype(np.int64)
    t = pa.table(
        {
            "id": pa.array(np.arange(len(labels)), type=pa.int64()),
            "label": pa.array(labels, type=pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(7), labels


def test_distributed_flip_matches_numpy_oracle(label_ds):
    ds, labels = label_ds
    py = np.bincount(labels, minlength=4) / len(labels)
    nm = generate_noise_matrix_from_trace(4, 2.7, py=py, seed=2)
    out = (
        generate_noisy_labels(ds, nm, seed=5)
        .to_pandas()
        .sort_values("id")["noisy_label"]
        .to_numpy()
    )
    np.testing.assert_array_equal(out, _numpy_flip_oracle(labels, nm, seed=5))


def test_flip_counts_exact_under_any_partitioning(label_ds):
    ds, labels = label_ds
    py = np.bincount(labels, minlength=4) / len(labels)
    nm = generate_noise_matrix_from_trace(4, 2.2, py=py, seed=9)
    cj = count_joint_from_matrix(nm, np.bincount(labels, minlength=4))
    for parts in (1, 13):
        got = (
            generate_noisy_labels(ds.repartition(parts), nm, seed=1)
            .to_pandas()
            .sort_values("id")["noisy_label"]
            .to_numpy()
        )
        induced = np.zeros((4, 4), dtype=np.int64)
        np.add.at(induced, (got, labels), 1)
        off = induced.copy()
        np.fill_diagonal(off, 0)
        np.testing.assert_array_equal(off, cj)


def test_refinement_path_is_byte_identical(label_ds):
    """Force the second-level histogram (refine_threshold=1) and tiny
    top-level bins: the exact same labels must come out."""
    ds, labels = label_ds
    py = np.bincount(labels, minlength=4) / len(labels)
    nm = generate_noise_matrix_from_trace(4, 2.7, py=py, seed=2)
    base = (
        generate_noisy_labels(ds, nm, seed=5)
        .to_pandas()
        .sort_values("id")["noisy_label"]
        .to_numpy()
    )
    refined = (
        generate_noisy_labels(ds, nm, seed=5, num_bins=16, refine_threshold=1)
        .to_pandas()
        .sort_values("id")["noisy_label"]
        .to_numpy()
    )
    np.testing.assert_array_equal(base, refined)
