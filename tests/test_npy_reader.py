"""Out-of-core .npy reader: mmap-backed blocks ≡ in-memory arrays.

Mirrors the reference's mmap ingestion of labels/pred_probs
(label_issues_batched.py:148-170) — the reader feeds the same
LabelInspector two-pass protocol and must reproduce the in-memory
scores exactly.
"""

import numpy as np
import pytest

from cleanlab_ray.sources.npy import npy_header, read_npy_columns


@pytest.fixture(scope="module")
def npy_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("npy")
    rng = np.random.default_rng(11)
    n, k = 5000, 4
    labels = rng.integers(0, k, size=n).astype(np.int64)
    logits = rng.normal(size=(n, k))
    probs = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    lp, pp = str(d / "labels.npy"), str(d / "pred_probs.npy")
    np.save(lp, labels)
    np.save(pp, probs)
    return lp, pp, labels, probs


def test_header_parse(npy_files):
    lp, pp, labels, probs = npy_files
    assert npy_header(lp) == ((5000,), np.dtype(np.int64))
    assert npy_header(pp) == ((5000, 4), np.dtype(np.float64))


def test_roundtrip_blocks(ray_session, npy_files):
    lp, pp, labels, probs = npy_files
    ds = read_npy_columns({"label": lp, "pred_probs": pp}, batch_rows=777)
    tbl = ds.to_pandas().sort_values("row_id").reset_index(drop=True)
    assert len(tbl) == len(labels)
    np.testing.assert_array_equal(tbl["label"].to_numpy(), labels)
    got = np.stack(tbl["pred_probs"].to_numpy())
    np.testing.assert_array_equal(got, probs)


def test_mismatched_lead_dim_raises(ray_session, tmp_path):
    a, b = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
    np.save(a, np.zeros(10))
    np.save(b, np.zeros(11))
    with pytest.raises(ValueError, match="leading dimensions"):
        read_npy_columns({"a": a, "b": b})


def test_feeds_self_confidence(ray_session, npy_files):
    """The mmap path produces the same per-row scores as in-memory."""
    import pyarrow as pa

    from cleanlab_ray.functions.rank import self_confidence

    lp, pp, labels, probs = npy_files
    ds = read_npy_columns({"label": lp, "pred_probs": pp}, batch_rows=1024)

    def score(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy(zero_copy_only=False)
        k = batch["pred_probs"].type.list_size
        p = np.asarray(batch["pred_probs"].combine_chunks().flatten()).reshape(-1, k)
        return pa.table(
            {"row_id": batch["row_id"], "score": pa.array(self_confidence(lab, p))}
        )

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = out.sort_values("row_id").reset_index(drop=True)
    exp = probs[np.arange(len(labels)), labels]
    np.testing.assert_allclose(out["score"].to_numpy(), exp, rtol=0, atol=0)
