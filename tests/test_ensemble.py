"""Ensemble quality scores vs a direct NumPy port of rank.py:158-360."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from cleanlab_ray.functions.ensemble import ensemble_label_quality_scores

T_VALUES = (1e-4, 1e-3, 1e-2, 1e-1, 1e0, 1e1, 1e2, 2e2)


def _fixture(n=400, m=3, k=3, seed=9):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, k, size=n)
    ps = []
    for i in range(m):
        logits = rng.normal(size=(n, k)) + 1.5 * np.eye(k)[y] * (0.5 + i * 0.3)
        e = np.exp(logits)
        ps.append(e / e.sum(axis=1, keepdims=True))
    cols = {"vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "label": pa.array(y.astype(np.int64))}
    for i, p in enumerate(ps):
        cols[f"pred_probs_{i}"] = pa.FixedSizeListArray.from_arrays(
            pa.array(p.reshape(-1)), k
        )
    return rd.from_arrow(pa.table(cols)).repartition(5), y, ps


def _np_logloss(y, p):
    q = np.clip(p, 1e-6, None)
    q = q / q.sum(axis=1, keepdims=True)
    return float(-np.log(q[np.arange(len(y)), y]).mean())


def _np_oracle(y, ps, weight_by, custom=None):
    scores = np.stack([p[np.arange(len(y)), y] for p in ps], axis=1)
    m = len(ps)
    if weight_by == "uniform":
        w = np.full(m, 1 / m)
    elif weight_by == "accuracy":
        accs = np.array([(p.argmax(axis=1) == y).mean() for p in ps])
        w = accs / accs.sum()
    elif weight_by == "custom":
        w = np.asarray(custom) / np.sum(custom)
    else:  # log_loss_search
        lls = np.array([_np_logloss(y, p) for p in ps])
        best, w = np.inf, None
        for t in T_VALUES:
            nll = np.exp(-t * lls)
            wt = nll / nll.sum()
            qs = [np.clip(p, 1e-6, None) for p in ps]
            qs = [q / q.sum(axis=1, keepdims=True) for q in qs]
            blend = sum(wt[i] * qs[i] for i in range(m))
            ev = float(-np.log(blend[np.arange(len(y)), y]).mean())
            if ev < best:
                best, w = ev, wt
    return (scores * w).sum(axis=1), w


@pytest.mark.parametrize("weight_by", ["uniform", "accuracy", "log_loss_search"])
def test_ensemble_matches_numpy(ray_session, weight_by):
    ds, y, ps = _fixture()
    out, w = ensemble_label_quality_scores(ds, num_models=3, weight_by=weight_by)
    got = out.to_pandas().sort_values("vec_id")["ensemble_score"].to_numpy()
    want, w_want = _np_oracle(y, ps, weight_by)
    np.testing.assert_allclose(w, w_want, rtol=1e-12)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_ensemble_custom_weights(ray_session):
    ds, y, ps = _fixture()
    out, w = ensemble_label_quality_scores(
        ds, num_models=3, weight_by="custom", custom_weights=np.array([3.0, 1.0, 1.0])
    )
    got = out.to_pandas().sort_values("vec_id")["ensemble_score"].to_numpy()
    want, _ = _np_oracle(y, ps, "custom", custom=[3.0, 1.0, 1.0])
    np.testing.assert_allclose(got, want, rtol=1e-12)
