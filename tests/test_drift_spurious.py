"""Drift-by-window KS and spurious-correlation scoring."""

import numpy as np
import pytest


def test_drift_detects_shifted_window(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.drift import drift_by_window

    rng = np.random.default_rng(4)
    base_us = (1_700_000_000 // 3600) * 3600 * 1_000_000  # hour-aligned
    rows = []
    for h in range(8):
        for i in range(400):
            v = rng.normal(10.0, 1.0)
            if h == 5:  # drifted hour
                v = rng.normal(20.0, 1.0)
            rows.append({"ts": base_us + h * 3_600_000_000 + i * 1_000_000, "value": float(v)})
    import pyarrow as pa

    t = pa.table(
        {
            "ts": pa.array([r["ts"] for r in rows], type=pa.timestamp("us")),
            "value": pa.array([r["value"] for r in rows]),
        }
    )
    out = drift_by_window(rd.from_arrow(t))
    worst = out.iloc[0]
    worst_hour = (worst["window_us"] - base_us) // 3_600_000_000
    assert worst_hour == 5
    assert worst["ks_statistic"] > 0.5
    assert out.iloc[3]["ks_statistic"] < 0.3  # non-drifted windows near global
    assert out.attrs["dataset_score"] < 0.5


def test_ks_statistic_reference_semantics():
    from cleanlab_ray.stages.drift import simplified_ks_statistic

    a = np.array([1.0, 0, 0, 0])
    b = np.array([0, 0, 0, 1.0])
    assert simplified_ks_statistic(a, b) == 1.0
    assert simplified_ks_statistic(a, a) == 0.0


def test_spurious_correlations(ray_session):
    import ray.data as rd

    from cleanlab_ray.pipelines.spurious import spurious_correlations

    rng = np.random.default_rng(6)
    n = 1500
    y = rng.integers(0, 3, n)
    leaky = y * 2.0 + rng.normal(0, 0.1, n)   # property that encodes the label
    noise = rng.normal(0, 1.0, n)             # unrelated property
    rows = [
        {"rid": i, "leaky": float(leaky[i]), "noise": float(noise[i]), "label": int(y[i])}
        for i in range(n)
    ]
    out = spurious_correlations(
        rd.from_items(rows), ["leaky", "noise"], id_col="rid"
    ).set_index("property")
    assert out.loc["leaky", "score"] < 0.1    # strongly predictive -> low score
    assert out.loc["noise", "score"] > 0.8    # uninformative -> near 1


def test_drift_tolerates_null_ts_and_empty_input(ray_session):
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.drift import drift_by_window

    t0 = datetime.datetime(2024, 1, 1)
    ts = [t0, t0, None, t0 + datetime.timedelta(hours=1)]
    vals = [1.0, 2.0, 3.0, None]
    tbl = pa.table({
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "value": pa.array(vals, type=pa.float64()),
    })
    out = drift_by_window(rd.from_arrow(tbl))
    # null-ts and null-value rows are dropped: window 0 has 2 rows,
    # window 1 has 0 surviving rows (its only value was null)
    assert int(out.loc[out["n"] > 0, "n"].sum()) == 2

    empty = drift_by_window(rd.from_arrow(tbl.slice(0, 0)))
    assert len(empty) == 0
    assert empty.attrs["dataset_score"] == 1.0
