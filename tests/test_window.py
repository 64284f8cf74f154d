"""sliding_window_agg vs a brute-force pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cleanlab_ray.stages.window import sliding_window_agg


def test_sliding_windows_match_bruteforce(ray_session):
    rng = np.random.default_rng(2)
    n = 2000
    ts = np.sort(rng.integers(0, 48 * 3600, size=n)) * 1_000_000
    val = rng.normal(size=n).round(2)
    tbl = pa.table(
        {
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "value": pa.array(val),
        }
    )
    W, S = 3_600_000_000, 900_000_000
    out = (
        sliding_window_agg(rd.from_arrow(tbl).repartition(7))
        .to_pandas()
        .sort_values("window_start_us")
        .reset_index(drop=True)
    )
    # brute force: every grid start whose window contains >= 1 event —
    # including negative starts (a window beginning before the first
    # event can still contain it)
    rows = []
    for w in range(-(W - S), int(ts.max()) + W, S):
        sel = (ts >= w) & (ts < w + W)
        if sel.any():
            rows.append((w, int(sel.sum()), val[sel].sum()))
    want = pd.DataFrame(rows, columns=["window_start_us", "n_events", "sum_value"])
    assert len(out) == len(want)
    assert (out["window_start_us"].values == want["window_start_us"].values).all()
    assert (out["n_events"].values == want["n_events"].values).all()
    np.testing.assert_allclose(out["sum_value"], want["sum_value"], rtol=1e-12)


def test_sliding_windows_width_check(ray_session):
    tbl = pa.table({"ts": pa.array([0], type=pa.timestamp("us")), "value": [1.0]})
    with pytest.raises(ValueError):
        sliding_window_agg(rd.from_arrow(tbl), width_us=100, slide_us=33)
