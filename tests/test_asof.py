"""asof_join vs pandas merge_asof (backward, ties included)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from cleanlab_ray.stages.asof import asof_join


def _mk(n_left=300, n_right=200, n_keys=12, seed=5):
    rng = np.random.default_rng(seed)

    def frame(n, tag):
        return pd.DataFrame(
            {
                "event_id": np.arange(n) + (0 if tag == "l" else 10_000),
                "ts": pd.to_datetime(
                    rng.integers(0, 1_000_000, size=n), unit="s"
                ),
                "user_id": rng.integers(0, n_keys, size=n),
                "value": rng.normal(size=n).round(3),
            }
        )

    return frame(n_left, "l"), frame(n_right, "r")


def test_asof_matches_pandas(ray_session):
    lp, rp = _mk()
    out = (
        asof_join(
            rd.from_pandas(lp).repartition(5),
            rd.from_pandas(rp).repartition(4),
            on="user_id",
            ts_col="ts",
            right_cols=("value",),
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            lp.sort_values("ts"),
            rp[["ts", "user_id", "value"]].sort_values("ts"),
            on="ts",
            by="user_id",
            direction="backward",
            suffixes=("", "_asof"),
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(want) == len(lp)
    va, vb = out["value_asof"].to_numpy(), want["value_asof"].to_numpy()
    assert ((np.isnan(va) & np.isnan(vb)) | (va == vb)).all()


def test_asof_tie_is_visible(ray_session):
    # right row at exactly the left ts must be matched (>= semantics)
    lp = pd.DataFrame(
        {"event_id": [0], "ts": pd.to_datetime([100], unit="s"), "user_id": [1],
         "value": [1.0]}
    )
    rp = pd.DataFrame(
        {"event_id": [10], "ts": pd.to_datetime([100], unit="s"), "user_id": [1],
         "value": [42.0]}
    )
    out = asof_join(
        rd.from_pandas(lp), rd.from_pandas(rp), on="user_id", ts_col="ts",
        right_cols=("value",),
    ).to_pandas()
    assert out["value_asof"].iloc[0] == 42.0


def test_asof_no_cross_key_leak(ray_session):
    # a right row for another user must never fill a left row
    lp = pd.DataFrame(
        {"event_id": [0], "ts": pd.to_datetime([200], unit="s"), "user_id": [1],
         "value": [1.0]}
    )
    rp = pd.DataFrame(
        {"event_id": [10], "ts": pd.to_datetime([100], unit="s"), "user_id": [2],
         "value": [42.0]}
    )
    out = asof_join(
        rd.from_pandas(lp), rd.from_pandas(rp), on="user_id", ts_col="ts",
        right_cols=("value",),
    ).to_pandas()
    assert np.isnan(out["value_asof"].iloc[0])


def test_asof_salted_mega_key(ray_session):
    """One key holds most rows (a mega key whose history would exceed a
    block); num_salts splits it by ts range and the carry must propagate
    the last right row across right-free salt partitions. Output must
    equal pandas merge_asof exactly."""
    rng = np.random.default_rng(9)
    n_left, n_right = 20_000, 400
    lp = pd.DataFrame(
        {
            "event_id": np.arange(n_left),
            # hot key 7 gets 95% of rows, full ts span
            "user_id": np.where(rng.uniform(size=n_left) < 0.95, 7,
                                 rng.integers(0, 5, size=n_left)),
            "ts": pd.to_datetime(rng.integers(0, 1_000_000, size=n_left), unit="s"),
            "value": rng.normal(size=n_left).round(3),
        }
    )
    # right rows only in the FIRST 10% of the span: most salt partitions
    # have no in-partition right rows and depend entirely on the carry
    rp = pd.DataFrame(
        {
            "event_id": np.arange(n_right) + 10_000_000,
            "user_id": np.where(rng.uniform(size=n_right) < 0.9, 7,
                                 rng.integers(0, 5, size=n_right)),
            "ts": pd.to_datetime(rng.integers(0, 100_000, size=n_right), unit="s"),
            "value": rng.normal(size=n_right).round(3),
        }
    )
    out = (
        asof_join(
            rd.from_pandas(lp).repartition(16),
            rd.from_pandas(rp).repartition(4),
            on="user_id", ts_col="ts", right_cols=("value",),
            num_salts=16,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            lp.sort_values("ts"),
            rp[["ts", "user_id", "value"]].sort_values("ts"),
            on="ts", by="user_id", direction="backward", suffixes=("", "_asof"),
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(want) == n_left
    va, vb = out["value_asof"].to_numpy(), want["value_asof"].to_numpy()
    assert ((np.isnan(va) & np.isnan(vb)) | (va == vb)).all()
    # carry actually exercised: rows in late ts ranges still matched
    late = out[out["ts"] > pd.Timestamp("1970-01-04")]
    assert len(late) > 1000 and late["value_asof"].notna().mean() > 0.9
