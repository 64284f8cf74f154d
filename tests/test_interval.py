"""interval_join vs a brute-force pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from cleanlab_ray.stages.interval import interval_join


def _oracle(pts: pd.DataFrame, ivs: pd.DataFrame) -> pd.DataFrame:
    m = pts.merge(ivs, on="k")
    m = m[(m["v"] >= m["lo"]) & (m["v"] <= m["hi"])]
    return m[["k", "pid", "iid"]].sort_values(["pid", "iid"]).reset_index(drop=True)


def test_interval_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    n_p, n_i = 500, 200
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, 15, size=n_p),
            "pid": np.arange(n_p),
            "v": rng.uniform(0, 100, size=n_p).round(2),
        }
    )
    lo = rng.uniform(0, 95, size=n_i).round(2)
    ivs = pd.DataFrame(
        {
            "k": rng.integers(0, 15, size=n_i),
            "iid": np.arange(n_i),
            "lo": lo,
            "hi": (lo + rng.uniform(0, 10, size=n_i)).round(2),
        }
    )
    out = (
        interval_join(
            rd.from_pandas(pts).repartition(5),
            rd.from_pandas(ivs).repartition(3),
            key_col="k", val_col="v", lo_col="lo", hi_col="hi",
        )
        .to_pandas()
        .rename(columns={"iid_iv": "iid"})[["k", "pid", "iid"]]
        .sort_values(["pid", "iid"])
        .reset_index(drop=True)
    )
    want = _oracle(pts, ivs)
    assert len(out) == len(want) and len(want) > 0
    assert out.equals(want.astype(out.dtypes.to_dict()))


def test_interval_join_boundary_inclusive(ray_session):
    pts = pd.DataFrame({"k": [1, 1, 1], "pid": [0, 1, 2], "v": [5.0, 10.0, 10.5]})
    ivs = pd.DataFrame({"k": [1], "iid": [0], "lo": [5.0], "hi": [10.0]})
    out = interval_join(
        rd.from_pandas(pts), rd.from_pandas(ivs),
        key_col="k", val_col="v", lo_col="lo", hi_col="hi",
    ).to_pandas()
    assert sorted(out["pid"].tolist()) == [0, 1]  # both ends inclusive


def test_interval_join_empty_key_no_leak(ray_session):
    # interval on a key with no points; point on a key with no intervals
    pts = pd.DataFrame({"k": [1], "pid": [0], "v": [5.0]})
    ivs = pd.DataFrame({"k": [2], "iid": [0], "lo": [0.0], "hi": [100.0]})
    out = interval_join(
        rd.from_pandas(pts), rd.from_pandas(ivs),
        key_col="k", val_col="v", lo_col="lo", hi_col="hi",
    ).to_pandas()
    assert len(out) == 0


def test_interval_join_salted_mega_key(ray_session):
    """A mega key with >1-block row count: value-range salting must
    replicate intervals across spanned bins and reproduce the brute
    force exactly (no dropped or duplicated matches)."""
    rng = np.random.default_rng(13)
    n_p, n_i = 30_000, 300
    pts = pd.DataFrame(
        {
            "k": np.where(rng.uniform(size=n_p) < 0.95, 3,
                           rng.integers(0, 4, size=n_p)),
            "pid": np.arange(n_p),
            "v": rng.uniform(0, 100, size=n_p).round(2),
        }
    )
    lo = rng.uniform(0, 95, size=n_i).round(2)
    ivs = pd.DataFrame(
        {
            "k": np.where(rng.uniform(size=n_i) < 0.9, 3,
                           rng.integers(0, 4, size=n_i)),
            "iid": np.arange(n_i),
            "lo": lo,
            # wide intervals span many salt bins -> replication exercised
            "hi": (lo + rng.uniform(0, 40, size=n_i)).round(2),
        }
    )
    out = (
        interval_join(
            rd.from_pandas(pts).repartition(16),
            rd.from_pandas(ivs).repartition(3),
            key_col="k", val_col="v", lo_col="lo", hi_col="hi",
            num_salts=16,
        )
        .to_pandas()
        .rename(columns={"iid_iv": "iid"})[["k", "pid", "iid"]]
        .sort_values(["pid", "iid"])
        .reset_index(drop=True)
    )
    want = _oracle(pts, ivs)
    assert len(out) == len(want) and len(want) > n_p  # multi-match present
    assert out.equals(want.astype(out.dtypes.to_dict()))


def test_interval_join_ulp_boundary_many_runs(ray_session):
    """Regression: the per-run band shift must not alias values ~1 ulp
    apart when run ids are large. With the old FLOAT shift
    ((v - vmin) + run*span), a point 1 ulp above hi matched spuriously
    once run*span grew past the values' precision (seen at sf0.1:
    point 17.19 vs hi 17.189999999999998). The integer-rank shift is
    exact at any run count."""
    import pandas as pd

    from cleanlab_ray.stages.interval import interval_join

    n = 5000
    v = 17.19 + np.arange(n)
    pts = pd.DataFrame({"k": np.arange(n), "pid": np.arange(n), "v": v})
    ivs = pd.DataFrame({
        "k": np.repeat(np.arange(n), 2),
        "iid": np.arange(2 * n),
        # even iid: hi exactly v  -> must match (inclusive bound)
        # odd iid:  hi 1 ulp BELOW v -> must not match
        "lo": np.repeat(v - 5.0, 2),
        "hi": np.stack([v, np.nextafter(v, -np.inf)], axis=1).reshape(-1),
    })
    out = interval_join(
        rd.from_pandas(pts).repartition(4),
        rd.from_pandas(ivs).repartition(4),
        key_col="k", val_col="v", lo_col="lo", hi_col="hi",
    ).to_pandas()
    assert len(out) == n
    assert (out["iid_iv"].to_numpy() % 2 == 0).all()
