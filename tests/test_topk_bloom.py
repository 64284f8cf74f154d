"""grouped_top_k + bloom_semijoin: brute-force parity and edge regimes."""

import numpy as np
import pyarrow as pa
import pytest


def test_grouped_top_k_matches_bruteforce(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.topk import grouped_top_k

    rng = np.random.default_rng(23)
    n = 500
    tbl = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "grp": pa.array(rng.integers(0, 7, size=n).astype(np.int64)),
        # heavy score ties to exercise the deterministic tie-break
        "score": pa.array(rng.integers(0, 10, size=n).astype(np.float64)),
    })
    ds = rd.from_arrow(tbl).repartition(8)
    out = grouped_top_k(ds, "grp", "score", k=4, tie_cols=("id",)).to_pandas()
    import pandas as pd

    df = tbl.to_pandas()
    exp = (
        df.sort_values(["grp", "score", "id"], ascending=[True, False, True])
        .groupby("grp")
        .head(4)
    )
    got = out.sort_values(["grp", "score", "id"], ascending=[True, False, True])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[["id", "grp", "score"]],
        exp.reset_index(drop=True)[["id", "grp", "score"]],
    )


def test_grouped_top_k_small_groups(ray_session):
    """Groups smaller than k are returned whole."""
    import ray.data as rd

    from cleanlab_ray.stages.topk import grouped_top_k

    tbl = pa.table({
        "id": pa.array([0, 1, 2], type=pa.int64()),
        "grp": pa.array(["a", "a", "b"]),
        "score": pa.array([1.0, 2.0, 3.0]),
    })
    out = grouped_top_k(rd.from_arrow(tbl).repartition(2), "grp", "score",
                        k=10, tie_cols=("id",)).to_pandas()
    assert len(out) == 3


def test_bloom_semijoin_exact_even_with_tiny_bitmap(ray_session):
    """A deliberately saturated bloom (huge FP rate) must still produce
    the exact semijoin — verification removes every false positive."""
    import ray.data as rd

    from cleanlab_ray.stages.bloom import (
        bloom_maybe_contains,
        bloom_semijoin,
        make_bloom_aggfn,
        _key_hashes,
    )

    rng = np.random.default_rng(3)
    left_keys = np.arange(2000, dtype=np.int64)
    members = rng.choice(left_keys, size=60, replace=False)
    left = rd.from_arrow(pa.table({
        "k": pa.array(left_keys),
        "payload": pa.array(left_keys * 7),
    })).repartition(5)
    right = rd.from_arrow(pa.table({"k": pa.array(np.sort(members))}))

    m_bits = 256  # saturated: 60 keys x 3 hashes in 256 bits
    out = bloom_semijoin(left, right, "k", m_bits=m_bits, n_hashes=3).to_pandas()
    assert sorted(out["k"]) == sorted(members)
    assert (out.set_index("k")["payload"] == out.set_index("k").index * 7).all()

    # and the bloom really does false-positive in this regime
    bitmap = np.asarray(
        right.aggregate(make_bloom_aggfn("k", m_bits, 3))["bloom"]
    )
    h = _key_hashes(pa.array(left_keys))
    cand = bloom_maybe_contains(bitmap, h, m_bits, 3)
    assert cand.sum() > len(members)  # FPs present
    # no false negatives ever
    member_mask = np.isin(left_keys, members)
    assert cand[member_mask].all()


def test_bloom_string_keys(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.bloom import bloom_semijoin

    left = rd.from_arrow(pa.table({
        "name": pa.array([f"user{i}" for i in range(300)]),
        "v": pa.array(np.arange(300, dtype=np.int64)),
    })).repartition(3)
    right = rd.from_arrow(pa.table({"name": pa.array(["user5", "user99", "user250"])}))
    out = bloom_semijoin(left, right, "name").to_pandas()
    assert sorted(out["name"]) == ["user250", "user5", "user99"]


def test_bloom_semijoin_join_fallback_matches_broadcast(ray_session):
    """broadcast_limit=0 forces the hash-join verify path; output must
    equal the broadcast path exactly."""
    import ray.data as rd

    from cleanlab_ray.stages.bloom import bloom_semijoin

    rng = np.random.default_rng(9)
    left_keys = np.arange(1500, dtype=np.int64)
    members = np.sort(rng.choice(left_keys, size=40, replace=False))

    def build():
        left = rd.from_arrow(pa.table({
            "k": pa.array(left_keys), "payload": pa.array(left_keys + 1),
        })).repartition(4)
        right = rd.from_arrow(pa.table({"k": pa.array(members)}))
        return left, right

    l1, r1 = build()
    bc = bloom_semijoin(l1, r1, "k").to_pandas().sort_values("k").reset_index(drop=True)
    l2, r2 = build()
    jn = bloom_semijoin(l2, r2, "k", broadcast_limit=0).to_pandas().sort_values(
        "k"
    ).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(bc[["k", "payload"]], jn[["k", "payload"]])
    assert list(bc["k"]) == list(members)


def test_mixture_sample_rates_and_determinism(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.topk import mixture_sample

    n = 20_000
    tbl = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "src": pa.array(np.where(np.arange(n) % 2 == 0, "a", "b")),
    })
    rates = {"a": 0.3, "b": 0.0}

    def run():
        return mixture_sample(
            rd.from_arrow(tbl).repartition(6), "src", rates, "id",
            default_rate=0.0,
        ).to_pandas().sort_values("id").reset_index(drop=True)

    s1, s2 = run(), run()
    import pandas as pd

    pd.testing.assert_frame_equal(s1, s2)  # deterministic
    assert (s1["src"] == "a").all()        # rate-0 group fully dropped
    frac = len(s1) / (n / 2)
    assert abs(frac - 0.3) < 0.02          # hits the target rate
    # partitioning-independent: same rows regardless of block layout
    s3 = mixture_sample(
        rd.from_arrow(tbl).repartition(1), "src", rates, "id"
    ).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(s1, s3)


def test_sorted_group_agg_matches_native(ray_session):
    """sum/max/min/count parity with Ray's native groupby on random
    int and string keys, including single-row groups and empty blocks."""
    import ray.data as rd

    from cleanlab_ray.stages.topk import sorted_group_agg

    rng = np.random.default_rng(31)
    n = 30_000
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 5_000, size=n).astype(np.int64)),
        "ks": pa.array([f"g{i}" for i in rng.integers(0, 777, size=n)]),
        "v": pa.array(rng.integers(-50, 50, size=n).astype(np.int64)),
    })
    ds = rd.from_arrow(tbl).repartition(7)
    got = (
        sorted_group_agg(ds, "k", {"v": "sum"})
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    exp = (
        rd.from_arrow(tbl).groupby("k").sum("v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp[got.columns])

    got2 = (
        sorted_group_agg(rd.from_arrow(tbl).repartition(5), "ks",
                         {"v": "max", "k": "min"})
        .to_pandas().sort_values("ks").reset_index(drop=True)
    )
    df = tbl.to_pandas()
    exp2 = df.groupby("ks").agg(**{"max(v)": ("v", "max"),
                                   "min(k)": ("k", "min")}).reset_index()
    pd.testing.assert_frame_equal(got2, exp2[got2.columns])


def test_sorted_group_agg_multikey(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.topk import sorted_group_agg

    rng = np.random.default_rng(77)
    n = 10_000
    tbl = pa.table({
        "a": pa.array(rng.integers(0, 200, size=n).astype(np.int64)),
        "b": pa.array([f"s{i}" for i in rng.integers(0, 50, size=n)]),
        "v": pa.array(rng.integers(0, 9, size=n).astype(np.int64)),
    })
    got = (
        sorted_group_agg(rd.from_arrow(tbl).repartition(5), ["a", "b"],
                         {"v": "sum", "a": "count"})
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    df = tbl.to_pandas()
    exp = df.groupby(["a", "b"]).agg(**{"sum(v)": ("v", "sum"),
                                        "count(a)": ("a", "size")}).reset_index()
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp[got.columns])


@pytest.mark.usefixtures("ray_session")
def test_global_top_k_matches_sort_limit():
    """global_top_k == pandas nsmallest/nlargest across blocks, empty
    input, k > n, and a ties+tiebreak total order."""
    import ray.data as rd

    from cleanlab_ray.stages.topk import global_top_k

    rng = np.random.default_rng(11)
    n = 5_000
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 400, size=n).astype(np.int64)),  # ties
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.normal(size=n)),
    })
    ds = rd.from_arrow(tbl).repartition(7)
    df = tbl.to_pandas()

    # unique-key ascending
    got = global_top_k(ds, "v", 25).to_pandas()
    exp = df.nsmallest(25, "v").reset_index(drop=True)
    assert np.array_equal(got["id"].to_numpy(), exp["id"].to_numpy())

    # descending
    got = global_top_k(ds, "v", 10, descending=True).to_pandas()
    exp = df.nlargest(10, "v").reset_index(drop=True)
    assert np.array_equal(got["id"].to_numpy(), exp["id"].to_numpy())

    # heavy ties + unique tie-break column = deterministic total order
    got = global_top_k(ds, ["k", "id"], 50).to_pandas()
    exp = df.sort_values(["k", "id"], kind="mergesort").head(50).reset_index(drop=True)
    assert np.array_equal(got["id"].to_numpy(), exp["id"].to_numpy())

    # k > n returns everything, still sorted
    got = global_top_k(rd.from_arrow(tbl.slice(0, 3)), "v", 99).to_pandas()
    assert len(got) == 3 and got["v"].is_monotonic_increasing

    # empty input
    got = global_top_k(rd.from_arrow(tbl.slice(0, 0)), "v", 5).to_pandas()
    assert len(got) == 0


def test_sorted_group_agg_bool_sum_schema_stable(ray_session):
    """sum over a BOOLEAN column must widen to int64 on empty and
    non-empty blocks alike (numpy reduceat widens; the empty-block
    schema must match or block concat fails)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.topk import sorted_group_agg

    tbl = pa.table({
        "g": pa.array(["a", "a", "b", "b", "b", "c"]),
        "flag": pa.array([True, False, True, True, False, False]),
    })
    # repartition to force empty blocks through the kernel
    ds = rd.from_arrow(tbl).repartition(8)
    out = sorted_group_agg(ds, "g", {"flag": "sum"}).to_pandas()
    out = out.sort_values("g").reset_index(drop=True)
    assert out["sum(flag)"].dtype == np.int64
    assert out["sum(flag)"].tolist() == [1, 2, 0]


def test_bloom_semijoin_right_with_empty_blocks(ray_session):
    """Regression: a finely-partitioned right side hands the broadcast
    path zero-row blocks with an EMPTY schema; concat must skip them
    (previously: ArrowInvalid "Schema at index N was different")."""
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.bloom import bloom_semijoin

    left = rd.from_arrow(pa.table({"k": pa.array(list(range(50)), pa.int64()),
                                   "v": pa.array(list(range(50)))}))
    right = rd.from_arrow(pa.table({"k": pa.array([3, 7, 7, 11], pa.int64())}))
    out = bloom_semijoin(left.repartition(9), right.repartition(16),
                         left_key="k").to_pandas()
    assert sorted(out["k"].tolist()) == [3, 7, 11]


def test_bloom_semijoin_empty_right(ray_session):
    """A fully empty right side yields an empty result with the left
    schema (no crash)."""
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.bloom import bloom_semijoin

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                   "v": pa.array(["a", "b"])}))
    right = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    out = bloom_semijoin(left, right.repartition(4), left_key="k")
    df = out.to_pandas()
    assert len(df) == 0
    assert out.schema().names == ["k", "v"]
