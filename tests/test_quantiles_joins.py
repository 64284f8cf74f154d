"""Order-statistics and join-packer edge cases (final-session review)."""

import numpy as np
import pyarrow as pa
import pytest


def test_exact_ranks_match_numpy_across_seeds(ray_session):
    """The boundary-bin pull must use the histogram's OWN bin-assignment
    rounding: a float >=/< edge predicate disagrees at computed bin
    edges and returns wrong order statistics or IndexErrors."""
    import ray.data as rd

    from cleanlab_ray.functions.quantiles import exact_median, exact_values_at_ranks

    for seed in range(12):
        rng = np.random.default_rng(seed)
        # quantized values -> many exactly-on-edge values after the
        # (s-lo)/width*num_bins scaling, the regression's trigger
        vals = np.round(rng.normal(37.0, 11.0, size=3000), 2)
        ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
        want = np.sort(vals)
        ranks = [0, 1, 777, 1500, 2998, 2999]
        got = exact_values_at_ranks(ds, "v", ranks, num_bins=64)
        for r in ranks:
            assert got[r] == want[r], (seed, r)
        med = exact_median(ds, "v", num_bins=64)
        assert med == float(np.median(vals)), seed


def test_exact_ranks_keyed_by_requested_rank(ray_session):
    """NaNs shrink the finite count; an out-of-range requested rank is
    clamped internally but the dict stays keyed by the REQUEST."""
    import ray.data as rd

    from cleanlab_ray.functions.quantiles import exact_values_at_ranks

    vals = [1.0, float("nan"), 3.0, 2.0]  # 3 finite values
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)}))
    got = exact_values_at_ranks(ds, "v", [3])  # rank 3 of 4 rows
    assert got == {3: 3.0}  # clamped to finite rank 2, keyed by 3


def test_join_packer_rejects_null_list_elements(ray_session):
    """A null ELEMENT inside a list column upcasts the value buffer to
    float64 whose raw bytes would be reinterpreted as int64 on unpack —
    silent garbage; must raise instead."""
    import ray.data as rd

    from cleanlab_ray.functions.joins import attach_flags_by_key

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], type=pa.int64()),
        "lst": pa.array([[1, None, 3], [4]], type=pa.list_(pa.int64())),
    }))
    flags = rd.from_arrow(pa.table({
        "k": pa.array([1], type=pa.int64()),
        "flag": pa.array([1], type=pa.int64()),
    }))
    with pytest.raises(Exception, match="null element"):
        attach_flags_by_key(left, flags, ("k",), {"flag": np.int64(0)}).to_pandas()


def test_join_preserves_large_list_type(ray_session):
    import ray.data as rd

    from cleanlab_ray.functions.joins import attach_flags_by_key

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], type=pa.int64()),
        "lst": pa.array([[1.5, 2.5], [3.5]], type=pa.large_list(pa.float64())),
    }))
    flags = rd.from_arrow(pa.table({
        "k": pa.array([2], type=pa.int64()),
        "flag": pa.array([7], type=pa.int64()),
    }))
    out = attach_flags_by_key(left, flags, ("k",), {"flag": np.int64(0)})
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(df["flag"]) == [0, 7]
    assert [list(v) for v in df["lst"]] == [[1.5, 2.5], [3.5]]
    sch = out.schema()
    t = dict(zip(sch.names, sch.types))["lst"]
    assert pa.types.is_large_list(t)


def test_labels_to_numpy_rejects_nulls_and_negatives(ray_session):
    from cleanlab_ray.state.confident import labels_to_numpy

    with pytest.raises(ValueError, match="null"):
        labels_to_numpy(pa.array([0, None, 2], type=pa.int32()))
    with pytest.raises(ValueError, match="negative"):
        labels_to_numpy(pa.array([0, -1, 2], type=pa.int64()))
    np.testing.assert_array_equal(
        labels_to_numpy(pa.array([0, 1, 2], type=pa.int32())), [0, 1, 2])
