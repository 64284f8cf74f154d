"""find_label_issues: every filter strategy vs the full-array oracle."""

import numpy as np
import pytest

from cleanlab_ray.fixtures.oracle import (
    oracle_confident_learning_mask,
    oracle_confident_joint,
    oracle_low_self_confidence_mask,
    oracle_prune_by_class,
    oracle_prune_by_count,
    oracle_reduce_mask,
)
from cleanlab_ray.state.prune import keep_at_least_n_per_class

K = 3


@pytest.fixture(scope="module")
def ds_and_arrays(ray_session, corpus_dir, small_corpus):
    import ray.data as rd

    from cleanlab_ray.state.confident import labels_to_numpy, pred_probs_to_numpy

    ds = rd.read_parquet(
        corpus_dir, columns=["conv_id", "turn_idx", "label", "pred_probs"]
    ).materialize()
    df = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    labels = df["label"].to_numpy().astype(np.int64)
    probs = np.stack(df["pred_probs"].to_numpy()).astype(np.float64)
    keys = (df["conv_id"].to_numpy(), df["turn_idx"].to_numpy())
    return ds, df, labels, probs, keys


def _engine_mask(ds, filter_by, **kw):
    from cleanlab_ray.pipelines.label_issues import find_label_issues

    out, stats = find_label_issues(ds, filter_by=filter_by, num_classes=K, **kw)
    got = out.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return got["is_label_issue"].to_numpy(), stats


def test_confident_learning(ds_and_arrays):
    ds, df, labels, probs, keys = ds_and_arrays
    mask, _ = _engine_mask(ds, "confident_learning")
    np.testing.assert_array_equal(mask, oracle_confident_learning_mask(labels, probs))


def test_predicted_neq_given(ds_and_arrays):
    ds, df, labels, probs, keys = ds_and_arrays
    mask, _ = _engine_mask(ds, "predicted_neq_given")
    expected = probs.argmax(axis=1) != labels
    expected[oracle_reduce_mask(labels, probs)] = False
    np.testing.assert_array_equal(mask, expected)


def test_low_self_confidence(ds_and_arrays):
    ds, df, labels, probs, keys = ds_and_arrays
    mask, stats = _engine_mask(ds, "low_self_confidence")
    tie = np.arange(len(labels))
    expected = oracle_low_self_confidence_mask(labels, probs, tie_break=tie)
    # identical count and >= 99% agreement (boundary ties may differ)
    assert mask.sum() == expected.sum()
    assert (mask == expected).mean() >= 0.999


def test_prune_by_class(ds_and_arrays):
    ds, df, labels, probs, keys = ds_and_arrays
    cj = oracle_confident_joint(labels, probs)
    pcm = keep_at_least_n_per_class(cj.T, n=1)
    expected = oracle_prune_by_class(labels, probs, pcm, keys)
    expected[oracle_reduce_mask(labels, probs)] = False
    mask, _ = _engine_mask(ds, "prune_by_class")
    np.testing.assert_array_equal(mask, expected)


def test_prune_by_noise_rate(ds_and_arrays):
    ds, df, labels, probs, keys = ds_and_arrays
    cj = oracle_confident_joint(labels, probs)
    pcm = keep_at_least_n_per_class(cj.T, n=1)
    expected = oracle_prune_by_count(labels, probs, pcm, keys)
    expected[oracle_reduce_mask(labels, probs)] = False
    mask, _ = _engine_mask(ds, "prune_by_noise_rate")
    np.testing.assert_array_equal(mask, expected)


def test_both(ds_and_arrays):
    ds, df, labels, probs, keys = ds_and_arrays
    cj = oracle_confident_joint(labels, probs)
    pcm = keep_at_least_n_per_class(cj.T, n=1)
    expected = oracle_prune_by_class(labels, probs, pcm, keys) & oracle_prune_by_count(
        labels, probs, pcm, keys
    )
    expected[oracle_reduce_mask(labels, probs)] = False
    mask, _ = _engine_mask(ds, "both")
    np.testing.assert_array_equal(mask, expected)


def test_bottom_t_refinement_is_byte_identical(ray_session, monkeypatch):
    """The recursive boundary-bin histogram (decision.py refine_boundary)
    must select exactly the same bottom-T set as the unrefined pull —
    forced on by dropping REFINE_PULL_THRESHOLD to 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import cleanlab_ray.stages.decision as dec

    rng = np.random.default_rng(17)
    n, t = 5000, 700
    # cluster scores so one coarse bin holds many rows (ties included)
    scores = np.round(rng.beta(2, 5, n), 3)
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([f"c{i:05d}" for i in range(n)], type=pa.string()),
        "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
        "score_self_confidence": pa.array(scores),
    })).materialize()

    def flags(bin_lo, keys):
        kern = dec.make_issue_mask_kernel(bin_lo, keys)
        out = ds.map_batches(kern, batch_format="pyarrow").to_pandas()
        return set(out.loc[out["is_label_issue"], "conv_id"])

    monkeypatch.setattr(dec, "REFINE_PULL_THRESHOLD", 10**12)  # never refine
    lo0, keys0 = dec.resolve_bottom_t(ds, t)
    monkeypatch.setattr(dec, "REFINE_PULL_THRESHOLD", 0)       # always refine
    lo1, keys1 = dec.resolve_bottom_t(ds, t)

    assert len(keys1) <= len(keys0)  # refined pull is never larger
    f0, f1 = flags(lo0, keys0), flags(lo1, keys1)
    assert len(f0) == t and f0 == f1

    # oracle: exact bottom-T by (score, conv_id, turn_idx)
    order = np.lexsort((np.zeros(n), np.array([f"c{i:05d}" for i in range(n)]), scores))
    expect = {f"c{i:05d}" for i in order[:t]}
    assert f0 == expect


def test_bottom_t_rejects_nan_and_out_of_range(ray_session):
    """NaN scores would be histogram-counted (clip sends them to bin 0)
    yet invisible to the mask kernel and the boundary pull — silently
    flagging fewer than T rows. The histogram pass must refuse loudly."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    import cleanlab_ray.stages.decision as dec

    def mk(scores):
        n = len(scores)
        return rd.from_arrow(pa.table({
            "conv_id": pa.array([f"c{i}" for i in range(n)]),
            "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
            "score_self_confidence": pa.array(np.asarray(scores, dtype=np.float64)),
        }))

    with pytest.raises(Exception, match="NaN-free"):
        dec.resolve_bottom_t(mk([0.2, np.nan, 0.9]), 1)
    with pytest.raises(Exception, match="NaN-free"):
        dec.resolve_bottom_t(mk([0.2, -0.5, 0.9]), 1)
    with pytest.raises(Exception, match="NaN-free"):
        dec.resolve_bottom_t(mk([0.2, 1.5, 0.9]), 1)


def test_bottom_t_exact_under_boundary_tie_mass(ray_session):
    """A massive exact-tie mass at the cutoff score (which sub-bin
    refinement cannot split) must still produce exactly T flags with the
    deterministic (score, key) tie-break — via the map-side-pruned
    global_top_k pull, not a whole-bin driver pull."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import cleanlab_ray.stages.decision as dec

    n_low, n_tie, n_high = 100, 20_000, 500
    scores = np.concatenate([
        np.linspace(0.01, 0.09, n_low),       # clearly below
        np.full(n_tie, 0.25),                 # one exact tied value
        np.linspace(0.7, 0.99, n_high),       # clearly above
    ])
    n = len(scores)
    conv = np.array([f"c{i:06d}" for i in range(n)])
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array(conv, type=pa.string()),
        "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
        "score_self_confidence": pa.array(scores),
    })).repartition(16).materialize()

    t = n_low + 1234  # cutoff lands INSIDE the tie mass
    bin_lo, keys = dec.resolve_bottom_t(ds, t)
    kern = dec.make_issue_mask_kernel(bin_lo, keys)
    out = ds.map_batches(kern, batch_format="pyarrow").to_pandas()
    flagged = set(out.loc[out["is_label_issue"], "conv_id"])
    assert len(flagged) == t
    # tie-break: smallest (score, conv_id, turn_idx) — i.e. the FIRST
    # 1234 tied conv_ids in lexicographic order
    order = np.lexsort((np.zeros(n), conv, scores))
    assert flagged == set(conv[order[:t]])
