"""Property-based tests (hypothesis) for the aggregation math core:
merge associativity and invariants must hold for ARBITRARY valid inputs,
not just the fixture corpus."""

import numpy as np
from hypothesis import given, settings, strategies as st

from cleanlab_ray.fixtures.oracle import (
    oracle_confident_joint,
    oracle_confident_thresholds,
    oracle_num_label_issues,
)
from cleanlab_ray.functions.numerics import round_preserving_row_totals, round_preserving_sum
from cleanlab_ray.state.confident import (
    calibrate_confident_joint,
    cj_partials,
    finalize_confident_joint,
    threshold_partials,
    thresholds_from_partials,
)


@st.composite
def label_prob_arrays(draw):
    k = draw(st.integers(2, 5))
    n = draw(st.integers(1, 200))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, k, size=n)
    probs = rng.dirichlet(np.ones(k), size=n)
    return labels, probs, k


@settings(max_examples=40, deadline=None)
@given(label_prob_arrays(), st.integers(2, 9))
def test_partials_merge_equals_direct(data, n_blocks):
    labels, probs, k = data
    t_direct = thresholds_from_partials(*threshold_partials(labels, probs, k))
    np.testing.assert_allclose(t_direct, oracle_confident_thresholds(labels, probs), atol=1e-9)

    splits = np.array_split(np.arange(len(labels)), n_blocks)
    sums = np.zeros(k)
    counts = np.zeros(k, dtype=np.int64)
    for s in splits:
        ps, pc_ = threshold_partials(labels[s], probs[s], k)
        sums += ps
        counts += pc_
    np.testing.assert_allclose(thresholds_from_partials(sums, counts), t_direct, atol=1e-9)

    cj = np.zeros((k, k), dtype=np.int64)
    issues = 0
    for s in splits:
        c, ni, _ = cj_partials(labels[s], probs[s], t_direct, k)
        cj += c
        issues += ni
    np.testing.assert_array_equal(
        finalize_confident_joint(cj), oracle_confident_joint(labels, probs)
    )
    assert issues == oracle_num_label_issues(labels, probs)


@settings(max_examples=40, deadline=None)
@given(label_prob_arrays())
def test_calibration_invariants(data):
    labels, probs, k = data
    cj = oracle_confident_joint(labels, probs)
    label_counts = np.bincount(labels, minlength=k)
    cal = calibrate_confident_joint(cj, label_counts)
    assert cal.sum() == len(labels)
    np.testing.assert_array_equal(cal.sum(axis=1), label_counts)
    assert (cal >= 0).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(0, 1000, allow_nan=False), min_size=1, max_size=30))
def test_round_preserving_sum_property(vals):
    x = np.array(vals)
    r = round_preserving_sum(x)
    assert r.sum() == np.round(x.sum())
    assert np.abs(r - x).max() <= len(x) + 1  # bounded adjustment


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(2, 5), st.integers(2, 6))
def test_row_totals_preserved(seed, k, scale):
    rng = np.random.default_rng(seed)
    m = rng.random((k, k)) * scale
    r = round_preserving_row_totals(m)
    np.testing.assert_array_equal(r.sum(axis=1), np.round(m.sum(axis=1)))


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.text(alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]), max_size=30),
            st.sampled_from([
                "bob@example.com", "x 123-45-6789 y", "555-123-4567",
                "10.0.0.1", "you idiot", "IDIOT", "a@b.co", "1.2.3.4.5",
                "12-34-5678", "almost@nodot", "trash talk", "hatefulness",
            ]),
        ),
        min_size=0,
        max_size=8,
    )
)
def test_scrub_engines_byte_identical(parts):
    """RE2 (engine) and Python-re (oracle) scrub must agree byte-for-byte
    on arbitrary text with planted and near-miss PII patterns."""
    import pyarrow as pa

    from cleanlab_ray.stages.scrub import scrub_array, scrub_text_py

    texts = [" ".join(parts), "".join(parts)]
    col = pa.array(texts, type=pa.large_string())
    engine = scrub_array(col).to_pylist()
    oracle = [scrub_text_py(t) for t in texts]
    assert engine == oracle


# ---------------------------------------------------------------------------
# topk block kernels (pure Arrow/numpy — the map-side prune these rely on
# must agree with a pandas oracle for arbitrary inputs, or the exchange-free
# top-k paths silently drop rows).

import pandas as pd
import pyarrow as pa

from cleanlab_ray.stages.topk import _rank_in_runs, _topk_block


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 5), max_size=60))
def test_rank_in_runs_matches_groupby_cumcount(codes):
    run = np.asarray(codes, dtype=np.int64)
    got = _rank_in_runs(run)
    # oracle: cumcount within contiguous runs
    exp = []
    for i, c in enumerate(codes):
        exp.append(exp[-1] + 1 if i and codes[i - 1] == c else 0)
    assert got.tolist() == exp


@st.composite
def grouped_score_tables(draw):
    n = draw(st.integers(0, 120))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 6, size=n)
    # few distinct scores -> exercises ties heavily
    score = rng.integers(0, 4, size=n).astype(np.float64)
    key = rng.permutation(n).astype(np.int64)
    return pa.table({"g": g, "score": score, "key": key})


@settings(max_examples=60, deadline=None)
@given(grouped_score_tables(), st.integers(1, 5))
def test_topk_block_matches_pandas_oracle(tbl, k):
    got = _topk_block(tbl, "g", "score", ("key",), k).to_pandas()
    df = tbl.to_pandas()
    exp = (
        df.sort_values(["g", "score", "key"], ascending=[True, False, True])
        .groupby("g")
        .head(k)
    )
    # kernel preserves original row order within the block; compare as sets
    # keyed by the unique key column plus full-row equality
    got_s = got.sort_values("key").reset_index(drop=True)
    exp_s = exp.sort_values("key").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s[got_s.columns])


@settings(max_examples=40, deadline=None)
@given(grouped_score_tables(), st.integers(1, 5), st.integers(1, 4))
def test_topk_block_prune_is_sound_under_split(tbl, k, n_parts):
    """Pruning each split to its local top-k then re-running the kernel on
    the concatenation must equal the kernel over the whole table — the
    soundness property grouped_top_k's map-side prune relies on."""
    n = tbl.num_rows
    bounds = np.linspace(0, n, n_parts + 1).astype(int)
    parts = [
        _topk_block(tbl.slice(a, b - a), "g", "score", ("key",), k)
        for a, b in zip(bounds[:-1], bounds[1:])
    ]
    merged = pa.concat_tables([p for p in parts if p.num_rows], promote_options="default") \
        if any(p.num_rows for p in parts) else tbl.slice(0, 0)
    got = _topk_block(merged.combine_chunks(), "g", "score", ("key",), k).to_pandas()
    exp = _topk_block(tbl, "g", "score", ("key",), k).to_pandas()
    got_s = got.sort_values("key").reset_index(drop=True)
    exp_s = exp.sort_values("key").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s)


_GRAM_WORDS = ["a", "b", "cc", "d", "ee", "f"]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),                                   # conv
            st.integers(0, 7),                                   # turn
            st.lists(st.sampled_from(_GRAM_WORDS), max_size=10), # words
        ),
        max_size=8,
    ),
    st.sampled_from([" ", "  ", " \t"]),
)
def test_turn_gram_postings_matches_python(rows, sep):
    """Posting kernel = per-turn UNIQUE word 3-grams, for arbitrary
    word sequences and messy whitespace."""
    import pyarrow as pa

    from cleanlab_ray.stages.transcripts import turn_gram_postings

    batch = pa.table({
        "conv_id": pa.array([f"c{c}" for c, _, _ in rows], pa.string()),
        "turn_idx": pa.array([t for _, t, _ in rows], pa.int32()),
        "text": pa.array([sep.join(ws) + sep for _, _, ws in rows],
                         pa.string()),
    })
    out = turn_gram_postings(batch)
    got = list(zip(out["conv_id"].to_pylist(), out["turn_idx"].to_pylist(),
                   out["gram"].to_pylist()))
    want = set()
    for c, t, ws in rows:
        for i in range(len(ws) - 2):
            want.add((f"c{c}", t, " ".join(ws[i:i + 3])))
    # exact set AND no duplicate postings for the same (row, gram)
    assert set(got) == want
    per_row = {}
    for c, t, ws in rows:
        key = len(per_row)  # rows are distinct batch rows even if
        per_row[key] = {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
    assert len(got) == sum(len(g) for g in per_row.values())


@st.composite
def _flag_runs(draw):
    """Arbitrary (turn, starts, run_id) posting-run layout: a few runs,
    each holding DISTINCT turn indices in arbitrary in-run order (the
    posting kernel dedupes per turn), runs laid out contiguously."""
    n_runs = draw(st.integers(1, 6))
    turn_parts, run_parts, starts = [], [], []
    pos = 0
    for r in range(n_runs):
        turns = draw(st.lists(st.integers(0, 12), min_size=1, max_size=6,
                              unique=True))
        starts.append(pos)
        pos += len(turns)
        turn_parts.extend(turns)
        run_parts.extend([r] * len(turns))
    return (np.array(turn_parts, dtype=np.int64),
            np.array(starts, dtype=np.int64),
            np.array(run_parts, dtype=np.int64))


@settings(max_examples=80, deadline=None)
@given(_flag_runs())
def test_repetition_flags_match_python_oracle(layout):
    """repetition_flags = "this turn is later than its run's min turn",
    for arbitrary run layouts and in-run orders."""
    from cleanlab_ray.stages.transcripts import repetition_flags

    turn, starts, run_id = layout
    got = repetition_flags(turn, starts, run_id)
    run_min = {}
    for t, r in zip(turn, run_id):
        run_min[r] = min(run_min.get(r, t), t)
    want = np.array([int(t > run_min[r]) for t, r in zip(turn, run_id)])
    np.testing.assert_array_equal(got, want)


@settings(max_examples=80, deadline=None)
@given(_flag_runs())
def test_echo_flags_match_python_oracle(layout):
    """echo_flags = "turn-1 is present in the same run", for arbitrary
    run layouts and in-run orders."""
    from cleanlab_ray.stages.transcripts import echo_flags

    turn, starts, run_id = layout
    got = echo_flags(turn, starts, run_id)
    members = {}
    for t, r in zip(turn, run_id):
        members.setdefault(r, set()).add(t)
    want = np.array([int(t - 1 in members[r]) for t, r in zip(turn, run_id)])
    np.testing.assert_array_equal(got, want)
