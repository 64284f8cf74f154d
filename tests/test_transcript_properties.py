"""Property-based tests (hypothesis) for the per-conversation
transcript kernels: the vectorized sorted-run implementations must
match the straight-python oracles for ARBITRARY corpora — random conv
shapes, out-of-order turns, null timestamps/roles/tools, repeated and
colliding short texts — not just the hand and fixture cases."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from tests.test_transcripts import (
    _full_ds,
    _lang_mix_oracle,
    _latency_oracle,
    _loops_oracle,
    _refusal_oracle,
    _sessions_oracle,
)


@st.composite
def corpora(draw):
    n_convs = draw(st.integers(1, 10))
    rows = []
    texts = ["hi", "I cannot do that", "ok then", "longer unique reply",
             "", "As an AI I can't", "tool output 42"]
    roles = ["user", "assistant", "tool", None]
    tools = ["search", "python", None, None]
    for ci in range(n_convs):
        n_turns = draw(st.integers(1, 7))
        turn_ids = draw(st.permutations(list(range(n_turns))))
        for t in turn_ids:
            rows.append((
                f"c{ci}",
                t,
                draw(st.sampled_from(roles)),
                draw(st.sampled_from(texts)),
                draw(st.sampled_from(tools)),
                draw(st.one_of(st.none(),
                               st.integers(0, 20) .map(lambda s: s * 1_000_000))),
            ))
    return rows


@settings(max_examples=12, deadline=None)
@given(corpora())
def test_latency_matches_oracle(ray_session, rows):
    from cleanlab_ray.stages.transcripts import turn_latency

    got = {r["conv_id"]: (r["n_turns"], r["n_gaps"], r["gap_min_us"],
                          r["gap_max_us"], r["gap_sum_us"], r["n_zero_gaps"],
                          r["n_neg_gaps"], r["n_ua_gaps"], r["ua_gap_sum_us"])
           for r in turn_latency(_full_ds(rows, blocks=3)).take_all()}
    assert got == _latency_oracle(
        [(c, t, r, ts) for c, t, r, x, tool, ts in rows])


@settings(max_examples=12, deadline=None)
@given(corpora(), st.integers(0, 10_000_000))
def test_sessions_matches_oracle(ray_session, rows, gap_us):
    from cleanlab_ray.stages.transcripts import latency_sessions

    got = {r["conv_id"]: (r["n_turns"], r["n_sessions"],
                          r["max_session_turns"], r["idle_us"])
           for r in latency_sessions(_full_ds(rows, blocks=3),
                                     gap_us=gap_us).take_all()}
    assert got == _sessions_oracle(
        [(c, t, ts) for c, t, r, x, tool, ts in rows], gap_us=gap_us)


@settings(max_examples=12, deadline=None)
@given(corpora(), st.integers(2, 4))
def test_loops_matches_oracle(ray_session, rows, loop_min):
    from cleanlab_ray.stages.transcripts import tool_loops

    got = {r["conv_id"]: (r["n_tool_calls"], r["n_runs"], r["max_tool_run"],
                          r["n_loops"])
           for r in tool_loops(_full_ds(rows, blocks=3),
                               loop_min=loop_min).take_all()}
    assert got == _loops_oracle(
        [(c, t, tool) for c, t, r, x, tool, ts in rows], loop_min=loop_min)


@settings(max_examples=12, deadline=None)
@given(corpora())
def test_refusals_match_oracle(ray_session, rows):
    from cleanlab_ray.stages.transcripts import refusal_rate

    got = {r["conv_id"]: (r["n_turns"], r["n_assistant"], r["n_refusals"],
                          r["refusal_frac_e6"], r["first_refusal_turn"])
           for r in refusal_rate(_full_ds(rows, blocks=3)).take_all()}
    assert got == _refusal_oracle(
        [(c, t, r, x) for c, t, r, x, tool, ts in rows])


@settings(max_examples=12, deadline=None)
@given(corpora())
def test_lang_mix_matches_oracle(ray_session, rows):
    import ray.data as rd

    from cleanlab_ray.stages.transcripts import conv_lang_mix

    # repurpose the tool column as a lang column (nullable strings)
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "lang": pa.array([r[4] for r in rows], pa.string()),
    })
    got = {r["conv_id"]: (r["n_turns"], r["n_langs"], r["majority_lang"],
                          r["majority_share_e6"], r["n_switches"])
           for r in conv_lang_mix(
               rd.from_arrow(t).repartition(3)).take_all()}
    assert got == _lang_mix_oracle(
        [(c, t_, tool) for c, t_, r, x, tool, ts in rows])


@settings(max_examples=12, deadline=None)
@given(corpora(), st.integers(1, 40))
def test_context_growth_matches_oracle(ray_session, rows, budget):
    from cleanlab_ray.stages.transcripts import context_growth

    got = {r["conv_id"]: (r["total_chars"], r["n_turns"],
                          r["first_overflow_turn"], r["n_overflow_turns"])
           for r in context_growth(_full_ds(rows, blocks=3),
                                   budget_chars=budget).take_all()}
    by = {}
    for c, t, r, x, tool, ts in rows:
        by.setdefault(c, []).append((t, len(x or "")))
    want = {}
    for c, turns in by.items():
        turns.sort()
        cum = 0
        first, n_over, total = -1, 0, 0
        for t, ln in turns:
            cum += ln
            total += ln
            if cum > budget:
                n_over += 1
                if first < 0:
                    first = t
        want[c] = (total, len(turns), first, n_over)
    assert got == want


@settings(max_examples=12, deadline=None)
@given(corpora())
def test_conv_exact_dedup_matches_oracle(ray_session, rows):
    from cleanlab_ray.stages.transcripts import conv_exact_dedup

    got = {r["conv_id"]: (r["canonical_conv_id"], r["is_dup"])
           for r in conv_exact_dedup(_full_ds(rows, blocks=3)).take_all()}
    by = {}
    for c, t, r, x, tool, ts in rows:
        by.setdefault(c, []).append((t, r, tool, x))
    fp = {}
    for c, turns in by.items():
        turns.sort(key=lambda z: z[0])
        fp[c] = tuple(turns)
    canon = {}
    for c, f in fp.items():
        canon.setdefault(f, []).append(c)
    want = {}
    for f, members in canon.items():
        rep = min(members)
        for c in members:
            want[c] = (rep, c != rep)
    assert got == want


@st.composite
def pii_corpora(draw):
    n_convs = draw(st.integers(1, 8))
    texts = ["clean text here", "mail me at bob@x.com", "",
             "ssn 123-45-6789 twice 123-45-6789", "call 555-123-4567",
             "ip 10.0.0.1 then bob@x.com", "you stupid MORON"]
    rows = []
    for ci in range(n_convs):
        for t in range(draw(st.integers(1, 5))):
            rows.append((f"c{ci}", t, "user",
                         draw(st.sampled_from(texts)), None, 0))
    return rows


@settings(max_examples=12, deadline=None)
@given(pii_corpora())
def test_pii_density_matches_oracle(ray_session, rows):
    from cleanlab_ray.stages.scrub import _COMPILED_PY, SCRUB_PATTERNS
    from cleanlab_ray.stages.transcripts import pii_density

    names = [n for n, _, _ in SCRUB_PATTERNS]
    want = {}
    for conv, _, _, text, _, _ in rows:
        e = want.setdefault(conv, {f"n_{n}": 0 for n in names}
                            | {"n_matches": 0, "n_pii_turns": 0,
                               "n_turns": 0})
        e["n_turns"] += 1
        turn_total = 0
        for (cre, _), n in zip(_COMPILED_PY, names):
            c = len(cre.findall(text))
            e[f"n_{n}"] += c
            turn_total += c
        e["n_matches"] += turn_total
        if turn_total:
            e["n_pii_turns"] += 1
    got = {r["conv_id"]: {k: r[k] for k in want[r["conv_id"]]}
           for r in pii_density(_full_ds(rows, blocks=3)).take_all()}
    assert got == want
