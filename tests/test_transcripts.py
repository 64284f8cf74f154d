"""Transcript-structure operators (stages/transcripts.py) vs pure-Python
oracles: cross-turn repetition, per-conversation structural audit, role
transitions. Includes multi-block inputs so conversations and (conv, gram)
groups cross input-block boundaries."""

import numpy as np
import pyarrow as pa
import pytest


def _grams(text, n=3):
    w = text.split()
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def _rep_oracle(rows, n=3):
    """rows: (conv, turn, text). Returns {(conv, turn): (n_grams, n_rep)}."""
    seen_min = {}
    for conv, turn, text in rows:
        for g in _grams(text, n):
            k = (conv, g)
            if k not in seen_min or turn < seen_min[k]:
                seen_min[k] = turn
    out = {}
    for conv, turn, text in rows:
        gs = _grams(text, n)
        if not gs:
            continue
        rep = sum(1 for g in gs if seen_min[(conv, g)] < turn)
        out[(conv, turn)] = (len(gs), rep)
    return out


def _ds(rows, blocks=3):
    import ray.data as rd

    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })
    return rd.from_arrow(t).repartition(blocks)


def test_turn_repetition_matches_oracle(ray_session):
    from cleanlab_ray.stages.transcripts import turn_repetition

    rows = [
        ("a", 0, "the cat sat on the mat"),
        ("a", 1, "the cat sat on a hat"),          # shares "the cat sat"
        ("a", 2, "the cat sat on the mat again"),  # mostly repeated
        ("b", 0, "the cat sat on the mat"),        # other conv: fresh
        ("b", 1, "completely new words here now"),
        ("c", 0, "too short"),                     # <3 words: no row
        ("c", 1, "x y z"),
    ]
    got = {(r["conv_id"], r["turn_idx"]): (r["n_grams"], r["n_repeated"])
           for r in turn_repetition(_ds(rows)).take_all()}
    assert got == _rep_oracle(rows)
    # the near-verbatim turn: 4 of its 5 grams repeat turn-0 grams
    res = {(r["conv_id"], r["turn_idx"]): r["rep_frac_e6"]
           for r in turn_repetition(_ds(rows)).take_all()}
    assert res[("a", 2)] == round(4 / 5 * 1e6)
    assert res[("b", 0)] == 0


def test_turn_repetition_dedupes_within_turn(ray_session):
    from cleanlab_ray.stages.transcripts import turn_repetition

    # "a b c" appears twice inside turn 1: counts ONCE, and repeats turn 0
    rows = [("z", 0, "a b c d"), ("z", 1, "a b c a b c")]
    got = {(r["conv_id"], r["turn_idx"]): (r["n_grams"], r["n_repeated"])
           for r in turn_repetition(_ds(rows, blocks=2)).take_all()}
    assert got == _rep_oracle(rows)
    assert got[("z", 1)] == (3, 1)  # unique grams {a b c, b c a, c a b}


def test_turn_repetition_min_turn_not_first_block(ray_session):
    """Turn order is by turn_idx, not row/block order: the LATER block
    holds the earlier turn."""
    from cleanlab_ray.stages.transcripts import turn_repetition

    rows = [("k", 5, "p q r s"), ("k", 1, "p q r s"), ("k", 3, "p q r s")]
    got = {r["turn_idx"]: r["n_repeated"]
           for r in turn_repetition(_ds(rows, blocks=3)).take_all()}
    assert got == {1: 0, 3: 2, 5: 2}


def test_turn_repetition_empty_and_no_grams(ray_session):
    from cleanlab_ray.stages.transcripts import turn_repetition

    assert turn_repetition(_ds([("a", 0, "one two")], blocks=1)).count() == 0
    assert turn_repetition(_ds([], blocks=1)).count() == 0


def _full_ds(rows, blocks=3):
    import ray.data as rd

    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "tool": pa.array([r[4] for r in rows], pa.string()),
        "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
    })
    return rd.from_arrow(t).repartition(blocks)


def test_conv_structure_stats(ray_session):
    from cleanlab_ray.stages.transcripts import conv_structure_stats

    rows = [
        ("a", 0, "user", "hello there", None, 1_000_000),
        ("a", 1, "assistant", "hi", None, 3_000_000),
        ("a", 2, "tool", "result", "search", 10_000_500),
        ("b", 1, "user", "no turn zero", None, 0),        # gap: not contiguous
        ("b", 2, "assistant", "reply", "python", 5_000_000),
        ("c", 0, "user", "solo", None, 7_000_000),
    ]
    got = {r["conv_id"]: r
           for r in conv_structure_stats(_full_ds(rows)).take_all()}
    a = got["a"]
    assert (a["n_turns"], a["n_user"], a["n_assistant"], a["n_tool"]) == (3, 1, 1, 1)
    assert a["n_tool_calls"] == 1
    assert a["chars_user"] == len("hello there")
    assert a["chars_assistant"] == len("hi")
    assert a["span_seconds"] == 9  # floor((10_000_500 - 1_000_000) / 1e6)
    assert a["contiguous"] is True
    b = got["b"]
    assert b["contiguous"] is False and b["n_tool_calls"] == 1
    c = got["c"]
    assert c["contiguous"] is True and c["span_seconds"] == 0


def test_conv_structure_empty(ray_session):
    from cleanlab_ray.stages.transcripts import conv_structure_stats

    assert conv_structure_stats(_full_ds([], blocks=1)).count() == 0


def test_role_transitions(ray_session):
    from cleanlab_ray.stages.transcripts import role_transitions

    rows = [
        ("a", 0, "user", "", None, 0),
        ("a", 1, "assistant", "", None, 0),
        ("a", 2, "user", "", None, 0),
        ("b", 0, "user", "", None, 0),
        ("b", 1, "assistant", "", None, 0),
        ("b", 2, "assistant", "", None, 0),  # consecutive same-role
        ("c", 0, "tool", "", None, 0),       # single turn: no transition
    ]
    got = {(r["from_role"], r["to_role"]): r["n"]
           for r in role_transitions(_full_ds(rows)).take_all()}
    assert got == {("user", "assistant"): 2, ("assistant", "user"): 1,
                   ("assistant", "assistant"): 1}


def test_role_transitions_order_by_turn_not_block(ray_session):
    from cleanlab_ray.stages.transcripts import role_transitions

    # rows shuffled: order must come from turn_idx
    rows = [
        ("a", 2, "user", "", None, 0),
        ("a", 0, "user", "", None, 0),
        ("a", 1, "assistant", "", None, 0),
    ]
    got = {(r["from_role"], r["to_role"]): r["n"]
           for r in role_transitions(_full_ds(rows, blocks=3)).take_all()}
    assert got == {("user", "assistant"): 1, ("assistant", "user"): 1}


def test_transcripts_ops_on_fixture_corpus(ray_session, small_corpus):
    """Zipf conversation lengths, shuffled row order, 6 blocks: totals
    must match a pure-Python pass over the same table."""
    import ray.data as rd

    from cleanlab_ray.stages.transcripts import (
        conv_structure_stats, role_transitions, turn_repetition)

    ds = rd.from_arrow(small_corpus).repartition(6)
    tbl = small_corpus.to_pydict()
    rows = list(zip(tbl["conv_id"], tbl["turn_idx"], tbl["text"]))

    oracle = _rep_oracle(rows)
    got = {(r["conv_id"], r["turn_idx"]): (r["n_grams"], r["n_repeated"])
           for r in turn_repetition(ds).take_all()}
    assert got == oracle

    stats = conv_structure_stats(ds).take_all()
    assert sum(r["n_turns"] for r in stats) == small_corpus.num_rows
    n_convs = len(set(tbl["conv_id"]))
    assert len(stats) == n_convs
    assert all(r["contiguous"] for r in stats)  # fixture has no gaps

    trans = role_transitions(ds).take_all()
    assert sum(r["n"] for r in trans) == small_corpus.num_rows - n_convs
