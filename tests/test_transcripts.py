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


def _echo_oracle(rows, n=3):
    """rows: (conv, turn, text). {(conv, turn): (n_grams, n_echoed)} —
    echo = gram also present in the turn with index turn-1."""
    per_turn = {}
    for conv, turn, text in rows:
        per_turn.setdefault((conv, turn), set()).update(_grams(text, n))
    out = {}
    for (conv, turn), gs in per_turn.items():
        if not gs:
            continue
        prev = per_turn.get((conv, turn - 1), set())
        out[(conv, turn)] = (len(gs), len(gs & prev))
    return out


def test_turn_echo_matches_oracle(ray_session):
    from cleanlab_ray.stages.transcripts import turn_echo

    rows = [
        ("a", 0, "the cat sat on the mat"),
        ("a", 1, "the cat sat on a hat"),          # echoes "the cat sat"
        ("a", 2, "the cat sat on the mat again"),  # echoes turn 1 only
        ("a", 4, "the cat sat on a hat"),          # turn 3 missing: gap, no echo
        ("b", 0, "the cat sat on the mat"),        # other conv: fresh
        ("b", 1, "completely new words here now"),
        ("c", 0, "too short"),                     # <3 words: no row
    ]
    got = {(r["conv_id"], r["turn_idx"]): (r["n_grams"], r["n_echoed"])
           for r in turn_echo(_ds(rows)).take_all()}
    assert got == _echo_oracle(rows)
    assert got[("a", 4)][1] == 0          # gap: turn 3 absent, no echo
    assert got[("a", 1)][1] >= 1          # adjacent echo detected
    fracs = {(r["conv_id"], r["turn_idx"]): r["echo_frac_e6"]
             for r in turn_echo(_ds(rows)).take_all()}
    ng, ne = got[("a", 1)]
    assert fracs[("a", 1)] == round(ne / ng * 1e6)


def test_turn_echo_vs_repetition_semantics(ray_session):
    """Echo is adjacent-only: a gram repeated from turn 0 at turn 2
    (but absent at turn 1) counts for repetition, not echo."""
    from cleanlab_ray.stages.transcripts import turn_echo, turn_repetition

    rows = [("z", 0, "p q r s"), ("z", 1, "x y z w"), ("z", 2, "p q r s")]
    echo = {r["turn_idx"]: r["n_echoed"]
            for r in turn_echo(_ds(rows, blocks=3)).take_all()}
    rep = {r["turn_idx"]: r["n_repeated"]
           for r in turn_repetition(_ds(rows, blocks=3)).take_all()}
    assert echo == {0: 0, 1: 0, 2: 0}
    assert rep == {0: 0, 1: 0, 2: 2}


def test_turn_echo_fixture_corpus(ray_session, small_corpus):
    import ray.data as rd

    from cleanlab_ray.stages.transcripts import turn_echo

    ds = rd.from_arrow(small_corpus).repartition(6)
    tbl = small_corpus.to_pydict()
    rows = list(zip(tbl["conv_id"], tbl["turn_idx"], tbl["text"]))
    got = {(r["conv_id"], r["turn_idx"]): (r["n_grams"], r["n_echoed"])
           for r in turn_echo(ds).take_all()}
    assert got == _echo_oracle(rows)


def test_conv_exact_dedup(ray_session):
    from cleanlab_ray.stages.transcripts import conv_exact_dedup

    rows = [
        # a and d: identical ordered content -> one group, canon "a"
        ("a", 0, "user", "hello", None, 0),
        ("a", 1, "assistant", "hi there", None, 0),
        ("d", 0, "user", "hello", None, 0),
        ("d", 1, "assistant", "hi there", None, 0),
        # b: same texts as a but swapped turn assignment -> distinct
        ("b", 0, "user", "hi there", None, 0),
        ("b", 1, "assistant", "hello", None, 0),
        # c: differs from a only in tool -> distinct
        ("c", 0, "user", "hello", "search", 0),
        ("c", 1, "assistant", "hi there", None, 0),
        # e: third copy of a, lexicographically before a? no: "a" < "e"
        ("e", 1, "assistant", "hi there", None, 0),   # shuffled row order
        ("e", 0, "user", "hello", None, 0),
    ]
    got = {r["conv_id"]: (r["canonical_conv_id"], r["is_dup"])
           for r in conv_exact_dedup(_full_ds(rows, blocks=4)).take_all()}
    assert got == {
        "a": ("a", False), "d": ("a", True), "e": ("a", True),
        "b": ("b", False), "c": ("c", False),
    }


def test_conv_exact_dedup_null_vs_empty_and_role(ray_session):
    from cleanlab_ray.stages.transcripts import conv_exact_dedup

    rows = [
        ("a", 0, "user", "x", None, 0),
        ("b", 0, "user", "x", "", 0),      # empty tool != null tool
        ("c", 0, "tool", "x", None, 0),    # role differs
        ("d", 0, "user", "x", None, 0),    # true dup of a
    ]
    got = {r["conv_id"]: (r["canonical_conv_id"], r["is_dup"])
           for r in conv_exact_dedup(_full_ds(rows, blocks=2)).take_all()}
    assert got == {"a": ("a", False), "b": ("b", False),
                   "c": ("c", False), "d": ("a", True)}


def test_conv_exact_dedup_prefix_not_dup(ray_session):
    """A conversation that is a strict prefix of another must NOT group
    with it (the turn-count guard)."""
    from cleanlab_ray.stages.transcripts import conv_exact_dedup

    rows = [
        ("a", 0, "user", "one", None, 0),
        ("a", 1, "assistant", "two", None, 0),
        ("p", 0, "user", "one", None, 0),
    ]
    got = {r["conv_id"]: r["is_dup"]
           for r in conv_exact_dedup(_full_ds(rows, blocks=2)).take_all()}
    assert got == {"a": False, "p": False}


def test_conv_exact_dedup_empty(ray_session):
    from cleanlab_ray.stages.transcripts import conv_exact_dedup

    assert conv_exact_dedup(_full_ds([], blocks=1)).count() == 0


def test_conv_exact_dedup_fixture_corpus(ray_session, small_corpus):
    """Oracle: group by the actual ordered (turn, role, tool, text)
    tuple sequence over the fixture corpus."""
    import ray.data as rd

    from cleanlab_ray.stages.transcripts import conv_exact_dedup

    ds = rd.from_arrow(small_corpus).repartition(6)
    tbl = small_corpus.to_pydict()
    content = {}
    for conv, turn, role, tool, text in zip(
            tbl["conv_id"], tbl["turn_idx"], tbl["role"],
            tbl["tool"], tbl["text"]):
        content.setdefault(conv, []).append((turn, role, tool, text))
    fp2canon = {}
    for conv in sorted(content):
        key = tuple(sorted(content[conv]))
        fp2canon.setdefault(key, conv)
    want = {conv: fp2canon[tuple(sorted(content[conv]))] for conv in content}
    got = {r["conv_id"]: r["canonical_conv_id"]
           for r in conv_exact_dedup(ds).take_all()}
    assert got == want


def _drift_oracle(rows, role="assistant"):
    """rows: (conv, turn, role, text). {conv: (n, sx, sy, sxy, sx2, slope_e6)}"""
    import math

    per = {}
    for conv, turn, r, text in rows:
        if role is not None and r != role:
            continue
        x, y = turn, len(text)
        n, sx, sy, sxy, sx2 = per.get(conv, (0, 0, 0, 0, 0))
        per[conv] = (n + 1, sx + x, sy + y, sxy + x * y, sx2 + x * x)
    out = {}
    for conv, (n, sx, sy, sxy, sx2) in per.items():
        den = n * sx2 - sx * sx
        s = 0 if den == 0 else int(math.floor((n * sxy - sx * sy) * 1e6 / den + 0.5))
        out[conv] = (n, sx, sy, sxy, sx2, s)
    return out


def test_conv_length_drift(ray_session):
    from cleanlab_ray.stages.transcripts import conv_length_drift

    rows = [
        ("a", 0, "user", "ignored entirely by the role filter"),
        ("a", 1, "assistant", "dddddddddd"),       # 10 chars at x=1
        ("a", 3, "assistant", "dddd"),             # 4 chars at x=3: slope -3
        ("b", 1, "assistant", "xx"),               # single turn: slope 0
        ("c", 0, "user", "no assistant turn"),     # no row at all
    ]
    ds = _full_ds([(c, t, r, x, None, 0) for c, t, r, x in rows], blocks=3)
    got = {r["conv_id"]: (r["n_turns"], r["sum_x"], r["sum_y"], r["sum_xy"],
                          r["sum_x2"], r["slope_e6"])
           for r in conv_length_drift(ds).take_all()}
    assert got == _drift_oracle(rows)
    assert got["a"][5] == -3_000_000
    assert got["b"][5] == 0
    assert "c" not in got


def test_conv_length_drift_all_roles_fixture(ray_session, small_corpus):
    import ray.data as rd

    from cleanlab_ray.stages.transcripts import conv_length_drift

    ds = rd.from_arrow(small_corpus).repartition(6)
    tbl = small_corpus.to_pydict()
    rows = list(zip(tbl["conv_id"], tbl["turn_idx"], tbl["role"], tbl["text"]))
    got = {r["conv_id"]: (r["n_turns"], r["sum_x"], r["sum_y"], r["sum_xy"],
                          r["sum_x2"], r["slope_e6"])
           for r in conv_length_drift(ds, role=None).take_all()}
    assert got == _drift_oracle(rows, role=None)
    # and the filtered variant over the fixture's real role mix
    got_a = {r["conv_id"]: r["slope_e6"]
             for r in conv_length_drift(ds).take_all()}
    want_a = {c: v[5] for c, v in _drift_oracle(rows).items()}
    assert got_a == want_a


# ---------------------------------------------------------------------------
# pii_density / context_growth / template_spam
# ---------------------------------------------------------------------------

def test_pii_density(ray_session):
    from cleanlab_ray.stages.scrub import _COMPILED_PY, SCRUB_PATTERNS
    from cleanlab_ray.stages.transcripts import pii_density

    rows = [
        ("a", 0, "user", "mail me at bob@x.com or 555-123-4567", None, 0),
        ("a", 1, "assistant", "clean turn", None, 1),
        ("a", 2, "tool", "ip 10.0.0.1 and ip 192.168.0.1", "t", 2),
        ("b", 0, "user", "ssn 123-45-6789 mail a@b.co", None, 3),
        ("c", 0, "user", "", None, 4),
    ]
    names = [n for n, _, _ in SCRUB_PATTERNS]
    want = {}
    for conv, _, _, text, _, _ in rows:
        e = want.setdefault(conv, {f"n_{n}": 0 for n in names})
        e.setdefault("n_matches", 0)
        e.setdefault("n_pii_turns", 0)
        e["n_turns"] = e.get("n_turns", 0) + 1
        turn_total = 0
        for (cre, _), n in zip(_COMPILED_PY, names):
            c = len(cre.findall(text))
            e[f"n_{n}"] += c
            turn_total += c
        e["n_matches"] = e.get("n_matches", 0) + turn_total
        if turn_total:
            e["n_pii_turns"] += 1
    got = {r["conv_id"]: {k: r[k] for k in want[r["conv_id"]]}
           for r in pii_density(_full_ds(rows)).take_all()}
    assert got == want
    assert pii_density(_full_ds([], blocks=1)).count() == 0


def test_context_growth(ray_session):
    from cleanlab_ray.stages.transcripts import context_growth

    rows = [  # deliberately out of turn order within blocks
        ("a", 2, "tool", "z" * 500, "t", 2),
        ("a", 0, "user", "x" * 600, None, 0),
        ("a", 1, "assistant", "y" * 1000, None, 1),   # cum 1600 > 1500 at t=1
        ("b", 0, "user", "small", None, 3),           # never overflows
        ("c", 5, "user", "q" * 2000, None, 4),        # overflows at its only turn
    ]
    got = {r["conv_id"]: (r["total_chars"], r["n_turns"],
                          r["first_overflow_turn"], r["n_overflow_turns"])
           for r in context_growth(_full_ds(rows)).take_all()}
    assert got == {
        "a": (2100, 3, 1, 2),
        "b": (5, 1, -1, 0),
        "c": (2000, 1, 5, 1),
    }
    # custom budget: with budget 600 conv a overflows starting at turn 1? no:
    # cum(0)=600 == budget (not >), cum(1)=1600 > 600, cum(2)=2100 > 600
    got2 = {r["conv_id"]: (r["first_overflow_turn"], r["n_overflow_turns"])
            for r in context_growth(_full_ds(rows), budget_chars=600).take_all()}
    assert got2["a"] == (1, 2)
    assert context_growth(_full_ds([], blocks=1)).count() == 0


def _template_oracle(texts_convs, min_count, k, prefix_words=None):
    import collections
    import re

    cnt = collections.Counter()
    convs = collections.defaultdict(set)
    for text, conv in texts_convs:
        t = re.sub(r"\s+", " ", re.sub(r"[0-9]+", "0", text.lower())).strip(" ")
        if prefix_words is not None:
            m = re.match(r"^(\S+(?: \S+){0,%d})" % (prefix_words - 1), t)
            t = m.group(1) if m else ""
        cnt[t] += 1
        convs[t].add(conv)
    rows = [(t, n, len(convs[t])) for t, n in cnt.items() if n >= min_count]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def test_template_spam(ray_session):
    from cleanlab_ray.stages.transcripts import template_spam

    rows = []
    for i in range(7):  # "thanks order 123!" style: digits vary, skeleton same
        rows.append((f"c{i % 3}", i, "assistant", f"Thanks  for order {i}!", None, i))
    rows += [
        ("c0", 10, "user", "unique turn one", None, 10),
        ("c1", 11, "user", "unique turn two", None, 11),
        ("c2", 12, "user", "also a  RARE turn", None, 12),
        ("c0", 13, "user", "also a rare turn", None, 13),  # ws-normalized dup
    ]
    texts_convs = [(r[3], r[0]) for r in rows]
    want = _template_oracle(texts_convs, min_count=2, k=10)
    got = [(r["template"], r["n"], r["n_convs"])
           for r in template_spam(_full_ds(rows), min_count=2, k=10).take_all()]
    assert got == want
    assert got[0] == ("thanks for order 0!", 7, 3)
    assert ("also a rare turn", 2, 2) in got

    # prefix variant groups by the first 2 normalized tokens
    want_p = _template_oracle(texts_convs, min_count=2, k=10, prefix_words=2)
    got_p = [(r["template"], r["n"], r["n_convs"])
             for r in template_spam(_full_ds(rows), min_count=2, k=10,
                                    prefix_words=2).take_all()]
    assert got_p == want_p
    assert ("thanks for", 7, 3) in got_p

    # empty result keeps its typed schema (min_count unreachable)
    empty = template_spam(_full_ds(rows), min_count=100)
    assert empty.count() == 0
    assert set(empty.schema().names) == {"template", "n", "n_convs"}
    assert template_spam(_full_ds([], blocks=1)).count() == 0


def test_template_spam_fixture_corpus(ray_session, small_corpus):
    import ray.data as rd

    from cleanlab_ray.stages.transcripts import template_spam

    ds = rd.from_arrow(small_corpus).repartition(6)
    tbl = small_corpus.to_pydict()
    texts_convs = list(zip(tbl["text"], tbl["conv_id"]))
    want = _template_oracle(texts_convs, min_count=2, k=50, prefix_words=2)
    got = [(r["template"], r["n"], r["n_convs"])
           for r in template_spam(ds, min_count=2, k=50,
                                  prefix_words=2).take_all()]
    assert got == want


# ---------------------------------------------------------------------------
# turn_latency / tool_loops
# ---------------------------------------------------------------------------

def _latency_oracle(rows):
    """rows: (conv, turn, role, ts_us). Per conv LAG-gap stats."""
    per = {}
    by = {}
    for conv, turn, role, ts in rows:
        if ts is None:
            continue
        by.setdefault(conv, []).append((turn, role, ts))
    for conv, turns in by.items():
        turns.sort()
        gaps = [(turns[i + 1][2] - turns[i][2],
                 turns[i][1], turns[i + 1][1]) for i in range(len(turns) - 1)]
        ua = [g for g, pr, cr in gaps if pr == "user" and cr == "assistant"]
        gv = [g for g, _, _ in gaps]
        per[conv] = (
            len(turns), len(gv),
            min(gv) if gv else 0, max(gv) if gv else 0, sum(gv),
            sum(1 for g in gv if g == 0), sum(1 for g in gv if g < 0),
            len(ua), sum(ua),
        )
    return per


def test_turn_latency(ray_session):
    from cleanlab_ray.stages.transcripts import turn_latency

    rows = [  # (conv, turn, role, ts_us) — out of order across blocks
        ("a", 2, "tool", 5_000_000),
        ("a", 0, "user", 1_000_000),
        ("a", 1, "assistant", 4_000_000),   # ua gap 3s
        ("a", 3, "assistant", 5_000_000),   # zero gap
        ("b", 0, "user", 9_000_000),
        ("b", 1, "assistant", 7_000_000),   # NEGATIVE ua gap (clock anomaly)
        ("c", 5, "user", 1_000_000),        # single turn: all sentinels 0
    ]
    ds = _full_ds([(c, t, r, "x", None, ts) for c, t, r, ts in rows])
    got = {r["conv_id"]: (r["n_turns"], r["n_gaps"], r["gap_min_us"],
                          r["gap_max_us"], r["gap_sum_us"], r["n_zero_gaps"],
                          r["n_neg_gaps"], r["n_ua_gaps"], r["ua_gap_sum_us"])
           for r in turn_latency(ds).take_all()}
    assert got == _latency_oracle(rows)
    assert got["a"] == (4, 3, 0, 3_000_000, 4_000_000, 1, 0, 1, 3_000_000)
    assert got["b"] == (2, 1, -2_000_000, -2_000_000, -2_000_000, 0, 1,
                        1, -2_000_000)
    assert got["c"] == (1, 0, 0, 0, 0, 0, 0, 0, 0)
    assert turn_latency(_full_ds([], blocks=1)).count() == 0


def test_turn_latency_fixture(ray_session, small_corpus):
    import ray.data as rd

    from cleanlab_ray.stages.transcripts import turn_latency

    ds = rd.from_arrow(small_corpus).repartition(6)
    tbl = small_corpus.to_pydict()
    rows = [(c, t, r, ts.timestamp() * 1e6 if hasattr(ts, "timestamp") else ts)
            for c, t, r, ts in zip(tbl["conv_id"], tbl["turn_idx"],
                                   tbl["role"], tbl["ts"])]
    rows = [(c, t, r, int(round(ts)) if ts is not None else None)
            for c, t, r, ts in rows]
    got = {r["conv_id"]: (r["n_turns"], r["n_gaps"], r["gap_min_us"],
                          r["gap_max_us"], r["gap_sum_us"], r["n_zero_gaps"],
                          r["n_neg_gaps"], r["n_ua_gaps"], r["ua_gap_sum_us"])
           for r in turn_latency(ds).take_all()}
    assert got == _latency_oracle(rows)


def _loops_oracle(rows, loop_min=3):
    """rows: (conv, turn, tool). Per conv same-tool run stats."""
    by = {}
    for conv, turn, tool in rows:
        by.setdefault(conv, []).append((turn, tool))
    out = {}
    for conv, turns in by.items():
        turns.sort()
        runs = []
        prev = None
        for _, tool in turns:
            if tool is not None and tool == prev:
                runs[-1] += 1
            elif tool is not None:
                runs.append(1)
            prev = tool
        if runs:
            out[conv] = (sum(runs), len(runs), max(runs),
                         sum(1 for r in runs if r >= loop_min))
    return out


def test_tool_loops(ray_session):
    from cleanlab_ray.stages.transcripts import tool_loops

    rows = [  # (conv, turn, tool)
        ("a", 0, "search"), ("a", 1, "search"), ("a", 2, "search"),  # loop of 3
        ("a", 3, None), ("a", 4, "search"),       # null breaks: new run of 1
        ("b", 0, "search"), ("b", 1, "python"), ("b", 2, "python"),
        ("c", 0, None), ("c", 1, None),           # no tool calls: no row
        ("d", 7, "x"), ("d", 9, "x"),             # turn-idx gap, adjacent order
    ]
    ds = _full_ds([(c, t, "user", "w", tool, 0) for c, t, tool in rows])
    got = {r["conv_id"]: (r["n_tool_calls"], r["n_runs"], r["max_tool_run"],
                          r["n_loops"]) for r in tool_loops(ds).take_all()}
    assert got == _loops_oracle(rows)
    assert got["a"] == (4, 2, 3, 1)
    assert got["b"] == (3, 2, 2, 0)
    assert "c" not in got
    assert got["d"] == (2, 1, 2, 0)
    # loop_min=2 counts both of a's... no: a has runs [3, 1] -> one loop;
    # b's python run of 2 now counts
    got2 = {r["conv_id"]: r["n_loops"]
            for r in tool_loops(ds, loop_min=2).take_all()}
    assert got2 == {c: v[3] for c, v in _loops_oracle(rows, 2).items()}
    assert tool_loops(_full_ds([], blocks=1)).count() == 0


def test_tool_loops_fixture(ray_session, small_corpus):
    import ray.data as rd

    from cleanlab_ray.stages.transcripts import tool_loops

    ds = rd.from_arrow(small_corpus).repartition(6)
    tbl = small_corpus.to_pydict()
    rows = list(zip(tbl["conv_id"], tbl["turn_idx"], tbl["tool"]))
    got = {r["conv_id"]: (r["n_tool_calls"], r["n_runs"], r["max_tool_run"],
                          r["n_loops"]) for r in tool_loops(ds).take_all()}
    assert got == _loops_oracle(rows)


def _refusal_oracle(rows, pattern=None):
    """rows: (conv, turn, role, text). Per-conv refusal stats."""
    import re

    from cleanlab_ray.stages.transcripts import REFUSAL_PATTERN

    pat = re.compile((pattern or REFUSAL_PATTERN).replace("(?i)", ""),
                     re.IGNORECASE)
    out = {}
    for conv, turn, role, text in rows:
        n, na, nr, first = out.get(conv, (0, 0, 0, -1))
        n += 1
        if role == "assistant":
            na += 1
            if pat.search(text or ""):
                nr += 1
                first = turn if first < 0 else min(first, turn)
        out[conv] = (n, na, nr, first)
    return {c: (n, na, nr,
                int(np.floor(nr * 1e6 / na + 0.5)) if na else 0, first)
            for c, (n, na, nr, first) in out.items()}


def test_refusal_rate(ray_session):
    from cleanlab_ray.stages.transcripts import refusal_rate

    rows = [
        ("a", 0, "user", "I cannot do this myself"),        # user: no count
        ("a", 1, "assistant", "I'M SORRY, BUT no."),        # case-insensitive
        ("a", 2, "assistant", "sure, here you go"),
        ("a", 3, "assistant", "As an AI I can't."),         # second refusal
        ("b", 0, "user", "hi"),
        ("b", 1, "assistant", "hello!"),                    # clean conv
        ("c", 0, "user", "only users here"),                # no assistant
    ]
    ds = _full_ds([(c, t, r, x, None, 0) for c, t, r, x in rows])
    got = {r["conv_id"]: (r["n_turns"], r["n_assistant"], r["n_refusals"],
                          r["refusal_frac_e6"], r["first_refusal_turn"])
           for r in refusal_rate(ds).take_all()}
    assert got == _refusal_oracle(rows)
    assert got["a"] == (4, 3, 2, 666667, 1)
    assert got["c"] == (1, 0, 0, 0, -1)
    assert refusal_rate(_full_ds([], blocks=1)).count() == 0


def _sessions_oracle(rows, gap_us=5_000_000):
    """rows: (conv, turn, ts_us|None). Per-conv session stats."""
    by = {}
    for conv, turn, ts in rows:
        if ts is not None:
            by.setdefault(conv, []).append((turn, ts))
    out = {}
    for conv, turns in by.items():
        turns.sort()
        lens, idle = [1], 0
        for (_, a), (_, b) in zip(turns, turns[1:]):
            if b - a > gap_us:
                lens.append(1)
                idle += b - a
            else:
                lens[-1] += 1
        out[conv] = (len(turns), len(lens), max(lens), idle)
    return out


def test_latency_sessions(ray_session):
    from cleanlab_ray.stages.transcripts import latency_sessions

    rows = [  # (conv, turn, ts_us)
        ("a", 0, 0),
        ("a", 1, 5_000_000),     # gap exactly 5s: NOT a split (strict >)
        ("a", 2, 10_000_001),    # 5.000001s: split
        ("a", 3, 11_000_000),
        ("a", 4, 30_000_000),    # 19s: split
        ("b", 0, 100),
        ("b", 1, 50),            # negative gap: never splits
        ("c", 7, 0),             # single turn
        ("d", 0, None),          # null ts dropped -> conv d has no rows
    ]
    ds = _full_ds([(c, t, "user", "x", None, ts) for c, t, ts in rows])
    got = {r["conv_id"]: (r["n_turns"], r["n_sessions"],
                          r["max_session_turns"], r["idle_us"])
           for r in latency_sessions(ds).take_all()}
    assert got == _sessions_oracle(rows)
    assert got["a"] == (5, 3, 2, 24_000_001)
    assert got["b"] == (2, 1, 2, 0)
    assert got["c"] == (1, 1, 1, 0)
    assert "d" not in got
    assert latency_sessions(_full_ds([], blocks=1)).count() == 0


def _conv_minhash_oracle(conv_texts):
    """conv_texts: {conv: [turn texts]}. Candidate pairs via the same
    documented transforms, computed independently with python ints."""
    from cleanlab_ray.stages.transcripts import (
        CONV_BAND_ROWS,
        CONV_MINHASH_TRANSFORMS,
    )

    M64, M63 = 2**64, 2**63 - 1

    def fp(s):
        h = 0
        for byte in s.encode("utf-8"):
            h = (h * 1099511628211 + byte) % M64
        return h

    sigs = {}
    for conv, texts in conv_texts.items():
        hs = [fp(t) for t in texts]
        sigs[conv] = [min(((h * a + b) % M64) & M63 for h in hs)
                      for a, b in CONV_MINHASH_TRANSFORMS]
    n_bands = len(CONV_MINHASH_TRANSFORMS) // CONV_BAND_ROWS
    # signature-identical convs collapse to their min-conv rep; members
    # pair with the rep at the full band count, and only reps band
    groups = {}
    for conv, sig in sigs.items():
        groups.setdefault(tuple(sig), []).append(conv)
    pairs = {}
    reps = []
    for sig, members in groups.items():
        members.sort()
        rep = members[0]
        reps.append(rep)
        for m in members[1:]:
            pairs[(rep, m)] = n_bands
    reps.sort()
    for i, ca in enumerate(reps):
        for cb in reps[i + 1:]:
            n = 0
            for bnd in range(n_bands):
                ka = ((sigs[ca][2 * bnd] * 0x9E3779B1) & M63) ^ sigs[ca][2 * bnd + 1]
                kb = ((sigs[cb][2 * bnd] * 0x9E3779B1) & M63) ^ sigs[cb][2 * bnd + 1]
                if ka == kb:
                    n += 1
            if n:
                pairs[(ca, cb)] = pairs.get((ca, cb), 0) + n
    return pairs


def test_conv_near_dup(ray_session):
    from cleanlab_ray.stages.transcripts import conv_near_dup

    conv_texts = {
        "a": ["alpha one", "beta two", "gamma three", "delta four"],
        "b": ["alpha one", "beta two", "gamma three", "delta four"],  # exact dup of a
        "c": ["alpha one", "beta two", "gamma three", "EDITED turn"],  # near-dup
        "d": ["totally", "different", "conversation", "entirely"],
    }
    rows = [(c, i, t) for c, ts in conv_texts.items()
            for i, t in enumerate(ts)]
    got = {(r["conv_a"], r["conv_b"]): r["n_shared_bands"]
           for r in conv_near_dup(_ds(rows, blocks=4)).take_all()}
    oracle = _conv_minhash_oracle(conv_texts)
    assert got == oracle
    assert got[("a", "b")] == 4          # identical convs share ALL bands
    assert ("a", "d") not in got         # disjoint convs never collide
    assert conv_near_dup(_ds([], blocks=1)).count() == 0


def test_conv_near_dup_bucket_cap(ray_session):
    import pytest

    from cleanlab_ray.stages.transcripts import conv_near_dup

    # IDENTICAL conversations no longer trip the cap: they collapse to
    # one representative and emit a SPANNING star of (rep, member)
    # pairs at the full band count
    rows = [(f"c{i:02d}", t, f"same text {t}")
            for i in range(12) for t in range(3)]
    got = {(r["conv_a"], r["conv_b"]): r["n_shared_bands"]
           for r in conv_near_dup(_ds(rows, blocks=4),
                                  bucket_cap=4).take_all()}
    assert got == {("c00", f"c{i:02d}"): 4 for i in range(1, 12)}

    # DISTINCT-signature near-dups sharing a band still trip it: 12
    # convs with 6 common turns + 1 unique turn each produce >4
    # distinct signatures colliding on the common-turn bands
    common = [f"common turn {j} with several words" for j in range(6)]
    rows2 = [(f"d{i}", t, txt)
             for i in range(12)
             for t, txt in enumerate(common + [f"unique closing remark {i}"])]
    with pytest.raises(Exception) as ei:  # ray wraps the ValueError
        conv_near_dup(_ds(rows2, blocks=4), bucket_cap=4).count()
    assert "bucket_cap" in str(ei.value)


def test_conv_near_dup_fixture(ray_session, small_corpus):
    """MinHash pairs over the fixture corpus texts match the python
    oracle (real duplicate conversations exist in the fixture)."""
    import ray.data as rd

    from cleanlab_ray.stages.transcripts import conv_near_dup

    tbl = small_corpus.to_pydict()
    conv_texts = {}
    for c, x in zip(tbl["conv_id"], tbl["text"]):
        conv_texts.setdefault(c, []).append(x or "")
    ds = rd.from_arrow(small_corpus).repartition(6)
    got = {(r["conv_a"], r["conv_b"]): r["n_shared_bands"]
           for r in conv_near_dup(ds).take_all()}
    assert got == _conv_minhash_oracle(conv_texts)


def _lang_mix_oracle(rows):
    """rows: (conv, turn, lang|None). Per-conv language-mix stats."""
    by = {}
    for conv, turn, lang in rows:
        if lang is not None:
            by.setdefault(conv, []).append((turn, lang))
    out = {}
    for conv, turns in by.items():
        turns.sort()
        langs = [l for _, l in turns]
        from collections import Counter
        c = Counter(langs)
        maj = min(c, key=lambda k: (-c[k], k))
        sw = sum(1 for a, b in zip(langs, langs[1:]) if a != b)
        out[conv] = (len(langs), len(c), maj,
                     int(np.floor(c[maj] * 1e6 / len(langs) + 0.5)), sw)
    return out


def test_conv_lang_mix(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.transcripts import conv_lang_mix

    rows = [  # (conv, turn, lang)
        ("a", 0, "en"), ("a", 1, "fr"), ("a", 2, "en"), ("a", 3, "en"),
        ("b", 0, "de"), ("b", 1, "de"),                 # monolingual
        ("c", 0, "en"), ("c", 1, "fr"),                 # tie -> "en" (lex)
        ("d", 0, None), ("d", 1, "zh"),                 # null dropped
        ("e", 0, None),                                 # all-null: no row
    ]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    })
    ds = rd.from_arrow(t).repartition(4)
    got = {r["conv_id"]: (r["n_turns"], r["n_langs"], r["majority_lang"],
                          r["majority_share_e6"], r["n_switches"])
           for r in conv_lang_mix(ds).take_all()}
    assert got == _lang_mix_oracle(rows)
    assert got["a"] == (4, 2, "en", 750000, 2)
    assert got["c"] == (2, 2, "en", 500000, 1)
    assert got["d"] == (1, 1, "zh", 1000000, 0)
    assert "e" not in got
    empty = rd.from_arrow(t.slice(0, 0)).repartition(1)
    assert conv_lang_mix(empty).count() == 0


def test_conv_audit_full_parity(ray_session, small_corpus):
    """The fused single-exchange audit equals the composition of the
    seven individual operators, column for column, on the fixture
    corpus (real roles/tools/timestamps/texts)."""
    import ray.data as rd

    from cleanlab_ray.stages.transcripts import (
        context_growth,
        conv_audit_full,
        conv_structure_stats,
        latency_sessions,
        pii_density,
        refusal_rate,
        tool_loops,
        turn_latency,
    )

    ds = rd.from_arrow(small_corpus).repartition(6)
    fused = {r["conv_id"]: r for r in conv_audit_full(ds).take_all()}

    struct = {r["conv_id"]: r for r in conv_structure_stats(ds).take_all()}
    assert set(fused) == set(struct)
    for c, s in struct.items():
        f = fused[c]
        for k in ("n_turns", "n_user", "n_assistant", "n_tool",
                  "n_tool_calls", "chars_user", "chars_assistant",
                  "span_seconds", "contiguous"):
            assert f[k] == s[k], (c, k)

    lat = {r["conv_id"]: r for r in turn_latency(ds).take_all()}
    for c, s in lat.items():
        f = fused[c]
        assert f["n_ts_turns"] == s["n_turns"], c
        for k in ("n_gaps", "gap_min_us", "gap_max_us", "gap_sum_us",
                  "n_zero_gaps", "n_neg_gaps", "n_ua_gaps",
                  "ua_gap_sum_us"):
            assert f[k] == s[k], (c, k)

    sess = {r["conv_id"]: r for r in latency_sessions(ds).take_all()}
    for c, s in sess.items():
        f = fused[c]
        for k in ("n_sessions", "max_session_turns", "idle_us"):
            assert f[k] == s[k], (c, k)

    loops = {r["conv_id"]: r for r in tool_loops(ds).take_all()}
    for c in fused:
        f = fused[c]
        if c in loops:
            s = loops[c]
            assert (f["n_tool_runs"], f["max_tool_run"], f["n_loops"]) == (
                s["n_runs"], s["max_tool_run"], s["n_loops"]), c
        else:  # no tool calls: zeroed in the fused output
            assert (f["n_tool_runs"], f["max_tool_run"], f["n_loops"]) == (
                0, 0, 0), c

    ref = {r["conv_id"]: r for r in refusal_rate(ds).take_all()}
    for c, s in ref.items():
        f = fused[c]
        for k in ("n_refusals", "refusal_frac_e6", "first_refusal_turn"):
            assert f[k] == s[k], (c, k)

    pii = {r["conv_id"]: r for r in pii_density(ds).take_all()}
    pii_keys = [k for k in next(iter(pii.values())) if k.startswith("n_")]
    for c, s in pii.items():
        f = fused[c]
        for k in pii_keys:
            if k in ("n_turns",):
                continue
            assert f[k] == s[k], (c, k)

    ctx = {r["conv_id"]: r for r in context_growth(ds).take_all()}
    for c, s in ctx.items():
        f = fused[c]
        for k in ("total_chars", "first_overflow_turn", "n_overflow_turns"):
            assert f[k] == s[k], (c, k)


def test_conv_audit_full_hostile(ray_session):
    """Fused audit on a hand corpus exercising the documented
    normalizations: null ts (latency family zeroed, span over valid
    turns), no tool calls (loop family zeroed), refusals, PII, and
    a context overflow."""
    from cleanlab_ray.stages.transcripts import conv_audit_full

    rows = [
        # conv a: 3 turns, one null ts, a refusal, an email, tool loop of 2
        ("a", 0, "user", "hi reach me at u@example.com", "search", 0),
        ("a", 1, "assistant", "I cannot help with that", "search", 7_000_000),
        ("a", 2, "assistant", "x" * 2000, None, None),
        # conv b: single turn, no ts, no tool
        ("b", 0, "user", "hello", None, None),
    ]
    ds = _full_ds(rows, blocks=2)
    got = {r["conv_id"]: r for r in conv_audit_full(ds).take_all()}
    a, b = got["a"], got["b"]
    assert a["n_turns"] == 3 and a["n_ts_turns"] == 2
    assert a["span_seconds"] == 7          # over the two valid-ts turns
    assert a["n_gaps"] == 1 and a["gap_sum_us"] == 7_000_000
    assert a["n_sessions"] == 2            # 7s > 5s default gap
    assert a["idle_us"] == 7_000_000
    assert a["n_tool_runs"] == 1 and a["max_tool_run"] == 2
    assert a["n_loops"] == 0               # run of 2 < loop_min 3
    assert a["n_refusals"] == 1 and a["first_refusal_turn"] == 1
    assert a["n_email"] == 1 and a["n_pii_turns"] == 1
    assert a["n_overflow_turns"] == 1 and a["first_overflow_turn"] == 2
    assert b["n_ts_turns"] == 0 and b["n_sessions"] == 0
    assert b["span_seconds"] == 0 and b["n_tool_runs"] == 0
    assert conv_audit_full(_full_ds([], blocks=1)).count() == 0


def test_conv_dedup_safe_split(ray_session, small_corpus):
    """Split parity with a python union-find over the engine's own
    candidate pairs: same groups, same min-hash roots, same sides; and
    the leakage guarantee — no near-dup pair straddles the split."""
    import ray.data as rd

    from cleanlab_ray.stages.dedup import (
        LEAK_SPLIT_SALT,
        polynomial_string_hashes,
    )
    from cleanlab_ray.stages.transcripts import (
        conv_dedup_safe_split,
        conv_near_dup,
    )

    ds = rd.from_arrow(small_corpus).repartition(6)
    got = {r["conv_id"]: (r["group_root"], r["split"])
           for r in conv_dedup_safe_split(ds).take_all()}

    pairs = [(r["conv_a"], r["conv_b"])
             for r in conv_near_dup(ds).take_all()]
    convs = sorted(set(small_corpus["conv_id"].to_pylist()))
    assert set(got) == set(convs)

    # union-find oracle
    parent = {c: c for c in convs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = {}
    for c in convs:
        groups.setdefault(find(c), []).append(c)
    h = polynomial_string_hashes(pa.array(convs, type=pa.string()))
    h = (h & np.uint64(2**63 - 1)).astype(np.int64)
    hmap = dict(zip(convs, h))
    for members in groups.values():
        root = min(hmap[c] for c in members)
        u = int(((np.uint64(root) ^ LEAK_SPLIT_SALT)
                 * np.uint64(2654435761)) % np.uint64(1 << 32)
                % np.uint64(1_000_000))
        side = "train" if u < 900_000 else "holdout"
        for c in members:
            assert got[c] == (root, side), c
    # leakage guarantee: no candidate pair straddles
    for a, b in pairs:
        assert got[a][1] == got[b][1]
    # both sides populated at default frac on 200 convs
    sides = {s for _, s in got.values()}
    assert sides == {"train", "holdout"}
    # train_frac extremes
    all_train = {r["split"] for r in
                 conv_dedup_safe_split(ds, train_frac=1.0).take_all()}
    assert all_train == {"train"}
    import pytest
    with pytest.raises(ValueError):
        conv_dedup_safe_split(ds, train_frac=1.5)
    # an empty-string conv_id is a legal (non-null) key and must be
    # assigned a side (regression: a "" sentinel once dropped it)
    t2 = pa.table({
        "conv_id": pa.array(["", "z"], pa.string()),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "text": pa.array(["empty-key conv", "other"], pa.string()),
    })
    got2 = {r["conv_id"] for r in conv_dedup_safe_split(
        rd.from_arrow(t2)).take_all()}
    assert got2 == {"", "z"}


def test_null_conv_keys_raise_loudly(ray_session):
    """Contract: every conv-keyed transcript operator refuses null
    conversation ids with a loud ValueError (a null key is not a
    conversation; grouping the null rows would fuse unrelated turns,
    and Ray's sort cannot order None vs str anyway)."""
    import ray.data as rd

    from cleanlab_ray.stages import transcripts as tr

    t = pa.table({
        "conv_id": pa.array(["a", None, "b"], pa.string()),
        "turn_idx": pa.array([0, 0, 0], pa.int32()),
        "role": pa.array(["user", "user", "user"]),
        "text": pa.array(["x y z", "p q r", "m n o"]),
        "tool": pa.array([None, None, None], pa.string()),
        "ts": pa.array([0, 0, 0], pa.timestamp("us")),
        "lang": pa.array(["en", "en", "fr"]),
    })
    ds = rd.from_arrow(t).repartition(2)
    ops = [
        tr.turn_latency, tr.tool_loops, tr.latency_sessions,
        tr.refusal_rate, tr.conv_audit_full, tr.conv_near_dup,
        tr.conv_dedup_safe_split, tr.turn_repetition, tr.turn_echo,
        tr.conv_exact_dedup, tr.conv_structure_stats,
        tr.conv_length_drift, tr.pii_density, tr.context_growth,
        tr.template_spam, tr.conv_lang_mix,
    ]
    import pytest
    for op in ops:
        with pytest.raises(Exception, match="null .?conv"):
            op(ds).count()


def test_conv_near_dup_stop_turns(ray_session):
    """Boilerplate turns above stop_turn_df carry no signal: unrelated
    conversations sharing only a ubiquitous greeting produce NO pairs,
    while true near-dups (sharing distinctive turns) still pair."""
    from cleanlab_ray.stages.transcripts import conv_near_dup

    rows = []
    # 6 unrelated convs all opening with the same boilerplate greeting
    for i in range(6):
        rows.append((f"u{i}", 0, "hello how can i help"))
        rows.append((f"u{i}", 1, f"distinct topic {i} with words {i * 7}"))
        rows.append((f"u{i}", 2, f"another unique line {i * 13}"))
    # one true near-dup pair sharing distinctive turns
    rows += [("x0", 0, "hello how can i help"),
             ("x0", 1, "rare shared payload alpha beta"),
             ("x0", 2, "rare shared payload gamma delta"),
             ("x1", 0, "hello how can i help"),
             ("x1", 1, "rare shared payload alpha beta"),
             ("x1", 2, "rare shared payload gamma delta")]
    got = {(r["conv_a"], r["conv_b"]): r["n_shared_bands"]
           for r in conv_near_dup(_ds(rows, blocks=3),
                                  stop_turn_df=3).take_all()}
    # the greeting (8 occurrences > 3) is stopped; u* convs share
    # nothing else -> no u-u pairs; x0/x1 share ALL remaining turns
    # (identical signatures -> collapsed spanning pair at full bands)
    assert got == {("x0", "x1"): 4}
    # with the filter disabled, the greeting dominates mins and drags
    # unrelated convs into buckets
    got_raw = {(r["conv_a"], r["conv_b"]): r["n_shared_bands"]
               for r in conv_near_dup(_ds(rows, blocks=3),
                                      stop_turn_df=None).take_all()}
    assert any(a.startswith("u") and b.startswith("u")
               for a, b in got_raw)


def test_boilerplate_turns(ray_session):
    from cleanlab_ray.stages.transcripts import boilerplate_turns

    rows = ([("c%d" % i, 0, "hello how can i help") for i in range(5)]
            + [("c%d" % i, 1, f"unique content {i}") for i in range(5)]
            + [("c0", 2, "hello how can i help")])  # 6th occurrence
    got = {(r["conv_id"], r["turn_idx"]): (r["is_boilerplate"],
                                           r["boilerplate_df"])
           for r in boilerplate_turns(_ds(rows, blocks=3),
                                      stop_turn_df=5).take_all()}
    assert len(got) == 11
    for i in range(5):
        assert got[(f"c{i}", 0)] == (True, 6)      # greeting: df 6 > 5
        assert got[(f"c{i}", 1)] == (False, 0)     # unique: not flagged
    assert got[("c0", 2)] == (True, 6)
    # threshold boundary: df == threshold is NOT boilerplate (strict >)
    got6 = {(r["conv_id"], r["turn_idx"]): r["is_boilerplate"]
            for r in boilerplate_turns(_ds(rows, blocks=3),
                                       stop_turn_df=6).take_all()}
    assert not any(got6.values())
    assert boilerplate_turns(_ds([], blocks=1)).count() == 0
