"""Transcript-structure operators: cross-turn repetition, per-conversation
structural audit, and role-transition statistics.

Agent / conversation transcripts need structural quality gates that the
per-document signals (stages/quality_signals.py) can't express, because
they depend on the CONVERSATION grouping and the turn order inside it:

- ``turn_repetition``: for every turn, the fraction of its word
  3-grams that already occurred in an EARLIER turn of the same
  conversation — the "stuck agent" / looping-assistant signal. A turn
  that mostly restates previous turns scores near 1.0. Semantics
  mirror the duplicate-n-gram family of Rae et al. 2021 §A1.1 but
  across turns rather than within one document.
- ``conv_structure_stats``: one row per conversation with role mix,
  tool-call count, per-role character volume, wall-clock span and a
  turn-index contiguity flag (gaps/truncation detector).
- ``role_transitions``: the corpus-level role-transition matrix
  (user→assistant, assistant→tool, …) — drift in this matrix between
  corpus snapshots is a cheap structural health check.

Scale shapes (the part that matters at 10^12 turns):

- ``turn_repetition`` never co-locates a whole conversation. Postings
  are (conv_id, gram, turn_idx) rows deduplicated per turn; ONE sort
  exchange on (conv_id, gram) makes "was this gram seen in an earlier
  turn" a vectorized run-min comparison, and the kernel pre-combines
  per (conv_id, turn_idx) inside each block so the second exchange
  (the per-turn re-aggregation) moves ~one row per turn, not one per
  gram. A conversation with 10^6 turns splits across many (conv, gram)
  groups — no hot-conversation block.
- ``conv_structure_stats`` is per-row feature extraction + ONE
  sorted-run aggregate (stages/topk.sorted_group_agg) keyed on
  conv_id: O(rows) numpy per block, one exchange total.
- ``role_transitions`` sorts by conv_id only (whole conversation per
  block — the same run-colocation guarantee dedup relies on; see
  stages/dedup._sorted_block_map), orders turns in-block, and emits
  per-block PARTIAL transition counts, so the global aggregate moves
  at most (distinct role pairs) rows per block.

Reference semantics anchor: the reference's conversation-level
handling pools per-turn scores by conversation key with stable turn
ordering (see SURVEY.md §2.5 conversation pooling); these operators
apply the same grouping contract to structural signals.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cleanlab_ray.stages.dedup import _run_starts, _sorted_block_map
from cleanlab_ray.stages.quality_signals import _tokens
from cleanlab_ray.stages.topk import sorted_group_agg


def _require_conv(batch: pa.Table, conv_col: str) -> None:
    """Loud contract: transcript operators refuse null conversation
    ids. A null key is not a conversation — grouping the null rows
    together would fuse unrelated turns into one pseudo-conversation
    (and Ray's sort cannot order None against str anyway, so the
    failure would otherwise surface as an opaque TypeError deep in the
    exchange). Matches the repo-wide empty-input contract: clean
    result or loud ValueError. O(1): Arrow tracks null_count in
    column metadata."""
    nc = batch[conv_col].null_count
    if nc:
        raise ValueError(
            f"transcripts: {nc} null {conv_col!r} key(s) in a block - a "
            "null conversation id would group unrelated turns into one "
            "pseudo-conversation; filter or fill null keys upstream")


REP_NGRAM = 3  # word n-gram width for the cross-turn repetition signal


def turn_gram_postings(batch: pa.Table, conv_col: str = "conv_id",
                       turn_col: str = "turn_idx",
                       text_col: str = "text",
                       n: int = REP_NGRAM) -> pa.Table:
    """Per-turn UNIQUE word n-grams as (conv_id, gram, turn_idx) rows.

    One regex split + Arrow joins per batch; n-grams are adjacent-token
    joins over the flattened token stream restricted to same-row spans,
    then deduplicated per turn via dictionary codes + lexsort (a turn
    repeating its own phrase is within-turn repetition — the
    quality_signals dup_2gram_frac signal — not cross-turn looping, so
    each turn contributes each gram once)."""
    _require_conv(batch, conv_col)
    codes, row_ids, _lens, vocab, _n_rows = _tokens(batch, text_col)
    m = len(codes)
    empty = pa.table({
        conv_col: pa.array([], batch[conv_col].type),
        "gram": pa.array([], pa.string()),
        turn_col: pa.array([], pa.int32()),
    })
    if m < n:
        return empty
    # positions i where tokens i..i+n-1 all come from the same row
    same = row_ids[: m - n + 1] == row_ids[n - 1:]
    idx = np.flatnonzero(same)
    if len(idx) == 0:
        return empty
    # cast the (small) vocab, not the token stream: large_string tokens
    # would not match binary_join_element_wise's string separator kernel
    toks = pc.cast(vocab, pa.string()).take(pa.array(codes))
    parts = [toks.take(pa.array(idx + j)) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    rid = row_ids[idx]
    # dedupe (turn, gram) pairs: dictionary codes keep the lexsort numeric
    enc = grams.dictionary_encode()
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    gcode = enc.indices.to_numpy(zero_copy_only=False)
    order = np.lexsort((gcode, rid))
    rs, gs = rid[order], gcode[order]
    keep = np.ones(len(order), dtype=bool)
    keep[1:] = (rs[1:] != rs[:-1]) | (gs[1:] != gs[:-1])
    sel = order[keep]
    sel_rows = pa.array(rid[sel])
    return pa.table({
        conv_col: batch[conv_col].take(sel_rows),
        # cast: a large_string text column yields large_string grams,
        # but empty batches emit string — keep the schema stable
        "gram": pc.cast(grams.take(pa.array(sel)), pa.string()),
        turn_col: pc.cast(batch[turn_col].take(sel_rows), pa.int32()),
    })


def repetition_flags(turn: np.ndarray, starts: np.ndarray,
                     run_id: np.ndarray) -> np.ndarray:
    """0/1 per posting row: 1 iff the row's turn is LATER than the
    minimum turn of its (conv, gram) run — i.e. the gram first occurred
    in an earlier turn. Runs are contiguous; ``starts`` are run start
    indices and ``run_id`` maps rows to runs (property-tested against a
    python-set oracle in tests/test_properties.py)."""
    first_turn = np.minimum.reduceat(turn, starts)
    return (turn > first_turn[run_id]).astype(np.int64)


def echo_flags(turn: np.ndarray, starts: np.ndarray,
               run_id: np.ndarray) -> np.ndarray:
    """0/1 per posting row: 1 iff turn-1 is also present in the row's
    (conv, gram) run (turns are unique within a run — the postings are
    per-turn deduplicated). In-run row order is arbitrary; the kernel
    sorts per run and uses a sorted-neighbor test (property-tested in
    tests/test_properties.py)."""
    order = np.lexsort((turn, run_id))
    t2, r2 = turn[order], run_id[order]
    echo2 = np.zeros(len(turn), dtype=np.int64)
    if len(turn) > 1:
        echo2[1:] = ((r2[1:] == r2[:-1]) & (t2[1:] == t2[:-1] + 1))
    flag = np.empty(len(turn), dtype=np.int64)
    flag[order] = echo2
    return flag


def turn_repetition(ds, conv_col: str = "conv_id", turn_col: str = "turn_idx",
                    text_col: str = "text", n: int = REP_NGRAM):
    """Cross-turn n-gram repetition per turn.

    Returns one row per turn that has at least one word n-gram:
    (conv_id, turn_idx, n_grams, n_repeated, rep_frac_e6) where
    n_repeated counts this turn's unique n-grams whose FIRST occurrence
    in the conversation was an earlier turn. Turns shorter than ``n``
    words emit no row (they have no n-gram to repeat)."""
    postings = ds.map_batches(
        lambda b: turn_gram_postings(b, conv_col, turn_col, text_col, n),
        batch_format="pyarrow",
    )
    return _per_turn_flag_rollup(postings, repetition_flags, "n_repeated",
                                 "rep_frac_e6", conv_col, turn_col)


def _per_turn_flag_rollup(postings, flag_fn, count_name: str,
                          frac_name: str, conv_col: str, turn_col: str):
    """Shared tail of the cross-turn gram signals: ONE (conv, gram)
    sort exchange over the postings, a per-block 0/1 flag kernel +
    per-(conv, turn) partial combine, then a turn-keyed re-aggregate.

    ``flag_fn(turn, starts, run_id) -> int64 0/1 per posting row``,
    where runs are the block's (conv, gram) groups (``starts`` are run
    start indices, ``run_id`` maps each row to its run). Output rows:
    (conv, turn, n_grams, {count_name}, {frac_name}) with the frac in
    floor(1e6·count/n_grams + 0.5) fixed-point."""

    def flag_and_combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                conv_col: pa.array([], batch[conv_col].type),
                turn_col: pa.array([], pa.int32()),
                "n_grams": pa.array([], pa.int64()),
                count_name: pa.array([], pa.int64()),
            })
        conv = batch[conv_col].to_numpy(zero_copy_only=False)
        gram = batch["gram"].to_numpy(zero_copy_only=False)
        turn = batch[turn_col].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = _run_starts(conv, gram)
        sizes = np.diff(np.append(starts, len(conv)))
        run_id = np.repeat(np.arange(len(starts)), sizes)
        flag = flag_fn(turn, starts, run_id)
        # in-block partial combine by (conv, turn): the re-aggregation
        # exchange then moves ~turns rows, not ~grams rows. The block
        # arrives sorted by (conv, gram), so conv runs are contiguous —
        # sort numerically on (conv run id, turn), never on strings.
        cstarts = _run_starts(conv)
        conv_rid = np.repeat(np.arange(len(cstarts)),
                             np.diff(np.append(cstarts, len(conv))))
        order = np.lexsort((turn, conv_rid))
        c2, t2, r2 = conv[order], turn[order], flag[order]
        s2 = _run_starts(conv_rid[order], t2)
        return pa.table({
            conv_col: pa.array(c2[s2], type=batch[conv_col].type),
            turn_col: pa.array(t2[s2].astype(np.int32), type=pa.int32()),
            "n_grams": pa.array(np.diff(np.append(s2, len(c2))).astype(np.int64)),
            count_name: pa.array(np.add.reduceat(r2, s2)),
        })

    flagged = _sorted_block_map(postings, [conv_col, "gram"], flag_and_combine)
    agg = sorted_group_agg(flagged, [conv_col, turn_col],
                           {"n_grams": "sum", count_name: "sum"})

    def finalize(batch: pa.Table) -> pa.Table:
        ng = batch["sum(n_grams)"].to_numpy(zero_copy_only=False).astype(np.float64)
        nr = batch[f"sum({count_name})"].to_numpy(zero_copy_only=False).astype(np.float64)
        frac = np.floor(nr * 1_000_000.0 / ng + 0.5).astype(np.int64)
        return pa.table({
            conv_col: batch[conv_col],
            turn_col: batch[turn_col],
            "n_grams": batch["sum(n_grams)"],
            count_name: batch[f"sum({count_name})"],
            frac_name: pa.array(frac),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def turn_echo(ds, conv_col: str = "conv_id", turn_col: str = "turn_idx",
              text_col: str = "text", n: int = REP_NGRAM):
    """Adjacent-turn n-gram echo per turn — the "assistant parrots the
    previous turn" signal, complementing :func:`turn_repetition`'s
    anywhere-earlier looping signal.

    Returns one row per turn with at least one word n-gram:
    (conv_id, turn_idx, n_grams, n_echoed, echo_frac_e6) where
    n_echoed counts this turn's unique n-grams that also occur in the
    turn with index ``turn_idx - 1`` of the same conversation (echo is
    against the immediately preceding turn INDEX; across a turn-index
    gap nothing is adjacent, matching the transcript contract that
    turn_idx encodes order). Same scale shape as turn_repetition: the
    postings pre-deduplicate per turn, ONE (conv, gram) sort exchange,
    and the flag is a vectorized sorted-run neighbor test — a
    conversation never co-locates."""
    postings = ds.map_batches(
        lambda b: turn_gram_postings(b, conv_col, turn_col, text_col, n),
        batch_format="pyarrow",
    )
    return _per_turn_flag_rollup(postings, echo_flags, "n_echoed",
                                 "echo_frac_e6", conv_col, turn_col)


def conv_length_drift(ds, conv_col: str = "conv_id",
                      turn_col: str = "turn_idx", role_col: str = "role",
                      text_col: str = "text",
                      role: str | None = "assistant"):
    """Per-conversation turn-length trend — the shrinking / ballooning
    response degeneration signal: the OLS slope of text length (chars)
    on turn_idx over the conversation's ``role`` turns (None = all
    turns), emitted as EXACT integer sufficient statistics plus a
    fixed-point slope.

    Output per conversation (only conversations with ≥1 matching turn):
    (conv_id, n_turns, sum_x, sum_y, sum_xy, sum_x2, slope_e6) with
    x = turn_idx, y = UTF-8 char count, all sums exact int64, and
    slope_e6 = floor(1e6·(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) + 0.5),
    0 when the denominator is 0 (a single matching turn). Both factors
    of the division are exact int64 on both engines, so the float64
    quotient — and hence the fixed-point value — is bit-identical to
    the SQL twin (the same contract as turn_repetition's rep_frac_e6).

    Scale shape: a per-row filter+project (5 ints per matching turn),
    then ONE conv-keyed sorted-run aggregate; no text ever reaches the
    exchange and a conversation never needs co-location (partial sums
    combine)."""

    def features(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        if role is not None:
            batch = batch.filter(pc.equal(
                pc.fill_null(batch[role_col], ""), role))
        x = pc.cast(batch[turn_col], pa.int64())
        y = pc.cast(pc.utf8_length(pc.fill_null(batch[text_col], "")),
                    pa.int64())
        return pa.table({
            conv_col: batch[conv_col],
            "x": x, "y": y,
            "xy": pc.multiply_checked(x, y),
            "x2": pc.multiply_checked(x, x),
        })

    agg = sorted_group_agg(
        ds.map_batches(features, batch_format="pyarrow"),
        conv_col,
        {"x": "sum", "y": "sum", "xy": "sum", "x2": "sum",
         conv_col: "count"},
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch[f"count({conv_col})"].to_numpy(zero_copy_only=False).astype(np.int64)
        sx = batch["sum(x)"].to_numpy(zero_copy_only=False)
        sy = batch["sum(y)"].to_numpy(zero_copy_only=False)
        sxy = batch["sum(xy)"].to_numpy(zero_copy_only=False)
        sx2 = batch["sum(x2)"].to_numpy(zero_copy_only=False)
        num = n * sxy - sx * sy
        den = n * sx2 - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.floor(num * 1_000_000.0 / den + 0.5)
        slope_e6 = np.where(den == 0, 0, slope).astype(np.int64)
        return pa.table({
            conv_col: batch[conv_col],
            "n_turns": pa.array(n),
            "sum_x": batch["sum(x)"], "sum_y": batch["sum(y)"],
            "sum_xy": batch["sum(xy)"], "sum_x2": batch["sum(x2)"],
            "slope_e6": pa.array(slope_e6),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


#: Second independent 16-byte key for the conversation fingerprint's
#: guard hash (pandas' default is "0123456789123456"); two independent
#: 64-bit sums give a 128-bit fingerprint.
_CONV_FP_KEY2 = "clray_conv_fp_k2"


def conv_exact_dedup(ds, conv_col: str = "conv_id",
                     turn_col: str = "turn_idx", role_col: str = "role",
                     tool_col: str = "tool", text_col: str = "text"):
    """Exact duplicate-CONVERSATION detection: conversations whose
    ordered (turn_idx, role, tool, text) sequences are identical are
    grouped, and each group's lexicographically minimal conv_id becomes
    the canonical id (reference semantics anchor: the duplicate-set
    grouping of datalab/internal/issue_manager/duplicate.py lifted from
    row granularity to the conversation grouping contract of SURVEY.md
    §2.5). Output: (conv_id, canonical_conv_id, is_dup), one row per
    conversation.

    Scale shape — TEXT NEVER SHUFFLES: each turn is hashed in the
    scoring map into two independent salted 64-bit values with
    turn_idx/role/tool baked into the hashed bytes, and the
    conversation fingerprint is the pair of mod-2^64 SUMS of those
    per-turn hashes (order-insensitive sum + order-carrying turn_idx
    inside the hash = sequence-sensitive fingerprint that needs no
    conversation co-location). Exchange 1 is turn-keyed on conv_id and
    moves 3 ints per turn (sorted_group_agg partial-combines in-block);
    exchange 2 is fingerprint-keyed and moves one 3-int row per
    CONVERSATION. Grouping inside a fingerprint run compares the
    second sum and the turn count, so merging two distinct
    conversations requires a simultaneous 128-bit collision
    (P ≈ n²/2^129 — unlike exact_dedup there is no byte-level verify,
    the honest cost of never moving text; a paranoid caller can join
    the emitted groups back against the corpus and byte-compare
    within groups, which touches only the flagged conversations)."""
    import pandas as pd

    def turn_hashes(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        turn = pc.cast(batch[turn_col], pa.string())
        role = pc.fill_null(pc.cast(batch[role_col], pa.string()), "\x04")
        tool = pc.fill_null(pc.cast(batch[tool_col], pa.string()), "\x04")
        text = pc.fill_null(pc.cast(batch[text_col], pa.large_string()), "")
        s = pc.binary_join_element_wise(
            turn, role, tool, pc.cast(text, pa.string()), "\x1f")
        vals = s.to_pandas().to_numpy(dtype=object)
        h1 = pd.util.hash_array(vals).astype(np.int64)
        h2 = pd.util.hash_array(vals, hash_key=_CONV_FP_KEY2).astype(np.int64)
        return pa.table({
            conv_col: batch[conv_col],
            "h1": pa.array(h1), "h2": pa.array(h2),
        })

    fp = sorted_group_agg(
        ds.map_batches(turn_hashes, batch_format="pyarrow"),
        conv_col, {"h1": "sum", "h2": "sum", conv_col: "count"})

    def assign(batch: pa.Table) -> pa.Table:
        conv_type = batch.schema.field(conv_col).type
        if batch.num_rows == 0:
            return pa.table({
                conv_col: pa.array([], conv_type),
                "canonical_conv_id": pa.array([], conv_type),
                "is_dup": pa.array([], pa.bool_()),
            })
        df = pd.DataFrame({
            "s1": batch["sum(h1)"].to_numpy(zero_copy_only=False),
            "s2": batch["sum(h2)"].to_numpy(zero_copy_only=False),
            "n": batch[f"count({conv_col})"].to_numpy(zero_copy_only=False),
            "conv": batch[conv_col].to_pandas(),
        })
        canon = df.groupby(["s1", "s2", "n"])["conv"].transform("min")
        return pa.table({
            conv_col: batch[conv_col],
            "canonical_conv_id": pa.array(canon.to_numpy(dtype=object),
                                          type=conv_type),
            "is_dup": pa.array((df["conv"] != canon).to_numpy()),
        })

    return _sorted_block_map(fp, "sum(h1)", assign)


def conv_structure_stats(ds, conv_col: str = "conv_id",
                         turn_col: str = "turn_idx", role_col: str = "role",
                         tool_col: str = "tool", text_col: str = "text",
                         ts_col: str = "ts"):
    """Per-conversation structural audit: one exchange.

    Output per conversation: n_turns, n_user / n_assistant / n_tool
    (role mix), n_tool_calls (tool column non-null), chars_user /
    chars_assistant (character volume by speaker), span_seconds
    (wall-clock from first to last turn timestamp) and ``contiguous``
    (turn_idx runs 0..n_turns-1 with no gap — assumes turn_idx unique
    within a conversation, the transcript contract)."""

    def features(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        role = batch[role_col]
        is_u = pc.cast(pc.equal(role, "user"), pa.int64())
        is_a = pc.cast(pc.equal(role, "assistant"), pa.int64())
        is_t = pc.cast(pc.equal(role, "tool"), pa.int64())
        has_tool = pc.cast(pc.is_valid(batch[tool_col]), pa.int64())
        nchars = pc.cast(pc.utf8_length(pc.fill_null(batch[text_col], "")),
                         pa.int64())
        turn = pc.cast(batch[turn_col], pa.int32())
        ts_us = pc.cast(batch[ts_col], pa.int64())
        zero = pa.array(np.zeros(batch.num_rows, dtype=np.int64))
        return pa.table({
            conv_col: batch[conv_col],
            "u": pc.fill_null(is_u, 0), "a": pc.fill_null(is_a, 0),
            "t": pc.fill_null(is_t, 0), "tc": has_tool,
            "cu": pc.if_else(pc.equal(pc.fill_null(role, ""), "user"),
                             nchars, zero),
            "ca": pc.if_else(pc.equal(pc.fill_null(role, ""), "assistant"),
                             nchars, zero),
            "turn_min": turn, "turn_max": turn,
            "ts_min": ts_us, "ts_max": ts_us,
        })

    agg = sorted_group_agg(
        ds.map_batches(features, batch_format="pyarrow"),
        conv_col,
        {"u": "sum", "a": "sum", "t": "sum", "tc": "sum",
         "cu": "sum", "ca": "sum",
         "turn_min": "min", "turn_max": "max",
         "ts_min": "min", "ts_max": "max", conv_col: "count"},
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch[f"count({conv_col})"].to_numpy(zero_copy_only=False)
        tmin = batch["min(turn_min)"].to_numpy(zero_copy_only=False).astype(np.int64)
        tmax = batch["max(turn_max)"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = batch["min(ts_min)"].to_numpy(zero_copy_only=False)
        hi = batch["max(ts_max)"].to_numpy(zero_copy_only=False)
        return pa.table({
            conv_col: batch[conv_col],
            "n_turns": pa.array(n.astype(np.int64)),
            "n_user": batch["sum(u)"], "n_assistant": batch["sum(a)"],
            "n_tool": batch["sum(t)"], "n_tool_calls": batch["sum(tc)"],
            "chars_user": batch["sum(cu)"],
            "chars_assistant": batch["sum(ca)"],
            "span_seconds": pa.array((hi - lo) // 1_000_000),
            "contiguous": pa.array((tmin == 0) & (tmax + 1 == n)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def role_transitions(ds, conv_col: str = "conv_id",
                     turn_col: str = "turn_idx", role_col: str = "role"):
    """Corpus role-transition matrix: (from_role, to_role, n) counting
    adjacent-turn transitions inside each conversation in turn order.

    Sorts by conv_id ONLY (whole conversation per block — the
    run-colocation guarantee; a hot conversation yields one oversized
    block, acceptable because transcripts bound conversation length),
    orders turns in-block, and pre-combines transition counts per block
    so the global aggregate moves at most (distinct role pairs) rows
    per block."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "from_role": pa.array([], pa.string()),
            "to_role": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        })
        if batch.num_rows < 2:
            return empty
        conv = batch[conv_col].to_numpy(zero_copy_only=False)
        turn = batch[turn_col].to_numpy(zero_copy_only=False)
        role = batch[role_col].to_numpy(zero_copy_only=False)
        # block arrives sorted by conv_id: numeric run ids, no string sort
        cstarts = _run_starts(conv)
        conv_rid = np.repeat(np.arange(len(cstarts)),
                             np.diff(np.append(cstarts, len(conv))))
        order = np.lexsort((turn, conv_rid))
        c2, r2 = conv_rid[order], role[order]
        adj = c2[:-1] == c2[1:]
        if not adj.any():
            return empty
        roles_u, rcode = np.unique(role, return_inverse=True)
        rc2 = rcode[order]
        frc, toc = rc2[:-1][adj], rc2[1:][adj]
        pair = frc * len(roles_u) + toc
        pair_order = np.argsort(pair, kind="stable")
        p2 = pair[pair_order]
        s = _run_starts(p2)
        heads = p2[s]
        return pa.table({
            "from_role": pa.array(roles_u[heads // len(roles_u)],
                                  type=pa.string()),
            "to_role": pa.array(roles_u[heads % len(roles_u)],
                                type=pa.string()),
            "n": pa.array(np.diff(np.append(s, len(p2))).astype(np.int64)),
        })

    partials = _sorted_block_map(ds.select_columns(
        [conv_col, turn_col, role_col]), conv_col, partial)
    agg = sorted_group_agg(partials, ["from_role", "to_role"], {"n": "sum"})

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "from_role": batch["from_role"],
            "to_role": batch["to_role"],
            "n": batch["sum(n)"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII / toxicity density, context-budget growth, boilerplate templates
# ---------------------------------------------------------------------------

def pii_density(ds, conv_col: str = "conv_id", text_col: str = "text"):
    """Per-conversation PII / toxicity match density over RAW text.

    For every conversation: per-pattern match counts for each entry of
    :data:`cleanlab_ray.stages.scrub.SCRUB_PATTERNS` (email, ssn,
    phone, ipv4, toxicity), the total match count, the number of turns
    containing at least one match, and the turn count — the
    scrub-stage tuning / audit report (which corpora need scrubbing,
    how concentrated is PII per conversation).

    Counting contract: each pattern is counted INDEPENDENTLY on the
    raw text (RE2 non-overlapping left-to-right matches), unlike the
    scrub stage itself which applies patterns sequentially — a
    substring consumed by an earlier pattern's replacement is still
    counted by later patterns here. Both the engine and the DuckDB
    oracle count this way, and it is the right semantics for an audit
    (every pattern reports its own footprint).

    Scale shape: per-row counting is ``pc.count_substring_regex`` (one
    RE2 pass per pattern per block, no Python loop); the exchange is
    ONE sorted-run aggregate keyed on conv_id moving 7 small ints per
    turn — text never shuffles.
    """
    from cleanlab_ray.stages.scrub import SCRUB_PATTERNS

    names = [n for n, _, _ in SCRUB_PATTERNS]

    def features(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        txt = pc.fill_null(batch[text_col], "")
        cols = {conv_col: batch[conv_col]}
        total = np.zeros(batch.num_rows, dtype=np.int64)
        for name, pattern, _ in SCRUB_PATTERNS:
            cnt = pc.count_substring_regex(txt, pattern)
            v = cnt.to_numpy(zero_copy_only=False).astype(np.int64)
            total += v
            cols[f"n_{name}"] = pa.array(v)
        cols["n_matches"] = pa.array(total)
        cols["pii_turn"] = pa.array((total > 0).astype(np.int64))
        return pa.table(cols)

    ops = {f"n_{n}": "sum" for n in names}
    ops.update({"n_matches": "sum", "pii_turn": "sum", conv_col: "count"})
    agg = sorted_group_agg(
        ds.select_columns([conv_col, text_col]).map_batches(
            features, batch_format="pyarrow"),
        conv_col, ops)

    def finalize(batch: pa.Table) -> pa.Table:
        out = {conv_col: batch[conv_col]}
        for n in names:
            out[f"n_{n}"] = batch[f"sum(n_{n})"]
        out["n_matches"] = batch["sum(n_matches)"]
        out["n_pii_turns"] = batch["sum(pii_turn)"]
        out["n_turns"] = batch[f"count({conv_col})"]
        return pa.table(out)

    return agg.map_batches(finalize, batch_format="pyarrow")


CONTEXT_BUDGET_CHARS = 1500  # default per-conversation context budget


def context_growth(ds, budget_chars: int = CONTEXT_BUDGET_CHARS,
                   conv_col: str = "conv_id", turn_col: str = "turn_idx",
                   text_col: str = "text"):
    """Per-conversation context-budget audit.

    Models the prompt-context cost of replaying a conversation: at
    turn t the accumulated context is the sum of the character lengths
    of turns 0..t (in ``turn_idx`` order). Emits one row per
    conversation: total_chars, n_turns, ``first_overflow_turn`` (the
    smallest turn_idx whose CUMULATIVE length exceeds
    ``budget_chars``; -1 if the conversation never overflows) and
    ``n_overflow_turns`` — the packing / truncation planner's input
    (which conversations fit a training context window, and where to
    cut the ones that don't).

    Scale shape: lengths are computed BEFORE the exchange, so only
    (conv_id, turn_idx, len) rows move; ONE sort exchange on conv_id
    co-locates each conversation (run-colocation guarantee of
    Dataset.sort — see _sorted_block_map), then a vectorized in-block
    cumulative sum per run does the rest. Transcript conversations are
    bounded in length, so a hot conversation yields one oversized but
    bounded block.
    """
    budget = int(budget_chars)

    def lengths(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        return pa.table({
            conv_col: batch[conv_col],
            turn_col: pc.cast(batch[turn_col], pa.int32()),
            "len": pc.cast(pc.utf8_length(pc.fill_null(batch[text_col], "")),
                           pa.int64()),
        })

    def per_conv(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                conv_col: pa.array([], batch[conv_col].type),
                "total_chars": pa.array([], pa.int64()),
                "n_turns": pa.array([], pa.int64()),
                "first_overflow_turn": pa.array([], pa.int32()),
                "n_overflow_turns": pa.array([], pa.int64()),
            })
        conv = batch[conv_col].to_numpy(zero_copy_only=False)
        turn = batch[turn_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["len"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = _run_starts(conv)
        rid = np.repeat(np.arange(len(starts)),
                        np.diff(np.append(starts, len(conv))))
        order = np.lexsort((turn, rid))
        r2, t2, l2 = rid[order], turn[order], ln[order]
        cum = np.cumsum(l2)
        s2 = _run_starts(r2)
        base = np.repeat(np.concatenate(([0], cum[s2[1:] - 1])),
                         np.diff(np.append(s2, len(r2))))
        cum = cum - base  # per-conversation running total
        over = cum > budget
        nrun = np.diff(np.append(s2, len(r2)))
        total = np.add.reduceat(l2, s2)
        n_over = np.add.reduceat(over.astype(np.int64), s2)
        # first overflow turn per run: turns are sorted within the run,
        # so the first True in the run is the minimum overflow turn
        first_idx = np.searchsorted(np.cumsum(over), 1 + np.concatenate(
            ([0], np.cumsum(over)[s2[1:] - 1])))
        has = n_over > 0
        first = np.where(has, t2[np.minimum(first_idx, len(t2) - 1)],
                         -1).astype(np.int32)
        return pa.table({
            conv_col: pa.array(conv[starts]),
            "total_chars": pa.array(total),
            "n_turns": pa.array(nrun.astype(np.int64)),
            "first_overflow_turn": pa.array(first),
            "n_overflow_turns": pa.array(n_over),
        })

    slim = ds.select_columns([conv_col, turn_col, text_col]).map_batches(
        lengths, batch_format="pyarrow")
    return _sorted_block_map(slim, conv_col, per_conv)


TEMPLATE_MIN_COUNT = 5  # default boilerplate threshold
TEMPLATE_TOP_K = 100


def normalize_template(col):
    """Turn skeleton normalization (contract shared with the SQL twin):
    lowercase, digit runs -> '0', whitespace runs -> ' ', trim spaces.
    Every step is an RE2 / utf8proc kernel DuckDB reproduces exactly."""
    col = pc.utf8_lower(pc.fill_null(col, ""))
    col = pc.replace_substring_regex(col, pattern="[0-9]+", replacement="0")
    col = pc.replace_substring_regex(col, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim(col, " ")


def template_prefix(col, prefix_words: int):
    """Reduce a normalized skeleton to its first ``prefix_words``
    whitespace-delimited tokens (RE2 extract; the SQL twin is DuckDB's
    regexp_extract with the same pattern). Empty input -> ''."""
    pat = r"^(?P<p>\S+(?: \S+){0,%d})" % (int(prefix_words) - 1)
    return pc.fill_null(
        pc.struct_field(pc.extract_regex(col, pat), "p"), "")


def template_spam(ds, min_count: int = TEMPLATE_MIN_COUNT,
                  k: int = TEMPLATE_TOP_K, conv_col: str = "conv_id",
                  text_col: str = "text", prefix_words: int | None = None):
    """Boilerplate template detection: the top-k most frequent
    NORMALIZED turn skeletons (see :func:`normalize_template`)
    appearing at least ``min_count`` times, with their occurrence count
    and the number of distinct conversations they appear in — the
    CCNet-style "this string is template spam, not content" signal
    (greetings, cookie banners, canned agent prefaces) that exact
    dedup misses because surrounding digits / whitespace vary.

    ``prefix_words`` switches the skeleton to its first N tokens only
    (canned-opening detection — "thank you for contacting", cookie
    banner prefixes): full-turn templates catch literal boilerplate,
    prefix templates catch boilerplate with variable tails.

    Output: (template, n, n_convs), ordered n DESC, template ASC,
    limited to k rows.

    Scale shape: per-block partials pre-combine to DISTINCT
    (template, conv) pairs with counts, so a hot template (the whole
    point of the operator) collapses to one row per conversation per
    block before the exchange; ONE sort exchange on template
    co-locates each template's pairs; the in-block run kernel sums
    counts and counts unique conversations; the final top-k is
    exchange-free (stages/topk.global_top_k). Rare templates ride the
    exchange once each — the same bounded shape as vocab_topk.
    """
    from cleanlab_ray.stages.topk import global_top_k

    def partials(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        tmpl = normalize_template(batch[text_col])
        if prefix_words is not None:
            tmpl = template_prefix(tmpl, prefix_words)
        if batch.num_rows == 0:
            return pa.table({
                "template": pa.array([], pa.string()),
                conv_col: pa.array([], batch[conv_col].type),
                "n": pa.array([], pa.int64()),
            })
        # in-block combine: count per (template, conv) pair
        tc = tmpl.combine_chunks() if isinstance(
            tmpl, pa.ChunkedArray) else tmpl
        enc_t = tc.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        conv = batch[conv_col]
        cc = conv.combine_chunks() if isinstance(
            conv, pa.ChunkedArray) else conv
        enc_c = cc.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        pair = enc_t * (enc_c.max() + 1) + enc_c
        order = np.argsort(pair, kind="stable")
        s = _run_starts(pair[order])
        heads = order[s]
        cnt = np.diff(np.append(s, len(pair)))
        return pa.table({
            "template": pc.take(tc, pa.array(heads)),
            conv_col: pc.take(cc, pa.array(heads)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def per_template(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "template": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "n_convs": pa.array([], pa.int64()),
            })
        tmpl = batch["template"]
        tc = tmpl.combine_chunks() if isinstance(
            tmpl, pa.ChunkedArray) else tmpl
        tv = tc.to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        conv = batch[conv_col]
        cc = conv.combine_chunks() if isinstance(
            conv, pa.ChunkedArray) else conv
        ccode = cc.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        s = _run_starts(tv)
        rid = np.repeat(np.arange(len(s)), np.diff(np.append(s, len(tv))))
        total = np.add.reduceat(n, s)
        # distinct convs per template run: unique (run, conv-code) pairs
        # (the same pair can arrive from multiple source blocks)
        pair = np.sort(rid * (ccode.max() + 1) + ccode)
        uniq_rows = pair[_run_starts(pair)] // (ccode.max() + 1)
        n_convs = np.bincount(uniq_rows, minlength=len(s)).astype(np.int64)
        keep = total >= min_count
        return pa.table({
            "template": pc.take(tc, pa.array(s[keep])),
            "n": pa.array(total[keep]),
            "n_convs": pa.array(n_convs[keep]),
        })

    slim = ds.select_columns([conv_col, text_col]).map_batches(
        partials, batch_format="pyarrow")
    per_t = _sorted_block_map(slim, "template", per_template)
    return global_top_k(per_t, ["n", "template"], k,
                        descending=[True, False])


def turn_latency(ds, conv_col: str = "conv_id", turn_col: str = "turn_idx",
                 ts_col: str = "ts", role_col: str = "role"):
    """Per-conversation inter-turn latency audit.

    For every conversation (turns ordered by ``turn_col``): the count,
    sum, min and max of the timestamp gaps between consecutive turns,
    the number of ZERO gaps (batch-dumped / synthetic conversations
    whose turns share one timestamp) and NEGATIVE gaps (clock
    anomalies: ts decreasing in turn order), plus the count and sum of
    user->assistant gaps specifically (assistant response latency).
    Rows with a null timestamp are dropped (documented contract — the
    SQL twin filters ``ts IS NOT NULL`` identically); a null role
    never matches the user->assistant test. Single-turn conversations
    emit n_gaps=0 with 0 sentinels for min/max/sum.

    All outputs are exact int64 microseconds — bit-identical to the
    DuckDB ``LAG() OVER (PARTITION BY conv ORDER BY turn)`` twin.

    Scale shape: (conv, turn, ts_us, role-code) projected BEFORE the
    exchange (text never moves); ONE conv-colocating sort, then a
    vectorized in-block lexsort + diff per conversation run.
    """

    def slim(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        keep = pc.is_valid(batch[ts_col])
        b = batch.filter(keep) if batch.num_rows else batch
        role = pc.fill_null(b[role_col], "")
        return pa.table({
            conv_col: b[conv_col],
            turn_col: pc.cast(b[turn_col], pa.int32()),
            "ts_us": pc.cast(b[ts_col], pa.int64()),
            "is_user": pc.cast(pc.equal(role, "user"), pa.int8()),
            "is_asst": pc.cast(pc.equal(role, "assistant"), pa.int8()),
        })

    def per_conv(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                conv_col: pa.array([], batch[conv_col].type),
                "n_turns": pa.array([], pa.int64()),
                "n_gaps": pa.array([], pa.int64()),
                "gap_min_us": pa.array([], pa.int64()),
                "gap_max_us": pa.array([], pa.int64()),
                "gap_sum_us": pa.array([], pa.int64()),
                "n_zero_gaps": pa.array([], pa.int64()),
                "n_neg_gaps": pa.array([], pa.int64()),
                "n_ua_gaps": pa.array([], pa.int64()),
                "ua_gap_sum_us": pa.array([], pa.int64()),
            })
        conv = batch[conv_col].to_numpy(zero_copy_only=False)
        turn = batch[turn_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        iu = batch["is_user"].to_numpy(zero_copy_only=False).astype(bool)
        ia = batch["is_asst"].to_numpy(zero_copy_only=False).astype(bool)
        starts = _run_starts(conv)
        rid = np.repeat(np.arange(len(starts)),
                        np.diff(np.append(starts, len(conv))))
        order = np.lexsort((turn, rid))
        r2, t2, u2, a2 = rid[order], ts[order], iu[order], ia[order]
        s2 = _run_starts(r2)
        nrun = np.diff(np.append(s2, len(r2)))
        gap = np.diff(t2)  # gap[i] = t2[i+1] - t2[i]
        # a gap is INTERNAL to a run iff position i+1 is not a run start
        internal = np.ones(len(gap), dtype=bool)
        internal[s2[1:] - 1] = False
        # per-gap run id = run of the RIGHT endpoint
        grid = r2[1:]
        ua = internal & u2[:-1] & a2[1:]

        def run_agg(vals, op, fill):
            out = np.full(len(s2), fill, dtype=np.int64)
            m = internal
            if not m.any():
                return out
            gr, gv = grid[m], vals[m]
            srt = np.argsort(gr, kind="stable")
            gr, gv = gr[srt], gv[srt]
            rs = _run_starts(gr)
            agg = op.reduceat(gv, rs)
            out[gr[rs]] = agg
            return out

        gv = gap.copy()
        n_gaps = run_agg(np.ones(len(gap), dtype=np.int64), np.add, 0)
        gmin = run_agg(gv, np.minimum, 0)
        gmax = run_agg(gv, np.maximum, 0)
        gsum = run_agg(gv, np.add, 0)
        nzero = run_agg((gap == 0).astype(np.int64), np.add, 0)
        nneg = run_agg((gap < 0).astype(np.int64), np.add, 0)
        # user->assistant gaps: mask others out of the count/sum
        ua_n = np.full(len(s2), 0, dtype=np.int64)
        ua_sum = np.full(len(s2), 0, dtype=np.int64)
        m = internal & ua
        if m.any():
            gr, c, v = grid[m], np.ones(m.sum(), dtype=np.int64), gap[m]
            srt = np.argsort(gr, kind="stable")
            gr, c, v = gr[srt], c[srt], v[srt]
            rs = _run_starts(gr)
            ua_n[gr[rs]] = np.add.reduceat(c, rs)
            ua_sum[gr[rs]] = np.add.reduceat(v, rs)
        # min/max sentinels must be 0 when a run has no gaps
        gmin[n_gaps == 0] = 0
        gmax[n_gaps == 0] = 0
        return pa.table({
            conv_col: pa.array(conv[starts]),
            "n_turns": pa.array(nrun.astype(np.int64)),
            "n_gaps": pa.array(n_gaps),
            "gap_min_us": pa.array(gmin),
            "gap_max_us": pa.array(gmax),
            "gap_sum_us": pa.array(gsum),
            "n_zero_gaps": pa.array(nzero),
            "n_neg_gaps": pa.array(nneg),
            "n_ua_gaps": pa.array(ua_n),
            "ua_gap_sum_us": pa.array(ua_sum),
        })

    slimmed = ds.select_columns(
        [conv_col, turn_col, ts_col, role_col]).map_batches(
        slim, batch_format="pyarrow")
    return _sorted_block_map(slimmed, conv_col, per_conv)


TOOL_LOOP_MIN = 3  # default "stuck in a tool loop" run length


def tool_loops(ds, loop_min: int = TOOL_LOOP_MIN, conv_col: str = "conv_id",
               turn_col: str = "turn_idx", tool_col: str = "tool"):
    """Tool-call loop detection: per conversation, maximal runs of
    CONSECUTIVE turns (in turn order) invoking the SAME non-null tool.
    A turn with a different tool — or no tool — breaks the run. Emits
    one row per conversation that makes at least one tool call:
    n_tool_calls, n_runs (maximal same-tool runs), max_tool_run (the
    longest), and n_loops (runs of length >= ``loop_min`` — the
    agent-stuck-retrying signal).

    SQL twin: DuckDB gaps-and-islands (LAG break flags + running sum
    island ids over ALL turns, so an intervening tool-less turn breaks
    the island exactly like the kernel).

    Scale shape: (conv, turn, tool) projected before the exchange; ONE
    conv-colocating sort; vectorized in-block run detection.
    """
    lm = int(loop_min)

    def slim(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        return pa.table({
            conv_col: batch[conv_col],
            turn_col: pc.cast(batch[turn_col], pa.int32()),
            tool_col: batch[tool_col],
        })

    def per_conv(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                conv_col: pa.array([], batch[conv_col].type),
                "n_tool_calls": pa.array([], pa.int64()),
                "n_runs": pa.array([], pa.int64()),
                "max_tool_run": pa.array([], pa.int64()),
                "n_loops": pa.array([], pa.int64()),
            })
        conv = batch[conv_col].to_numpy(zero_copy_only=False)
        turn = batch[turn_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tcol = batch[tool_col]
        tc = tcol.combine_chunks() if isinstance(
            tcol, pa.ChunkedArray) else tcol
        enc = tc.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False)
        code = np.where(np.isnan(code.astype(np.float64)), -1,
                        np.nan_to_num(code.astype(np.float64), nan=-1)
                        ).astype(np.int64) if code.dtype.kind == "f" else (
            code.astype(np.int64))
        valid = tc.is_valid().to_numpy(zero_copy_only=False)
        code = np.where(valid, code, -1)
        starts = _run_starts(conv)
        rid = np.repeat(np.arange(len(starts)),
                        np.diff(np.append(starts, len(conv))))
        order = np.lexsort((turn, rid))
        r2, c2 = rid[order], code[order]
        # break before i when run changes, tool changes, or tool is null
        brk = np.ones(len(r2), dtype=bool)
        if len(r2) > 1:
            brk[1:] = (r2[1:] != r2[:-1]) | (c2[1:] != c2[:-1])
        brk |= c2 == -1
        isl = np.cumsum(brk) - 1
        m = c2 != -1
        if not m.any():
            return pa.table({
                conv_col: pa.array([], batch[conv_col].type),
                "n_tool_calls": pa.array([], pa.int64()),
                "n_runs": pa.array([], pa.int64()),
                "max_tool_run": pa.array([], pa.int64()),
                "n_loops": pa.array([], pa.int64()),
            })
        isl_m, rid_m = isl[m], r2[m]
        rs = _run_starts(isl_m)  # islands are consecutive among kept rows
        run_len = np.diff(np.append(rs, len(isl_m))).astype(np.int64)
        run_rid = rid_m[rs]
        # per-conversation rollup over its runs
        srt = np.argsort(run_rid, kind="stable")
        run_rid, run_len = run_rid[srt], run_len[srt]
        cs = _run_starts(run_rid)
        n_calls = np.add.reduceat(run_len, cs)
        n_runs = np.diff(np.append(cs, len(run_rid))).astype(np.int64)
        max_run = np.maximum.reduceat(run_len, cs)
        n_loops = np.add.reduceat((run_len >= lm).astype(np.int64), cs)
        return pa.table({
            conv_col: pa.array(conv[starts][run_rid[cs]]),
            "n_tool_calls": pa.array(n_calls),
            "n_runs": pa.array(n_runs),
            "max_tool_run": pa.array(max_run),
            "n_loops": pa.array(n_loops),
        })

    slimmed = ds.select_columns([conv_col, turn_col, tool_col]).map_batches(
        slim, batch_format="pyarrow")
    return _sorted_block_map(slimmed, conv_col, per_conv)


# One RE2 pattern bank, shared by the engine kernel and the DuckDB
# oracle (both are RE2 — identical match semantics). Inline (?i) keeps
# case-insensitivity portable across the two engines.
REFUSAL_PATTERN = (
    r"(?i)(i cannot|i can't|i am unable|i'm unable|as an ai"
    r"|i won't be able|i'm sorry, but|i am sorry, but)"
)


def refusal_rate(ds, pattern: str = REFUSAL_PATTERN,
                 conv_col: str = "conv_id", turn_col: str = "turn_idx",
                 role_col: str = "role", text_col: str = "text"):
    """Per-conversation assistant-refusal audit.

    A REFUSAL turn is an assistant turn whose text matches
    ``pattern`` (RE2, case-insensitive by default — canned
    "I cannot / as an AI / I'm sorry, but" openers). Emits one row per
    conversation: n_turns, n_assistant, n_refusals, refusal_frac_e6
    (refusals per assistant turn, fixed-point 1e6; 0 when the
    conversation has no assistant turns) and first_refusal_turn (the
    smallest turn_idx of a refusal; -1 if none) — the
    training-data-quality signal for agent transcripts dominated by
    refusals or degenerating into them.

    Scale shape: the regex runs as ONE vectorized RE2 pass per block
    (`pc.match_substring_regex`) on raw text; the exchange is one
    conv-keyed sorted-run aggregate moving 3 small ints per turn —
    text never shuffles.
    """
    _SENTINEL = np.int64(2**62)

    def features(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        role = pc.fill_null(batch[role_col], "")
        is_a = pc.equal(role, "assistant")
        txt = pc.fill_null(batch[text_col], "")
        hit = pc.match_substring_regex(txt, pattern)
        ref = pc.and_(is_a, hit)
        refi = pc.cast(ref, pa.int64())
        turn = pc.cast(batch[turn_col], pa.int64())
        first = pc.if_else(ref, turn, pa.scalar(_SENTINEL, pa.int64()))
        return pa.table({
            conv_col: batch[conv_col],
            "is_asst": pc.cast(is_a, pa.int64()),
            "refusal": refi,
            "first_ref": first,
        })

    agg = sorted_group_agg(
        ds.select_columns([conv_col, turn_col, role_col, text_col])
          .map_batches(features, batch_format="pyarrow"),
        conv_col,
        {"is_asst": "sum", "refusal": "sum", "first_ref": "min",
         conv_col: "count"},
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n_ref = batch["sum(refusal)"].to_numpy(zero_copy_only=False)
        n_asst = batch["sum(is_asst)"].to_numpy(zero_copy_only=False)
        first = batch["min(first_ref)"].to_numpy(zero_copy_only=False)
        first = np.where(n_ref > 0, first, -1).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = np.where(
                n_asst > 0,
                np.floor(n_ref * 1_000_000.0 / np.maximum(n_asst, 1) + 0.5),
                0.0).astype(np.int64)
        return pa.table({
            conv_col: batch[conv_col],
            "n_turns": batch[f"count({conv_col})"],
            "n_assistant": batch["sum(is_asst)"],
            "n_refusals": batch["sum(refusal)"],
            "refusal_frac_e6": pa.array(frac),
            "first_refusal_turn": pa.array(first),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


SESSION_GAP_US = 5_000_000  # default idle gap that splits sessions (5s)


def latency_sessions(ds, gap_us: int = SESSION_GAP_US,
                     conv_col: str = "conv_id", turn_col: str = "turn_idx",
                     ts_col: str = "ts"):
    """Per-conversation sessionization by inter-turn idle gaps.

    Turns (ordered by ``turn_col``) belong to the same session until a
    gap STRICTLY greater than ``gap_us`` microseconds separates them.
    Emits one row per conversation: n_turns, n_sessions,
    max_session_turns (longest session) and idle_us (the summed
    microseconds of the session-splitting gaps) — the resumed-thread /
    multi-sitting signal for packing and context-window planning.
    Rows with a null timestamp are dropped (same contract as
    :func:`turn_latency`); negative gaps (clock anomalies) never split.

    Scale shape: (conv, turn, ts_us) projected BEFORE the exchange;
    ONE conv-colocating sort, vectorized in-block lexsort + diff +
    island reduceat per conversation run.
    """
    g = np.int64(gap_us)

    def slim(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        keep = pc.is_valid(batch[ts_col])
        b = batch.filter(keep) if batch.num_rows else batch
        return pa.table({
            conv_col: b[conv_col],
            turn_col: pc.cast(b[turn_col], pa.int32()),
            "ts_us": pc.cast(b[ts_col], pa.int64()),
        })

    def per_conv(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                conv_col: pa.array([], batch[conv_col].type),
                "n_turns": pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64()),
                "max_session_turns": pa.array([], pa.int64()),
                "idle_us": pa.array([], pa.int64()),
            })
        conv = batch[conv_col].to_numpy(zero_copy_only=False)
        turn = batch[turn_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = _run_starts(conv)
        rid = np.repeat(np.arange(len(starts)),
                        np.diff(np.append(starts, len(conv))))
        order = np.lexsort((turn, rid))
        r2, t2 = rid[order], ts[order]
        s2 = _run_starts(r2)
        nrun = np.diff(np.append(s2, len(r2))).astype(np.int64)
        gap = np.diff(t2)
        internal = np.ones(len(gap), dtype=bool)
        internal[s2[1:] - 1] = False
        split = internal & (gap > g)
        # session islands: break at every run start and at every split
        brk = np.zeros(len(r2), dtype=bool)
        brk[s2] = True
        brk[1:] |= split
        isl = np.cumsum(brk) - 1
        is_ = _run_starts(isl)
        sess_len = np.diff(np.append(is_, len(isl))).astype(np.int64)
        sess_rid = r2[is_]
        cs = _run_starts(sess_rid)  # islands are grouped by run already
        n_sessions = np.diff(np.append(cs, len(sess_rid))).astype(np.int64)
        max_sess = np.maximum.reduceat(sess_len, cs)
        idle = np.zeros(len(s2), dtype=np.int64)
        if split.any():
            grid = r2[1:][split]
            gv = gap[split]
            srt = np.argsort(grid, kind="stable")
            grid, gv = grid[srt], gv[srt]
            rs = _run_starts(grid)
            idle[grid[rs]] = np.add.reduceat(gv, rs)
        return pa.table({
            conv_col: pa.array(conv[starts]),
            "n_turns": pa.array(nrun),
            "n_sessions": pa.array(n_sessions),
            "max_session_turns": pa.array(max_sess),
            "idle_us": pa.array(idle),
        })

    slimmed = ds.select_columns([conv_col, turn_col, ts_col]).map_batches(
        slim, batch_format="pyarrow")
    return _sorted_block_map(slimmed, conv_col, per_conv)


# MinHash transform constants for conv_near_dup: 8 independent
# (multiplier, offset) pairs applied to the per-turn content hash mod
# 2^64 then folded into [0, 2^63) so both numpy int64 and SQL BIGINT
# order them identically. Documented so an external oracle can
# reproduce the signatures exactly.
# All constants < 2^63 so the SQL twin's HUGEINT product h*a (h < 2^64)
# stays below 2^127; numpy's uint64 arithmetic is unaffected.
CONV_MINHASH_TRANSFORMS = (
    (0x1E3779B97F4A7C15, 0x0123456789ABCDEF),
    (0x42B2AE3D27D4EB4F, 0x0F1E2D3C4B5A6978),
    (0x165667B19E3779F9, 0x1122334455667788),
    (0x56E8FEB86659FD93, 0x243F6A8885A308D3),
    (0x224BAED4963EE407, 0x13198A2E03707344),
    (0x1FB21C651E98DF25, 0x24093822299F31D0),
    (0x4C9E2D51AB0E9789, 0x082EFA98EC4E6C89),
    (0x27D4EB2F165667C5, 0x452821E638D01377),
)
CONV_BAND_ROWS = 2  # mins per LSH band (4 bands with K=8)
_MASK63 = np.uint64(2**63 - 1)


CONV_STOP_TURN_DF = 1000  # default boilerplate-turn occurrence cutoff
_STOP_SET_MAX = 5_000_000  # broadcast-size guard for the stop-turn set


def conv_near_dup(ds, conv_col: str = "conv_id", text_col: str = "text",
                  bucket_cap: int = 4096,
                  stop_turn_df: int | None = CONV_STOP_TURN_DF):
    """Near-duplicate CONVERSATION detection (MinHash-LSH over the SET
    of per-turn content hashes).

    A conversation is summarized by the set of 64-bit polynomial
    hashes of its turn texts (:func:`...dedup.polynomial_string_hashes`
    — the corpus-wide documented fold); two conversations sharing most
    turns verbatim (re-dumped threads with small edits — the
    conv-granularity analogue of document near-dup) collide on MinHash
    bands. K=8 signature mins (:data:`CONV_MINHASH_TRANSFORMS`), bands
    of :data:`CONV_BAND_ROWS`; emits candidate pairs
    (conv_a < conv_b, n_shared_bands) — downstream verification or
    :func:`...dedup.near_dup_safe_split`-style grouping consumes them.

    SIGNATURE-IDENTICAL conversations (exact duplicates, and edits
    that never displace a min) are collapsed to their lexicographic
    min-conv REPRESENTATIVE before banding: each non-representative
    member emits ONE (rep, member) pair with n_shared_bands = the full
    band count (identical signatures share every band by definition),
    and only representatives enter the LSH buckets. A 100k-strong
    exact-dup cluster (empty convs, canned test threads — routine in
    web-scale corpora) therefore costs O(k) member pairs instead of a
    C(k,2) clique. The pair list is the SPANNING structure of each
    candidate group, not the full clique — connected components are
    identical; consumers needing cliques expand within signature
    groups.

    STOP TURNS: a turn text occurring more than ``stop_turn_df`` times
    corpus-wide (empty strings, "ok", canned greetings) carries no
    near-dup signal but DOMINATES the mins — two unrelated
    conversations sharing two ubiquitous turns collide on a band, so
    boilerplate inflates buckets with unrelated distinct signatures.
    Such turns are removed before signatures (the stop-shingle-removal
    semantics of ngram_jaccard's df_cap, at turn granularity);
    conversations consisting ONLY of stop turns drop out of the
    candidate set entirely (exact-dup handling is
    :func:`conv_exact_dedup`'s job). ``stop_turn_df=None`` disables
    the filter. The stop set is computed with one int-row aggregate
    and broadcast (it is vocabulary-sized — a loud guard fires past
    5M entries).

    Scale shape: turn hashing and all K transforms run in-block over
    the text ONCE per pass (text never shuffles); exchange 0 counts
    turn-hash occurrences (pre-combined int rows) to find stop turns;
    exchange 1 is a conv-keyed sorted-run MIN over K ints per turn;
    exchange 2 collapses signature groups (K-int keys); exchange 3
    groups the K/r band rows per representative by (band, key) and
    emits pairs inside each bucket; exchange 4 sums shared-band counts
    per pair. A bucket with more than ``bucket_cap`` DISTINCT
    signatures still raises loudly (a template family below the stop
    cutoff that LSH granularity cannot separate; lower
    CONV_BAND_ROWS, lower stop_turn_df, or raise bucket_cap) — but
    duplicate clusters and boilerplate no longer trip it.

    DELIBERATE re-scan: the stop-count pass and the transforms pass
    each stream the (conv, text) projection from source — the text is
    NOT materialized between them, and neither are the per-turn hash
    rows (at 10^12 turns either would pin ~corpus-scale bytes in the
    object store; a second streaming source scan is the cheaper
    resource). At small inputs this shows up as one extra
    fixed-cost pipeline execution — noise at scale.
    """
    from cleanlab_ray.stages.dedup import polynomial_string_hashes

    n_bands = len(CONV_MINHASH_TRANSFORMS) // CONV_BAND_ROWS
    cap = int(bucket_cap)

    slim_in = ds.select_columns([conv_col, text_col])

    stop_sorted = np.empty(0, dtype=np.uint64)
    if stop_turn_df is not None:
        sdf = np.int64(stop_turn_df)

        def hash_counts(batch: pa.Table) -> pa.Table:
            _require_conv(batch, conv_col)
            h = polynomial_string_hashes(batch[text_col])
            uniq, cnt = np.unique(h, return_counts=True)
            return pa.table({
                "h": pa.array(uniq.astype(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        df = sorted_group_agg(
            slim_in.map_batches(hash_counts, batch_format="pyarrow"),
            "h", {"cnt": "sum"})

        def only_stop(batch: pa.Table) -> pa.Table:
            keep = pc.greater(batch["sum(cnt)"], pa.scalar(int(sdf)))
            return batch.filter(keep).select(["h"])

        # materialize ONCE, guard on the count BEFORE pulling rows to
        # the driver (take_all first would OOM the driver exactly in
        # the case the guard exists for), then pull the single int
        # column Arrow-natively
        stop_rows = df.map_batches(
            only_stop, batch_format="pyarrow").materialize()
        n_stop = stop_rows.count()
        if n_stop > _STOP_SET_MAX:
            raise ValueError(
                f"conv_near_dup: stop-turn set has {n_stop} "
                f"entries (> {_STOP_SET_MAX}) — raise stop_turn_df")
        if n_stop:
            stop_sorted = np.sort(
                stop_rows.to_pandas()["h"].to_numpy(
                    dtype=np.int64).astype(np.uint64))

    def transforms(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        h = polynomial_string_hashes(batch[text_col])  # uint64
        conv = batch[conv_col]
        if len(stop_sorted):
            pos = np.searchsorted(stop_sorted, h)
            pos = np.minimum(pos, len(stop_sorted) - 1)
            keep = stop_sorted[pos] != h
            if not keep.all():
                h = h[keep]
                conv = conv.filter(pa.array(keep)) if not isinstance(
                    conv, pa.ChunkedArray) else conv.combine_chunks().filter(
                    pa.array(keep))
        cols = {conv_col: conv}
        for k, (a, b) in enumerate(CONV_MINHASH_TRANSFORMS):
            m = (h * np.uint64(a) + np.uint64(b)) & _MASK63
            cols[f"m{k}"] = pa.array(m.astype(np.int64))
        return pa.table(cols)

    sig = sorted_group_agg(
        slim_in.map_batches(transforms, batch_format="pyarrow"),
        conv_col,
        {f"m{k}": "min" for k in range(len(CONV_MINHASH_TRANSFORMS))},
    )

    K = len(CONV_MINHASH_TRANSFORMS)
    mcols = [f"min(m{k})" for k in range(K)]

    def collapse(batch: pa.Table) -> pa.Table:
        ct = batch[conv_col].type
        if batch.num_rows == 0:
            return pa.table({
                conv_col: pa.array([], ct),
                **{c: pa.array([], pa.int64()) for c in mcols},
                "mate": pa.array([], ct),
                "is_rep": pa.array([], pa.bool_()),
            })
        arrs = [batch[c].to_numpy(zero_copy_only=False) for c in mcols]
        starts = _run_starts(*arrs)
        lens = np.diff(np.append(starts, batch.num_rows))
        conv = batch[conv_col].to_numpy(zero_copy_only=False)
        rid = np.repeat(np.arange(len(starts)), lens)
        order = np.lexsort((conv, rid))
        conv2 = conv[order]
        rep = conv2[starts]                     # lexicographic min per group
        rep_rows = {
            conv_col: pa.array(rep, type=ct),
            **{c: pa.array(a[starts].astype(np.int64))
               for c, a in zip(mcols, arrs)},
            "mate": pa.array([""] * len(starts), type=ct),
            "is_rep": pa.array(np.ones(len(starts), dtype=bool)),
        }
        member_mask = np.ones(batch.num_rows, dtype=bool)
        member_mask[starts] = False             # drop the rep itself
        n_mem = int(member_mask.sum())
        if not n_mem:
            return pa.table(rep_rows)
        rep_per_row = np.repeat(rep, lens)
        mem_rows = {
            conv_col: pa.array(rep_per_row[member_mask], type=ct),
            **{c: pa.array(np.zeros(n_mem, dtype=np.int64)) for c in mcols},
            "mate": pa.array(conv2[member_mask], type=ct),
            "is_rep": pa.array(np.zeros(n_mem, dtype=bool)),
        }
        return pa.concat_tables([pa.table(rep_rows), pa.table(mem_rows)])

    collapsed = _sorted_block_map(sig, mcols, collapse).materialize()

    def take_reps(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["is_rep"], True)) \
            if batch.num_rows else batch
        return pa.table({conv_col: b[conv_col],
                         **{c: b[c] for c in mcols}})

    def take_member_pairs(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["is_rep"], False)) \
            if batch.num_rows else batch
        n = b.num_rows
        return pa.table({
            "conv_a": b[conv_col],
            "conv_b": b["mate"],
            "n": pa.array(np.full(n, K // CONV_BAND_ROWS, dtype=np.int64)),
        })

    reps = collapsed.map_batches(take_reps, batch_format="pyarrow")
    member_pairs = collapsed.map_batches(take_member_pairs,
                                         batch_format="pyarrow")

    def band_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        convs, bands, keys = [], [], []
        for b in range(n_bands):
            lo = batch[f"min(m{CONV_BAND_ROWS * b})"].to_numpy(
                zero_copy_only=False).astype(np.uint64)
            hi = batch[f"min(m{CONV_BAND_ROWS * b + 1})"].to_numpy(
                zero_copy_only=False).astype(np.uint64)
            key = (((lo * np.uint64(0x9E3779B1)) & _MASK63) ^ hi) & _MASK63
            convs.append(batch[conv_col])
            bands.append(np.full(n, b, dtype=np.int32))
            keys.append(key.astype(np.int64))
        if not n:
            return pa.table({
                conv_col: pa.array([], batch[conv_col].type),
                "band": pa.array([], pa.int32()),
                "key": pa.array([], pa.int64()),
            })
        return pa.table({
            conv_col: pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                 for c in convs]),
            "band": pa.array(np.concatenate(bands)),
            "key": pa.array(np.concatenate(keys)),
        })

    banded = reps.map_batches(band_rows, batch_format="pyarrow")

    def emit_pairs(batch: pa.Table) -> pa.Table:
        from cleanlab_ray.stages.dedup import _pairs_within_runs

        empty = pa.table({
            "conv_a": pa.array([], batch[conv_col].type),
            "conv_b": pa.array([], batch[conv_col].type),
            "n": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        band = batch["band"].to_numpy(zero_copy_only=False)
        key = batch["key"].to_numpy(zero_copy_only=False)
        starts = _run_starts(band, key)
        lens = np.diff(np.append(starts, len(band)))
        if int(lens.max()) > cap:
            raise ValueError(
                f"conv_near_dup: a band bucket holds {int(lens.max())} "
                f"DISTINCT signatures (> bucket_cap={cap}) — a template "
                "family the LSH granularity cannot separate; lower "
                "CONV_BAND_ROWS, pre-filter the family, or raise "
                "bucket_cap")
        # order conv ids inside each run so pairs come out (a < b)
        conv = batch[conv_col].to_numpy(zero_copy_only=False)
        rid = np.repeat(np.arange(len(starts)), lens)
        order = np.lexsort((conv, rid))
        conv2 = conv[order]
        ia, ib = _pairs_within_runs(starts, lens)
        if not len(ia):
            return empty
        return pa.table({
            "conv_a": pa.array(conv2[ia], type=batch[conv_col].type),
            "conv_b": pa.array(conv2[ib], type=batch[conv_col].type),
            "n": pa.array(np.ones(len(ia), dtype=np.int64)),
        })

    pairs = _sorted_block_map(banded, ["band", "key"], emit_pairs)
    agg = sorted_group_agg(pairs.union(member_pairs),
                           ["conv_a", "conv_b"], {"n": "sum"})

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_a": batch["conv_a"],
            "conv_b": batch["conv_b"],
            "n_shared_bands": batch["sum(n)"],
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def conv_lang_mix(ds, conv_col: str = "conv_id", turn_col: str = "turn_idx",
                  lang_col: str = "lang"):
    """Per-conversation language-consistency audit.

    Over any per-turn language column (the :mod:`..turn_scorer` langid
    stage's output in production, or an upstream label): one row per
    conversation with at least one non-null lang — n_turns (non-null
    lang), n_langs (distinct), majority_lang (most frequent; ties
    break to the lexicographically smallest so the result is
    deterministic), majority_share_e6 (fixed-point majority fraction)
    and n_switches (adjacent turns, in turn order, whose langs
    differ) — the code-switching / mixed-language-conversation filter
    signal. Null-lang turns are dropped (documented contract, matching
    the SQL twin's ``lang IS NOT NULL``).

    Scale shape: (conv, turn, lang-code) projected BEFORE the
    exchange; ONE conv-colocating sort; vectorized in-block
    dictionary-encode + lexsort + reduceat per conversation run.
    """

    def slim(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        keep = pc.is_valid(batch[lang_col])
        b = batch.filter(keep) if batch.num_rows else batch
        return pa.table({
            conv_col: b[conv_col],
            turn_col: pc.cast(b[turn_col], pa.int32()),
            lang_col: pc.cast(b[lang_col], pa.string()),
        })

    def per_conv(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                conv_col: pa.array([], batch[conv_col].type),
                "n_turns": pa.array([], pa.int64()),
                "n_langs": pa.array([], pa.int64()),
                "majority_lang": pa.array([], pa.string()),
                "majority_share_e6": pa.array([], pa.int64()),
                "n_switches": pa.array([], pa.int64()),
            })
        conv = batch[conv_col].to_numpy(zero_copy_only=False)
        turn = batch[turn_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lcol = batch[lang_col]
        lc = lcol.combine_chunks() if isinstance(
            lcol, pa.ChunkedArray) else lcol
        enc = lc.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        # rank[c] = position of vocab[c] in lexicographic order, so
        # "smaller rank" == "lexicographically smaller lang"
        rank = np.empty(len(vocab), dtype=np.int64)
        rank[np.argsort(vocab)] = np.arange(len(vocab))
        starts = _run_starts(conv)
        nrun = np.diff(np.append(starts, len(conv)))
        rid = np.repeat(np.arange(len(starts)), nrun)
        # switches: adjacent turns in turn order with different langs
        o = np.lexsort((turn, rid))
        r2, c2 = rid[o], code[o]
        adj = (r2[1:] == r2[:-1]) & (c2[1:] != c2[:-1])
        sw = np.zeros(len(starts), dtype=np.int64)
        np.add.at(sw, r2[1:][adj], 1)
        # per-(conv, lang) counts: group by (rid, code)
        o2 = np.lexsort((code, rid))
        rg, cg = rid[o2], code[o2]
        gs = _run_starts(rg, cg)
        gcount = np.diff(np.append(gs, len(rg))).astype(np.int64)
        grid, gcode = rg[gs], cg[gs]
        n_langs = np.zeros(len(starts), dtype=np.int64)
        np.add.at(n_langs, grid, 1)
        # majority per conv: max count, ties -> smallest lexicographic
        o3 = np.lexsort((rank[gcode], -gcount, grid))
        first = _run_starts(grid[o3])
        maj_rid = grid[o3][first]
        maj_code = gcode[o3][first]
        maj_count = gcount[o3][first]
        share = np.floor(
            maj_count * 1_000_000.0 / nrun[maj_rid] + 0.5).astype(np.int64)
        return pa.table({
            conv_col: pa.array(conv[starts][maj_rid]),
            "n_turns": pa.array(nrun[maj_rid].astype(np.int64)),
            "n_langs": pa.array(n_langs[maj_rid]),
            "majority_lang": pa.array(vocab[maj_code], type=pa.string()),
            "majority_share_e6": pa.array(share),
            "n_switches": pa.array(sw[maj_rid]),
        })

    slimmed = ds.select_columns([conv_col, turn_col, lang_col]).map_batches(
        slim, batch_format="pyarrow")
    return _sorted_block_map(slimmed, conv_col, per_conv)


def conv_audit_full(ds, budget_chars: int = CONTEXT_BUDGET_CHARS,
                    session_gap_us: int = SESSION_GAP_US,
                    loop_min: int = TOOL_LOOP_MIN,
                    refusal_pattern: str = REFUSAL_PATTERN,
                    conv_col: str = "conv_id", turn_col: str = "turn_idx",
                    role_col: str = "role", text_col: str = "text",
                    tool_col: str = "tool", ts_col: str = "ts"):
    """FUSED per-conversation audit: every conv-keyed audit family in
    ONE sort exchange.

    Computes, per conversation, the union of
    :func:`conv_structure_stats` (role mix / char volume / contiguity),
    :func:`turn_latency` (gap stats incl. zero/negative anomalies and
    user->assistant response gaps), :func:`latency_sessions`
    (idle-gap sessionization), :func:`tool_loops` (same-tool runs),
    :func:`refusal_rate`, :func:`pii_density` and
    :func:`context_growth` — the individual operators each pay one
    conv-colocating sort; at 10^12 turns running all seven audits
    means SEVEN all-to-all exchanges over the same corpus. This
    operator computes every per-turn feature (role flags, regex
    passes, char lengths) in ONE in-block map, rides ONE exchange of
    small-int rows (text never shuffles, regexes run once), and emits
    the full audit row per conversation.

    Value parity with the individual operators (enforced by
    tests/test_transcripts.py::test_conv_audit_full_parity):
    identical values column-for-column, with these documented
    normalizations —
    - conversations with NO tool calls get n_tool_runs/max_tool_run/
      n_loops = 0 (tool_loops omits them);
    - conversations with NO valid timestamp get the latency/session
      families zeroed with n_ts_turns = 0 (turn_latency /
      latency_sessions omit them), and span_seconds is computed over
      ts-valid turns only;
    - latency's per-family turn count is emitted as ``n_ts_turns``
      (its ``n_turns`` name collides with structure's all-rows count).
    """
    from cleanlab_ray.stages.scrub import SCRUB_PATTERNS

    pii_names = [n for n, _, _ in SCRUB_PATTERNS]
    budget = int(budget_chars)
    gap_thresh = np.int64(session_gap_us)
    lm = int(loop_min)
    _SENT = np.int64(2**62)

    def slim(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        role = pc.fill_null(batch[role_col], "")
        txt = pc.fill_null(batch[text_col], "")
        is_a = pc.equal(role, "assistant")
        hit = pc.match_substring_regex(txt, refusal_pattern)
        cols = {
            conv_col: batch[conv_col],
            turn_col: pc.cast(batch[turn_col], pa.int32()),
            "is_user": pc.cast(pc.equal(role, "user"), pa.int8()),
            "is_asst": pc.cast(is_a, pa.int8()),
            "is_tool": pc.cast(pc.equal(role, "tool"), pa.int8()),
            "has_tool": pc.cast(pc.is_valid(batch[tool_col]), pa.int8()),
            "tool": pc.cast(batch[tool_col], pa.string()),
            "ts_valid": pc.cast(pc.is_valid(batch[ts_col]), pa.int8()),
            "ts_us": pc.fill_null(pc.cast(batch[ts_col], pa.int64()), 0),
            "refusal": pc.cast(pc.and_(is_a, hit), pa.int8()),
            "nchars": pc.cast(pc.utf8_length(txt), pa.int64()),
        }
        for name, pattern, _ in SCRUB_PATTERNS:
            cols[f"pii_{name}"] = pc.cast(
                pc.count_substring_regex(txt, pattern), pa.int64())
        return pa.table(cols)

    out_schema = [
        ("n_turns", pa.int64()), ("n_user", pa.int64()),
        ("n_assistant", pa.int64()), ("n_tool", pa.int64()),
        ("n_tool_calls", pa.int64()), ("chars_user", pa.int64()),
        ("chars_assistant", pa.int64()), ("span_seconds", pa.int64()),
        ("contiguous", pa.bool_()),
        ("n_ts_turns", pa.int64()), ("n_gaps", pa.int64()),
        ("gap_min_us", pa.int64()), ("gap_max_us", pa.int64()),
        ("gap_sum_us", pa.int64()), ("n_zero_gaps", pa.int64()),
        ("n_neg_gaps", pa.int64()), ("n_ua_gaps", pa.int64()),
        ("ua_gap_sum_us", pa.int64()),
        ("n_sessions", pa.int64()), ("max_session_turns", pa.int64()),
        ("idle_us", pa.int64()),
        ("n_tool_runs", pa.int64()), ("max_tool_run", pa.int64()),
        ("n_loops", pa.int64()),
        ("n_refusals", pa.int64()), ("refusal_frac_e6", pa.int64()),
        ("first_refusal_turn", pa.int64()),
        *[(f"n_{n}", pa.int64()) for n in pii_names],
        ("n_matches", pa.int64()), ("n_pii_turns", pa.int64()),
        ("total_chars", pa.int64()), ("first_overflow_turn", pa.int32()),
        ("n_overflow_turns", pa.int64()),
    ]

    def per_conv(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            out = {conv_col: pa.array([], batch[conv_col].type)}
            out.update({n: pa.array([], t) for n, t in out_schema})
            return pa.table(out)
        conv = batch[conv_col].to_numpy(zero_copy_only=False)
        turn = batch[turn_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g = {c: batch[c].to_numpy(zero_copy_only=False)
             for c in ("is_user", "is_asst", "is_tool", "has_tool",
                       "ts_valid", "ts_us", "refusal", "nchars")}
        starts = _run_starts(conv)
        nconv = len(starts)
        nrun = np.diff(np.append(starts, len(conv))).astype(np.int64)
        rid = np.repeat(np.arange(nconv), nrun)

        def rsum(v):
            return np.add.reduceat(v.astype(np.int64), starts)

        # ---- structure ----
        n_user, n_asst, n_tool = (rsum(g["is_user"]), rsum(g["is_asst"]),
                                  rsum(g["is_tool"]))
        n_tool_calls = rsum(g["has_tool"])
        nchars = g["nchars"].astype(np.int64)
        chars_user = np.add.reduceat(nchars * g["is_user"], starts)
        chars_asst = np.add.reduceat(nchars * g["is_asst"], starts)
        tmin = np.minimum.reduceat(turn, starts)
        tmax = np.maximum.reduceat(turn, starts)
        contiguous = (tmin == 0) & (tmax + 1 == nrun)

        # ---- turn-ordered view (all rows) ----
        o = np.lexsort((turn, rid))
        r2, t2 = rid[o], turn[o]

        # ---- context growth (all rows, turn order) ----
        l2 = nchars[o]
        s2 = _run_starts(r2)
        cum = np.cumsum(l2)
        base = np.repeat(np.concatenate(([0], cum[s2[1:] - 1])),
                         np.diff(np.append(s2, len(r2))))
        cum = cum - base
        over = cum > budget
        total_chars = np.add.reduceat(l2, s2)
        n_over = np.add.reduceat(over.astype(np.int64), s2)
        cum_over = np.cumsum(over)
        first_idx = np.searchsorted(cum_over, 1 + np.concatenate(
            ([0], cum_over[s2[1:] - 1])))
        first_over = np.where(n_over > 0,
                              t2[np.minimum(first_idx, len(t2) - 1)],
                              -1).astype(np.int32)

        # ---- refusals ----
        n_ref = rsum(g["refusal"])
        ref_first_key = np.where(g["refusal"].astype(bool), turn, _SENT)
        first_ref = np.minimum.reduceat(ref_first_key, starts)
        first_ref = np.where(n_ref > 0, first_ref, -1).astype(np.int64)
        ref_frac = np.where(
            n_asst > 0,
            np.floor(n_ref * 1_000_000.0 / np.maximum(n_asst, 1) + 0.5),
            0.0).astype(np.int64)

        # ---- pii ----
        pii_cols = {}
        pii_total_rows = np.zeros(len(conv), dtype=np.int64)
        for name in pii_names:
            v = batch[f"pii_{name}"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            pii_total_rows += v
            pii_cols[f"n_{name}"] = np.add.reduceat(v, starts)
        n_matches = np.add.reduceat(pii_total_rows, starts)
        n_pii_turns = np.add.reduceat(
            (pii_total_rows > 0).astype(np.int64), starts)

        # ---- latency + sessions over the ts-valid subset ----
        tv = g["ts_valid"].astype(bool)
        tvo = tv[o]
        vo = o[tvo]
        rv, tsv = rid[vo], g["ts_us"][vo].astype(np.int64)
        iuv, iav = g["is_user"][vo].astype(bool), g["is_asst"][vo].astype(bool)
        sv = _run_starts(rv)
        n_ts = np.zeros(nconv, dtype=np.int64)
        lat = {k: np.zeros(nconv, dtype=np.int64)
               for k in ("n_gaps", "gap_min_us", "gap_max_us", "gap_sum_us",
                         "n_zero_gaps", "n_neg_gaps", "n_ua_gaps",
                         "ua_gap_sum_us", "n_sessions", "max_session_turns",
                         "idle_us")}
        span = np.zeros(nconv, dtype=np.int64)
        if len(rv):
            vrids = rv[sv]
            n_ts[vrids] = np.diff(np.append(sv, len(rv)))
            span[vrids] = (np.maximum.reduceat(tsv, sv)
                           - np.minimum.reduceat(tsv, sv)) // 1_000_000
            gap = np.diff(tsv)
            internal = np.ones(len(gap), dtype=bool)
            internal[sv[1:] - 1] = False
            grid_all = rv[1:]

            def scatter(mask, vals, op, out):
                m = internal & mask
                if not m.any():
                    return
                gr, gv2 = grid_all[m], vals[m]
                srt = np.argsort(gr, kind="stable")
                gr, gv2 = gr[srt], gv2[srt]
                rs = _run_starts(gr)
                out[gr[rs]] = op.reduceat(gv2, rs)

            ones = np.ones(len(gap), dtype=np.int64)
            scatter(np.ones(len(gap), bool), ones, np.add, lat["n_gaps"])
            scatter(np.ones(len(gap), bool), gap, np.minimum,
                    lat["gap_min_us"])
            scatter(np.ones(len(gap), bool), gap, np.maximum,
                    lat["gap_max_us"])
            scatter(np.ones(len(gap), bool), gap, np.add, lat["gap_sum_us"])
            scatter(np.ones(len(gap), bool), (gap == 0).astype(np.int64),
                    np.add, lat["n_zero_gaps"])
            scatter(np.ones(len(gap), bool), (gap < 0).astype(np.int64),
                    np.add, lat["n_neg_gaps"])
            ua = iuv[:-1] & iav[1:]
            scatter(ua, ones, np.add, lat["n_ua_gaps"])
            scatter(ua, gap, np.add, lat["ua_gap_sum_us"])
            lat["gap_min_us"][lat["n_gaps"] == 0] = 0
            lat["gap_max_us"][lat["n_gaps"] == 0] = 0
            # sessions
            split = internal & (gap > gap_thresh)
            brk = np.zeros(len(rv), dtype=bool)
            brk[sv] = True
            brk[1:] |= split
            isl = np.cumsum(brk) - 1
            is_ = _run_starts(isl)
            sess_len = np.diff(np.append(is_, len(isl))).astype(np.int64)
            sess_rid = rv[is_]
            cs = _run_starts(sess_rid)
            lat["n_sessions"][sess_rid[cs]] = np.diff(
                np.append(cs, len(sess_rid)))
            lat["max_session_turns"][sess_rid[cs]] = np.maximum.reduceat(
                sess_len, cs)
            scatter(gap > gap_thresh, gap, np.add, lat["idle_us"])

        # ---- tool loops (all rows, turn order) ----
        tcol = batch["tool"]
        tc = tcol.combine_chunks() if isinstance(
            tcol, pa.ChunkedArray) else tcol
        enc = tc.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False)
        code = (code.astype(np.int64) if code.dtype.kind in "iu"
                else np.nan_to_num(code.astype(np.float64),
                                   nan=-1).astype(np.int64))
        valid_tool = tc.is_valid().to_numpy(zero_copy_only=False)
        code = np.where(valid_tool, code, -1)
        c2 = code[o]
        n_tool_runs = np.zeros(nconv, dtype=np.int64)
        max_tool_run = np.zeros(nconv, dtype=np.int64)
        n_loops = np.zeros(nconv, dtype=np.int64)
        m = c2 != -1
        if m.any():
            brk2 = np.ones(len(r2), dtype=bool)
            if len(r2) > 1:
                brk2[1:] = (r2[1:] != r2[:-1]) | (c2[1:] != c2[:-1])
            brk2 |= c2 == -1
            isl2 = np.cumsum(brk2) - 1
            isl_m, rid_m = isl2[m], r2[m]
            rs = _run_starts(isl_m)
            run_len = np.diff(np.append(rs, len(isl_m))).astype(np.int64)
            run_rid = rid_m[rs]
            srt = np.argsort(run_rid, kind="stable")
            run_rid, run_len = run_rid[srt], run_len[srt]
            cs2 = _run_starts(run_rid)
            tgt = run_rid[cs2]
            n_tool_runs[tgt] = np.diff(np.append(cs2, len(run_rid)))
            max_tool_run[tgt] = np.maximum.reduceat(run_len, cs2)
            n_loops[tgt] = np.add.reduceat(
                (run_len >= lm).astype(np.int64), cs2)

        vals = {
            "n_turns": nrun, "n_user": n_user, "n_assistant": n_asst,
            "n_tool": n_tool, "n_tool_calls": n_tool_calls,
            "chars_user": chars_user, "chars_assistant": chars_asst,
            "span_seconds": span, "contiguous": contiguous,
            "n_ts_turns": n_ts, **lat,
            "n_tool_runs": n_tool_runs, "max_tool_run": max_tool_run,
            "n_loops": n_loops,
            "n_refusals": n_ref, "refusal_frac_e6": ref_frac,
            "first_refusal_turn": first_ref,
            **pii_cols, "n_matches": n_matches, "n_pii_turns": n_pii_turns,
            "total_chars": total_chars, "first_overflow_turn": first_over,
            "n_overflow_turns": n_over,
        }
        out = {conv_col: pa.array(conv[starts])}
        for name, typ in out_schema:
            out[name] = pa.array(vals[name], type=typ)
        return pa.table(out)

    cols = [conv_col, turn_col, role_col, text_col, tool_col, ts_col]
    slimmed = ds.select_columns(cols).map_batches(
        slim, batch_format="pyarrow")
    return _sorted_block_map(slimmed, conv_col, per_conv)


def conv_dedup_safe_split(ds, train_frac: float = 0.9,
                          conv_col: str = "conv_id",
                          text_col: str = "text",
                          bucket_cap: int = 4096):
    """Near-duplicate-aware CONVERSATION train/holdout split: every
    transitive :func:`conv_near_dup` candidate group lands on one side
    — the conversation-granularity analogue of
    :func:`...dedup.near_dup_safe_split` (re-dumped threads with small
    edits can no longer straddle the split and leak train content
    into eval). Candidate semantics are conservative BY DESIGN: a
    false-positive band collision (or a node-hash collision,
    P≈n²/2^63) only merges MORE conversations onto one side — never a
    leak.

    Side assignment: group root = the MINIMUM 63-bit polynomial hash
    of the member conversation ids; side = the same salted Knuth hash
    of the root that the document-level splits use
    (:data:`...dedup.LEAK_SPLIT_SALT`), so the split is deterministic,
    partitioning-independent and decorrelated from the
    mixture/fold/export hashes.

    Exchange shape: conv_near_dup's three small-int exchanges, a
    candidate-edge component closure (stages/components.py — driver-
    local for any realistic dup-graph size, distributed pointer
    jumping past 2M edges), then ONE node-keyed merge exchange
    unioning component rows with per-conversation identity rows (so
    isolated conversations assign themselves; no broadcast map).
    """
    if not 0.0 <= train_frac <= 1.0:
        raise ValueError(f"train_frac must be in [0, 1], got {train_frac}")
    import ray.data as rd  # noqa: F401  (Dataset.union used below)

    from cleanlab_ray.stages.components import connected_components
    from cleanlab_ray.stages.dedup import (
        LEAK_SPLIT_SALT,
        polynomial_string_hashes,
    )

    thr = int(round(train_frac * 1_000_000))

    def conv_node(col) -> np.ndarray:
        return (polynomial_string_hashes(col) & _MASK63).astype(np.int64)

    pairs = conv_near_dup(ds, conv_col=conv_col, text_col=text_col,
                          bucket_cap=bucket_cap)

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node_a": pa.array(conv_node(batch["conv_a"])),
            "node_b": pa.array(conv_node(batch["conv_b"])),
        })

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")
    comp = connected_components(edges, src_col="node_a", dst_col="node_b")

    # identity rows are distinguished from component rows by an
    # explicit flag, NOT a sentinel conv value — an empty-string
    # conv_id is a legal (non-null) key and must survive the merge
    def comp_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "node": batch["node"],
            conv_col: pa.array([""] * n, type=pa.string()),
            "root": batch["component"],
            "is_ident": pa.array(np.zeros(n, dtype=bool)),
        })

    def ident_rows(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        col = batch[conv_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        conv = np.unique(np.asarray(col.to_pylist(), dtype=object))
        nodes = conv_node(pa.array(conv, type=pa.string()))
        return pa.table({
            "node": pa.array(nodes),
            conv_col: pa.array(conv, type=pa.string()),
            "root": pa.array(nodes),
            "is_ident": pa.array(np.ones(len(conv), dtype=bool)),
        })

    a = comp.map_batches(comp_rows, batch_format="pyarrow")
    b = ds.select_columns([conv_col]).map_batches(
        ident_rows, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            conv_col: pa.array([], pa.string()),
            "group_root": pa.array([], pa.int64()),
            "split": pa.array([], pa.string()),
        })
        if batch.num_rows == 0:
            return empty
        node = batch["node"].to_numpy(zero_copy_only=False)
        root = batch["root"].to_numpy(zero_copy_only=False).astype(np.int64)
        conv = np.asarray(batch[conv_col].to_pylist(), dtype=object)
        starts = _run_starts(node)
        rid = np.repeat(np.arange(len(starts)),
                        np.diff(np.append(starts, len(node))))
        run_root = np.minimum.reduceat(root, starts)
        keep = batch["is_ident"].to_numpy(zero_copy_only=False).astype(bool)
        if not keep.any():
            return empty
        kr, kc = rid[keep], conv[keep]
        # distinct convs per run (identity rows are per-block unique,
        # so duplicates only arise from multi-block conversations)
        order = np.lexsort((kc, kr))
        kr, kc = kr[order], kc[order]
        first = np.ones(len(kr), dtype=bool)
        first[1:] = (kr[1:] != kr[:-1]) | (kc[1:] != kc[:-1])
        kr, kc = kr[first], kc[first]
        groot = run_root[kr]
        u = ((groot.astype(np.uint64) ^ LEAK_SPLIT_SALT)
             * np.uint64(2654435761)) % np.uint64(1 << 32) % np.uint64(1_000_000)
        return pa.table({
            conv_col: pa.array(kc, type=pa.string()),
            "group_root": pa.array(groot),
            "split": pa.array(np.where(u < np.uint64(thr), "train",
                                       "holdout"), type=pa.string()),
        })

    return _sorted_block_map(a.union(b), "node", merge)


def boilerplate_turns(ds, stop_turn_df: int = CONV_STOP_TURN_DF,
                      conv_col: str = "conv_id", turn_col: str = "turn_idx",
                      text_col: str = "text"):
    """Per-turn boilerplate flag: a turn is BOILERPLATE when its exact
    text occurs more than ``stop_turn_df`` times corpus-wide (empty
    strings, "ok", canned greetings/closings) — the turn-granularity
    counterpart of CCNet line dedup, and the filter you run before
    training so ubiquitous turns don't dominate the loss. Emits every
    turn with ``is_boilerplate`` and ``boilerplate_df`` (the corpus
    occurrence count for flagged turns; 0 otherwise — per-turn df for
    NON-boilerplate turns is deliberately not materialized, keeping
    the broadcast vocabulary-sized).

    Scale shape: one pre-combined int aggregate counts turn-hash
    occurrences (the same exchange :func:`conv_near_dup`'s stop-turn
    stage uses); the flagged set is vocabulary-sized and broadcast
    (loud guard past 5M entries); the output pass is MAP-ONLY — no
    sort exchange touches the turns, text never shuffles.
    """
    from cleanlab_ray.stages.dedup import polynomial_string_hashes

    sdf = np.int64(stop_turn_df)
    slim_in = ds.select_columns([conv_col, turn_col, text_col])

    def hash_counts(batch: pa.Table) -> pa.Table:
        _require_conv(batch, conv_col)
        h = polynomial_string_hashes(batch[text_col])
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({
            "h": pa.array(uniq.astype(np.int64)),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    df = sorted_group_agg(
        slim_in.map_batches(hash_counts, batch_format="pyarrow"),
        "h", {"cnt": "sum"})

    def only_stop(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch["sum(cnt)"], pa.scalar(int(sdf)))
        return batch.filter(keep)

    stop_rows = df.map_batches(only_stop, batch_format="pyarrow").materialize()
    n_stop = stop_rows.count()
    if n_stop > _STOP_SET_MAX:
        raise ValueError(
            f"boilerplate_turns: flagged-text set has {n_stop} entries "
            f"(> {_STOP_SET_MAX}) — raise stop_turn_df")
    if n_stop:
        pdf = stop_rows.to_pandas()
        order = np.argsort(pdf["h"].to_numpy(dtype=np.int64)
                           .astype(np.uint64), kind="stable")
        stop_h = pdf["h"].to_numpy(dtype=np.int64).astype(np.uint64)[order]
        stop_c = pdf["sum(cnt)"].to_numpy(dtype=np.int64)[order]
    else:
        stop_h = np.empty(0, dtype=np.uint64)
        stop_c = np.empty(0, dtype=np.int64)

    def flag(batch: pa.Table) -> pa.Table:
        h = polynomial_string_hashes(batch[text_col])
        if len(stop_h):
            pos = np.searchsorted(stop_h, h)
            pos = np.minimum(pos, len(stop_h) - 1)
            hit = stop_h[pos] == h
            dfv = np.where(hit, stop_c[pos], 0).astype(np.int64)
        else:
            hit = np.zeros(len(h), dtype=bool)
            dfv = np.zeros(len(h), dtype=np.int64)
        return pa.table({
            conv_col: batch[conv_col],
            turn_col: pc.cast(batch[turn_col], pa.int32()),
            "is_boilerplate": pa.array(hit),
            "boilerplate_df": pa.array(dfv),
        })

    return slim_in.map_batches(flag, batch_format="pyarrow")
