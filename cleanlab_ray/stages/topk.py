"""Per-group top-k selection with map-side pruning.

"Keep the k best examples per source/domain/shard" is a standard
training-data curation step that Ray Data has no primitive for (a
global ``sort`` + driver cut does not bound per-group output, and
``map_groups`` shuffles every row). This operator shuffles at most
k rows per (group, input block):

1. map-side prune: each block lexsorts once on (group, -score, key) and
   keeps only each group's first k rows — sound because a row outside a
   block's local top-k cannot be in the global top-k (scores only get
   more competition when blocks merge);
2. one sort exchange on the group key co-locates the survivors
   (<= k x blocks rows per group);
3. the sorted block kernel re-ranks each run and keeps rank < k.

Deterministic total order: (score DESC, tie_cols ASC) — ties broken by
the caller-supplied unique key so output is reproducible and
SQL-checkable with a row_number() window oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _rank_in_runs(run_id: np.ndarray) -> np.ndarray:
    """0-based rank of each element within its (contiguous) run."""
    n = len(run_id)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.flatnonzero(np.concatenate([[True], run_id[1:] != run_id[:-1]]))
    return np.arange(n, dtype=np.int64) - np.repeat(
        starts, np.diff(np.append(starts, n))
    )


def _topk_block(batch: pa.Table, group_col: str, score_col: str,
                tie_cols: tuple[str, ...], k: int) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    g = batch[group_col]
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    enc = g.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    score = batch[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
    ties = [
        np.asarray(batch[c].to_pandas()) for c in reversed(tie_cols)
    ]
    order = np.lexsort((*ties, -score, codes))
    rank = _rank_in_runs(codes[order])
    keep_sorted = order[rank < k]
    return batch.take(pa.array(np.sort(keep_sorted)))


def grouped_top_k(
    ds,
    group_col: str,
    score_col: str,
    k: int,
    tie_cols: tuple[str, ...] = (),
):
    """Top-k rows per group by (score DESC, tie_cols ASC). Returns the
    selected rows with their original columns."""
    from cleanlab_ray.stages.dedup import _sorted_block_map

    def prune(batch: pa.Table) -> pa.Table:
        return _topk_block(batch, group_col, score_col, tie_cols, k)

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    return _sorted_block_map(
        pruned, group_col,
        lambda b: _topk_block(b, group_col, score_col, tie_cols, k),
    )


# per-operator hash salt (< 2^30 so the SQL-oracle int64 product never
# overflows): decorrelates sampling from the unsalted split/fold hash
MIXTURE_SALT = np.uint64(805306457)


def mixture_sample(ds, group_col: str, rates: dict, key_col: str,
                   default_rate: float = 0.0):
    """Deterministic per-group Bernoulli sampling — the data-mixture
    composition step (sample each source at its target rate, e.g. to
    rebalance domains before training). Coordination-free and
    restart-stable: row r of group g survives iff
    ``(key_hash(r) % 1e6) < rate[g] * 1e6`` with a SALTED Knuth
    multiplicative hash (``(id XOR 805306457) * 2654435761 mod 2^32``),
    so membership is a pure function of the row — no RNG state, no
    global pass, exactly reproducible (and SQL-replicable: DuckDB
    ``xor()``) at any scale or partitioning. The salt makes the sample
    decision independent of stratified_split / kfold (which use the
    UNSALTED hash): composing mixture_sample with a split no longer
    selects exactly the split's rows."""
    rates_e6 = {g: int(round(r * 1_000_000)) for g, r in rates.items()}
    default_e6 = int(round(default_rate * 1_000_000))

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids ^ MIXTURE_SALT) * np.uint64(2654435761)) % np.uint64(1 << 32)
        u = (h % np.uint64(1_000_000)).astype(np.int64)
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        thr_by_code = np.array(
            [rates_e6.get(v.as_py(), default_e6) for v in enc.dictionary],
            dtype=np.int64,
        )
        return batch.filter(pa.array(u < thr_by_code[codes]))

    return ds.map_batches(sample, batch_format="pyarrow")


def sorted_group_agg(ds, key_col, ops: dict):
    """Grouped aggregate as ONE sort exchange + a vectorized run
    kernel — a drop-in for ``groupby(keys).sum/max/min`` when the group
    count is large. Ray's native aggregate pays a per-group cost
    (~0.3 ms/group measured: 50k groups took 17 s where this kernel
    takes 1.3 s); this path is O(rows) numpy per block after the same
    sort exchange the native path already performs.

    ``key_col``: one key column name or a list of them.
    ``ops``: {column: "sum" | "max" | "min" | "count"}. Output columns
    are named ``{op}({col})`` like the native aggregate ("count" counts
    run rows; its column operand is only used for the output name)."""
    from cleanlab_ray.stages.dedup import _sorted_block_map

    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)

    def kernel(batch: pa.Table) -> pa.Table:
        kcols = {}
        for kc in key_cols:
            col = batch[kc]
            kcols[kc] = col.combine_chunks() if isinstance(
                col, pa.ChunkedArray) else col
        n = batch.num_rows
        if n == 0:
            out = dict(kcols)
            for c, op in ops.items():
                t = batch[c].type
                if op == "count":
                    ot = pa.int64()
                elif op == "sum":
                    # the non-empty path widens int/uint/bool to int64
                    # (numpy reduceat after astype); floats keep their
                    # type — mirror that so empty and non-empty blocks
                    # agree on schema (bool included: is_integer alone
                    # would leave an empty block typed bool)
                    ot = (pa.int64()
                          if pa.types.is_integer(t) or pa.types.is_boolean(t)
                          else t)
                else:
                    ot = t
                out[f"{op}({c})"] = pa.array([], type=ot)
            return pa.table(out)
        import pyarrow.compute as pc

        # row 0 always starts a run; later rows start one iff ANY key
        # differs from the previous row
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for kcol in kcols.values():
            try:
                kv = kcol.to_numpy(zero_copy_only=False)
                change[1:] |= kv[1:] != kv[:-1]
            except (TypeError, ValueError):
                neq = pc.invert(pc.equal(kcol.slice(1), kcol.slice(0, n - 1)))
                change[1:] |= neq.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        out = {kc: kcol.take(pa.array(starts)) for kc, kcol in kcols.items()}
        for c, op in ops.items():
            v = batch[c].to_numpy(zero_copy_only=False)
            if op == "sum":
                if v.dtype.kind in "iub":
                    v = v.astype(np.int64)
                # reduceat, NOT cumsum-differencing: cumsum's rounding
                # error scales with the PREFIX magnitude, so a small
                # group late in a block inherits the whole block's
                # accumulated error (measured 5e-7 relative on softmin
                # partials); reduceat's error scales with the group
                agg = np.add.reduceat(v, starts)
            elif op == "max":
                agg = np.maximum.reduceat(v, starts)
            elif op == "min":
                agg = np.minimum.reduceat(v, starts)
            elif op == "count":
                agg = ends - starts
            else:
                raise ValueError(f"unsupported op {op!r}")
            out[f"{op}({c})"] = pa.array(np.asarray(agg))
        return pa.table(out)

    return _sorted_block_map(ds, key_col, kernel)


def global_top_k(ds, sort_cols, k: int, descending: bool = False):
    """Exact GLOBAL top-k rows by ``sort_cols`` without a sort exchange.

    ``Dataset.sort(cols).limit(k)`` pays a full all-to-all over every
    row to keep k of them. Instead each block contributes its own
    top-k in a map-only pass — sound because any row outside a block's
    local top-k is beaten by k rows from that block alone — and the
    driver merges the O(blocks × k) survivors with one small Arrow
    sort. Ties beyond ``sort_cols`` are resolved arbitrarily, the same
    contract as sort().limit(); pass a unique trailing column for a
    total order.

    ``descending`` may be a single bool or a per-column list (matching
    ``Dataset.sort``'s signature). Returns a ``ray.data.Dataset`` of
    exactly ``min(k, n)`` rows (driver-merged, so also cheap to
    ``to_pandas()``).
    """
    import pyarrow.compute as pc
    import ray.data as rd

    cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    if isinstance(descending, (list, tuple)):
        orders = ["descending" if d else "ascending" for d in descending]
    else:
        orders = ["descending" if descending else "ascending"] * len(cols)
    keys = list(zip(cols, orders))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.sort_indices(batch, sort_keys=keys)[:k]
        return batch.take(idx)

    import ray

    small_ds = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    small = pa.concat_tables(
        ray.get(small_ds.to_arrow_refs()), promote_options="default"
    ).combine_chunks()
    if small.num_rows:
        idx = pc.sort_indices(small, sort_keys=keys)[:k]
        small = small.take(idx)
    elif len(small.schema) == 0:
        # Ray hands `partial` SCHEMA-LESS empty batches for empty input
        # blocks, so an all-empty result concatenates to a zero-column
        # table; recover the typed-empty contract from the input schema.
        sch = ds.schema()
        base = getattr(sch, "base_schema", None) if sch is not None else None
        if base is not None:
            small = base.empty_table()
    return rd.from_arrow(small)
