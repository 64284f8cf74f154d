"""Distributed connected components (min-label propagation).

Near-duplicate clusters are the connected components of the candidate
pair graph — MinHash/SimHash/Jaccard pair emitters give edges, and the
transitive closure ("A~B, B~C ⟹ one cluster") needs a component
operator. Ray Data has none; this is the classic iterated min-label
propagation, all wide steps expressed as native ``join`` / ``groupby``
exchanges:

- labels start as ``label(v) = v`` (the smallest node id wins, so
  component ids are stable, deterministic, and SQL-reproducible);
- each round hash-joins the symmetric edge list with the current
  labels on the source endpoint and takes, per destination node, the
  min over (own label, every neighbour's label);
- labels only ever decrease, so ``sum(label)`` is strictly decreasing
  until the fixpoint — convergence is one cheap scalar aggregate per
  round, no label-vs-label join;
- rounds needed = graph diameter (dup clusters are tiny and dense:
  single digits in practice; ``max_iters`` guards pathologies).

Per-round cost: one hash join + one groupby over the LABEL table
(candidate nodes only — a vanishing fraction of a 100-TB corpus), the
corpus itself is never touched. Each round materializes the label
table so the lineage doesn't re-execute the whole chain per iteration.

Reference kinship: duplicate-set construction in cleanlab's Datalab
near-duplicate manager (/root/reference/cleanlab/datalab/internal/
issue_manager/duplicate.py:59-103) keeps per-example duplicate sets;
components are their transitive closure at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _drop_empty_blocks(ds):
    """Rebuild a materialized Dataset from its non-empty block refs.

    Ray's hash join / hash groupby emit zero-row blocks with an EMPTY
    schema for output partitions that received no rows; a later join
    whose right-side partition holds only such a block fails inside
    acero ("No match for FieldRef"). Dropping them is zero-copy — the
    surviving block refs are reused."""
    import ray.data as rd

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for bref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(bref)
    if not refs:
        return ds
    return rd.from_arrow_refs(refs)


#: Candidate-edge count below which the closure runs as ONE driver-local
#: vectorized pass instead of the iterated distributed propagation. The
#: edge list is the DUP graph, not the corpus — 2M edges ≈ 32 MB on the
#: driver — so this is the common case even at 100-TB corpus scale;
#: above it the distributed path takes over (same labels either way).
LOCAL_CC_MAX_EDGES = 2_000_000


def _local_components(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Driver-local min-label propagation with pointer doubling:
    O(E) numpy per round, O(log diameter) rounds, same labels as the
    distributed path (component = min reachable node id)."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[: len(a)], inv[len(a):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        nxt = lab.copy()
        np.minimum.at(nxt, ea, lab[eb])
        np.minimum.at(nxt, eb, lab[ea])
        nxt = nxt[nxt]  # pointer jump
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    return pa.table({"node": pa.array(nodes, type=pa.int64()),
                     "component": pa.array(nodes[lab], type=pa.int64())})


def connected_components(edges, src_col: str = "src", dst_col: str = "dst",
                         max_iters: int = 50, num_partitions: int | None = None,
                         local_max_edges: int = LOCAL_CC_MAX_EDGES):
    """Component id (min reachable node id) for every node in ``edges``.

    ``edges`` is a Dataset with int64 endpoint columns. Returns a
    Dataset (node, component). Isolated nodes never appear in an edge
    list; union them in afterwards if the contract needs them.

    Small edge lists (≤ ``local_max_edges``, the overwhelmingly common
    case since edges cover only duplicate candidates) short-circuit to
    one driver-local vectorized pass — the distributed propagation
    costs ~6 Dataset executions PER ROUND in fixed overhead, which
    dominates wall time when the graph is small. Labels are identical
    on both paths, so the auto-delegation is invisible to callers
    (same pattern as knn_outlier's EXACT_KNN_MAX_ROWS)."""
    import ray.data as rd

    if num_partitions is None:
        import ray

        num_partitions = max(int(ray.cluster_resources().get("CPU", 8)) // 2, 4)

    mat_edges = edges.select_columns([src_col, dst_col]).materialize()
    if mat_edges.count() <= local_max_edges:
        df = mat_edges.to_pandas()
        if len(df) == 0:
            return rd.from_arrow(pa.table({
                "node": pa.array([], type=pa.int64()),
                "component": pa.array([], type=pa.int64()),
            }))
        a = df[src_col].to_numpy().astype(np.int64)
        b = df[dst_col].to_numpy().astype(np.int64)
        return rd.from_arrow(_local_components(a, b))
    edges = mat_edges

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "nbr": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        n = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.unique(n), type=pa.int64())})

    from cleanlab_ray.stages.topk import sorted_group_agg as _sga

    # global distinct node set: map-side unique + sorted-run dedup (one
    # group per node — the native groupby would pay its ~0.3 ms/group
    # fixed cost per NODE here)
    labels = _drop_empty_blocks(
        _sga(
            sym.map_batches(init_labels, batch_format="pyarrow"),
            "node",
            {"node": "count"},
        )
        .map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["node"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    prev_sum = labels.sum("label")
    if prev_sum is None:  # empty edge list: no nodes, empty result
        return rd.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "component": pa.array([], type=pa.int64()),
        }))

    for _ in range(max_iters):
        # neighbour candidates: label(u) offered to every v adjacent to u
        offered = (
            sym.join(labels, "inner", num_partitions=num_partitions, on=("node",))
            .map_batches(
                lambda b: pa.table({"node": b["nbr"], "label": b["label"]}),
                batch_format="pyarrow",
            )
        )
        labels = _drop_empty_blocks(
            _sga(offered.union(labels), "node", {"label": "min"})
            .map_batches(
                lambda b: pa.table({"node": b["node"], "label": b["min(label)"]}),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # pointer jump: label <- label(label). L(u) <= u for every u, so
        # this only decreases labels; it turns O(diameter) convergence
        # into O(log diameter) on path-shaped components.
        lut = labels.map_batches(
            lambda b: pa.table({"jkey": b["node"], "label2": b["label"]}),
            batch_format="pyarrow",
        )
        jumped = labels.map_batches(
            lambda b: pa.table({"node": b["node"], "jkey": b["label"]}),
            batch_format="pyarrow",
        ).join(lut, "inner", num_partitions=num_partitions, on=("jkey",))
        labels = _drop_empty_blocks(
            jumped.map_batches(
                lambda b: pa.table({"node": b["node"], "label": b["label2"]}),
                batch_format="pyarrow",
            ).materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # labels only decrease: fixpoint reached
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "component": b["label"]}),
        batch_format="pyarrow",
    )
