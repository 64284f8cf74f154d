"""Remaining Datalab issue-manager analogues: null patterns and
underperforming groups.

- Null-pattern stats (/root/reference/cleanlab/datalab/internal/issue_manager/null.py:36-139):
  per-row null fraction (in the null stage of the audit) plus the
  dataset-level "most common null pattern" — a groupby(pattern).count()
  over a per-row pattern string built vectorized per batch.
- Underperforming group (/root/reference/cleanlab/datalab/internal/
  issue_manager/underperforming_group.py:113-155): mean self-confidence
  per cluster, worst-cluster ratio vs the dataset mean. The reference
  clusters with DBSCAN over a kNN graph; at engine scale the cluster id
  is an input column (any upstream partitioner: LSH bucket, metadata
  key, hash) — the aggregation semantics are what's reproduced.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def null_pattern_kernel(columns: list[str]):
    """map_batches kernel appending a per-row null-pattern string
    ('0'/'1' per audited column, e.g. '0010')."""

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        pattern = np.zeros((n, len(columns)), dtype=np.uint8)
        for j, c in enumerate(columns):
            pattern[:, j] = pc.is_null(batch[c]).to_numpy(zero_copy_only=False)
        strs = np.apply_along_axis(lambda r: "".join(map(str, r)), 1, pattern) if n else np.array([], dtype=object)
        return batch.append_column("null_pattern", pa.array(strs, type=pa.string()))

    return kernel


def most_common_null_pattern(ds, columns: list[str]):
    """Dataset-level most common non-trivial null pattern + count
    (null.py:71-139). Returns (pattern, count) — ('no_null', 0) when no
    row has a null."""
    no_null = "0" * len(columns)
    counts = (
        ds.map_batches(null_pattern_kernel(columns), batch_format="pyarrow")
        .groupby("null_pattern")
        .count()
        .to_pandas()
    )
    counts = counts[counts["null_pattern"] != no_null]
    if counts.empty:
        return "no_null", 0
    top = counts.sort_values(["count()", "null_pattern"], ascending=[False, True]).iloc[0]
    return str(top["null_pattern"]), int(top["count()"])


def underperforming_groups(
    ds,
    cluster_col: str,
    score_col: str = "score_self_confidence",
    threshold: float = 0.1,
):
    """Per-cluster mean quality score + worst-cluster flag.

    Returns a Dataset[(cluster, n, mean_score, loss_ratio, is_underperforming)]
    where loss_ratio = cluster mean / dataset mean (flag when
    loss_ratio < threshold — semantics of underperforming_group.py:113-133
    with the reference's performed/overall loss ratio inverted to scores).
    """
    from ray.data.aggregate import Count, Mean

    overall = ds.aggregate(Mean(score_col, alias_name="m"))["m"]

    per_cluster = ds.groupby(cluster_col).aggregate(
        Count(alias_name="n"), Mean(score_col, alias_name="mean_score")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        mean = batch["mean_score"].to_numpy(zero_copy_only=False)
        ratio = mean / max(overall, 1e-300)
        batch = batch.append_column("loss_ratio", pa.array(ratio, type=pa.float64()))
        return batch.append_column(
            "is_underperforming", pa.array(ratio < threshold, type=pa.bool_())
        )

    return per_cluster.map_batches(finalize, batch_format="pyarrow")


def underperforming_groups_auto(
    ds,
    embedding_col: str = "embedding",
    key_col: str = "vec_id",
    score_col: str = "score_self_confidence",
    k: int = 8,
    n_iter: int = 3,
    threshold: float = 0.1,
):
    """Cluster-free underperforming-group detection: when the caller has
    no cluster ids, cluster the embeddings with the native distributed
    k-means (stages/kmeans.py — the role the reference delegates to a
    driver-side sklearn KMeans in underperforming_group.py
    `perform_clustering`) and score the resulting groups."""
    from cleanlab_ray.stages.kmeans import kmeans_cluster

    assigned, _cents = kmeans_cluster(
        ds, embedding_col=embedding_col, key_col=key_col, k=k, n_iter=n_iter
    )
    return underperforming_groups(
        assigned, cluster_col="cluster", score_col=score_col, threshold=threshold
    )
