"""Ragged token / tensor column operators.

- Token flatten/unflatten (/root/reference/cleanlab/token_classification/
  rank.py:107-119): explode per-sentence ``list<float>`` token scores to
  one row per token (sentence keys carried), and re-nest flat token rows
  back into per-sentence lists via groupby with in-group position sort.
- Segmentation downsample (/root/reference/cleanlab/segmentation/
  filter.py:76-100): block-mean downsample of dense per-pixel
  probability tensors stored as flattened fixed-size lists, renormalized.

Both are pure per-batch Arrow/numpy kernels — flatten uses
``pc.list_flatten`` + ``pc.list_parent_indices`` (zero per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def flatten_token_scores(
    batch: pa.Table, list_col: str = "token_scores", keys: tuple[str, ...] = ("conv_id", "turn_idx")
) -> pa.Table:
    """One output row per token: keys + token_pos + token_score."""
    col = batch[list_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col)
    parents = pc.list_parent_indices(col)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    pos = np.concatenate([np.arange(n, dtype=np.int32) for n in lens]) if len(lens) else np.array([], np.int32)
    cols = {k: batch[k].take(parents) for k in keys}
    cols["token_pos"] = pa.array(pos, type=pa.int32())
    cols["token_score"] = flat
    return pa.table(cols)


def unflatten_token_scores(
    ds, keys: tuple[str, ...] = ("conv_id", "turn_idx"), out_col: str = "token_scores"
):
    """Re-nest flat token rows into per-sentence sorted lists: ONE sort
    exchange on the sentence keys + a vectorized
    ``pa.ListArray.from_arrays`` run kernel (token_pos ordered by an
    in-block lexsort) — NOT map_groups, whose
    one-pandas-frame-per-sentence cost is per-row Python at scale."""
    from cleanlab_ray.stages.dedup import _run_starts, _sorted_block_map

    def nest_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        score = batch["token_score"]
        if isinstance(score, pa.ChunkedArray):
            score = score.combine_chunks()
        if n == 0:
            cols = {k: batch[k] for k in keys}
            cols[out_col] = pa.array([], type=pa.list_(score.type))
            return pa.table(cols)
        key_np = [
            np.asarray(batch[k].to_pandas(), dtype=object)
            if pa.types.is_string(batch[k].type)
            else batch[k].to_numpy(zero_copy_only=False)
            for k in keys
        ]
        starts = _run_starts(*key_np)
        sizes = np.diff(np.append(starts, n))
        run_of_row = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        pos = batch["token_pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, run_of_row))
        score = score.take(pa.array(order))
        offsets = np.append(starts, n).astype(np.int32)
        starts_arr = pa.array(starts)
        cols = {k: batch[k].take(starts_arr) for k in keys}
        cols[out_col] = pa.ListArray.from_arrays(pa.array(offsets), score)
        return pa.table(cols)

    return _sorted_block_map(ds, list(keys), nest_block)


def downsample_prob_tensor(
    batch: pa.Table,
    tensor_col: str,
    k: int,
    h: int,
    w: int,
    factor: int,
    out_col: str | None = None,
) -> pa.Table:
    """Block-mean downsample of (K,H,W) per-row probability tensors
    (stored flattened as fixed_size_list<float>[K*H*W]); output
    renormalized over K (segmentation/filter.py:76-100 semantics)."""
    col = batch[tensor_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    arr = np.asarray(col.values, dtype=np.float64).reshape(n, k, h, w)
    hh, ww = h // factor, w // factor
    down = arr[:, :, : hh * factor, : ww * factor].reshape(n, k, hh, factor, ww, factor).mean(
        axis=(3, 5)
    )
    down /= np.clip(down.sum(axis=1, keepdims=True), 1e-300, None)
    out = pa.FixedSizeListArray.from_arrays(
        pa.array(down.reshape(-1).astype(np.float32)), k * hh * ww
    )
    return batch.append_column(out_col or f"{tensor_col}_ds{factor}", out)
