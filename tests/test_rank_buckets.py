"""group_rank_buckets (distributed NTILE) vs a pandas oracle, plus the
CCNet perplexity partitioner's scorer stage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def ntile_oracle(df, group_col, value_col, id_col, n_buckets):
    """SQL NTILE semantics: first n % k buckets get the extra row."""
    out = np.zeros(len(df), dtype=np.int32)
    for _, sub in df.groupby(group_col, sort=False):
        order = sub.sort_values([value_col, id_col], kind="mergesort").index
        n = len(order)
        q, r = divmod(n, n_buckets)
        sizes = [q + 1 if k < r else q for k in range(n_buckets)]
        pos = 0
        for b, s in enumerate(sizes, start=1):
            out[df.index.get_indexer(order[pos : pos + s])] = b
            pos += s
    return out


def run_buckets(df, n_buckets, num_bins=64, parts=5):
    import ray.data as rd

    from cleanlab_ray.stages.rank_buckets import group_rank_buckets

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)
    got = group_rank_buckets(
        ds, "g", "v", "id", n_buckets=n_buckets, num_bins=num_bins
    ).to_pandas()
    return got.sort_values("id").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_matches_pandas_ntile():
    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame(
        {
            "g": rng.choice(["en", "de", "fr", "und"], n, p=[0.6, 0.2, 0.15, 0.05]),
            "v": rng.normal(size=n).astype(np.float32).astype(np.float64),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    exp = ntile_oracle(df, "g", "v", "id", 3)
    got = run_buckets(df, 3)
    assert np.array_equal(got["bucket"].to_numpy(), exp)


@pytest.mark.usefixtures("ray_session")
def test_heavy_ties_and_id_tiebreak():
    # values drawn from 4 distinct levels: cut ranks land inside tie
    # runs, so the id tie-break decides every boundary
    rng = np.random.default_rng(3)
    n = 3000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], n),
            "v": rng.choice([0.0, 1.0, 1.0, 2.0, 3.0], n),
            "id": rng.permutation(n).astype(np.int64),
        }
    )
    for nb in (2, 3, 5):
        exp = pd.Series(ntile_oracle(df, "g", "v", "id", nb), index=df.index)
        exp = exp[df.sort_values("id").index].to_numpy()  # align to got's id order
        got = run_buckets(df, nb, num_bins=16)
        assert np.array_equal(got["bucket"].to_numpy(), exp), nb


@pytest.mark.usefixtures("ray_session")
def test_small_and_degenerate_groups():
    # groups smaller than n_buckets (zero-size trailing buckets) and a
    # constant-value group (degenerate [min, max] range)
    df = pd.DataFrame(
        {
            "g": ["s"] * 2 + ["c"] * 50 + ["n"] * 10,
            "v": [5.0, 1.0] + [2.5] * 50 + list(range(10)),
            "id": np.arange(62, dtype=np.int64),
        }
    )
    exp = ntile_oracle(df, "g", "v", "id", 4)
    got = run_buckets(df, 4, num_bins=8)
    assert np.array_equal(got["bucket"].to_numpy(), exp)


@pytest.mark.usefixtures("ray_session")
def test_partitioning_independence():
    rng = np.random.default_rng(11)
    n = 1500
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], n),
            "v": rng.integers(0, 40, n).astype(np.float64),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    a = run_buckets(df, 3, parts=2)
    b = run_buckets(df, 3, parts=13)
    assert np.array_equal(a["bucket"].to_numpy(), b["bucket"].to_numpy())


@pytest.mark.usefixtures("ray_session")
def test_ppl_scorer_matches_turn_scorer_math():
    """PplScorer's ppl agrees with a direct score_arrow_column recompute
    (incl. the OOV fallback for trigram-free rows)."""
    from cleanlab_ray.stages._chargram import score_arrow_column
    from cleanlab_ray.stages.langid import PplScorer, build_langid_table

    texts = ["the quick brown fox jumps", "der baum und die katze", "", "ab"]
    batch = pa.table({"doc_id": list(range(4)), "text": texts})
    out = PplScorer()(batch)
    table = build_langid_table()
    import pyarrow.compute as pc

    ll, cnt = score_arrow_column(table, pc.utf8_lower(batch["text"]))
    exp = np.exp(-ll[:, 0] / np.maximum(cnt, 1.0))
    exp[cnt == 0] = np.exp(-table.oov[0])
    assert np.allclose(out["ppl"].to_numpy(), exp.astype(np.float32), rtol=0, atol=0)
    assert out["lang"].to_pylist()[0] == "en"
    assert out["lang"].to_pylist()[2] == "en"  # no evidence -> first-max
