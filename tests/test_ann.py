"""Similarity search: brute-force exactness and LSH recall."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((400, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(400)]
    return rd.from_items(rows).materialize(), vecs


def _oracle_topk(vecs, queries, k):
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = vn @ qn.T
    out = {}
    for qi in range(queries.shape[0]):
        order = np.lexsort((np.arange(len(vecs)), -sims[:, qi]))
        out[qi] = [int(i) for i in order[:k]]
    return out


def test_brute_force_matches_oracle(emb_ds):
    from cleanlab_ray.stages.ann import ann_brute_force

    ds, vecs = emb_ds
    queries = vecs[:3].astype(np.float64)
    got = ann_brute_force(ds, queries, k=10).to_pandas()
    expected = _oracle_topk(vecs.astype(np.float64), queries, 10)
    for qi in range(3):
        g = got[got["query_id"] == qi].sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        )
        assert g["vec_id"].tolist() == expected[qi]


def test_lsh_recall(emb_ds):
    from cleanlab_ray.stages.ann import ann_brute_force, ann_lsh

    ds, vecs = emb_ds
    queries = vecs[:3].astype(np.float64)
    exact = ann_brute_force(ds, queries, k=5).to_pandas()
    approx = ann_lsh(ds, queries, k=5, num_planes=6, multiprobe=1).to_pandas()
    # the query vector itself must always be found (cos=1 in its own bucket)
    for qi in range(3):
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        assert qi in a
        # reasonable recall of the exact top-5
        assert len(a & e) >= 2


def test_ivf_probed_exactness(emb_ds):
    """Within probed cells IVF is exact: every returned row must appear
    in the brute-force ranking restricted to the probed cells, and the
    query's own vector (which lives in its nearest cell) must be found."""
    from cleanlab_ray.stages.ann import ann_ivf
    from cleanlab_ray.stages.kmeans import _assign, kmeans_fit

    ds, vecs = emb_ds
    queries = vecs[:3].astype(np.float64)
    got = ann_ivf(ds, queries, k=5, nlist=4, nprobe=2, n_iter=2).to_pandas()

    cents = kmeans_fit(ds, k=4, n_iter=2)
    v = vecs.astype(np.float64)
    cell = _assign(v, cents)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    for qi in range(3):
        d2 = ((queries[qi][None, :] - cents) ** 2).sum(axis=1)
        probe = np.argsort(d2, kind="stable")[:2]
        cand = np.nonzero(np.isin(cell, probe))[0]
        sims = vn[cand] @ qn[qi]
        order = np.lexsort((cand, -sims))
        expected = [int(cand[i]) for i in order[:5]]
        g = got[got["query_id"] == qi].sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        )
        assert g["vec_id"].tolist() == expected
        assert qi in set(g["vec_id"])


def test_ann_handles_empty_blocks_and_duplicate_ties(ray_session):
    """(a) Zero-row blocks must pass through all three partial kernels
    (reshape(0,-1) crashed them); (b) >k rows with IDENTICAL embeddings
    must keep the SMALLEST vec_ids — bare argpartition kept an arbitrary
    tie subset, breaking the (cos_sim DESC, vec_id ASC) total order."""
    import ray.data as rd

    from cleanlab_ray.stages.ann import ann_brute_force, ann_ivf, ann_lsh

    base = np.ones(8)
    rows = [{"vec_id": i, "embedding": base.tolist()} for i in range(40)]
    # a couple of decoys so the dataset isn't ALL ties
    rng = np.random.default_rng(3)
    rows += [{"vec_id": 100 + j, "embedding": rng.standard_normal(8).tolist()}
             for j in range(10)]
    # tiny blocks + many partitions -> some empty blocks after split
    ds = rd.from_items(rows).repartition(16).materialize()
    q = base[None, :]

    k = 10
    expect = list(range(k))  # smallest vec_ids among the 40 exact ties
    bf = ann_brute_force(ds, q, k=k).to_pandas().sort_values("vec_id")
    assert list(bf["vec_id"]) == expect
    lsh = ann_lsh(ds, q, k=k).to_pandas().sort_values("vec_id")
    assert list(lsh["vec_id"]) == expect
    ivf = ann_ivf(ds, q, k=k, nlist=4, nprobe=4).to_pandas().sort_values("vec_id")
    assert list(ivf["vec_id"]) == expect


def test_lsh_multiprobe_full_ball_equals_brute_force(emb_ds):
    """multiprobe=num_planes probes the entire hamming ball (all 2^p
    buckets), so LSH must return exactly the brute-force result —
    previously multiprobe>1 silently generated only 1-bit flips."""
    from cleanlab_ray.stages.ann import ann_brute_force, ann_lsh

    ds, vecs = emb_ds
    rng = np.random.default_rng(21)
    q = rng.standard_normal((3, 16))
    k = 7
    bf = ann_brute_force(ds, q, k=k).to_pandas()
    full = ann_lsh(ds, q, k=k, num_planes=6, multiprobe=6).to_pandas()
    bf_s = bf.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    full_s = full.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    assert bf_s[["query_id", "vec_id"]].equals(full_s[["query_id", "vec_id"]])
