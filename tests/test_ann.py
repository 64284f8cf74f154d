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
