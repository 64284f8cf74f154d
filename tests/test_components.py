"""Distributed connected components + exact quantiles at ranks."""

import numpy as np
import pyarrow as pa


def test_components_chain_and_stars(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.components import connected_components

    # one 30-node chain (diameter forces many propagation rounds),
    # one star, one triangle, edges shuffled
    chain = [(i, i + 1) for i in range(100, 130)]
    star = [(500, x) for x in (501, 502, 503, 504)]
    tri = [(7, 9), (9, 11), (7, 11)]
    edges = chain + star + tri
    rng = np.random.default_rng(3)
    rng.shuffle(edges)
    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"src": a, "dst": b})).repartition(4)
    out = connected_components(ds, "src", "dst").to_pandas()
    comp = dict(zip(out["node"], out["component"]))
    assert all(comp[i] == 100 for i in range(100, 131))
    assert all(comp[x] == 500 for x in (500, 501, 502, 503, 504))
    assert comp[7] == comp[9] == comp[11] == 7
    assert len(out) == 31 + 5 + 3


def test_components_undirected(ray_session):
    import ray.data as rd

    from cleanlab_ray.stages.components import connected_components

    # min label must flow AGAINST edge direction too
    ds = rd.from_arrow(
        pa.table({"src": pa.array([10, 20], type=pa.int64()),
                  "dst": pa.array([1, 10], type=pa.int64())})
    )
    out = connected_components(ds, "src", "dst").to_pandas()
    assert set(out["component"]) == {1}
    assert len(out) == 3


def test_exact_values_at_ranks(ray_session):
    import ray.data as rd

    from cleanlab_ray.functions.quantiles import exact_values_at_ranks

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 10_000, size=5000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(6)
    ranks = [0, 1, 499, 2500, 4998, 4999]
    got = exact_values_at_ranks(ds, "v", ranks, num_bins=64)
    s = np.sort(vals)
    for r in ranks:
        assert got[r] == s[r], (r, got[r], s[r])


def test_local_and_distributed_paths_identical(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cleanlab_ray.stages.components import connected_components

    rng = np.random.default_rng(11)
    # 3 chains + a clique + isolated pairs, shuffled ids
    ids = rng.permutation(400)
    edges = []
    for s in range(0, 120, 40):       # three 40-node chains
        edges += [(ids[i], ids[i + 1]) for i in range(s, s + 39)]
    edges += [(ids[i], ids[j]) for i in range(120, 130)
              for j in range(i + 1, 130)]                  # clique
    edges += [(ids[i], ids[i + 1]) for i in range(130, 200, 2)]
    t = pa.table({"src": pa.array([int(a) for a, _ in edges], pa.int64()),
                  "dst": pa.array([int(b) for _, b in edges], pa.int64())})
    ds = rd.from_arrow(t).repartition(4)
    local = {r["node"]: r["component"]
             for r in connected_components(ds).take_all()}
    dist = {r["node"]: r["component"]
            for r in connected_components(ds, local_max_edges=0).take_all()}
    assert local == dist and len(local) > 0
