"""Triangle family vs NetworkX — exact (counts) / allclose (coefficients).

Mirrors the reference's K5 unit tests (algorithms/tests/test_cluster.py:7-53)
including self-edge exclusion."""

import networkx as nx
import numpy as np
import pytest

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.triangles import (
    average_clustering,
    clustering,
    total_triangles,
    transitivity,
    triangles_dict,
)


def _check(G_nx, n):
    g = Graph(list(G_nx.edges()), n=n, directed=False, num_parts=3)
    exp_tri = nx.triangles(G_nx)
    assert triangles_dict(g) == exp_tri
    assert total_triangles(g) == sum(exp_tri.values()) // 3
    assert abs(transitivity(g) - nx.transitivity(G_nx)) < 1e-12
    ours = clustering(g).to_pandas().set_index("v")["clustering"].to_dict()
    theirs = nx.clustering(G_nx)
    for v in theirs:
        assert abs(ours[v] - theirs[v]) < 1e-12
    assert abs(average_clustering(g) - nx.average_clustering(G_nx)) < 1e-12


def test_k5():
    G = nx.complete_graph(5)
    _check(G, 5)
    # K5 exact values from the reference's own test
    g = Graph(list(G.edges()), n=5, directed=False, num_parts=2)
    assert triangles_dict(g) == {v: 6 for v in range(5)}
    assert total_triangles(g) == 10
    assert transitivity(g) == 1.0


def test_k5_with_self_edges():
    # self-edges must be excluded (cluster.py offdiag semantics)
    G = nx.complete_graph(5)
    edges = list(G.edges()) + [(v, v) for v in range(5)]
    g = Graph(edges, n=5, directed=False, num_parts=2)
    assert triangles_dict(g) == {v: 6 for v in range(5)}
    assert total_triangles(g) == 10


@pytest.mark.parametrize("seed", [1, 2])
def test_random(seed):
    G = nx.gnp_random_graph(80, 0.08, seed=seed)
    G.add_nodes_from(range(90))  # isolated vertices count 0
    _check(G, 90)


def test_triangle_free():
    G = nx.cycle_graph(10)  # no triangles
    g = Graph(list(G.edges()), n=10, directed=False, num_parts=3)
    assert total_triangles(g) == 0
    assert triangles_dict(g) == {v: 0 for v in range(10)}


def test_average_clustering_count_zeros_false():
    # ADVICE r1: average over nodes with NONZERO clustering (triangle + path)
    G = nx.Graph([(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)])
    g = Graph(list(G.edges()), n=5, directed=False, num_parts=3)
    assert (
        abs(
            average_clustering(g, count_zeros=False)
            - nx.average_clustering(G, count_zeros=False)
        )
        < 1e-12
    )


def test_weighted_clustering():
    # reference cluster.py:24-53 cbrt plus_times — vs nx weighted clustering
    rng = np.random.RandomState(4)
    G = nx.gnp_random_graph(40, 0.2, seed=4)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.randint(1, 10))
    g = Graph(
        [(u, v, G[u][v]["weight"]) for u, v in G.edges()],
        n=40,
        directed=False,
        weighted=True,
        num_parts=3,
    )
    ours = clustering(g, weight="weight").to_pandas().set_index("v")["clustering"].to_dict()
    theirs = nx.clustering(G, weight="weight")
    for v in theirs:
        assert abs(ours[v] - theirs[v]) < 1e-12, v
    assert (
        abs(
            average_clustering(g, weight="weight")
            - nx.average_clustering(G, weight="weight")
        )
        < 1e-12
    )


def test_single_node_fast_paths():
    from graphblas_algorithms_ray.pipelines.triangles import (
        single_clustering,
        single_generalized_degree,
        single_triangle,
    )

    rng = np.random.RandomState(6)
    G = nx.gnp_random_graph(40, 0.2, seed=6)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.randint(1, 9))
    g = Graph(
        [(u, v, G[u][v]["weight"]) for u, v in G.edges()],
        n=40, directed=False, weighted=True, num_parts=3,
    )
    for v in (0, 7, 19, 33):
        assert single_triangle(g, v) == nx.triangles(G, v)
        assert abs(single_clustering(g, v) - nx.clustering(G, v)) < 1e-12
        assert (
            abs(single_clustering(g, v, weighted=True) - nx.clustering(G, v, weight="weight"))
            < 1e-12
        )
        assert single_generalized_degree(g, v) == dict(nx.generalized_degree(G, v))


def test_sharded_rank_tier():
    """GRAFT_RANK_DIST_MIN_N=0 forces the sharded (no-O(n)-driver) degree
    rank; triangles / clustering / edge_support / k_truss must match the
    broadcast tier (= NetworkX) exactly."""
    import os

    from graphblas_algorithms_ray.pipelines.core import edge_support, k_truss
    from graphblas_algorithms_ray.pipelines.triangles import _RankMap, _forward_graph

    G = nx.gnp_random_graph(70, 0.1, seed=9)
    G.add_nodes_from(range(78))
    os.environ["GRAFT_RANK_DIST_MIN_N"] = "0"
    try:
        g = Graph(list(G.edges()), n=78, directed=False, num_parts=3)
        _, _, rm = _forward_graph(g)
        assert rm.kind == "shard"
        assert triangles_dict(g) == nx.triangles(G)
        assert total_triangles(g) == sum(nx.triangles(G).values()) // 3
        es = edge_support(g).to_pandas()
        exp = {
            tuple(sorted(e)): s
            for e in G.edges()
            if (s := sum(1 for w in G if G.has_edge(e[0], w) and G.has_edge(e[1], w)))
        }
        got = {(int(r.u), int(r.w)): int(r.support) for r in es.itertuples()}
        assert got == exp
        kt = k_truss(g, 4)
        kt_edges = sorted(
            {(min(int(r["src"]), int(r["dst"])), max(int(r["src"]), int(r["dst"])))
             for r in kt.edges_ds().take_all()}
        )
        exp_edges = sorted(
            (min(u, v), max(u, v)) for u, v in nx.k_truss(G, 4).edges()
        )
        assert kt_edges == exp_edges
    finally:
        os.environ.pop("GRAFT_RANK_DIST_MIN_N", None)


def test_sharded_rank_weighted():
    import os

    rng = np.random.RandomState(11)
    G = nx.gnp_random_graph(40, 0.2, seed=11)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.randint(1, 9))
    os.environ["GRAFT_RANK_DIST_MIN_N"] = "0"
    try:
        g = Graph(
            [(u, v, G[u][v]["weight"]) for u, v in G.edges()],
            n=40, directed=False, weighted=True, num_parts=3,
        )
        ours = clustering(g, weight="weight").to_pandas().set_index("v")["clustering"].to_dict()
        theirs = nx.clustering(G, weight="weight")
        for v in theirs:
            assert abs(ours[v] - theirs[v]) < 1e-12, v
    finally:
        os.environ.pop("GRAFT_RANK_DIST_MIN_N", None)


def test_shuffle_exchange_parity():
    """GRAFT_TRI_EXCHANGE=shuffle (the >10^10-edge formulation) must match
    the default in-task probe on counts, per-node triangles, edge support,
    and the weighted cbrt kernel (r5 regression: _WedgeGen lost its n)."""
    import os

    from graphblas_algorithms_ray.pipelines.core import edge_support

    rng = np.random.RandomState(7)
    G = nx.gnp_random_graph(50, 0.15, seed=7)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.randint(1, 9))
    edges = [(u, v, G[u][v]["weight"]) for u, v in G.edges()]

    def run_all():
        g = Graph(edges, n=50, directed=False, weighted=True, num_parts=3)
        tri = triangles_dict(g)
        es = edge_support(g).to_pandas().sort_values(["u", "w"]).reset_index(drop=True)
        cw = clustering(g, weight="weight").to_pandas().set_index("v")["clustering"].to_dict()
        return total_triangles(g), tri, es, cw

    os.environ["GRAFT_TRI_EXCHANGE"] = "shuffle"
    try:
        t_sh, tri_sh, es_sh, cw_sh = run_all()
    finally:
        os.environ.pop("GRAFT_TRI_EXCHANGE", None)
    t_pr, tri_pr, es_pr, cw_pr = run_all()
    assert t_sh == t_pr
    assert tri_sh == tri_pr
    assert es_sh.equals(es_pr)
    assert cw_sh.keys() == cw_pr.keys()
    for v in cw_pr:
        assert abs(cw_sh[v] - cw_pr[v]) < 1e-12
