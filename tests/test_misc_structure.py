"""Structure predicates, reciprocity, s-metric, ego graph, LCA vs NetworkX."""

import networkx as nx
import numpy as np

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines import misc
from graphblas_algorithms_ray.pipelines.structure import (
    is_regular,
    number_of_isolates,
    overall_reciprocity,
    s_metric,
)


def test_reciprocity_and_isolates():
    G = nx.gnp_random_graph(50, 0.08, seed=2, directed=True)
    G.add_nodes_from(range(55))
    g = Graph.from_networkx(G, num_parts=3)
    assert abs(overall_reciprocity(g) - nx.overall_reciprocity(G)) < 1e-12
    assert number_of_isolates(g) == nx.number_of_isolates(G)


def test_s_metric():
    G = nx.gnp_random_graph(40, 0.1, seed=5)
    g = Graph.from_networkx(G, num_parts=3)
    assert abs(s_metric(g) - nx.s_metric(G)) < 1e-9


def test_tournament():
    G = nx.tournament.random_tournament(9, seed=3)
    g = Graph.from_networkx(G, num_parts=2)
    assert misc.is_tournament(g)
    assert misc.score_sequence(g) == sorted(d for _, d in G.out_degree())
    G2 = nx.gnp_random_graph(9, 0.5, seed=1, directed=True)
    g2 = Graph.from_networkx(G2, num_parts=2)
    assert not misc.is_tournament(g2)


def test_regular():
    g = Graph.from_networkx(nx.cycle_graph(10), num_parts=2)
    assert is_regular(g)
    assert misc.is_k_regular(g, 2)
    assert not misc.is_k_regular(g, 3)
    g2 = Graph.from_networkx(nx.path_graph(5), num_parts=2)
    assert not is_regular(g2)


def test_simple_path_and_dominating():
    G = nx.path_graph(6)
    g = Graph.from_networkx(G, num_parts=2)
    assert misc.is_simple_path(g, [0, 1, 2, 3])
    assert not misc.is_simple_path(g, [0, 2])
    assert not misc.is_simple_path(g, [0, 1, 0])
    assert misc.is_dominating_set(g, {1, 4})
    assert not misc.is_dominating_set(g, {0})
    assert nx.is_dominating_set(G, {1, 4})


def test_mutual_weight_and_efficiency():
    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 2.0), (1, 0, 3.0), (1, 2, 1.0)])
    g = Graph.from_networkx(G, weighted=True, num_parts=2)
    assert misc.mutual_weight(g, 0, 1) == 5.0
    assert misc.mutual_weight(g, 1, 2) == 1.0
    assert misc.mutual_weight(g, 0, 2) == 0.0
    Gu = nx.path_graph(5)
    gu = Graph.from_networkx(Gu, num_parts=2)
    assert misc.efficiency(gu, 0, 2) == nx.efficiency(Gu, 0, 2)


def test_could_be_isomorphic():
    G = nx.gnp_random_graph(20, 0.2, seed=1)
    H = nx.relabel_nodes(G, {i: (i * 7) % 20 for i in range(20)})
    g = Graph.from_networkx(G, num_parts=2)
    h = Graph.from_networkx(H, num_parts=2)
    assert misc.faster_could_be_isomorphic(g, h)
    assert misc.fast_could_be_isomorphic(g, h)
    H2 = nx.gnp_random_graph(20, 0.2, seed=9)
    h2 = Graph.from_networkx(H2, num_parts=2)
    assert misc.faster_could_be_isomorphic(g, h2) == nx.faster_could_be_isomorphic(
        G, H2
    )


def test_ego_graph():
    G = nx.gnp_random_graph(30, 0.1, seed=8)
    g = Graph.from_networkx(G, num_parts=3)
    ego = misc.ego_graph(g, 0, radius=2)
    exp = nx.ego_graph(G, 0, radius=2)
    got = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in ego.edges_ds().take_all()
    }
    expe = {(min(u, v), max(u, v)) for u, v in exp.edges()}
    assert got == expe


def test_lca():
    G = nx.DiGraph([(0, 2), (1, 2), (2, 3), (1, 4), (4, 3)])
    g = Graph.from_networkx(G, num_parts=2)
    ours = misc.lowest_common_ancestor(g, 3, 4)
    theirs = nx.lowest_common_ancestor(G, 3, 4)
    assert ours == theirs


def test_tournament_matrix():
    G = nx.tournament.random_tournament(6, seed=2)
    g = Graph.from_networkx(G, num_parts=2)
    tm = misc.tournament_matrix(g).to_pandas()
    dense = np.zeros((6, 6))
    for _, r in tm.iterrows():
        dense[int(r["row"]), int(r["col"])] += r["value"]
    assert np.all(dense == -dense.T)
    assert np.abs(dense).sum() == 2 * G.number_of_edges()


def test_registry_dispatch():
    """The ALGORITHMS registry (reference Dispatcher parity) dispatches by
    NetworkX-style name."""
    from graphblas_algorithms_ray.registry import ALGORITHMS

    assert len(ALGORITHMS) >= 85
    G = nx.gnp_random_graph(20, 0.2, seed=2, directed=True)
    g = Graph.from_networkx(G, num_parts=2)
    pr = ALGORITHMS["pagerank"](g).to_pandas()
    assert len(pr) == 20
    assert abs(ALGORITHMS["overall_reciprocity"](g) - nx.overall_reciprocity(G)) < 1e-12


def test_reciprocity_per_node():
    # reference algorithms/reciprocity.py:8-14 — vs nx per-node reciprocity
    import networkx as nx
    from graphblas_algorithms_ray.pipelines.structure import reciprocity

    G = nx.gnp_random_graph(40, 0.12, seed=13, directed=True)
    G.add_edge(2, 2)  # self-loop reciprocates itself
    g = Graph.from_networkx(G, num_parts=3)
    ours = {r["v"]: r["reciprocity"] for r in reciprocity(g).take_all()}
    for v in G.nodes():
        if G.degree(v) == 0:
            assert v not in ours
        else:
            assert abs(ours[v] - nx.reciprocity(G, v)) < 1e-12, v
    # nodes subset filter
    sub = {r["v"] for r in reciprocity(g, nodes=[0, 1, 2]).take_all()}
    assert sub <= {0, 1, 2}


def test_nodeset_algebra():
    import ray.data
    from graphblas_algorithms_ray.pipelines.nodeset import (
        map_isequal,
        set_intersection_size,
        set_isdisjoint,
        set_isequal,
        set_issubset,
        set_union_size,
    )

    a = ray.data.from_items([{"v": i} for i in [1, 2, 3, 5, 8]])
    b = ray.data.from_items([{"v": i} for i in [8, 5, 3, 2, 1]])
    c = ray.data.from_items([{"v": i} for i in [2, 3]])
    d = ray.data.from_items([{"v": i} for i in [10, 11]])
    assert set_isequal(a, b)
    assert not set_isequal(a, c)
    assert set_issubset(c, a)
    assert not set_issubset(a, c)
    assert set_isdisjoint(a, d)
    assert not set_isdisjoint(a, c)
    assert set_intersection_size(a, c) == 2
    assert set_union_size(a, d) == 7

    m1 = ray.data.from_items([{"v": 1, "x": 0.5}, {"v": 2, "x": 1.5}])
    m2 = ray.data.from_items([{"v": 2, "y": 1.5}, {"v": 1, "y": 0.5}])
    m3 = ray.data.from_items([{"v": 1, "y": 0.5}])
    assert map_isequal(m1, m2)
    assert not map_isequal(m1, m3)
