"""BFS family + Bellman-Ford vs NetworkX — exact."""

import networkx as nx
import numpy as np
import pytest

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.traversal import (
    ancestors,
    bfs_layers,
    bfs_levels,
    bfs_parents,
    descendants,
    descendants_at_distance,
    has_path,
)
from graphblas_algorithms_ray.pipelines.shortest_paths import (
    Unbounded,
    bellman_ford_dict,
    negative_edge_cycle,
)


def test_bfs_levels_directed():
    G = nx.gnp_random_graph(60, 0.05, seed=4, directed=True)
    g = Graph.from_networkx(G, num_parts=3)
    ours = {r["v"]: r["level"] for r in bfs_levels(g, 0).take_all()}
    theirs = nx.single_source_shortest_path_length(G, 0)
    assert ours == theirs


def test_bfs_layers_and_distance():
    G = nx.gnp_random_graph(50, 0.06, seed=8, directed=True)
    g = Graph.from_networkx(G, num_parts=3)
    layers = bfs_layers(g, 0)
    exp = [sorted(l) for l in nx.bfs_layers(G, 0)]
    assert layers == exp
    assert descendants_at_distance(g, 0, 2) == nx.descendants_at_distance(G, 0, 2)
    assert descendants(g, 0) == nx.descendants(G, 0)
    assert ancestors(g, 0) == nx.ancestors(G, 0)


def test_has_path():
    G = nx.DiGraph([(0, 1), (1, 2), (3, 4)])
    G.add_nodes_from(range(5))
    g = Graph.from_networkx(G, num_parts=2)
    assert has_path(g, 0, 2)
    assert not has_path(g, 0, 4)


def test_bfs_parents_min_first():
    # parents: min-id frontier vertex wins (min_first, _bfs.py:110-137)
    G = nx.DiGraph([(0, 2), (1, 2), (0, 1), (2, 3)])
    g = Graph.from_networkx(G, num_parts=2)
    p = {r["v"]: r["parent"] for r in bfs_parents(g, 0).take_all()}
    assert p == {0: 0, 1: 0, 2: 0, 3: 2}


def test_bellman_ford_positive_weights():
    rng = np.random.RandomState(5)
    G = nx.gnp_random_graph(50, 0.08, seed=5, directed=True)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.randint(1, 10))
    g = Graph.from_networkx(G, weighted=True, num_parts=3)
    ours = bellman_ford_dict(g, 0)
    theirs = nx.single_source_bellman_ford_path_length(G, 0)
    assert set(ours) == set(theirs)
    for k in theirs:
        assert abs(ours[k] - theirs[k]) < 1e-9


def test_bellman_ford_negative_edges_no_cycle():
    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 2.0), (1, 2, -1.0), (0, 2, 5.0), (2, 3, 1.0)])
    g = Graph.from_networkx(G, weighted=True, num_parts=2)
    assert bellman_ford_dict(g, 0) == {0: 0.0, 1: 2.0, 2: 1.0, 3: 2.0}
    assert not negative_edge_cycle(g)


def test_negative_cycle_detection():
    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 1.0), (1, 2, -3.0), (2, 0, 1.0)])
    g = Graph.from_networkx(G, weighted=True, num_parts=2)
    with pytest.raises(Unbounded):
        bellman_ford_dict(g, 0)
    assert negative_edge_cycle(g)


def test_bellman_ford_path_reconstruction():
    rng = np.random.RandomState(7)
    G = nx.gnp_random_graph(40, 0.1, seed=7, directed=True)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.randint(1, 10))
    from graphblas_algorithms_ray.pipelines.shortest_paths import (
        bellman_ford_path,
        bellman_ford_path_lengths,
    )

    g = Graph.from_networkx(G, weighted=True, num_parts=3)
    # path must exist and have the optimal length (path itself may differ
    # among equal-cost paths; our tie-break is deterministic lexicographic)
    lengths = nx.single_source_bellman_ford_path_length(G, 0)
    reachable = [t for t in lengths if t != 0]
    for t in reachable[:5]:
        path = bellman_ford_path(g, 0, t)
        assert path[0] == 0 and path[-1] == t
        cost = sum(G[a][b]["weight"] for a, b in zip(path, path[1:]))
        assert abs(cost - lengths[t]) < 1e-9

    # multi-source lengths
    ds = bellman_ford_path_lengths(g, [0, 1]).to_pandas()
    got = {}
    for _, r in ds.iterrows():
        got.setdefault(int(r["source"]), {})[int(r["v"])] = float(r["dist"])
    for s in (0, 1):
        exp = nx.single_source_bellman_ford_path_length(G, s)
        assert set(got[s]) == set(exp)
        for v in exp:
            assert abs(got[s][v] - exp[v]) < 1e-9


def test_negative_self_loop_unbounded():
    # ADVICE r1: negative self-loop on a reached vertex = negative cycle
    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 1.0), (1, 1, -1.0)])
    g = Graph.from_networkx(G, weighted=True, num_parts=2)
    with pytest.raises(Unbounded):
        bellman_ford_dict(g, 0)
    assert negative_edge_cycle(g)


def test_negative_self_loop_unreached_ok():
    # the negative self-loop is NOT reachable from source 0 -> finite dists
    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 1.0), (2, 2, -1.0)])
    g = Graph.from_networkx(G, weighted=True, num_parts=2)
    assert bellman_ford_dict(g, 0) == {0: 0.0, 1: 1.0}
    assert negative_edge_cycle(g)  # the cycle still exists globally


def test_bellman_ford_multi_source_packed():
    # VERDICT r1: >=3 sources resolved in ONE packed BSP loop
    from graphblas_algorithms_ray.pipelines.shortest_paths import (
        bellman_ford_path_lengths,
    )

    rng = np.random.RandomState(9)
    G = nx.gnp_random_graph(60, 0.08, seed=9, directed=True)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.randint(1, 9))
    g = Graph.from_networkx(G, weighted=True, num_parts=3)
    sources = [0, 7, 23, 41]
    got = {}
    for r in bellman_ford_path_lengths(g, sources).take_all():
        got.setdefault(int(r["source"]), {})[int(r["v"])] = float(r["dist"])
    for s in sources:
        exp = nx.single_source_bellman_ford_path_length(G, s)
        assert set(got.get(s, {})) == set(exp), f"source {s}"
        for v in exp:
            assert abs(got[s][v] - exp[v]) < 1e-9
