"""Connected components + label propagation — exact-match oracles."""

import networkx as nx
import numpy as np

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.components import (
    components_dict,
    is_connected,
)
from graphblas_algorithms_ray.pipelines.label_prop import (
    label_propagation_dict,
    lpa_oracle,
)


def _cc_oracle(G_nx, n):
    out = {}
    for comp in nx.connected_components(G_nx.to_undirected() if G_nx.is_directed() else G_nx):
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


def test_cc_multi_component():
    G = nx.Graph()
    G.add_edges_from([(0, 1), (1, 2), (5, 6), (7, 7)])
    G.add_nodes_from(range(10))
    g = Graph.from_networkx(G, num_parts=3)
    assert components_dict(g) == _cc_oracle(G, 10)
    assert not is_connected(g)


def test_cc_random():
    G = nx.gnp_random_graph(120, 0.02, seed=5)
    G.add_nodes_from(range(140))  # isolated tail
    g = Graph(list(G.edges()), n=140, directed=False, num_parts=4)
    assert components_dict(g) == _cc_oracle(G, 140)


def test_cc_directed_weak():
    G = nx.gnp_random_graph(60, 0.03, seed=9, directed=True)
    g = Graph.from_networkx(G, num_parts=3)
    exp = {}
    for comp in nx.weakly_connected_components(G):
        m = min(comp)
        for v in comp:
            exp[v] = m
    assert components_dict(g) == exp


def test_cc_connected_path():
    G = nx.path_graph(50)
    g = Graph.from_networkx(G, num_parts=4)
    assert is_connected(g)
    assert components_dict(g) == {v: 0 for v in range(50)}


def test_lpa_barbell_and_cliques():
    # two-cluster barbell (FIXTURES.md §3.5)
    G = nx.barbell_graph(6, 0)
    edges = list(G.edges())
    g = Graph(edges, n=12, directed=False, num_parts=3)
    assert label_propagation_dict(g) == lpa_oracle(edges, 12)

    # ring of cliques
    G2 = nx.ring_of_cliques(4, 5)
    edges2 = list(G2.edges())
    g2 = Graph(edges2, n=20, directed=False, num_parts=4)
    assert label_propagation_dict(g2) == lpa_oracle(edges2, 20)


def test_lpa_random_with_selfloops():
    rng = np.random.RandomState(3)
    edges = [(int(rng.randint(30)), int(rng.randint(30))) for _ in range(60)]
    g = Graph(edges, n=30, directed=False, num_parts=3)
    assert label_propagation_dict(g, max_iter=15) == lpa_oracle(edges, 30, max_iter=15)
