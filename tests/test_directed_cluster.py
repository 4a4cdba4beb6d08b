"""Directed clustering (Fagiolo) vs nx.clustering; directed transitivity vs
the reference formula (brute-force oracle, cluster.py:83-91); mirrors the
reference's own mutated-K5 digraph test (nxapi/tests/test_cluster.py:6-34)."""

import networkx as nx
import numpy as np

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.cluster_directed import (
    average_clustering_directed,
    clustering_directed,
    transitivity_directed,
)


def _mutated_k5():
    G = nx.complete_graph(5, create_using=nx.DiGraph)
    G.remove_edge(1, 2)
    G.remove_edge(2, 3)
    G.add_node(5)
    return G


def _check_clustering(G, n):
    g = Graph.from_networkx(G, num_parts=3)
    ours = (
        clustering_directed(g).to_pandas().set_index("v")["clustering"].to_dict()
    )
    theirs = nx.clustering(G)
    for v in theirs:
        assert abs(ours[v] - theirs[v]) < 1e-12, (v, ours[v], theirs[v])
    assert abs(
        average_clustering_directed(g) - nx.average_clustering(G)
    ) < 1e-12


def test_mutated_k5_directed():
    _check_clustering(_mutated_k5(), 6)


def test_random_directed_clustering():
    G = nx.gnp_random_graph(40, 0.12, seed=4, directed=True)
    _check_clustering(G, 40)


def test_single_clustering_directed_fast_path():
    # one-node fast path (reference cluster.py:151-173) vs nx, on the
    # mutated-K5 fixture and a random digraph, unweighted and weighted
    from graphblas_algorithms_ray.pipelines.cluster_directed import (
        single_clustering_directed,
    )

    G = _mutated_k5()
    g = Graph.from_networkx(G, num_parts=3)
    exp = nx.clustering(G)
    for v in G.nodes():
        assert abs(single_clustering_directed(g, v) - exp[v]) < 1e-12, v

    G2 = nx.gnp_random_graph(25, 0.18, seed=7, directed=True)
    rng = np.random.RandomState(8)
    for u, w in G2.edges():
        G2[u][w]["weight"] = float(rng.randint(1, 5))
    g2u = Graph.from_networkx(G2, num_parts=3)
    g2w = Graph.from_networkx(G2, weighted=True, num_parts=3)
    expu = nx.clustering(G2)
    expw = nx.clustering(G2, weight="weight")
    for v in (0, 3, 11, 24):
        assert abs(single_clustering_directed(g2u, v) - expu[v]) < 1e-12
        assert abs(single_clustering_directed(g2w, v, weighted=True) - expw[v]) < 1e-9


def _transitivity_directed_oracle(G):
    # reference formula: Σ_{(u,w)∈E} |N_out(u) ∩ N_out(w)| / Σ d(d-1)
    num = 0
    for u, w in G.edges():
        if u == w:
            continue
        num += len(set(G.successors(u)) & set(G.successors(w)))
    den = sum(d * (d - 1) for _, d in G.out_degree())
    return num / den if den else 0.0


def test_transitivity_directed():
    G = _mutated_k5()
    g = Graph.from_networkx(G, num_parts=2)
    assert abs(transitivity_directed(g) - _transitivity_directed_oracle(G)) < 1e-12
    G2 = nx.gnp_random_graph(30, 0.15, seed=6, directed=True)
    g2 = Graph.from_networkx(G2, num_parts=3)
    assert abs(transitivity_directed(g2) - _transitivity_directed_oracle(G2)) < 1e-12
