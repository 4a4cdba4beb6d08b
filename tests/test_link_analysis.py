"""HITS / Katz / eigenvector vs NetworkX pure-python — allclose 1e-6
(the reference validates these against nx through its dispatch suite)."""

import networkx as nx
import numpy as np
import pytest
from networkx.algorithms.link_analysis.hits_alg import _hits_python

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.link_analysis import (
    eigenvector_centrality,
    hits,
    katz_centrality,
)


def _d(ds, col):
    df = ds.to_pandas()
    return dict(zip(df["v"].astype(int), df[col].astype(float)))


def test_eigenvector():
    G = nx.gnp_random_graph(60, 0.1, seed=2)  # undirected, connected enough
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    G = nx.convert_node_labels_to_integers(G)
    n = G.number_of_nodes()
    g = Graph.from_networkx(G, num_parts=3)
    ours = _d(eigenvector_centrality(g, max_iter=500), "centrality")
    theirs = nx.eigenvector_centrality(G, max_iter=500)
    for v in theirs:
        assert abs(ours[v] - theirs[v]) < 1e-6


def test_eigenvector_directed():
    G = nx.gnp_random_graph(50, 0.15, seed=6, directed=True)
    g = Graph.from_networkx(G, num_parts=3)
    ours = _d(eigenvector_centrality(g, max_iter=500), "centrality")
    theirs = nx.eigenvector_centrality(G, max_iter=500)
    for v in theirs:
        assert abs(ours[v] - theirs[v]) < 1e-6


def test_katz():
    G = nx.gnp_random_graph(50, 0.08, seed=3, directed=True)
    g = Graph.from_networkx(G, num_parts=3)
    ours = _d(katz_centrality(g), "centrality")
    theirs = nx.katz_centrality(G)
    for v in theirs:
        assert abs(ours[v] - theirs[v]) < 1e-6


def test_katz_beta_dict():
    G = nx.gnp_random_graph(40, 0.1, seed=9, directed=True)
    beta = {v: 1.0 + (v % 3) for v in range(40)}
    g = Graph.from_networkx(G, num_parts=3)
    ours = _d(katz_centrality(g, beta=beta), "centrality")
    theirs = nx.katz_centrality(G, beta=beta)
    for v in theirs:
        assert abs(ours[v] - theirs[v]) < 1e-6


def test_hits():
    # README 4-node digraph (reference README.md:41-48, hits smoke)
    G = nx.DiGraph([(0, 1), (0, 3), (1, 0), (2, 0), (2, 1), (3, 2)])
    g = Graph.from_networkx(G, num_parts=2)
    h, a = hits(g)
    eh, ea = _hits_python(G, max_iter=100, tol=1e-8)
    oh, oa = _d(h, "hub"), _d(a, "authority")
    for v in eh:
        assert abs(oh[v] - eh[v]) < 1e-6
        assert abs(oa[v] - ea[v]) < 1e-6


def test_hits_random():
    G = nx.gnp_random_graph(40, 0.12, seed=12, directed=True)
    g = Graph.from_networkx(G, num_parts=3)
    h, a = hits(g)
    eh, ea = _hits_python(G, max_iter=100, tol=1e-8)
    oh, oa = _d(h, "hub"), _d(a, "authority")
    for v in eh:
        assert abs(oh[v] - eh[v]) < 1e-6
        assert abs(oa[v] - ea[v]) < 1e-6
