"""PageRank vs NetworkX oracle — allclose 1e-6 (BASELINE.md correctness gate).

Covers the reference's corner cases (pagerank_alg.py:12-101): dangling
nodes, personalization, nstart, dangling-weights dicts, self-loops,
weighted graphs, directed + undirected, multiple alphas.
"""

import networkx as nx
import numpy as np
import pytest

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.pagerank import pagerank_dict
from graphblas_algorithms_ray.stages.fixpoint import ConvergenceFailure


# scipy is not in this environment; use networkx's pure-python reference
from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python


def _compare(G_nx, n, directed, weighted=False, alpha=0.85, **kw):
    g = Graph.from_networkx(G_nx, weighted=weighted, num_parts=3)
    ours = pagerank_dict(g, alpha=alpha, **kw)
    theirs = _pagerank_python(
        G_nx, alpha=alpha, weight="weight" if weighted else None, **kw
    )
    assert set(ours) == set(theirs)
    o = np.array([ours[v] for v in sorted(ours)])
    t = np.array([theirs[v] for v in sorted(theirs)])
    np.testing.assert_allclose(o, t, atol=1e-6, rtol=0)


def test_readme_digraph():
    # README 4-node weighted digraph (reference README.md:41-48)
    edges = [(0, 1, 1.0), (0, 3, 2.0), (1, 0, 3.0), (2, 0, 4.0), (2, 1, 5.0), (3, 2, 6.0)]
    G = nx.DiGraph()
    G.add_weighted_edges_from(edges)
    _compare(G, 4, True, weighted=True)
    # unweighted view too
    G2 = nx.DiGraph()
    G2.add_edges_from([(u, v) for u, v, _ in edges])
    _compare(G2, 4, True)


@pytest.mark.parametrize("n,p,seed,directed", [(50, 0.1, 1, True), (50, 0.1, 2, False), (200, 0.05, 3, True)])
def test_random_graphs(n, p, seed, directed):
    G = nx.gnp_random_graph(n, p, seed=seed, directed=directed)
    _compare(G, n, directed)


def test_dangling_and_isolated():
    G = nx.DiGraph()
    G.add_edges_from([(0, 1), (1, 2), (2, 0), (3, 0)])
    G.add_nodes_from([4, 5])  # isolated (also dangling)
    G.add_edge(6, 6)  # self loop
    _compare(G, 7, True)


def test_personalization_nstart_dangling():
    G = nx.gnp_random_graph(40, 0.1, seed=7, directed=True)
    pers = {v: (v % 3) + 1.0 for v in range(40)}
    nst = {v: 1.0 + (v % 5) for v in range(40)}
    dang = {v: (v % 4) + 0.5 for v in range(40)}
    _compare(G, 40, True, personalization=pers)
    _compare(G, 40, True, nstart=nst)
    _compare(G, 40, True, personalization=pers, dangling=dang)
    _compare(G, 40, True, alpha=0.6)


def test_convergence_failure():
    G = nx.gnp_random_graph(50, 0.1, seed=11, directed=True)
    g = Graph.from_networkx(G, num_parts=2)
    with pytest.raises(ConvergenceFailure):
        pagerank_dict(g, max_iter=2)
