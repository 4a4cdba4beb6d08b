"""Multi-source BFS / all-pairs, bidirectional SP, google_matrix, FW."""

import networkx as nx
import numpy as np

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.allpairs import (
    all_pairs_shortest_path_length,
    bidirectional_shortest_path_length,
    multi_source_bfs,
)
from graphblas_algorithms_ray.pipelines.small_fallbacks import (
    floyd_warshall,
    google_matrix,
)

# pure-python nx pagerank oracle for google_matrix cross-check
from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python


def test_multi_source_bfs():
    G = nx.gnp_random_graph(60, 0.06, seed=10, directed=True)
    g = Graph.from_networkx(G, num_parts=3)
    sources = [0, 5, 11]
    df = multi_source_bfs(g, sources).to_pandas()
    got = {
        (int(r["source"]), int(r["v"])): int(r["level"]) for _, r in df.iterrows()
    }
    for s in sources:
        exp = nx.single_source_shortest_path_length(G, s)
        mine = {v: lvl for (ss, v), lvl in got.items() if ss == s}
        assert mine == exp


def test_all_pairs():
    G = nx.gnp_random_graph(40, 0.08, seed=12, directed=True)
    g = Graph.from_networkx(G, num_parts=3)
    df = all_pairs_shortest_path_length(g, chunk=16).to_pandas()
    got = {}
    for _, r in df.iterrows():
        got.setdefault(int(r["source"]), {})[int(r["v"])] = int(r["level"])
    exp = dict(nx.all_pairs_shortest_path_length(G))
    assert got == {s: dict(d) for s, d in exp.items()}


def test_bidirectional():
    G = nx.path_graph(8, create_using=nx.DiGraph)
    g = Graph.from_networkx(G, num_parts=2)
    assert bidirectional_shortest_path_length(g, 0, 5) == 5
    assert bidirectional_shortest_path_length(g, 5, 0) is None


def test_google_matrix_powers_to_pagerank():
    G = nx.gnp_random_graph(30, 0.1, seed=14, directed=True)
    g = Graph.from_networkx(G, num_parts=2)
    M = google_matrix(g)
    assert M.shape == (30, 30)
    np.testing.assert_allclose(M.sum(axis=1), 1.0, atol=1e-12)
    # power iteration on M must converge to pagerank
    x = np.full(30, 1.0 / 30)
    for _ in range(200):
        x = x @ M
    # nx's own stop rule leaves ~1e-4 error in its result; our 200-step
    # power iteration is essentially exact
    pr = _pagerank_python(G)
    np.testing.assert_allclose(x, [pr[v] for v in range(30)], atol=1e-4, rtol=0)


def test_floyd_warshall():
    rng = np.random.RandomState(2)
    G = nx.gnp_random_graph(25, 0.15, seed=2, directed=True)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.randint(1, 9))
    g = Graph.from_networkx(G, weighted=True, num_parts=2)
    df = floyd_warshall(g).to_pandas()
    got = {(int(r["src"]), int(r["dst"])): r["dist"] for _, r in df.iterrows()}
    exp = dict(nx.floyd_warshall(G))
    for s, dd in exp.items():
        for d, dist in dd.items():
            if np.isfinite(dist):
                assert abs(got[(s, d)] - dist) < 1e-9
            else:
                assert (s, d) not in got
