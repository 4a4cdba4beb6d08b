"""k-truss, generalized degree, boundary/cuts vs NetworkX — exact."""

import networkx as nx
import numpy as np

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.core import generalized_degree, k_truss
from graphblas_algorithms_ray.pipelines import cuts


def _edges_und(g):
    return {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in g.edges_ds().take_all()
        if r["src"] != r["dst"]
    }


def test_k_truss():
    G = nx.gnp_random_graph(60, 0.15, seed=7)
    g = Graph(list(G.edges()), n=60, directed=False, num_parts=3)
    for k in (3, 4, 5):
        ours = _edges_und(k_truss(g, k))
        theirs = {
            (min(u, v), max(u, v)) for u, v in nx.k_truss(G, k).edges()
        }
        assert ours == theirs, f"k={k}"


def test_generalized_degree():
    G = nx.gnp_random_graph(40, 0.15, seed=3)
    g = Graph(list(G.edges()), n=40, directed=False, num_parts=3)
    df = generalized_degree(g).to_pandas()
    ours = {}
    for _, r in df.iterrows():
        ours.setdefault(int(r["v"]), {})[int(r["tri_count"])] = int(r["n_edges"])
    gd = nx.generalized_degree(G)
    theirs = {v: dict(gd[v]) for v in G.nodes()}
    # nx returns entries only for nodes with edges
    for v, c in theirs.items():
        assert ours.get(v, {}) == c


def test_boundary_cuts():
    G = nx.gnp_random_graph(50, 0.1, seed=4)
    g = Graph(list(G.edges()), n=50, directed=False, num_parts=3)
    S = set(range(0, 50, 3))
    eb = {
        (r["src"], r["dst"]) for r in cuts.edge_boundary(g, S).take_all()
    }
    exp_eb = set()
    for u, v in nx.edge_boundary(G, S):
        # our undirected table has both orientations; boundary emits src∈S
        exp_eb.add((u, v) if u in S else (v, u))
    assert eb == exp_eb
    assert cuts.node_boundary(g, S) == nx.node_boundary(G, S)
    assert cuts.cut_size(g, S) == nx.cut_size(G, S)
    assert abs(cuts.volume(g, S) - nx.volume(G, S)) < 1e-12
    assert abs(cuts.conductance(g, S) - nx.conductance(G, S)) < 1e-12
    assert abs(
        cuts.normalized_cut_size(g, S) - nx.normalized_cut_size(G, S)
    ) < 1e-12
    assert abs(cuts.edge_expansion(g, S) - nx.edge_expansion(G, S)) < 1e-12
    assert abs(cuts.mixing_expansion(g, S) - nx.mixing_expansion(G, S)) < 1e-12


def test_cuts_directed():
    G = nx.gnp_random_graph(40, 0.08, seed=6, directed=True)
    g = Graph.from_networkx(G, num_parts=3)
    S = set(range(0, 40, 4))
    T = set(range(40)) - S  # nx requires explicit T on directed graphs
    assert cuts.cut_size(g, S) == nx.cut_size(G, S, T)


def test_k_truss_k_below_3_identity():
    # ADVICE r1: k < 3 leaves the graph unchanged (nx parity), pendant kept
    G = nx.Graph([(0, 1), (1, 2), (0, 2), (2, 3)])
    g = Graph(list(G.edges()), n=4, directed=False, num_parts=2)
    for k in (0, 1, 2):
        ours = _edges_und(k_truss(g, k))
        theirs = {(min(u, v), max(u, v)) for u, v in nx.k_truss(G, k).edges()}
        assert ours == theirs, f"k={k}"


def test_expansions_vs_nx():
    # node_expansion = |union of S's neighborhoods| / |S| (not boundary∪S)
    G = nx.gnp_random_graph(40, 0.15, seed=3)
    g = Graph(list(G.edges()), n=40, directed=False, num_parts=3)
    S = set(range(0, 40, 4))
    assert abs(cuts.node_expansion(g, S) - nx.node_expansion(G, S)) < 1e-12
    assert abs(cuts.edge_expansion(g, S) - nx.edge_expansion(G, S)) < 1e-12
    assert abs(cuts.boundary_expansion(g, S) - nx.boundary_expansion(G, S)) < 1e-12
    assert abs(cuts.mixing_expansion(g, S) - nx.mixing_expansion(G, S)) < 1e-12


def test_node_boundary_ds_streams_distinct():
    # VERDICT r3: node_boundary returned a driver-side set only; the
    # Dataset variant must stream the distinct boundary
    import networkx as nx

    from graphblas_algorithms_ray.pipelines.cuts import (
        node_boundary,
        node_boundary_ds,
    )
    from graphblas_algorithms_ray.state.graph import Graph

    G = nx.gnp_random_graph(60, 0.12, seed=13)
    g = Graph.from_networkx(G, num_parts=4)
    S = set(range(0, 60, 4))
    ds_rows = sorted(int(r["v"]) for r in node_boundary_ds(g, S).take_all())
    assert len(ds_rows) == len(set(ds_rows))  # distinct
    assert set(ds_rows) == nx.node_boundary(G, S)
    assert node_boundary(g, S) == nx.node_boundary(G, S)
