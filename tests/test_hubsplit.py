"""Hub-split (skew handling) parity: with GRAFT_HUB_DEGREE forcing hub
rows out of their owner's CSR and onto the per-dst-part foreign path
(stages/hubsplit.py), every dense-mesh kernel must reproduce the Dataset
executor's results exactly (CC/LPA) or to float tolerance (PageRank)."""

import os

import networkx as nx
import numpy as np
import pytest

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.components import components_dict
from graphblas_algorithms_ray.pipelines.label_prop import label_propagation_dict
from graphblas_algorithms_ray.pipelines.pagerank import pagerank_dict
from graphblas_algorithms_ray.stages.hubsplit import hub_split


@pytest.fixture
def force_hubs():
    """Split any row with out-degree >= 25 for the duration of a test."""
    old = os.environ.get("GRAFT_HUB_DEGREE")
    os.environ["GRAFT_HUB_DEGREE"] = "25"
    yield
    if old is None:
        del os.environ["GRAFT_HUB_DEGREE"]
    else:
        os.environ["GRAFT_HUB_DEGREE"] = old


def _hubby_digraph(seed, n=200):
    """Sparse random digraph plus three heavy out-hubs (deg ~120)."""
    G = nx.gnp_random_graph(n, 0.02, seed=seed, directed=True)
    rng = np.random.RandomState(seed)
    for h in (0, 1, 7):
        for v in rng.choice(n, size=120, replace=False):
            if int(v) != h:
                G.add_edge(h, int(v))
    return G


def test_hub_split_registry(force_hubs):
    G = _hubby_digraph(71)
    g = Graph.from_networkx(G, num_parts=4)
    split = hub_split(g)
    assert split is not None and split["vids"].size >= 3
    assert {0, 1, 7} <= set(split["vids"].tolist())
    # every hub's edges are fully accounted for across the foreign arrays
    import ray

    fes = ray.get([r for r in split["fe_refs"]])
    total = sum(fe["fsrc"].size for fe in fes if fe is not None)
    assert total == int(split["cnt"].sum())


def test_pagerank_hub_split_parity(force_hubs):
    G = _hubby_digraph(72)
    g = Graph.from_networkx(G, num_parts=4)
    assert hub_split(g) is not None  # the split path is actually active
    a = pagerank_dict(g)
    b = pagerank_dict(g, executor="actors_dense")
    assert set(a) == set(b)
    np.testing.assert_allclose(
        [a[v] for v in sorted(a)], [b[v] for v in sorted(b)], atol=1e-12, rtol=0
    )


def test_pagerank_hub_split_weighted_parity(force_hubs):
    G = _hubby_digraph(73)
    rng = np.random.RandomState(5)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.randint(1, 5))
    gw = Graph.from_networkx(G, weighted=True, num_parts=4)
    assert hub_split(gw) is not None
    a = pagerank_dict(gw)
    b = pagerank_dict(gw, executor="actors_dense")
    np.testing.assert_allclose(
        [a[v] for v in sorted(a)], [b[v] for v in sorted(b)], atol=1e-12, rtol=0
    )


def test_cc_hub_split_parity(force_hubs):
    # undirected: CSR is symmetrized, so the hub rows carry both directions
    G = nx.gnp_random_graph(200, 0.008, seed=74)
    for v in range(1, 80):
        G.add_edge(0, v)
    g = Graph(list(G.edges()), n=200, directed=False, num_parts=4)
    assert hub_split(g) is not None
    assert components_dict(g) == components_dict(g, executor="actors_dense")


def test_lpa_hub_split_parity(force_hubs):
    G = nx.ring_of_cliques(16, 5)  # 80 nodes
    for v in range(2, 80, 2):
        G.add_edge(0, v)
    g = Graph(list(G.edges()), n=80, directed=False, num_parts=4)
    assert hub_split(g) is not None
    assert label_propagation_dict(g, max_iter=15) == label_propagation_dict(
        g, max_iter=15, executor="actors_dense"
    )


def test_hub_split_multi_part_per_worker(force_hubs):
    # A=2 actors owning P=5 parts with n % P != 0: hub ownership, foreign
    # arrays and the per-part layout cache must all stay keyed by part
    old = os.environ.get("GRAFT_DENSE_ACTORS")
    os.environ["GRAFT_DENSE_ACTORS"] = "2"
    try:
        G = _hubby_digraph(75, n=203)
        g = Graph.from_networkx(G, num_parts=5)
        assert hub_split(g) is not None
        a = pagerank_dict(g)
        b = pagerank_dict(g, executor="actors_dense")
        np.testing.assert_allclose(
            [a[v] for v in sorted(a)], [b[v] for v in sorted(b)], atol=1e-12, rtol=0
        )
        G2 = nx.gnp_random_graph(203, 0.008, seed=76)
        for v in range(1, 80):
            G2.add_edge(0, v)
        g2 = Graph(list(G2.edges()), n=203, directed=False, num_parts=5)
        assert components_dict(g2) == components_dict(g2, executor="actors_dense")
        assert label_propagation_dict(g2, max_iter=12) == label_propagation_dict(
            g2, max_iter=12, executor="actors_dense"
        )
    finally:
        if old is None:
            del os.environ["GRAFT_DENSE_ACTORS"]
        else:
            os.environ["GRAFT_DENSE_ACTORS"] = old
