"""The actor-BSP executor must produce EXACTLY the Dataset executor's
results (same stage callables, different exchange)."""

import networkx as nx
import numpy as np

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.components import components_dict
from graphblas_algorithms_ray.pipelines.label_prop import label_propagation_dict
from graphblas_algorithms_ray.pipelines.pagerank import pagerank_dict


def test_pagerank_executor_parity():
    G = nx.gnp_random_graph(120, 0.05, seed=21, directed=True)
    g = Graph.from_networkx(G, num_parts=4)
    a = pagerank_dict(g)
    b = pagerank_dict(g, executor="actors")
    assert set(a) == set(b)
    np.testing.assert_allclose(
        [a[v] for v in sorted(a)], [b[v] for v in sorted(b)], atol=1e-14, rtol=0
    )


def test_cc_executor_parity():
    G = nx.gnp_random_graph(150, 0.015, seed=22)
    g = Graph(list(G.edges()), n=150, directed=False, num_parts=4)
    assert components_dict(g) == components_dict(g, executor="actors")


def test_lpa_executor_parity():
    G = nx.ring_of_cliques(5, 4)
    g = Graph(list(G.edges()), n=20, directed=False, num_parts=3)
    assert label_propagation_dict(g, max_iter=10) == label_propagation_dict(
        g, max_iter=10, executor="actors"
    )


def test_fused_executor_parity():
    # the fused in-actor peer-to-peer chunk loop (run_fused) must match the
    # Dataset executor exactly, including mid-chunk convergence stops
    G = nx.gnp_random_graph(120, 0.05, seed=23, directed=True)
    g = Graph.from_networkx(G, num_parts=4)
    a = pagerank_dict(g)
    b = pagerank_dict(g, executor="actors_fused")
    assert set(a) == set(b)
    np.testing.assert_allclose(
        [a[v] for v in sorted(a)], [b[v] for v in sorted(b)], atol=1e-14, rtol=0
    )
    G2 = nx.gnp_random_graph(150, 0.015, seed=24)
    g2 = Graph(list(G2.edges()), n=150, directed=False, num_parts=4)
    assert components_dict(g2) == components_dict(g2, executor="actors_fused")
    G3 = nx.ring_of_cliques(5, 4)
    g3 = Graph(list(G3.edges()), n=20, directed=False, num_parts=3)
    assert label_propagation_dict(g3, max_iter=10) == label_propagation_dict(
        g3, max_iter=10, executor="actors_fused"
    )


def test_dense_executor_parity():
    # dense-accumulator fused mesh (DensePool): same results as the Dataset
    # executor to float-reassociation tolerance, on plain / weighted /
    # personalized / nstart / dangling variants
    import numpy as np

    G = nx.gnp_random_graph(150, 0.06, seed=31, directed=True)
    g = Graph.from_networkx(G, num_parts=4)
    a = pagerank_dict(g)
    b = pagerank_dict(g, executor="actors_dense")
    np.testing.assert_allclose(
        [a[v] for v in sorted(a)], [b[v] for v in sorted(b)], atol=1e-12, rtol=0
    )
    rng = np.random.RandomState(3)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.randint(1, 5))
    gw = Graph.from_networkx(G, weighted=True, num_parts=4)
    pers = {0: 1.0, 3: 2.0, 17: 1.0}
    nstart = {v: 1.0 + (v % 3) for v in range(150)}
    dang = {v: 1.0 for v in range(150)}
    aw = pagerank_dict(gw, personalization=pers, nstart=nstart, dangling=dang)
    bw = pagerank_dict(
        gw, personalization=pers, nstart=nstart, dangling=dang, executor="actors_dense"
    )
    np.testing.assert_allclose(
        [aw[v] for v in sorted(aw)], [bw[v] for v in sorted(bw)], atol=1e-12, rtol=0
    )


def test_cc_dense_executor_parity():
    # dense min-label mesh must match the Dataset executor EXACTLY
    G = nx.gnp_random_graph(200, 0.012, seed=41)
    g = Graph(list(G.edges()), n=200, directed=False, num_parts=4)
    assert components_dict(g) == components_dict(g, executor="actors_dense")


def test_lpa_dense_executor_parity():
    # dense-layout LPA mesh must match the Dataset executor EXACTLY
    G = nx.ring_of_cliques(6, 5)
    g = Graph(list(G.edges()), n=30, directed=False, num_parts=4)
    assert label_propagation_dict(g, max_iter=15) == label_propagation_dict(
        g, max_iter=15, executor="actors_dense"
    )
    G2 = nx.gnp_random_graph(200, 0.02, seed=61)
    g2 = Graph(list(G2.edges()), n=200, directed=False, num_parts=4)
    assert label_propagation_dict(g2, max_iter=20) == label_propagation_dict(
        g2, max_iter=20, executor="actors_dense"
    )


def test_dense_multi_part_per_worker_parity():
    # ADVICE r2 (high): with A actors < P parts each _DenseWorker owns
    # several parts (range(aid, P, A)); the per-part layout cache must be
    # keyed by part or every part silently reuses part 0's edges. Use
    # n % P != 0 so universe sizes differ (shape mismatch would raise) AND
    # check values, which catches the equal-universe silent-wrong case too.
    import os

    old = os.environ.get("GRAFT_DENSE_ACTORS")
    os.environ["GRAFT_DENSE_ACTORS"] = "2"
    try:
        G = nx.gnp_random_graph(150, 0.06, seed=51, directed=True)
        g = Graph.from_networkx(G, num_parts=8)  # 150 % 8 != 0, A=2 < P=8
        a = pagerank_dict(g)
        b = pagerank_dict(g, executor="actors_dense")
        np.testing.assert_allclose(
            [a[v] for v in sorted(a)], [b[v] for v in sorted(b)], atol=1e-12, rtol=0
        )
        G2 = nx.gnp_random_graph(200, 0.012, seed=52)
        g2 = Graph(list(G2.edges()), n=200, directed=False, num_parts=8)  # 200 % 8 == 0
        assert components_dict(g2) == components_dict(g2, executor="actors_dense")
        G3 = nx.gnp_random_graph(150, 0.03, seed=53)
        g3 = Graph(list(G3.edges()), n=150, directed=False, num_parts=8)
        assert label_propagation_dict(g3, max_iter=15) == label_propagation_dict(
            g3, max_iter=15, executor="actors_dense"
        )
    finally:
        if old is None:
            os.environ.pop("GRAFT_DENSE_ACTORS", None)
        else:
            os.environ["GRAFT_DENSE_ACTORS"] = old
