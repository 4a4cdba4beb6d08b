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
