"""square_clustering vs nx.square_clustering — exact (rational arithmetic
reproduced by identical float ops)."""

import networkx as nx

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.squares import square_clustering


def _check(G, n):
    g = Graph(list(G.edges()), n=n, directed=False, num_parts=3)
    ours = (
        square_clustering(g).to_pandas().set_index("v")["square_clustering"].to_dict()
    )
    theirs = nx.square_clustering(G)
    for v in theirs:
        assert abs(ours[v] - theirs[v]) < 1e-12, (v, ours[v], theirs[v])


def test_cycle4():
    _check(nx.cycle_graph(4), 4)  # a perfect square: coefficient 1 everywhere


def test_cube():
    G = nx.convert_node_labels_to_integers(nx.hypercube_graph(3))
    _check(G, 8)


def test_random():
    G = nx.gnp_random_graph(40, 0.12, seed=9)
    G.add_nodes_from(range(45))
    _check(G, 45)


def test_complete():
    _check(nx.complete_graph(6), 6)
