"""Round-5 Dispatcher additions: operators, dense linalg, cut expansions,
community quality, shortest-path aliases, misc singletons — each checked
against networkx (or nx's documented numpy formula where nx needs scipy)."""

import networkx as nx
import numpy as np
import pytest

from graphblas_algorithms_ray.interface import Dispatcher as D, convert_to_nx


def _same_graph(a, b):
    assert sorted(map(str, a.nodes())) == sorted(map(str, b.nodes()))
    if a.is_directed():
        assert sorted(map(str, a.edges())) == sorted(map(str, b.edges()))
    else:
        assert sorted(map(str, map(sorted, map(lambda e: tuple(map(str, e)), a.edges())))) == sorted(
            map(str, map(sorted, map(lambda e: tuple(map(str, e)), b.edges())))
        )


@pytest.fixture(scope="module")
def graphs():
    G = nx.Graph([("a", "b"), ("b", "c"), ("c", "a")])
    G.add_node("z")
    H = nx.Graph([("b", "c"), ("c", "d")])
    G2 = nx.Graph([(0, 1), (1, 2), (2, 3)])
    H2 = nx.Graph([(1, 2), (2, 3), (0, 3)])
    G2.add_nodes_from(H2)
    H2.add_nodes_from(G2)
    return G, H, G2, H2


def test_operator_dispatch_matches_nx(graphs):
    G, H, G2, H2 = graphs
    Hr = nx.relabel_nodes(H, {n: f"h{n}" for n in H})
    _same_graph(convert_to_nx(D.union(G, Hr)), nx.union(G, Hr))
    _same_graph(convert_to_nx(D.disjoint_union(G2, H2)), nx.disjoint_union(G2, H2))
    _same_graph(convert_to_nx(D.intersection(G, H)), nx.intersection(G, H))
    _same_graph(convert_to_nx(D.difference(G2, H2)), nx.difference(G2, H2))
    _same_graph(
        convert_to_nx(D.symmetric_difference(G2, H2)), nx.symmetric_difference(G2, H2)
    )
    _same_graph(convert_to_nx(D.compose(G, H)), nx.compose(G, H))
    _same_graph(convert_to_nx(D.complement(G)), nx.complement(G))
    _same_graph(
        convert_to_nx(D.full_join(G2, H2, rename=("g", "h"))),
        nx.full_join(G2, H2, rename=("g", "h")),
    )
    DG = nx.DiGraph([("a", "b"), ("b", "c")])
    _same_graph(convert_to_nx(D.reverse(DG)), DG.reverse())
    with pytest.raises(nx.NetworkXError):
        D.reverse(G)
    with pytest.raises(nx.NetworkXError):
        D.union(G, G)  # overlapping labels
    with pytest.raises(nx.NetworkXError):
        D.difference(G, H)  # unequal node sets


def test_dense_linalg_matches_nx_formulas():
    G = nx.karate_club_graph()
    A = nx.to_numpy_array(G)  # weighted (karate carries weights)
    Au = nx.to_numpy_array(G, weight=None)
    assert np.allclose(D.adjacency_matrix(G), A)
    assert np.allclose(D.laplacian_matrix(G), np.diag(A.sum(1)) - A)
    d = A.sum(1)
    inv = 1 / np.sqrt(d)
    assert np.allclose(
        D.normalized_laplacian_matrix(G), inv[:, None] * (np.diag(d) - A) * inv[None, :]
    )
    # nx bethe: weighted A/D, UNWEIGHTED degrees for default r
    r = sum(dd**2 for _, dd in nx.degree(G)) / sum(dd for _, dd in nx.degree(G)) - 1
    H = (r**2 - 1) * np.eye(34) - r * A + np.diag(A.sum(1))
    assert np.allclose(D.bethe_hessian_matrix(G), H)
    k = Au.sum(1)
    assert np.allclose(D.modularity_matrix(G), Au - np.outer(k, k) / k.sum())
    DG = nx.DiGraph([(0, 1), (1, 2), (2, 0), (0, 2)])
    Ad = nx.to_numpy_array(DG)
    assert np.allclose(
        D.directed_modularity_matrix(DG),
        Ad - np.outer(Ad.sum(1), Ad.sum(0)) / Ad.sum(),
    )
    # nodelist permutation = nx induced-subgraph semantics
    nl = list(G)[::-1]
    assert np.allclose(D.adjacency_matrix(G, nodelist=nl), nx.to_numpy_array(G, nodelist=nl))
    with pytest.raises(nx.NetworkXNotImplemented):
        D.modularity_matrix(DG)
    with pytest.raises(nx.NetworkXNotImplemented):
        D.directed_modularity_matrix(G)


def test_shortest_path_aliases_match_nx():
    G = nx.gnp_random_graph(30, 0.15, seed=7, directed=True)
    assert {k: v for k, v in D.all_pairs_shortest_path_length(G)} == dict(
        nx.all_pairs_shortest_path_length(G)
    )
    for u, v, dd in G.edges(data=True):
        dd["weight"] = (u * 7 + v) % 5 + 0.5
    exp = {s: dict(dd) for s, dd in nx.all_pairs_bellman_ford_path_length(G)}
    got = {s: dd for s, dd in D.all_pairs_bellman_ford_path_length(G)}
    assert set(got) == set(exp)
    for s in got:
        assert set(got[s]) == set(exp[s])
        for t in got[s]:
            assert abs(got[s][t] - exp[s][t]) < 1e-9
    assert (
        abs(D.bellman_ford_path_length(G, 0, 5) - nx.bellman_ford_path_length(G, 0, 5))
        < 1e-9
    )
    with pytest.raises(nx.NodeNotFound):
        D.bellman_ford_path_length(G, 0, 999)
    assert D.single_target_shortest_path_length(G, 3) == dict(
        nx.single_target_shortest_path_length(G, 3)
    )
    WG = nx.Graph()
    WG.add_weighted_edges_from([(0, 1, 2.0), (1, 2, 3.0), (3, 3, 1.0)])
    assert np.allclose(D.floyd_warshall_numpy(WG), nx.floyd_warshall_numpy(WG))
    nl = [2, 0, 3, 1]
    assert np.allclose(
        D.floyd_warshall_numpy(WG, nodelist=nl), nx.floyd_warshall_numpy(WG, nodelist=nl)
    )
    with pytest.raises(nx.NetworkXError):
        D.floyd_warshall_numpy(WG, nodelist=[0, 1])


def test_expansions_and_misc_match_nx():
    G = nx.karate_club_graph()
    S = set(range(10))
    for fn in ("edge_expansion", "mixing_expansion", "node_expansion", "boundary_expansion"):
        assert abs(getattr(D, fn)(G, S) - getattr(nx, fn)(G, S)) < 1e-12, fn
    WG = nx.Graph()
    WG.add_weighted_edges_from([(0, 1, 2.5), (1, 2, 1.5)])
    from networkx.algorithms.structuralholes import mutual_weight as nxmw

    assert D.mutual_weight(WG, 0, 1, weight="weight") == nxmw(WG, 0, 1, "weight")
    assert D.mutual_weight(WG, 0, 9, weight="weight") == 0
    T = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    exp = np.zeros((3, 3))
    for u, v in T.edges():
        exp[u, v] = 1
        exp[v, u] = -1
    assert np.allclose(D.tournament_matrix(T), exp)
    with pytest.raises(nx.NetworkXNotImplemented):
        D.tournament_matrix(nx.Graph([(0, 1)]))


def test_community_quality_reference_semantics():
    # reference algorithms/community/quality.py: ordered-pair counts over
    # the stored adjacency; inter requires the DST to be assigned
    DG = nx.DiGraph([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")])
    part = [{"a", "b", "c"}, {"d", "e"}]
    assert D.intra_community_edges(DG, part) == 4  # a->b,b->c,c->a,d->e
    assert D.inter_community_edges(DG, part) == 1  # c->d
    # unassigned dst never counts; unassigned src counts toward inter
    part2 = [{"a", "b"}]
    assert D.intra_community_edges(DG, part2) == 1  # a->b
    assert D.inter_community_edges(DG, part2) == 1  # c->a (src c unassigned)


def test_katz_beta_validation_matches_nx():
    # nx centrality/katz.py: non-numeric beta is treated as a mapping and
    # must cover every node, else NetworkXException
    G = nx.Graph([(0, 1)])
    with pytest.raises(nx.NetworkXException):
        D.katz_centrality(G, 0.1, beta={0: 77})
    with pytest.raises(nx.NetworkXException):
        D.katz_centrality(G, 0.1, beta="foo")
    # full dict still works
    res = D.katz_centrality(G, 0.1, beta={0: 1.0, 1: 1.0})
    exp = nx.katz_centrality(G, 0.1, beta={0: 1.0, 1: 1.0})
    assert all(abs(res[k] - exp[k]) < 1e-6 for k in exp)
    # nx keeps a non-float beta AS-IS and checks set(beta) against the
    # node set — an iterable of pairs must raise (set is the pairs),
    # never be dict-converted into a passing mapping
    with pytest.raises(nx.NetworkXError):
        D.katz_centrality(G, 0.1, beta=[(0, 1.0), (1, 1.0)])
    with pytest.raises(nx.NetworkXError):
        nx.katz_centrality(G, 0.1, beta=[(0, 1.0), (1, 1.0)])  # nx agrees
    # a non-dict Mapping whose keys ARE the nodes is accepted (nx: b[n])
    class M:
        def __iter__(self):
            return iter([0, 1])
        def __getitem__(self, k):
            return 1.0
    res = D.katz_centrality(G, 0.1, beta=M())
    assert all(abs(res[k] - exp[k]) < 1e-6 for k in exp)


def test_degree_centrality_small_graphs_match_nx():
    # nx degree_alg.py: len(G) <= 1 short-circuits the 1/(n-1) divisor
    for factory in (nx.Graph, nx.DiGraph):
        E = nx.empty_graph(0, create_using=factory)
        S = nx.empty_graph(1, create_using=factory)
        assert D.degree_centrality(E) == {} == nx.degree_centrality(E)
        assert D.degree_centrality(S) == {0: 1} == nx.degree_centrality(S)
    DG = nx.empty_graph(1, create_using=nx.DiGraph)
    assert D.in_degree_centrality(DG) == {0: 1} == nx.in_degree_centrality(DG)
    assert D.out_degree_centrality(DG) == {0: 1} == nx.out_degree_centrality(DG)


def test_sssp_length_absent_source_raises_node_not_found():
    G = nx.cycle_graph(7)
    with pytest.raises(nx.NodeNotFound):
        D.single_source_shortest_path_length(G, 8)


def test_eigenvector_zero_nstart_raises():
    G = nx.Graph([(1, 2), (1, 3), (2, 3)])
    with pytest.raises(nx.NetworkXException, match="cannot have all zero"):
        D.eigenvector_centrality(G, nstart={v: 0 for v in G})
