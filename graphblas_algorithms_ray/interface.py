"""NetworkX-backend-style dispatch surface.

The reference's primary public surface is ``nx.pagerank(G,
backend="graphblas")`` via a ``Dispatcher`` of nx-named staticmethods plus
``convert_from_nx`` / ``convert_to_nx`` (reference
``graphblas_algorithms/interface.py:9-266``, entry points in
``pyproject.toml:66-73``). This module is that surface for the Ray engine:

  * ``convert_from_nx(nx_graph, weight=...)`` → engine ``Graph`` carrying
    the label↔dense-id dictionary (the reference's ``_key_to_id``,
    ``classes/graph.py:378-381``) — arbitrary hashable node labels work.
  * ``Dispatcher.<nx_name>(graph, ...)`` — nx signatures in, nx result
    shapes out (dicts keyed by original labels, scalars, sets, nx graphs).
    Accepts either an nx graph (converted on the fly, cached on the
    graph object) or an engine ``Graph``.

Entry-point registration (``networkx.backends``) requires an installed
distribution; in-process use is ``Dispatcher.pagerank(G)`` or
``nx.config``-free direct calls — the conformance tests drive exactly
that path.
"""

from __future__ import annotations

import networkx as nx
import numpy as np

from .state.graph import Graph

_CACHE_ATTR = "__gar_graph__"


def convert_from_nx(graph, weight: str | None = None) -> Graph:
    """nx (Di)Graph with arbitrary hashable labels → engine Graph with the
    label dictionary attached. Engine Graphs pass through unchanged."""
    if isinstance(graph, Graph):
        return graph
    if graph.is_multigraph():
        # parallel-edge semantics (multi-counted volumes/cuts, per-key
        # edge data) have no engine representation; silently collapsing
        # them returns WRONG numbers (found by nx's own test_cuts) —
        # refuse instead. nx's test machinery xfails on this.
        raise NotImplementedError("MultiGraph/MultiDiGraph are not supported")
    # cache inside nx's own __networkx_cache__: every nx mutation method
    # (add/remove edge, attribute writes via nx APIs) clears that dict, so
    # count-preserving STRUCTURAL mutations can't serve a stale conversion
    # (ADVICE r3). Only UNWEIGHTED conversions are cached: a weighted
    # conversion also depends on attr values, and direct attr-dict writes
    # (G[u][v]['weight'] = x) bypass nx's cache clearing — nx's own
    # backend cache documents the same caveat and test mode disables it
    # (found by nx's test_negative_cycle_heuristic).
    nx_cache = (
        getattr(graph, "__networkx_cache__", None) if weight is None else None
    )
    ckey = (_CACHE_ATTR, weight)
    if isinstance(nx_cache, dict):
        cached = nx_cache.get(ckey)
        if cached is not None:
            return cached
    nodes = list(graph.nodes())
    key_to_id = {k: i for i, k in enumerate(nodes)}
    if weight is not None:
        edges = [
            (key_to_id[u], key_to_id[v], float(d.get(weight, 1.0)))
            for u, v, d in graph.edges(data=True)
        ]
    else:
        edges = [(key_to_id[u], key_to_id[v]) for u, v in graph.edges()]
    g = Graph(
        edges,
        n=len(nodes),
        directed=graph.is_directed(),
        weighted=weight is not None,
    )
    g._key_to_id = key_to_id
    g._id_to_key = nodes
    if isinstance(nx_cache, dict):
        nx_cache[ckey] = g
    return g


def _key_of(g: Graph, i: int):
    keys = getattr(g, "_id_to_key", None)
    return keys[i] if keys is not None else i


def _id_of(g: Graph, k):
    m = getattr(g, "_key_to_id", None)
    if m is None:
        return int(k)
    return m[k]


def _contains(g: Graph, key) -> bool:
    """Membership test for a label against the conversion dictionary
    (or the dense id range for engine Graphs). May raise TypeError for
    unhashable keys — callers use that to detect iterables."""
    m = getattr(g, "_key_to_id", None)
    if m is None:
        return isinstance(key, (int, np.integer)) and 0 <= int(key) < _num_nodes(g)
    return key in m


def _ids_in(g: Graph, nbunch) -> set:
    """nbunch semantics: silently ignore labels not in the graph."""
    m = getattr(g, "_key_to_id", None)
    if m is None:
        n = _num_nodes(g)
        return {int(k) for k in nbunch if 0 <= int(k) < n}
    return {m[k] for k in nbunch if k in m}


def _map_keys(g: Graph, d: dict) -> dict:
    """Map internal ids → nx labels, in nx NODE ORDER: ids were assigned by
    enumerate(graph.nodes()) in convert_from_nx, so ascending id == nx
    insertion order. nx's own tests compare list(result.values()), which
    makes dict order part of the API (found by the borrowed nx suite)."""
    keys = getattr(g, "_id_to_key", None)
    if keys is None:
        return {i: d[i] for i in sorted(d)}
    return {keys[i]: d[i] for i in range(len(keys)) if i in d}


def _num_nodes(graph) -> int:
    """Node count for either input kind: nx graphs (direct calls) or
    engine Graphs (nx test mode converts first, then calls the backend)."""
    if isinstance(graph, Graph):
        if graph.n is None:
            graph._ensure_built()
        return graph.n
    return graph.number_of_nodes()


def _map_dict_in(g: Graph, d: dict | None) -> dict | None:
    if d is None:
        return None
    return {_id_of(g, k): v for k, v in d.items()}


def _vertex_dict(g: Graph, ds, col: str, cast=float) -> dict:
    df = ds.to_pandas()
    if len(df) == 0:  # all-empty blocks can drop columns entirely
        return {}
    return _map_keys(g, {int(r): cast(x) for r, x in zip(df["v"], df[col])})


def convert_to_nx(obj, *, name: str | None = None):
    """Engine results → nx-facing objects (Graph → nx graph; Datasets are
    converted inside the dispatcher methods, which know their shapes).
    Graphs carry their label dictionary back out: ids map through
    ``_id_to_key`` (set by ``convert_from_nx`` and by the operator glue),
    so ``nx.union(G, H, backend=...)`` round-trips original labels."""
    if isinstance(obj, Graph):
        obj._ensure_built()
        keys = getattr(obj, "_id_to_key", None)
        out = nx.DiGraph() if obj.directed else nx.Graph()
        if keys is None:
            out.add_nodes_from(range(obj.n))
        else:
            out.add_nodes_from(keys)
        edges = obj.edges_pandas()
        if len(edges) == 0 or "src" not in edges.columns:
            return out
        srcs = edges["src"].astype(int)
        dsts = edges["dst"].astype(int)
        if obj.weighted and "weight" in edges.columns:
            ws = edges["weight"].astype(float)
            if keys is None:
                out.add_weighted_edges_from(zip(srcs, dsts, ws))
            else:
                out.add_weighted_edges_from(
                    (keys[u], keys[v], w) for u, v, w in zip(srcs, dsts, ws)
                )
        elif keys is None:
            out.add_edges_from(zip(srcs, dsts))
        else:
            out.add_edges_from((keys[u], keys[v]) for u, v in zip(srcs, dsts))
        return out
    return obj


def _keys_list(g: Graph) -> list:
    """The graph's node labels in id order (ids themselves if no dict)."""
    keys = getattr(g, "_id_to_key", None)
    if keys is not None:
        return list(keys)
    return list(range(_num_nodes(g)))


def _node_labels(graph) -> list:
    """Node labels for either input kind (see _num_nodes)."""
    if isinstance(graph, Graph):
        return _keys_list(graph)
    return list(graph)


def _set_keys(g: Graph, keys) -> Graph:
    g._id_to_key = list(keys)
    g._key_to_id = {k: i for i, k in enumerate(g._id_to_key)}
    return g


def _remapped_graph(g: Graph, trans: np.ndarray, n_out: int) -> Graph:
    """g's edge table pushed through the id-translation array ``trans``
    (entry −1 drops the edge) as a new engine Graph over the output id
    space — the operator glue's vectorized analog of the reference's
    ``A[ids, ids]`` permutations (``algorithms/operators/binary.py``).
    One streaming map over the edge blocks; no driver materialization."""
    import pyarrow as pa

    g._ensure_built()
    weighted = g.weighted

    def _remap(t: pa.Table) -> pa.Table:
        s = trans[t["src"].to_numpy(zero_copy_only=False)]
        d = trans[t["dst"].to_numpy(zero_copy_only=False)]
        keep = (s >= 0) & (d >= 0)
        cols = {"src": pa.array(s[keep]), "dst": pa.array(d[keep])}
        if weighted and "weight" in t.column_names:
            cols["weight"] = pa.array(
                t["weight"].to_numpy(zero_copy_only=False)[keep]
            )
        return pa.table(cols)

    # edges_ds() of an undirected graph already carries both directions;
    # feed the remapped table back in as directed to avoid re-symmetrizing
    # (the downstream operator result keeps the logical directedness).
    return Graph(
        g.edges_ds().map_batches(_remap, batch_format="pyarrow"),
        n=n_out,
        directed=True,
        weighted=weighted,
        num_parts=g.num_parts,
    )


_DENSE_NX_LIMIT = 4096  # n×n numpy outputs (linalg glue) refuse above this


def _dense_adjacency(g: Graph, nodelist=None) -> np.ndarray:
    """Dense adjacency over the converted graph (weights if converted
    weighted), rows/cols ordered by ``nodelist`` labels (nx semantics:
    the matrix of the induced subgraph). Small-graph nx surface only —
    the streaming coordinate form is ``pipelines.linalg``."""
    g._ensure_built()
    n = g.n
    if n > _DENSE_NX_LIMIT:
        raise NotImplementedError(
            f"dense n×n output; n={n} > {_DENSE_NX_LIMIT} "
            "(use pipelines.linalg for the coordinate Dataset form)"
        )
    A = np.zeros((n, n))
    edges = g.edges_pandas()
    if len(edges) and "src" in edges.columns:
        s = edges["src"].to_numpy().astype(np.int64)
        d = edges["dst"].to_numpy().astype(np.int64)
        w = (
            edges["weight"].to_numpy().astype(float)
            if g.weighted and "weight" in edges.columns
            else np.ones(s.size)
        )
        A[s, d] = w
    if nodelist is not None:
        ids = np.array([_id_of(g, k) for k in nodelist], dtype=np.int64)
        A = A[np.ix_(ids, ids)]
    return A


class Dispatcher:
    """nx-named entry points over the Ray engine (reference
    ``interface.py`` Dispatcher parity for the implemented surface).
    Registered as the ``networkx.backends`` entry point ``graphblas_ray``
    (pyproject.toml), so ``nx.pagerank(G, backend="graphblas_ray")``
    dispatches here when the distribution is installed."""

    # -- nx backend conversion protocol (reference interface.py:174-241) --
    @staticmethod
    def convert_from_nx(
        graph,
        edge_attrs=None,
        node_attrs=None,
        preserve_edge_attrs=False,
        preserve_node_attrs=False,
        preserve_graph_attrs=False,
        name=None,
        graph_name=None,
        *,
        weight=None,
    ):
        if preserve_edge_attrs and edge_attrs is None:
            attrs = set().union(
                *(d for nbrs in graph._adj.values() for d in nbrs.values())
            )
            if len(attrs) == 1:
                edge_attrs = {attrs.pop(): None}
            elif attrs:
                raise NotImplementedError(
                    "preserve_edge_attrs=True with multiple attrs is not implemented"
                )
        if node_attrs or preserve_node_attrs:
            raise NotImplementedError("node attribute conversion is not implemented")
        if edge_attrs:
            if len(edge_attrs) > 1:
                raise NotImplementedError("multiple edge attributes not implemented")
            if weight is not None:
                raise TypeError("edge_attrs and weight both given")
            [[weight, default]] = edge_attrs.items()
            if default is not None and default != 1:
                raise NotImplementedError(f"edge default != 1 not implemented: {default}")
        return convert_from_nx(graph, weight)

    @staticmethod
    def convert_to_nx(obj, *, name=None):
        return convert_to_nx(obj, name=name)

    # -- link analysis -------------------------------------------------
    @staticmethod
    def pagerank(
        graph,
        alpha=0.85,
        personalization=None,
        max_iter=100,
        tol=1e-6,
        nstart=None,
        weight="weight",
        dangling=None,
    ):
        from .stages.fixpoint import ConvergenceFailure
        from .pipelines.pagerank import pagerank

        if _num_nodes(graph) == 0:
            return {}  # nx parity
        g = convert_from_nx(graph, None)
        try:
            res = pagerank(
                g,
                alpha=alpha,
                personalization=_map_dict_in(g, personalization),
                max_iter=max_iter,
                tol=tol,
                nstart=_map_dict_in(g, nstart),
                dangling=_map_dict_in(g, dangling),
            )
            return _vertex_dict(g, res, "pagerank")
        except ConvergenceFailure as e:
            raise nx.PowerIterationFailedConvergence(max_iter) from e

    @staticmethod
    def hits(graph, max_iter=100, tol=1e-8, nstart=None, normalized=True):
        from .pipelines.link_analysis import ConvergenceFailure, hits

        if _num_nodes(graph) == 0:
            return {}, {}  # nx parity
        g = convert_from_nx(graph, None)
        try:
            h, a = hits(g, max_iter=max_iter, tol=tol, normalized=normalized)
        except ConvergenceFailure as e:
            raise nx.PowerIterationFailedConvergence(max_iter) from e
        return _vertex_dict(g, h, "hub"), _vertex_dict(g, a, "authority")

    @staticmethod
    def eigenvector_centrality(graph, max_iter=100, tol=1e-6, nstart=None, weight=None):
        from .pipelines.link_analysis import ConvergenceFailure, eigenvector_centrality

        if _num_nodes(graph) == 0:
            raise nx.NetworkXPointlessConcept(
                "cannot compute centrality for the null graph"
            )
        if nstart is not None and all(v == 0 for v in nstart.values()):
            raise nx.NetworkXException("initial vector cannot have all zero values")
        g = convert_from_nx(graph, weight)
        try:
            res = eigenvector_centrality(
                g, max_iter=max_iter, tol=tol, nstart=_map_dict_in(g, nstart)
            )
        except ConvergenceFailure as e:
            raise nx.PowerIterationFailedConvergence(max_iter) from e
        return _vertex_dict(g, res, "centrality")

    @staticmethod
    def katz_centrality(
        graph, alpha=0.1, beta=1.0, max_iter=1000, tol=1e-6, nstart=None,
        normalized=True, weight=None,
    ):
        from .pipelines.link_analysis import ConvergenceFailure, katz_centrality

        # nx parity (centrality/katz.py): on float(beta) failure nx keeps
        # beta AS-IS and requires set(beta) == set(G) — it does NOT
        # dict-convert first, so an iterable of pairs like [(0, 1.), (1,
        # 1.)] must RAISE (its set is the pairs, not the nodes), never be
        # silently accepted as a mapping.
        if not isinstance(beta, dict):
            try:
                beta = float(beta)
            except (TypeError, ValueError, AttributeError) as err:
                try:
                    cover = set(beta) == set(_node_labels(graph))
                except TypeError:
                    cover = False
                if not cover:
                    raise nx.NetworkXError(
                        "beta dictionary must have a value for every node"
                    ) from err
                beta = {k: beta[k] for k in set(beta)}
        if isinstance(beta, dict) and set(beta) != set(_node_labels(graph)):
            raise nx.NetworkXError(
                "beta dictionary must have a value for every node"
            )
        if _num_nodes(graph) == 0:
            return {}  # nx parity
        g = convert_from_nx(graph, weight)
        b = _map_dict_in(g, beta) if isinstance(beta, dict) else beta
        try:
            res = katz_centrality(
                g, alpha=alpha, beta=b, max_iter=max_iter, tol=tol,
                nstart=_map_dict_in(g, nstart), normalized=normalized,
            )
        except ConvergenceFailure as e:
            raise nx.PowerIterationFailedConvergence(max_iter) from e
        return _vertex_dict(g, res, "centrality")

    # -- degrees -------------------------------------------------------
    @staticmethod
    def degree_centrality(graph):
        from .pipelines.centrality import degree_centrality

        if _num_nodes(graph) <= 1:  # nx parity: 1/(n-1) special case
            return {n: 1 for n in _node_labels(graph)}
        g = convert_from_nx(graph, None)
        mode = "total" if g.directed else "out"
        return _vertex_dict(g, degree_centrality(g, mode=mode), "centrality")

    @staticmethod
    def in_degree_centrality(graph):
        from .pipelines.centrality import degree_centrality

        if _num_nodes(graph) <= 1:  # nx parity: 1/(n-1) special case
            return {n: 1 for n in _node_labels(graph)}
        g = convert_from_nx(graph, None)
        return _vertex_dict(g, degree_centrality(g, mode="in"), "centrality")

    @staticmethod
    def out_degree_centrality(graph):
        from .pipelines.centrality import degree_centrality

        if _num_nodes(graph) <= 1:  # nx parity: 1/(n-1) special case
            return {n: 1 for n in _node_labels(graph)}
        g = convert_from_nx(graph, None)
        return _vertex_dict(g, degree_centrality(g, mode="out"), "centrality")

    # -- clustering / triangles ---------------------------------------
    @staticmethod
    def triangles(graph, nodes=None):
        from .pipelines.triangles import single_triangle, triangles_dict

        g = convert_from_nx(graph, None)
        if nodes is not None and not isinstance(nodes, (list, set, tuple)):
            return int(single_triangle(g, _id_of(g, nodes)))
        full = _map_keys(g, triangles_dict(g))
        if nodes is None:
            return full
        return {k: full[k] for k in nodes}

    @staticmethod
    def clustering(graph, nodes=None, weight=None):
        from .pipelines.triangles import clustering, single_clustering
        from .pipelines.cluster_directed import clustering_directed

        g = convert_from_nx(graph, weight)
        if g.directed:
            from .pipelines.cluster_directed import single_clustering_directed

            if nodes is not None and not isinstance(nodes, (list, set, tuple)):
                return float(
                    single_clustering_directed(
                        g, _id_of(g, nodes), weighted=weight is not None
                    )
                )
            res = _vertex_dict(
                g, clustering_directed(g, weighted=weight is not None), "clustering"
            )
        else:
            if nodes is not None and not isinstance(nodes, (list, set, tuple)):
                return float(
                    single_clustering(g, _id_of(g, nodes), weighted=weight is not None)
                )
            res = _vertex_dict(g, clustering(g, weight=weight), "clustering")
        if nodes is None:
            return res
        if not isinstance(nodes, (list, set, tuple)):
            return res[nodes]
        return {k: res[k] for k in nodes}

    @staticmethod
    def transitivity(graph):
        from .pipelines.triangles import transitivity
        from .pipelines.cluster_directed import transitivity_directed

        g = convert_from_nx(graph, None)
        return float(transitivity_directed(g) if g.directed else transitivity(g))

    @staticmethod
    def average_clustering(graph, nodes=None, weight=None, count_zeros=True):
        from .pipelines.triangles import average_clustering
        from .pipelines.cluster_directed import average_clustering_directed

        if _num_nodes(graph) == 0:
            raise ZeroDivisionError  # nx parity (sum(c)/len(c) on empty)
        # nx reduces the per-node dict on the driver (sum(c)/len(c) in node
        # order, count_zeros dropping only |v| == 0); reproducing that here
        # keeps FLOAT-EXACT parity — nx's own tests compare with `==`. The
        # distributed aggregates stay available via pipelines.triangles.
        cl = Dispatcher.clustering(
            graph, nodes=list(nodes) if nodes is not None else None, weight=weight
        )
        vals = [v for v in cl.values() if count_zeros or abs(v) > 0]
        return float(sum(vals) / len(vals))

    @staticmethod
    def square_clustering(graph, nodes=None):
        from .pipelines.squares import square_clustering

        g = convert_from_nx(graph, None)
        res = _vertex_dict(g, square_clustering(g), "square_clustering")
        if nodes is None:
            return res
        if not isinstance(nodes, (list, set, tuple)):
            return res[nodes]
        return {k: res[k] for k in nodes}

    @staticmethod
    def generalized_degree(graph, nodes=None):
        from .pipelines.core import generalized_degree
        from .pipelines.triangles import single_generalized_degree

        if _num_nodes(graph) == 0:
            return {}
        g = convert_from_nx(graph, None)
        if nodes is not None and not isinstance(nodes, (list, set, tuple)):
            return single_generalized_degree(g, _id_of(g, nodes))
        df = generalized_degree(g).to_pandas()
        out: dict = {}
        if len(df):
            for v, tc, ne in zip(df["v"], df["tri_count"], df["n_edges"]):
                out.setdefault(int(v), {})[int(tc)] = int(ne)
        if nodes is not None:
            return {k: out.get(_id_of(g, k), {}) for k in nodes}
        keys = getattr(g, "_id_to_key", None)
        if keys is None:
            return {i: out.get(i, {}) for i in sorted(out)}
        return {keys[i]: out[i] for i in range(len(keys)) if i in out}

    @staticmethod
    def k_truss(graph, k):
        from .pipelines.core import k_truss

        g = convert_from_nx(graph, None)
        res = k_truss(g, k)
        out = nx.Graph()
        keys = getattr(g, "_id_to_key", None)
        edges = res.edges_pandas()
        for u, v in zip(edges["src"].astype(int), edges["dst"].astype(int)):
            if u <= v:
                a = keys[u] if keys else u
                b = keys[v] if keys else v
                out.add_edge(a, b)
        return out

    # -- components ----------------------------------------------------
    @staticmethod
    def is_connected(graph):
        from .pipelines.components import is_connected

        if _num_nodes(graph) == 0:
            raise nx.NetworkXPointlessConcept(
                "Connectivity is undefined for the null graph."
            )
        return bool(is_connected(convert_from_nx(graph, None)))

    @staticmethod
    def is_weakly_connected(graph):
        from .pipelines.components import is_weakly_connected

        if _num_nodes(graph) == 0:
            raise nx.NetworkXPointlessConcept(
                "Connectivity is undefined for the null graph."
            )
        return bool(is_weakly_connected(convert_from_nx(graph, None)))

    @staticmethod
    def node_connected_component(graph, n):
        from .pipelines.components import node_connected_component

        g = convert_from_nx(graph, None)
        comp = node_connected_component(g, _id_of(g, n))
        if hasattr(comp, "take_all"):  # Dataset of (v, ...) rows
            comp = [r["v"] for r in comp.take_all()]
        return {_key_of(g, int(v)) for v in comp}

    # -- traversal / shortest paths -----------------------------------
    @staticmethod
    def single_source_shortest_path_length(graph, source, cutoff=None):
        from .pipelines.traversal import bfs_levels

        g = convert_from_nx(graph, None)
        if not _contains(g, source):
            raise nx.NodeNotFound(f"Source {source} is not in G")
        d = {
            r["v"]: int(r["level"])
            for r in bfs_levels(g, _id_of(g, source)).take_all()
        }
        if cutoff is not None:
            d = {k: v for k, v in d.items() if v <= cutoff}
        return _map_keys(g, d)

    @staticmethod
    def single_source_bellman_ford_path_length(graph, source, weight="weight"):
        from .pipelines.shortest_paths import Unbounded, bellman_ford_dict

        g = convert_from_nx(graph, weight)
        if not _contains(g, source):
            raise nx.NodeNotFound(f"Node {source} is not found in the graph")
        try:
            return _map_keys(g, bellman_ford_dict(g, _id_of(g, source)))
        except Unbounded as e:
            raise nx.NetworkXUnbounded("Negative cycle detected.") from e

    @staticmethod
    def bellman_ford_path(graph, source, target, weight="weight"):
        from .pipelines.shortest_paths import bellman_ford_path

        g = convert_from_nx(graph, weight)
        for node in (source, target):
            if not _contains(g, node):
                raise nx.NodeNotFound(f"Node {node} is not found in the graph")
        path = bellman_ford_path(g, _id_of(g, source), _id_of(g, target))
        return [_key_of(g, v) for v in path]

    @staticmethod
    def negative_edge_cycle(graph, weight="weight", heuristic=True):
        from .pipelines.shortest_paths import negative_edge_cycle

        # heuristic only affects nx's early-exit strategy, not the answer
        return bool(negative_edge_cycle(convert_from_nx(graph, weight)))

    @staticmethod
    def descendants(graph, source):
        from .pipelines.traversal import descendants

        g = convert_from_nx(graph, None)
        if not _contains(g, source):
            raise nx.NetworkXError(f"The node {source} is not in the graph.")
        return {_key_of(g, v) for v in descendants(g, _id_of(g, source))}

    @staticmethod
    def ancestors(graph, source):
        from .pipelines.traversal import ancestors

        g = convert_from_nx(graph, None)
        if not _contains(g, source):
            raise nx.NetworkXError(f"The node {source} is not in the graph.")
        return {_key_of(g, v) for v in ancestors(g, _id_of(g, source))}

    @staticmethod
    def bfs_layers(graph, sources):
        from .pipelines.traversal import bfs_layers

        g = convert_from_nx(graph, None)
        # nx semantics: a single node IN the graph, else any iterable
        # (generators included); unknown sources raise NetworkXError
        try:
            single = _contains(g, sources)
        except TypeError:
            single = False
        keys = [sources] if single else list(sources)
        for k in keys:
            if not _contains(g, k):
                raise nx.NetworkXError(f"The node {k} is not in the graph.")
        src = [_id_of(g, k) for k in keys]

        def _gen():
            for layer in bfs_layers(g, src):
                yield [_key_of(g, v) for v in layer]

        return _gen()

    @staticmethod
    def descendants_at_distance(graph, source, distance):
        from .pipelines.traversal import descendants_at_distance

        g = convert_from_nx(graph, None)
        if not _contains(g, source):
            raise nx.NetworkXError(f"The node {source} is not in the graph.")
        return {
            _key_of(g, v)
            for v in descendants_at_distance(g, _id_of(g, source), distance)
        }

    @staticmethod
    def has_path(graph, source, target):
        from .pipelines.traversal import has_path

        g = convert_from_nx(graph, None)
        return bool(has_path(g, _id_of(g, source), _id_of(g, target)))

    # -- cuts / boundary ----------------------------------------------
    @staticmethod
    def cut_size(graph, S, T=None, weight=None):
        from .pipelines.cuts import cut_size

        g = convert_from_nx(graph, weight)
        S2 = {_id_of(g, s) for s in S}
        T2 = {_id_of(g, t) for t in T} if T is not None else None
        return cut_size(g, S2, T2, weighted=weight is not None)

    @staticmethod
    def volume(graph, S, weight=None):
        from .pipelines.cuts import volume

        g = convert_from_nx(graph, weight)
        return volume(g, {_id_of(g, s) for s in S}, weighted=weight is not None)

    @staticmethod
    def conductance(graph, S, T=None, weight=None):
        from .pipelines.cuts import conductance

        g = convert_from_nx(graph, weight)
        S2 = {_id_of(g, s) for s in S}
        T2 = {_id_of(g, t) for t in T} if T is not None else None
        return conductance(g, S2, T2, weighted=weight is not None)

    @staticmethod
    def normalized_cut_size(graph, S, T=None, weight=None):
        from .pipelines.cuts import normalized_cut_size

        g = convert_from_nx(graph, weight)
        S2 = {_id_of(g, s) for s in S}
        T2 = {_id_of(g, t) for t in T} if T is not None else None
        return normalized_cut_size(g, S2, T2, weighted=weight is not None)

    @staticmethod
    def node_boundary(graph, nbunch1, nbunch2=None):
        from .pipelines.cuts import node_boundary

        if _num_nodes(graph) == 0:
            return set()
        g = convert_from_nx(graph, None)
        S = _ids_in(g, nbunch1)
        out = node_boundary(g, S)
        if nbunch2 is not None:
            out = out & _ids_in(g, nbunch2)
        return {_key_of(g, v) for v in out}

    @staticmethod
    def edge_boundary(graph, nbunch1, nbunch2=None, data=False, keys=False, default=None):
        from .pipelines.cuts import edge_boundary

        if data is not False or keys is not False:
            raise NotImplementedError("edge data/keys views are not supported")
        if _num_nodes(graph) == 0:
            return iter(())
        g = convert_from_nx(graph, None)
        S = _ids_in(g, nbunch1)
        T = _ids_in(g, nbunch2) if nbunch2 is not None else None
        res = edge_boundary(g, S, T)
        if hasattr(res, "take_all"):
            rows = [(r["src"], r["dst"]) for r in res.take_all()]
        else:
            rows = list(res)
        return iter([(_key_of(g, int(u)), _key_of(g, int(v))) for u, v in rows])

    # -- structure -----------------------------------------------------
    @staticmethod
    def reciprocity(graph, nodes=None):
        from .pipelines.structure import overall_reciprocity, reciprocity

        g = convert_from_nx(graph, None)
        if nodes is None:
            return Dispatcher.overall_reciprocity(graph)
        if not isinstance(nodes, (list, set, tuple)):
            res = _vertex_dict(g, reciprocity(g, nodes=[_id_of(g, nodes)]), "reciprocity")
            if nodes not in res:  # degree-0 node: nx parity
                raise nx.NetworkXError("Not defined for isolated nodes.")
            return res[nodes]
        res = _vertex_dict(
            g, reciprocity(g, nodes=[_id_of(g, k) for k in nodes]), "reciprocity"
        )
        if len(res) < len({k for k in nodes}):
            raise nx.NetworkXError("Not defined for isolated nodes.")
        return res

    @staticmethod
    def overall_reciprocity(graph):
        from .pipelines.structure import overall_reciprocity

        g = convert_from_nx(graph, None)
        g._ensure_built()
        if g.m == 0:
            raise nx.NetworkXError("Not defined for empty graphs")
        return float(overall_reciprocity(g))

    @staticmethod
    def is_isolate(graph, n):
        from .pipelines.misc import is_isolate

        g = convert_from_nx(graph, None)
        return bool(is_isolate(g, _id_of(g, n)))

    @staticmethod
    def isolates(graph):
        from .pipelines.structure import isolates

        g = convert_from_nx(graph, None)
        for r in isolates(g).take_all():
            yield _key_of(g, int(r["v"]))

    @staticmethod
    def number_of_isolates(graph):
        from .pipelines.structure import number_of_isolates

        return int(number_of_isolates(convert_from_nx(graph, None)))

    @staticmethod
    def is_regular(graph):
        from .pipelines.structure import is_regular

        if _num_nodes(graph) == 0:
            raise nx.NetworkXPointlessConcept("Graph has no nodes.")
        return bool(is_regular(convert_from_nx(graph, None)))

    @staticmethod
    def is_tournament(graph):
        from .pipelines.misc import is_tournament

        return bool(is_tournament(convert_from_nx(graph, None)))

    @staticmethod
    def score_sequence(graph):
        from .pipelines.misc import score_sequence

        return score_sequence(convert_from_nx(graph, None))

    @staticmethod
    def is_triad(graph):
        from .pipelines.misc import is_triad

        return bool(is_triad(convert_from_nx(graph, None)))

    @staticmethod
    def is_k_regular(graph, k):
        from .pipelines.misc import is_k_regular

        return bool(is_k_regular(convert_from_nx(graph, None), k))

    @staticmethod
    def is_dominating_set(graph, nbunch):
        from .pipelines.misc import is_dominating_set

        g = convert_from_nx(graph, None)
        return bool(is_dominating_set(g, _ids_in(g, nbunch)))

    @staticmethod
    def is_simple_path(graph, nodes):
        from .pipelines.misc import is_simple_path

        g = convert_from_nx(graph, None)
        keys = list(nodes)
        if any(not _contains(g, k) for k in keys):
            return False  # nx parity: unknown nodes make the path invalid
        return bool(is_simple_path(g, [_id_of(g, k) for k in keys]))

    @staticmethod
    def efficiency(graph, u, v):
        from .pipelines.misc import efficiency

        g = convert_from_nx(graph, None)
        return float(efficiency(g, _id_of(g, u), _id_of(g, v)))

    @staticmethod
    def s_metric(graph, **kwargs):
        from .pipelines.structure import s_metric

        # nx <3.4 accepted a deprecated `normalized` kwarg; refuse truthy
        if kwargs.pop("normalized", False):
            raise nx.NetworkXError("Normalization not implemented")
        if kwargs:
            raise TypeError(f"unexpected kwargs: {sorted(kwargs)}")
        return float(s_metric(convert_from_nx(graph, None)))

    @staticmethod
    def lowest_common_ancestor(graph, node1, node2, default=None):
        from .pipelines.misc import lowest_common_ancestor

        if _num_nodes(graph) == 0:
            raise nx.NetworkXPointlessConcept(
                "LCA meaningless on null graphs."
            )
        g = convert_from_nx(graph, None)
        # nx parity: LCA is only defined on DAGs. Kahn peel on the edge
        # table (driver-side — this nx-facing tier is the small-graph
        # surface; engine users call pipelines.misc directly).
        g._ensure_built()
        edges = g.edges_pandas()
        if len(edges) == 0:  # edgeless: trivially a DAG (empty frames
            # can also drop columns entirely)
            res = lowest_common_ancestor(
                g, _id_of(g, node1), _id_of(g, node2), default=None
            )
            return default if res is None else _key_of(g, int(res))
        indeg = np.zeros(g.n, np.int64)
        src_a = edges["src"].to_numpy().astype(np.int64)
        dst_a = edges["dst"].to_numpy().astype(np.int64)
        np.add.at(indeg, dst_a, 1)
        order = np.argsort(src_a, kind="stable")
        s_sorted, d_sorted = src_a[order], dst_a[order]
        bounds = np.searchsorted(s_sorted, np.arange(g.n + 1))
        frontier = list(np.nonzero(indeg == 0)[0])
        removed = 0
        while frontier:
            v = int(frontier.pop())
            removed += 1
            for d in d_sorted[bounds[v] : bounds[v + 1]]:
                indeg[d] -= 1
                if indeg[d] == 0:
                    frontier.append(d)
        if removed < g.n:
            raise nx.NetworkXError(
                "LCA only defined on directed acyclic graphs."
            )
        res = lowest_common_ancestor(
            g, _id_of(g, node1), _id_of(g, node2), default=None
        )
        return default if res is None else _key_of(g, int(res))

    @staticmethod
    def fast_could_be_isomorphic(graph1, graph2):
        from .pipelines.misc import fast_could_be_isomorphic

        return bool(
            fast_could_be_isomorphic(
                convert_from_nx(graph1, None), convert_from_nx(graph2, None)
            )
        )

    @staticmethod
    def faster_could_be_isomorphic(graph1, graph2):
        from .pipelines.misc import faster_could_be_isomorphic

        return bool(
            faster_could_be_isomorphic(
                convert_from_nx(graph1, None), convert_from_nx(graph2, None)
            )
        )

    @staticmethod
    def ego_graph(graph, n, radius=1, center=True, undirected=False, distance=None):
        import pyarrow as pa

        from .pipelines.traversal import bfs_levels

        if distance is not None:
            raise NotImplementedError("weighted ego distance is not implemented")
        g = convert_from_nx(graph, None)
        g._ensure_built()
        # nx semantics: undirected=True changes only NODE SELECTION (BFS
        # on the symmetrized graph); the returned subgraph keeps the
        # original arcs and graph type (found by code review r4)
        walk = g.to_undirected() if (undirected and g.directed) else g
        ball = {
            int(r["v"])
            for r in bfs_levels(walk, _id_of(g, n), cutoff=radius).take_all()
        }
        if not center:
            ball.discard(_id_of(g, n))
        karr = np.array(sorted(ball), dtype=np.int64)

        def _induced(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            if karr.size == 0 or t.num_rows == 0:
                return t.slice(0, 0)
            ps = np.minimum(np.searchsorted(karr, s), karr.size - 1)
            pd_ = np.minimum(np.searchsorted(karr, d), karr.size - 1)
            m = (karr[ps] == s) & (karr[pd_] == d)
            return t.filter(pa.array(m))

        out = nx.DiGraph() if g.directed else nx.Graph()
        out.add_nodes_from(_key_of(g, v) for v in sorted(ball))
        edges = g.edges_ds().map_batches(_induced, batch_format="pyarrow")
        for r in edges.take_all():
            out.add_edge(_key_of(g, int(r["src"])), _key_of(g, int(r["dst"])))
        return out

    @staticmethod
    def floyd_warshall(graph, weight="weight"):
        from .pipelines.small_fallbacks import floyd_warshall

        import collections

        g = convert_from_nx(graph, weight)
        keys = getattr(g, "_id_to_key", None) or list(range(_num_nodes(g)))
        # nx returns dict-of-defaultdict(inf): unreachable pairs read as inf
        dist: dict = {k: collections.defaultdict(lambda: float("inf")) for k in keys}
        for r in floyd_warshall(g).take_all():
            dist[_key_of(g, int(r["src"]))][_key_of(g, int(r["dst"]))] = float(
                r["dist"]
            )
        return dist

    @staticmethod
    def floyd_warshall_predecessor_and_distance(graph, weight="weight"):
        from .pipelines.small_fallbacks import (
            floyd_warshall_predecessor_and_distance,
        )

        g = convert_from_nx(graph, weight)
        import collections

        pred_ds, dist_ds = floyd_warshall_predecessor_and_distance(g)
        keys = getattr(g, "_id_to_key", None) or list(range(_num_nodes(g)))
        # nx's pred is a defaultdict: rows appear only when written
        pred: dict = collections.defaultdict(dict)
        # nx materializes the FULL distance matrix (inf for unreachable)
        inf = float("inf")
        dist: dict = {k: {k2: inf for k2 in keys} for k in keys}
        for r in pred_ds.take_all():
            pred[_key_of(g, int(r["src"]))][_key_of(g, int(r["dst"]))] = _key_of(
                g, int(r["pred"])
            )
        for r in dist_ds.take_all():
            dist[_key_of(g, int(r["src"]))][_key_of(g, int(r["dst"]))] = float(
                r["dist"]
            )
        return pred, dist

    @staticmethod
    def google_matrix(
        graph,
        alpha=0.85,
        personalization=None,
        nodelist=None,
        weight="weight",
        dangling=None,
    ):
        from .pipelines.small_fallbacks import google_matrix

        if nodelist is not None:
            raise NotImplementedError("nodelist reordering is not implemented")
        g = convert_from_nx(graph, weight)
        return google_matrix(
            g,
            alpha=alpha,
            personalization=_map_dict_in(g, personalization),
            dangling=_map_dict_in(g, dangling),
        )

    # -- graph set operators (reference interface.py operators block;
    #    label semantics from algorithms/operators/binary.py) -----------
    @staticmethod
    def _check_same_kind(g: Graph, h: Graph):
        if g.directed != h.directed:
            raise nx.NetworkXError("G and H must both be directed or undirected.")

    @staticmethod
    def union(graph1, graph2, rename=()):
        from .pipelines.operators import disjoint_union

        g, h = convert_from_nx(graph1, None), convert_from_nx(graph2, None)
        Dispatcher._check_same_kind(g, h)
        gk, hk = _keys_list(g), _keys_list(h)
        if rename:
            if rename[0] is not None:
                gk = [f"{rename[0]}{k}" for k in gk]
            if len(rename) > 1 and rename[1] is not None:
                hk = [f"{rename[1]}{k}" for k in hk]
        if not set(gk).isdisjoint(hk):
            raise nx.NetworkXError("The node sets of the graphs are not disjoint.")
        return _set_keys(disjoint_union(g, h), gk + hk)

    @staticmethod
    def disjoint_union(graph1, graph2):
        from .pipelines.operators import disjoint_union

        g, h = convert_from_nx(graph1, None), convert_from_nx(graph2, None)
        Dispatcher._check_same_kind(g, h)
        # nx relabels to 0..n-1 in node order — exactly our dense ids
        out = disjoint_union(g, h)
        out._id_to_key = None
        out._key_to_id = None
        return out

    @staticmethod
    def intersection(graph1, graph2):
        from .pipelines.operators import intersection

        g, h = convert_from_nx(graph1, None), convert_from_nx(graph2, None)
        Dispatcher._check_same_kind(g, h)
        gk, hk = _keys_list(g), _keys_list(h)
        hset = {k: i for i, k in enumerate(hk)}
        common = [k for k in gk if k in hset]  # G-id order (reference)
        n_out = len(common)
        tg = np.full(max(g.n or 0, 1), -1, dtype=np.int64)
        th = np.full(max(h.n or 0, 1), -1, dtype=np.int64)
        for i, k in enumerate(common):
            tg[_id_of(g, k)] = i
            th[hset[k]] = i
        g2 = _remapped_graph(g, tg, n_out)
        h2 = _remapped_graph(h, th, n_out)
        out = intersection(g2, h2)
        out.directed = g.directed
        return _set_keys(out, common)

    @staticmethod
    def _aligned_pair(graph1, graph2):
        """Shared difference/symmetric_difference prep: equal label sets
        required; H permuted into G's id order."""
        g, h = convert_from_nx(graph1, None), convert_from_nx(graph2, None)
        Dispatcher._check_same_kind(g, h)
        gk, hk = _keys_list(g), _keys_list(h)
        if set(gk) != set(hk):
            raise nx.NetworkXError("Node sets of graphs not equal")
        gpos = {k: i for i, k in enumerate(gk)}
        th = np.array([gpos[k] for k in hk], dtype=np.int64)
        h2 = _remapped_graph(h, th, len(gk)) if len(gk) else h
        h2.directed = g.directed
        return g, h2, gk

    @staticmethod
    def difference(graph1, graph2):
        from .pipelines.operators import difference

        g, h2, gk = Dispatcher._aligned_pair(graph1, graph2)
        out = difference(g, h2)
        out.directed = g.directed
        return _set_keys(out, gk)

    @staticmethod
    def symmetric_difference(graph1, graph2):
        from .pipelines.operators import symmetric_difference

        g, h2, gk = Dispatcher._aligned_pair(graph1, graph2)
        out = symmetric_difference(g, h2)
        out.directed = g.directed
        return _set_keys(out, gk)

    @staticmethod
    def compose(graph1, graph2):
        from .pipelines.operators import compose

        g, h = convert_from_nx(graph1, None), convert_from_nx(graph2, None)
        Dispatcher._check_same_kind(g, h)
        gk, hk = _keys_list(g), _keys_list(h)
        gpos = {k: i for i, k in enumerate(gk)}
        out_keys = gk + [k for k in hk if k not in gpos]
        n_out = len(out_keys)
        tg = np.arange(max(g.n or 0, 1), dtype=np.int64)
        opos = {k: i for i, k in enumerate(out_keys)}
        th = np.array([opos[k] for k in hk], dtype=np.int64) if hk else np.array(
            [-1], dtype=np.int64
        )
        g2 = _remapped_graph(g, tg, n_out)
        h2 = _remapped_graph(h, th, n_out)
        out = compose(g2, h2)
        out.directed = g.directed
        return _set_keys(out, out_keys)

    @staticmethod
    def complement(graph):
        from .pipelines.operators import complement

        g = convert_from_nx(graph, None)
        out = complement(g)
        return _set_keys(out, _keys_list(g))

    @staticmethod
    def reverse(graph, copy=True):
        g = convert_from_nx(graph, None)
        if not g.directed:
            raise nx.NetworkXError("Cannot reverse an undirected graph.")
        return _set_keys(g.reverse(), _keys_list(g))

    @staticmethod
    def full_join(graph1, graph2, rename=()):
        from .pipelines.operators import full_join

        g, h = convert_from_nx(graph1, None), convert_from_nx(graph2, None)
        Dispatcher._check_same_kind(g, h)
        gk, hk = _keys_list(g), _keys_list(h)
        if rename:
            if rename[0] is not None:
                gk = [f"{rename[0]}{k}" for k in gk]
            if len(rename) > 1 and rename[1] is not None:
                hk = [f"{rename[1]}{k}" for k in hk]
        if not set(gk).isdisjoint(hk):
            raise nx.NetworkXError("The node sets of the graphs are not disjoint.")
        return _set_keys(full_join(g, h), gk + hk)

    # -- linalg (dense nx-facing fallbacks; the streaming coordinate
    #    forms are pipelines/linalg.py — reference interface.py linalg
    #    block. No scipy in this environment, so these return dense
    #    numpy arrays rather than scipy sparse.) ------------------------
    @staticmethod
    def adjacency_matrix(graph, nodelist=None, dtype=None, weight="weight"):
        g = convert_from_nx(graph, weight)
        A = _dense_adjacency(g, nodelist)
        return A.astype(dtype) if dtype is not None else A

    @staticmethod
    def laplacian_matrix(graph, nodelist=None, weight="weight"):
        g = convert_from_nx(graph, weight)
        A = _dense_adjacency(g, nodelist)
        return np.diag(A.sum(axis=1)) - A

    @staticmethod
    def normalized_laplacian_matrix(graph, nodelist=None, weight="weight"):
        g = convert_from_nx(graph, weight)
        A = _dense_adjacency(g, nodelist)
        d = A.sum(axis=1)
        with np.errstate(divide="ignore"):
            inv_sqrt = np.where(d > 0, 1.0 / np.sqrt(np.where(d > 0, d, 1.0)), 0.0)
        L = np.diag(d) - A
        return inv_sqrt[:, None] * L * inv_sqrt[None, :]

    @staticmethod
    def bethe_hessian_matrix(graph, r=None, nodelist=None):
        # nx parity: A and D use the 'weight' attribute, but the default
        # regularizer r comes from UNWEIGHTED degrees of the full graph
        # (nx.linalg.bethehessianmatrix source)
        g = convert_from_nx(graph, "weight")
        if g.directed:
            raise nx.NetworkXNotImplemented(
                "not implemented for directed type"
            )
        A_full = _dense_adjacency(g)
        if r is None:
            d = (A_full != 0).sum(axis=1).astype(float)
            # nx.degree counts a self loop twice
            d = d + (np.diag(A_full) != 0)
            denom = d.sum()
            r = (d**2).sum() / denom - 1 if denom > 0 else -1.0
        A = A_full
        if nodelist is not None:
            ids = np.array([_id_of(g, k) for k in nodelist], dtype=np.int64)
            A = A_full[np.ix_(ids, ids)]
        n = A.shape[0]
        return (r**2 - 1) * np.eye(n) - r * A + np.diag(A.sum(axis=1))

    @staticmethod
    def modularity_matrix(graph, nodelist=None, weight=None):
        g = convert_from_nx(graph, weight)
        if g.directed:
            raise nx.NetworkXNotImplemented(
                "not implemented for directed type"
            )
        A = _dense_adjacency(g, nodelist)
        k = A.sum(axis=1)
        m = k.sum()
        if m == 0:
            return A
        return A - np.outer(k, k) / m

    @staticmethod
    def directed_modularity_matrix(graph, nodelist=None, weight=None):
        g = convert_from_nx(graph, weight)
        if not g.directed:
            raise nx.NetworkXNotImplemented(
                "not implemented for undirected type"
            )
        A = _dense_adjacency(g, nodelist)
        k_out, k_in = A.sum(axis=1), A.sum(axis=0)
        m = A.sum()
        if m == 0:
            return A
        return A - np.outer(k_out, k_in) / m

    # -- cut expansions (reference interface.py cuts block) -------------
    @staticmethod
    def edge_expansion(graph, S, T=None, weight=None):
        from .pipelines.cuts import cut_size

        g = convert_from_nx(graph, weight)
        S2 = _ids_in(g, S)
        T2 = _ids_in(g, T) if T is not None else None
        cut = cut_size(g, S2, T2, weighted=weight is not None)
        nt = len(T2) if T2 is not None else _num_nodes(graph) - len(S2)
        return cut / min(len(S2), nt)

    @staticmethod
    def mixing_expansion(graph, S, T=None, weight=None):
        from .pipelines.cuts import cut_size, num_edges

        g = convert_from_nx(graph, weight)
        S2 = _ids_in(g, S)
        T2 = _ids_in(g, T) if T is not None else None
        cut = cut_size(g, S2, T2, weighted=weight is not None)
        return cut / (2.0 * num_edges(g))

    @staticmethod
    def node_expansion(graph, S):
        from .pipelines.cuts import node_expansion

        g = convert_from_nx(graph, None)
        return float(node_expansion(g, _ids_in(g, S)))

    @staticmethod
    def boundary_expansion(graph, S):
        from .pipelines.cuts import boundary_expansion

        g = convert_from_nx(graph, None)
        return float(boundary_expansion(g, _ids_in(g, S)))

    # -- community quality (reference interface.py community block) -----
    @staticmethod
    def _partition_counts(graph, partition):
        from .pipelines.structure import partition_edge_counts

        g = convert_from_nx(graph, None)
        g._ensure_built()
        comm = np.full(max(g.n, 1), -1, dtype=np.int64)
        for i, block in enumerate(partition):
            for k in block:  # ignore_extra=True semantics
                if _contains(g, k):
                    comm[_id_of(g, k)] = i
        return partition_edge_counts(g, comm)

    @staticmethod
    def intra_community_edges(graph, partition):
        return int(Dispatcher._partition_counts(graph, partition)["intra"])

    @staticmethod
    def inter_community_edges(graph, partition):
        return int(Dispatcher._partition_counts(graph, partition)["inter"])

    # -- shortest-path aliases (reference interface.py shortest_paths) --
    @staticmethod
    def bellman_ford_path_length(graph, source, target, weight="weight"):
        from .pipelines.shortest_paths import Unbounded, bellman_ford_dict

        g = convert_from_nx(graph, weight)
        for node in (source, target):
            if not _contains(g, node):
                raise nx.NodeNotFound(f"Node {node} not found")
        try:
            d = bellman_ford_dict(g, _id_of(g, source))
        except Unbounded as e:
            raise nx.NetworkXUnbounded("Negative cycle detected.") from e
        t = _id_of(g, target)
        if t not in d:
            raise nx.NetworkXNoPath(f"node {target} not reachable from {source}")
        return float(d[t])

    @staticmethod
    def all_pairs_bellman_ford_path_length(graph, weight="weight", chunksize=64):
        from .pipelines.shortest_paths import Unbounded, bellman_ford_path_lengths

        g = convert_from_nx(graph, weight)
        n = _num_nodes(g)
        chunk = max(int(chunksize) if isinstance(chunksize, int) else 64, 1)

        def _gen():
            for lo in range(0, n, chunk):
                sources = list(range(lo, min(lo + chunk, n)))
                try:
                    df = bellman_ford_path_lengths(g, sources).to_pandas()
                except Unbounded as e:
                    raise nx.NetworkXUnbounded("Negative cycle detected.") from e
                per: dict[int, dict] = {s: {} for s in sources}
                if len(df) and "source" in df.columns:
                    for s, v, dist in zip(df["source"], df["v"], df["dist"]):
                        per[int(s)][int(v)] = float(dist)
                for s in sources:
                    yield (_key_of(g, s), _map_keys(g, per[s]))

        return _gen()

    @staticmethod
    def all_pairs_shortest_path_length(graph, cutoff=None, chunksize=64):
        from .pipelines.allpairs import multi_source_bfs

        g = convert_from_nx(graph, None)
        n = _num_nodes(g)
        chunk = max(int(chunksize) if isinstance(chunksize, int) else 64, 1)

        def _gen():
            for lo in range(0, n, chunk):
                sources = list(range(lo, min(lo + chunk, n)))
                df = multi_source_bfs(g, sources).to_pandas()
                per: dict[int, dict] = {s: {} for s in sources}
                if len(df) and "source" in df.columns:
                    for s, v, lvl in zip(df["source"], df["v"], df["level"]):
                        if cutoff is None or lvl <= cutoff:
                            per[int(s)][int(v)] = int(lvl)
                for s in sources:
                    yield (_key_of(g, s), _map_keys(g, per[s]))

        return _gen()

    @staticmethod
    def single_target_shortest_path_length(graph, target, cutoff=None):
        from .pipelines.traversal import single_target_shortest_path_length

        g = convert_from_nx(graph, None)
        if not _contains(g, target):
            raise nx.NodeNotFound(f"Target {target} is not in G")
        d = {
            int(r["v"]): int(r["level"])
            for r in single_target_shortest_path_length(
                g, _id_of(g, target), cutoff=cutoff
            ).take_all()
        }
        if cutoff is not None:
            d = {k: v for k, v in d.items() if v <= cutoff}
        return _map_keys(g, d)

    @staticmethod
    def floyd_warshall_numpy(graph, nodelist=None, weight="weight"):
        from .pipelines.small_fallbacks import floyd_warshall

        g = convert_from_nx(graph, weight)
        n = _num_nodes(g)
        if nodelist is not None:
            if not (len(nodelist) == n == len(set(nodelist))):
                raise nx.NetworkXError(
                    "nodelist must contain every node in G with no repeats."
                )
            perm = np.array([_id_of(g, k) for k in nodelist], dtype=np.int64)
        else:
            perm = None
        D = np.full((n, n), np.inf)
        for r in floyd_warshall(g).take_all():
            D[int(r["src"]), int(r["dst"])] = float(r["dist"])
        if perm is not None:
            D = D[np.ix_(perm, perm)]
        return D

    # -- misc singletons -------------------------------------------------
    @staticmethod
    def mutual_weight(graph, u, v, weight=None):
        from .pipelines.misc import mutual_weight

        g = convert_from_nx(graph, weight)
        if not _contains(g, u) or not _contains(g, v):
            return 0
        return mutual_weight(g, _id_of(g, u), _id_of(g, v))

    @staticmethod
    def tournament_matrix(graph):
        from .pipelines.misc import tournament_matrix

        g = convert_from_nx(graph, None)
        if not g.directed:
            raise nx.NetworkXNotImplemented("not implemented for undirected type")
        g._ensure_built()
        if g.n > _DENSE_NX_LIMIT:
            raise NotImplementedError(
                f"dense n×n output; n={g.n} > {_DENSE_NX_LIMIT}"
            )
        T = np.zeros((g.n, g.n))
        for r in tournament_matrix(g).take_all():
            T[int(r["row"]), int(r["col"])] += float(r["value"])
        return T
