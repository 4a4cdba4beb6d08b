"""Small structure predicates & measures — thin compositions of the engine
primitives (SURVEY.md §2.8): tournament checks, dominating sets, simple
paths, isomorphism heuristics, ego graphs, LCA, efficiency, mutual weight.

Each is one or two vectorized passes / probes; point lookups use the CSR
shard probe (zero-copy), never a driver-side row scan of the edge table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..state.graph import Graph
from .structure import _EdgeProbe
from .traversal import bfs_levels


def _probe(G) -> _EdgeProbe:
    G._ensure_built()
    return _EdgeProbe(G.csr_refs, G.n)


def _member_pairs(G, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized edge-set membership for (a[i], b[i]) pairs."""
    p = _probe(G)
    out = np.zeros(a.size, dtype=bool)
    P = G.num_parts
    for k in np.unique(a % P):
        sel = (a % P) == k
        out[sel] = p.member(int(k), a[sel], b[sel])
    return out


def has_edge(G, u: int, v: int) -> bool:
    return bool(
        _member_pairs(G, np.array([u], np.int64), np.array([v], np.int64))[0]
    )


def mutual_weight(G, u: int, v: int) -> float:
    """A[u,v] + A[v,u] (``algorithms/structuralholes.py:4-11``)."""
    G._ensure_built()
    total = 0.0
    for (a, b) in ((u, v), (v, u)):
        k = a % G.num_parts
        csr = ray.get(G.csr_refs[k])
        pos = np.searchsorted(csr["srcs"], a)
        if pos < csr["srcs"].size and csr["srcs"][pos] == a:
            lo, hi = csr["indptr"][pos], csr["indptr"][pos + 1]
            j = np.searchsorted(csr["dst"][lo:hi], b)
            if j < hi - lo and csr["dst"][lo + j] == b:
                total += (
                    float(csr["weight"][lo + j])
                    if csr.get("weight") is not None
                    else 1.0
                )
    return total


def is_tournament(G) -> bool:
    """Exactly one arc per unordered pair, no self loops
    (``algorithms/tournament.py:7-13``)."""
    G._ensure_built()
    if not G.directed:
        return False
    if G.self_edges:
        return False
    n = G.n
    if G.m != n * (n - 1) // 2:
        return False
    # no reciprocated pair
    from .structure import reciprocated_edge_count

    return reciprocated_edge_count(G) == 0


def score_sequence(G) -> list[int]:
    """Sorted out-degrees (``tournament.py:16-22``)."""
    df = G.degrees_ds("out").to_pandas()
    return sorted(int(x) for x in df["degree"].values)


def tournament_matrix(G) -> ray.data.Dataset:
    """T = A - Aᵀ as (row, col, value) (``tournament.py:25-27``)."""
    G._ensure_built()

    def _pos(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "row": t["src"],
                "col": t["dst"],
                "value": pa.array(np.ones(t.num_rows)),
            }
        )

    def _neg(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "row": t["dst"],
                "col": t["src"],
                "value": pa.array(np.full(t.num_rows, -1.0)),
            }
        )

    e = G.edges_ds()
    return e.map_batches(_pos, batch_format="pyarrow").union(
        e.map_batches(_neg, batch_format="pyarrow")
    )


def is_triad(G) -> bool:
    """Directed, order 3, no self edges (``algorithms/triads.py:6-12``)."""
    G._ensure_built()
    return G.directed and G.n == 3 and G.self_edges == 0


def is_isolate(G, v: int) -> bool:
    from .structure import isolates

    return int(v) in {int(r["v"]) for r in isolates(G).take_all()}


def is_dominating_set(G, S) -> bool:
    """S ∪ N(S) covers V (``algorithms/dominating.py:6-8``)."""
    G._ensure_built()
    S = set(int(s) for s in S)
    if not S:
        return G.n == 0
    sarr = np.array(sorted(S), dtype=np.int64)

    def _nbrs(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(sarr, s), sarr.size - 1)
        keep = sarr[pos] == s
        in_s = np.minimum(np.searchsorted(sarr, d), sarr.size - 1)
        keep &= sarr[in_s] != d  # members of S are covered regardless
        return pa.table({"v": pa.array(np.unique(d[keep]))})

    # distinct-count aggregate (groupby count of unique covered vertices)
    # instead of collecting the covered set on the driver
    nbrs = G.edges_ds().map_batches(_nbrs, batch_format="pyarrow")
    distinct = nbrs.groupby("v").count()
    n_covered = distinct.count() + len(S)
    return n_covered == G.n


def is_simple_path(G, nodes) -> bool:
    """Consecutive pairs are edges, no repeated nodes
    (``algorithms/simple_paths.py:6-29``)."""
    G._ensure_built()
    nodes = [int(x) for x in nodes]
    if len(nodes) == 0:
        return False
    if len(set(nodes)) != len(nodes):
        return False
    if any(v < 0 or v >= G.n for v in nodes):
        return False
    if len(nodes) == 1:
        return True
    a = np.array(nodes[:-1], dtype=np.int64)
    b = np.array(nodes[1:], dtype=np.int64)
    return bool(_member_pairs(G, a, b).all())


def is_k_regular(G, k: int) -> bool:
    """All degrees == k (undirected; ``algorithms/regular.py:20-30``)."""
    df = G.degrees_ds("out").to_pandas()
    return bool((df["degree"] == k).all())


def efficiency(G, u: int, v: int) -> float:
    """1 / shortest-path-length, 0 if unreachable
    (``algorithms/efficiency_measures.py:7-12``)."""
    df = bfs_levels(G, u).to_pandas()
    hit = df[df["v"] == int(v)]
    if hit.empty or int(hit["level"].iloc[0]) == 0:
        return 0.0 if hit.empty else float("inf")
    return 1.0 / int(hit["level"].iloc[0])


def fast_could_be_isomorphic(G, H) -> bool:
    """Compare sorted (degree, triangle) sequences
    (``algorithms/isomorphism/isomorph.py:30-56``)."""
    from .triangles import triangles_dict

    if G.n != H.n:
        return False
    dg = G.degrees_ds("out", include_self=False).to_pandas()
    dh = H.degrees_ds("out", include_self=False).to_pandas()
    tg, th = triangles_dict(G), triangles_dict(H)
    sg = sorted(zip(dg.sort_values("v")["degree"], (tg[v] for v in sorted(tg))))
    sh = sorted(zip(dh.sort_values("v")["degree"], (th[v] for v in sorted(th))))
    return sg == sh


def faster_could_be_isomorphic(G, H) -> bool:
    """Compare sorted degree sequences (``isomorph.py:12-27``)."""
    if G.n != H.n:
        return False
    dg = sorted(G.degrees_ds("out", include_self=False).to_pandas()["degree"])
    dh = sorted(H.degrees_ds("out", include_self=False).to_pandas()["degree"])
    return dg == dh


def ego_graph(G, n: int, radius: int = 1, center: bool = True) -> Graph:
    """BFS ball of `radius` around n → induced subgraph on ORIGINAL ids
    (``generators/ego.py:7-24``; the reference renumbers, we keep ids)."""
    G._ensure_built()
    df = bfs_levels(G, n, cutoff=radius).to_pandas()
    keep = set(int(v) for v in df["v"])
    if not center:
        keep.discard(int(n))
    karr = np.array(sorted(keep), dtype=np.int64)

    def _induced(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        if karr.size == 0:
            return t.slice(0, 0)
        ps = np.minimum(np.searchsorted(karr, s), karr.size - 1)
        pd_ = np.minimum(np.searchsorted(karr, d), karr.size - 1)
        m = (karr[ps] == s) & (karr[pd_] == d)
        return t.filter(pa.array(m))

    ds = G.edges_ds().map_batches(_induced, batch_format="pyarrow")
    return Graph(ds, n=G.n, directed=G.directed, weighted=G.weighted, num_parts=G.num_parts)


def lowest_common_ancestor(G, n1: int, n2: int, default=None):
    """Intersect ancestor sets; drop any that is a proper ancestor of
    another common ancestor (``algorithms/lowest_common_ancestors.py:9-21``).
    Returns the max-id LCA like the reference's deterministic pick."""
    from .traversal import ancestors

    a1 = ancestors(G, n1) | {int(n1)}
    a2 = ancestors(G, n2) | {int(n2)}
    common = a1 & a2
    if not common:
        return default
    # v is an LCA if no OTHER common ancestor is a descendant of v on the
    # path; reference: keep common ancestors with no successor in the set
    carr = np.array(sorted(common), dtype=np.int64)
    lcas = set()
    for v in common:
        from .traversal import descendants

        desc = descendants(G, v)
        if not (desc & common):
            lcas.add(v)
    return max(lcas) if lcas else default
