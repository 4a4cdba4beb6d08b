"""Boundary & cut measures (reference ``algorithms/boundary.py`` /
``cuts.py``) — vectorized edge-table predicates + degree-table aggregates.

Vertex sets S/T are passed as python sets (small, broadcast in the stage
closure) or vectorized predicates; every measure is one pass over the edge
table with a per-batch combiner.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _as_pred(S):
    if callable(S):
        return S
    arr = np.array(sorted(S), dtype=np.int64)

    def pred(v: np.ndarray) -> np.ndarray:
        pos = np.minimum(np.searchsorted(arr, v), max(arr.size - 1, 0))
        if arr.size == 0:
            return np.zeros(v.shape, dtype=bool)
        return arr[pos] == v

    return pred


def _set_size(G, S) -> int:
    """|S| (or |pred-selected set|) without an O(n) driver array: explicit
    sets count directly; predicates are evaluated per part in ray tasks."""
    if not callable(S):
        return len(set(S))
    import ray

    from .._util import universe

    @ray.remote
    def _count(k, n, P):
        return int(S(universe(k, n, P)).sum())

    G._ensure_built()
    return int(sum(ray.get([_count.remote(k, G.n, G.num_parts) for k in range(G.num_parts)])))


def _set_members(G, S) -> set:
    """Materialize S as a set of ids (explicit sets pass through;
    predicates are evaluated per part in ray tasks — O(|S|) to the
    driver, never O(n))."""
    if not callable(S):
        return set(int(v) for v in S)
    import ray

    from .._util import universe

    @ray.remote
    def _members(k, n, P):
        uni = universe(k, n, P)
        return uni[S(uni)]

    G._ensure_built()
    out: set = set()
    for arr in ray.get([_members.remote(k, G.n, G.num_parts) for k in range(G.num_parts)]):
        out.update(int(v) for v in arr)
    return out


def edge_boundary(G, S, T=None) -> ray.data.Dataset:
    """Edges from S to T (default: complement of S) — ``boundary.py:7-20``."""
    G._ensure_built()
    ps = _as_pred(S)
    pt = _as_pred(T) if T is not None else None

    def _f(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        keep = ps(s)
        keep &= pt(d) if pt is not None else ~ps(d)
        return t.filter(pa.array(keep))

    return G.edges_ds().map_batches(_f, batch_format="pyarrow")


def node_boundary_ds(G, S) -> ray.data.Dataset:
    """Neighbors of S outside S as a (v) Dataset — the web-scale variant:
    a seed set's boundary on a hub-heavy graph can be millions of
    vertices, which must stream rather than collect to a driver set
    (VERDICT r3). Distinct via per-batch unique + one vertex-keyed
    groupby."""
    import pyarrow.compute as pc

    ps = _as_pred(S)
    eb = edge_boundary(G, ps)
    return (
        eb.map_batches(
            lambda t: pa.table({"v": pc.unique(t["dst"])}),
            batch_format="pyarrow",
        )
        .groupby("v")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )


def node_boundary(G, S) -> set:
    """Neighbors of S outside S (``boundary.py:23-29``) as a driver-side
    set — nx API parity for small boundaries; use ``node_boundary_ds``
    when the boundary itself is big."""
    out = set()
    for r in node_boundary_ds(G, S).take_all():
        out.add(int(r["v"]))
    return out


def cut_size(G, S, T=None, weighted: bool = False) -> float:
    """``cuts.py:18-30``: boundary edge count/weight; directed graphs add
    the reverse direction."""
    G._ensure_built()

    def _sum(ds):
        if weighted and G.weighted:
            return float(ds.sum("weight") or 0.0)
        return float(ds.count())

    total = _sum(edge_boundary(G, S, T))
    if G.directed:
        ps = _as_pred(S)
        pt = _as_pred(T) if T is not None else (lambda v: ~ps(v))
        total += _sum(edge_boundary(G, pt, ps))
    if not G.directed:
        pass  # symmetrized table already holds both orientations? no:
        # undirected Graph stores both (u,v),(v,u); boundary S→T counts each
        # undirected boundary edge exactly once (src∈S, dst∈T).
    return total


def volume(G, S, weighted: bool = False) -> float:
    """Σ out-degree over S (``cuts.py:33-38``); ``weighted`` sums edge
    weights (nx ``volume(..., weight=)`` parity) via the per-part
    ``out_wsum`` aux — float accumulator, no int truncation."""
    G._ensure_built()
    ps = _as_pred(S)
    if weighted and G.weighted:
        from .._util import universe as _universe

        aux_refs, n, P = G.aux_refs, G.n, G.num_parts

        def _fw(t: pa.Table) -> pa.Table:
            tot = 0.0
            for k in t["id"].to_numpy(zero_copy_only=False):
                aux = ray.get(aux_refs[int(k)])
                uni = _universe(int(k), n, P)
                tot += float(aux["out_wsum"][ps(uni)].sum())
            return pa.table({"x": pa.array([tot], pa.float64())})

        return float(
            ray.data.range(P, override_num_blocks=P)
            .map_batches(_fw, batch_format="pyarrow")
            .sum("x")
            or 0.0
        )
    deg = G.degrees_ds("out")

    def _f(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        d = t["degree"].to_numpy(zero_copy_only=False)
        return pa.table({"x": pa.array([float(d[ps(v)].sum())], pa.float64())})

    return float(deg.map_batches(_f, batch_format="pyarrow").sum("x") or 0)


def normalized_cut_size(G, S, T=None, weighted: bool = False) -> float:
    """``cuts.py:41-47``: cut·(1/vol(S) + 1/vol(T))."""
    ps = _as_pred(S)
    pt = _as_pred(T) if T is not None else (lambda v: ~ps(v))
    c = cut_size(G, ps, pt, weighted=weighted)
    return c * (
        1.0 / volume(G, ps, weighted=weighted) + 1.0 / volume(G, pt, weighted=weighted)
    )


def conductance(G, S, T=None, weighted: bool = False) -> float:
    """``cuts.py:50-54``: cut / min(vol(S), vol(T))."""
    ps = _as_pred(S)
    pt = _as_pred(T) if T is not None else (lambda v: ~ps(v))
    return cut_size(G, ps, pt, weighted=weighted) / min(
        volume(G, ps, weighted=weighted), volume(G, pt, weighted=weighted)
    )


def edge_expansion(G, S, T=None) -> float:
    """``cuts.py:57-61``: cut / min(|S|, |T|)."""
    G._ensure_built()
    ps = _as_pred(S)
    pt = _as_pred(T) if T is not None else (lambda v: ~ps(v))
    ns = _set_size(G, S if not callable(S) else ps)
    nt = _set_size(G, T if (T is not None and not callable(T)) else pt)
    return cut_size(G, ps, pt) / min(ns, nt)


def mixing_expansion(G, S, T=None) -> float:
    """``cuts.py:64-68``: cut / (2·m)."""
    G._ensure_built()
    return cut_size(G, S, T) / (2.0 * num_edges(G))


def node_expansion(G, S) -> float:
    """``cuts.py:71-73``: |N(S)| / |S| — the OUT-neighborhood of S
    (⋃ successors, S-members included when they are someone's neighbor;
    nx/reference ``any_pair(S @ A)`` semantics)."""
    G._ensure_built()
    ps = _as_pred(S)

    def _nbrs(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array(np.unique(d[ps(s)]))})

    distinct = G.edges_ds().map_batches(_nbrs, batch_format="pyarrow").groupby("v").count()
    n_nbrs = distinct.count()
    return n_nbrs / _set_size(G, S if not callable(S) else ps)


def boundary_expansion(G, S) -> float:
    """``cuts.py:76``: |∂S| / |S|."""
    G._ensure_built()
    ps = _as_pred(S)
    base = _set_size(G, S if not callable(S) else ps)
    return len(node_boundary(G, ps)) / base


def num_edges(G) -> int:
    """Undirected edge count convention of the reference (m for Graph counts
    each undirected edge once)."""
    G._ensure_built()
    if G.directed:
        return G.m
    return (G.m + G.self_edges) // 2
