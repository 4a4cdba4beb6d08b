"""Graph set operators (reference ``algorithms/operators/binary.py`` /
``unary.py``) — edge-table algebra.

Union/disjoint_union are offset remaps + Dataset.union (no shuffle);
intersection/difference/symmetric_difference/compose are partition-aligned
membership probes against the other graph's CSR shards (both graphs share
the ``v % P`` partitioning, so every probe is shard-local — no extra
shuffle beyond the probed side's natural layout).

``complement``/``full_join`` are dense outputs — small-graph fallbacks only
(documented non-goals at web scale, SURVEY.md §7)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..state.graph import Graph
from .structure import _EdgeProbe

_DENSE_LIMIT = 20_000


def _offset_edges(ds, off: int):
    def _f(t: pa.Table) -> pa.Table:
        cols = {
            "src": pa.array(t["src"].to_numpy(zero_copy_only=False) + off),
            "dst": pa.array(t["dst"].to_numpy(zero_copy_only=False) + off),
        }
        if "weight" in t.column_names:
            cols["weight"] = t["weight"]
        return pa.table(cols)

    return ds.map_batches(_f, batch_format="pyarrow")


def disjoint_union(G: Graph, H: Graph) -> Graph:
    """Block-diagonal concat, H's ids shifted by G.n
    (``operators/binary.py:16-56``)."""
    G._ensure_built()
    H._ensure_built()
    edges = G.edges_ds().union(_offset_edges(H.edges_ds(), G.n))
    return Graph(
        edges,
        n=G.n + H.n,
        directed=G.directed and H.directed,
        weighted=G.weighted or H.weighted,
        num_parts=G.num_parts,
    )


def union(G: Graph, H: Graph, rename=None) -> Graph:
    """Union requiring disjoint id ranges unless rename offsets given."""
    if rename is not None:
        return disjoint_union(G, H)
    G._ensure_built()
    H._ensure_built()
    # ids overlap → reference raises; we mirror that contract
    if min(G.n, H.n) > 0 and not (G.n == 0 or H.n == 0):
        raise ValueError(
            "union requires disjoint vertex ids (use disjoint_union or rename)"
        )
    return disjoint_union(G, H)


def _probe_filter(G: Graph, H: Graph, keep_if_member: bool) -> ray.data.Dataset:
    """Edges of G filtered by membership in H's edge set (shard-local)."""
    G._ensure_built()
    H._ensure_built()
    assert G.num_parts == H.num_parts, "operand graphs must share num_parts"
    probe = _EdgeProbe(H.csr_refs, H.n)
    P = G.num_parts

    class _F:
        def __call__(self, t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            keep = np.zeros(s.size, dtype=bool)
            for k in np.unique(s % P):
                sel = (s % P) == k
                keep[sel] = probe.member(int(k), s[sel], d[sel])
            if not keep_if_member:
                keep = ~keep
            return t.filter(pa.array(keep))

    return G.edges_ds().map_batches(_F(), batch_format="pyarrow")


def intersection(G: Graph, H: Graph) -> Graph:
    """Common edges over the common id space (``binary.py:59-70``)."""
    G._ensure_built()
    H._ensure_built()
    ds = _probe_filter(G, H, keep_if_member=True)
    return Graph(ds, n=max(G.n, H.n), directed=G.directed, num_parts=G.num_parts)


def difference(G: Graph, H: Graph) -> Graph:
    """Edges of G not in H (``binary.py:73-89``)."""
    G._ensure_built()
    H._ensure_built()
    if G.n != H.n:
        raise ValueError("difference requires same node set")
    ds = _probe_filter(G, H, keep_if_member=False)
    return Graph(ds, n=G.n, directed=G.directed, num_parts=G.num_parts)


def symmetric_difference(G: Graph, H: Graph) -> Graph:
    """XOR of edge sets (``binary.py:92-109``)."""
    G._ensure_built()
    H._ensure_built()
    if G.n != H.n:
        raise ValueError("symmetric_difference requires same node set")
    ds = _probe_filter(G, H, keep_if_member=False).union(
        _probe_filter(H, G, keep_if_member=False)
    )
    return Graph(ds, n=G.n, directed=G.directed, num_parts=G.num_parts)


def compose(G: Graph, H: Graph) -> Graph:
    """Union of edges, H wins on conflicts (``binary.py:112-147``).
    Unweighted: plain distinct union; weighted: G-only edges ∪ all of H."""
    G._ensure_built()
    H._ensure_built()
    n = max(G.n, H.n)
    if not (G.weighted or H.weighted):
        ds = G.edges_ds().union(H.edges_ds())
    else:
        ds = _probe_filter(G, H, keep_if_member=False).union(H.edges_ds())
    return Graph(
        ds, n=n, directed=G.directed, weighted=G.weighted or H.weighted,
        num_parts=G.num_parts,
    )


def reverse(G: Graph) -> Graph:
    """Transpose (``operators/unary.py:15-18``): swap src/dst (free) +
    repartition by the new src — exactly Graph.reverse()."""
    return G.reverse()


def complement(G: Graph) -> Graph:
    """~A.S minus diagonal (``operators/unary.py:8-12``) — dense output,
    small graphs only (non-goal at web scale, SURVEY.md §7)."""
    G._ensure_built()
    if G.n > _DENSE_LIMIT:
        raise NotImplementedError(
            f"complement is dense O(n^2); refusing n={G.n} > {_DENSE_LIMIT}"
        )
    probe = _EdgeProbe(G.csr_refs, G.n)
    n, P = G.n, G.num_parts

    class _Emit:
        def __call__(self, t: pa.Table) -> pa.Table:
            outs, outd = [], []
            for k in t["id"].to_numpy(zero_copy_only=False):
                k = int(k)
                uni = np.arange(k, n, P, dtype=np.int64)
                for u in uni:
                    dsts = np.arange(n, dtype=np.int64)
                    member = probe.member(k, np.full(n, u, np.int64), dsts)
                    keep = ~member & (dsts != u)
                    outs.append(np.full(int(keep.sum()), u, np.int64))
                    outd.append(dsts[keep])
            return pa.table(
                {
                    "src": pa.array(
                        np.concatenate(outs) if outs else np.empty(0, np.int64)
                    ),
                    "dst": pa.array(
                        np.concatenate(outd) if outd else np.empty(0, np.int64)
                    ),
                }
            )

    ds = ray.data.range(P, override_num_blocks=P).map_batches(
        _Emit(), batch_format="pyarrow"
    )
    return Graph(ds, n=n, directed=G.directed, num_parts=P)


def full_join(G: Graph, H: Graph) -> Graph:
    """disjoint_union + complete bipartite fill (``binary.py:150-155``) —
    small graphs only."""
    G._ensure_built()
    H._ensure_built()
    if G.n * H.n > _DENSE_LIMIT * 100:
        raise NotImplementedError("full_join fill is dense; graphs too large")
    base = disjoint_union(G, H)
    gs = np.repeat(np.arange(G.n, dtype=np.int64), H.n)
    hs = np.tile(np.arange(G.n, G.n + H.n, dtype=np.int64), G.n)
    fill = [pa.table({"src": pa.array(gs), "dst": pa.array(hs)})]
    if G.directed:
        fill.append(pa.table({"src": pa.array(hs), "dst": pa.array(gs)}))
    ds = base.edges_ds().union(ray.data.from_arrow(pa.concat_tables(fill)))
    return Graph(ds, n=G.n + H.n, directed=G.directed, num_parts=G.num_parts)
