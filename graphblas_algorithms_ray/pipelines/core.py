"""k-truss + generalized degree — per-edge triangle-support kernels.

Reference ``algorithms/core.py:8-37``: iterate {per-edge support =
``plus_pair(S @ S.T)`` masked to S; keep edges with support ≥ k-2} until
fixpoint, then drop isolated vertices. Distributed form: the triangle
wedge-join (pipelines/triangles.py) re-aimed at EDGES — each confirmed
triangle (v<a<b) increments the support of its three edges; the combine is
a groupby on the canonical edge's source part; surviving edges feed the
next round. Rounds shrink monotonically, so each round's graph rebuild
costs less than the last.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import named
from ..state.graph import Graph
from .triangles import _WedgeGen, _forward_graph


class _ProbeEdgeSupport:
    """Confirm closing edges; emit +1 support for each triangle edge
    (canonical u<v), keyed by part(u); pre-summed per group call."""

    def __init__(self, csr_refs, n, num_parts):
        self.csr_refs, self.n, self.P = csr_refs, n, num_parts
        self._keys = {}

    def _shard_keys(self, k):
        if k not in self._keys:
            csr = ray.get(self.csr_refs[k])
            cnt = np.diff(csr["indptr"])
            self._keys[k] = np.repeat(csr["srcs"], cnt) * np.int64(self.n) + csr["dst"]
        return self._keys[k]

    def __call__(self, g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "part": pa.array([], pa.int32()),
                "u": pa.array([], pa.int64()),
                "w": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        k = int(g["part"][0].as_py())
        keys = self._shard_keys(k)
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        u = g["u"].to_numpy(zero_copy_only=False)
        want = a * np.int64(self.n) + b
        if keys.size:
            pos = np.minimum(np.searchsorted(keys, want), keys.size - 1)
            ok = keys[pos] == want
        else:
            return empty
        ua, ub, uu = a[ok], b[ok], u[ok]
        # three edges per triangle, already canonical (u<a<b)
        eu = np.concatenate([uu, uu, ua])
        ew = np.concatenate([ua, ub, ub])
        key = eu * np.int64(self.n) + ew
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "part": pa.array(((uk // self.n) % self.P).astype(np.int32)),
                "u": pa.array(uk // self.n),
                "w": pa.array(uk % self.n),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )


class _SumEdgeSupport:
    def __call__(self, g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        n = max(int(u.max()), int(w.max())) + 1 if u.size else 1
        key = u * np.int64(1 << 32) + w  # local combine key (ids < 2^31 here)
        uk, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(uk.size, dtype=np.int64)
        np.add.at(acc, inv, c)
        return pa.table(
            {
                "u": pa.array((uk >> 32).astype(np.int64)),
                "w": pa.array((uk & ((1 << 32) - 1)).astype(np.int64)),
                "support": pa.array(acc),
            }
        )


def edge_support(G) -> ray.data.Dataset:
    """(u, w, support): per canonical undirected edge (u < v, ORIGINAL ids),
    the number of triangles it participates in. Internally runs in the
    degree-rank space of pipelines/triangles (hub-safe orientation)."""
    g, fg, rank_ref, perm_ref = _forward_graph(G)
    P = fg.num_parts
    wedges = ray.data.range(P, override_num_blocks=P).map_batches(
        _WedgeGen(fg.csr_refs, P), batch_format="pyarrow"
    )
    counted = (
        wedges.groupby("part")
        .map_groups(named(_ProbeEdgeSupport(fg.csr_refs, fg.n, P)), batch_format="pyarrow")
        .groupby("part")
        .map_groups(named(_SumEdgeSupport()), batch_format="pyarrow")
    )

    class _Back:
        def __init__(self):
            self._perm = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._perm is None:
                self._perm = ray.get(perm_ref)
            u = self._perm[t["u"].to_numpy(zero_copy_only=False)]
            w = self._perm[t["w"].to_numpy(zero_copy_only=False)]
            return pa.table(
                {
                    "u": pa.array(np.minimum(u, w)),
                    "w": pa.array(np.maximum(u, w)),
                    "support": t["support"],
                }
            )

    return counted.map_batches(_Back(), batch_format="pyarrow")


def k_truss(G, k: int, max_rounds: int | None = None) -> Graph:
    """Maximal subgraph where every edge has ≥ k-2 triangle supports
    (``algorithms/core.py:8-37``). Returns an undirected Graph over the
    ORIGINAL id space (no renumbering; the reference renumbers only because
    its Matrix must stay dense — our universe is already sparse-friendly)."""
    g = G.to_undirected() if G.directed else G
    if k < 3:
        # reference/networkx leave the graph unchanged for k < 3 (every edge
        # trivially has >= k-2 <= 0 supports); only self-loops are stripped
        g._ensure_built()
        return Graph(
            g.edges_ds(), n=g.n, directed=False, num_parts=g.num_parts, keep_self=False
        )
    g._ensure_built()
    cur_graph = g
    prev_count = None
    thresh = k - 2
    rounds = 0

    def _keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater_equal(t["support"], thresh))
        return pa.table({"src": t["u"], "dst": t["w"]})

    while True:
        surviving = (
            edge_support(cur_graph)
            .map_batches(_keep, batch_format="pyarrow")
            .materialize()
        )
        count = surviving.count()
        if count == 0:
            empty = pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
            return Graph(empty, n=g.n, directed=False, num_parts=g.num_parts)
        if prev_count is not None and count == prev_count:
            return cur_graph
        prev_count = count
        cur_graph = Graph(surviving, n=g.n, directed=False, num_parts=g.num_parts)
        cur_graph._ensure_built()
        rounds += 1
        if max_rounds is not None and rounds >= max_rounds:
            return cur_graph


def generalized_degree(G) -> ray.data.Dataset:
    """(v, tri_count, n_edges): per node, how many incident edges
    participate in exactly tri_count triangles
    (``algorithms/cluster.py:285-310``). Edges with 0 triangles included."""
    g = G.to_undirected() if G.directed else G
    g._ensure_built()
    sup = edge_support(g).materialize()
    # edges with zero support are absent from sup; recover them by probing
    # all canonical edges against the support table (small at test scale;
    # at web scale this is a partition-aligned left join)
    sup_tbl = [t for t in ray.get(sup.to_arrow_refs()) if t.num_rows]
    smap = {}
    for t in sup_tbl:
        for u, w, s in zip(
            t["u"].to_pylist(), t["w"].to_pylist(), t["support"].to_pylist()
        ):
            smap[(u, w)] = s
    def _canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        m = s < d
        return pa.table({"src": pa.array(s[m]), "dst": pa.array(d[m])})

    rows = g.edges_ds().map_batches(_canon, batch_format="pyarrow").take_all()
    from collections import Counter

    per_node: Counter = Counter()
    for r in rows:
        u, w = int(r["src"]), int(r["dst"])
        s = smap.get((u, w), 0)
        per_node[(u, s)] += 1
        per_node[(w, s)] += 1
    import pandas as pd

    if not per_node:
        return ray.data.from_arrow(
            pa.table(
                {"v": pa.array([], pa.int64()), "tri_count": pa.array([], pa.int64()), "n_edges": pa.array([], pa.int64())}
            )
        )
    df = pd.DataFrame(
        [(v, s, c) for (v, s), c in sorted(per_node.items())],
        columns=["v", "tri_count", "n_edges"],
    )
    return ray.data.from_pandas(df)
