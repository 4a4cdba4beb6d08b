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
from .triangles import (
    _WedgeGen,
    _WedgeProbeEdges,
    _bloom_ref,
    _forward_graph,
    _probe_chunks,
    _probe_key_refs,
    _tri_exchange,
)


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
    g, fg, rm = _forward_graph(G)
    P = fg.num_parts
    if _tri_exchange() == "shuffle":
        wedges = ray.data.range(P, override_num_blocks=P).map_batches(
            _WedgeGen(fg.csr_refs, P, fg.n), batch_format="pyarrow"
        )
        support = wedges.groupby("part").map_groups(
            named(_ProbeEdgeSupport(fg.csr_refs, fg.n, P)), batch_format="pyarrow"
        )
    else:
        support = _probe_chunks(fg).map_batches(
            _WedgeProbeEdges(
                fg.csr_refs, _probe_key_refs(fg), P, fg.n, bloom_ref=_bloom_ref(fg)
            ),
            batch_format="pyarrow",
        )
    counted = support.groupby("part").map_groups(
        named(_SumEdgeSupport()), batch_format="pyarrow"
    )

    mapped = rm.back_cols(counted.select_columns(["u", "w", "support"]), ["u", "w"])

    def _canon_uw(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.minimum(u, w)),
                "w": pa.array(np.maximum(u, w)),
                "support": t["support"],
            }
        )

    return mapped.map_batches(named(_canon_uw), batch_format="pyarrow")


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


class _CanonKey:
    """Canonical (u<w) edges with a packed int64 join key u*n+w.
    Key packing assumes n*n < 2**63 (n < 3e9) — same documented caveat as
    the graph-build dedup."""

    def __init__(self, n):
        self.n = n

    def __call__(self, t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        m = s < d
        s, d = s[m], d[m]
        return pa.table(
            {
                "u": pa.array(s),
                "w": pa.array(d),
                "k": pa.array(s * np.int64(self.n) + d),
            }
        )


class _GenDegPartial:
    """Per-batch combiner: incident (v, support) pair counts."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = t["u"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        s = pc.fill_null(t["support"], 0).to_numpy(zero_copy_only=False)
        v = np.concatenate([u, w])
        ss = np.concatenate([s, s]).astype(np.int64)
        key = np.stack([v, ss], axis=1)
        ukey, counts = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "v": pa.array(ukey[:, 0], pa.int64()),
                "tri_count": pa.array(ukey[:, 1], pa.int64()),
                "n_edges": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )


def generalized_degree(G) -> ray.data.Dataset:
    """(v, tri_count, n_edges): per node, how many incident edges
    participate in exactly tri_count triangles
    (``algorithms/cluster.py:285-310``). Edges with 0 triangles included.

    Fully distributed: canonical edges LEFT-JOIN edge_support via the
    bucketed hash join (missing → support 0), per-batch (v, support)
    pre-combine, then one small groupby-sum."""
    g = G.to_undirected() if G.directed else G
    g._ensure_built()
    n = g.n
    from ..stages.hashjoin import lookup_join

    sup_keyed = edge_support(g).map_batches(
        lambda t: pa.table(
            {
                "k": pa.array(
                    t["u"].to_numpy(zero_copy_only=False) * np.int64(n)
                    + t["w"].to_numpy(zero_copy_only=False)
                ),
                "support": t["support"],
            }
        ),
        batch_format="pyarrow",
    )
    fact = g.edges_ds().map_batches(_CanonKey(n), batch_format="pyarrow")
    joined = lookup_join(
        fact, "k", sup_keyed, "k", "support", "support", drop_missing=False
    )
    partial = joined.map_batches(_GenDegPartial(), batch_format="pyarrow")
    return partial.groupby(["v", "tri_count"]).aggregate(
        ray.data.aggregate.Sum("n_edges", alias_name="n_edges")
    )
