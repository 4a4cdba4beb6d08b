"""Triangle counting family — distributed wedge join with the L-ordering trick.

Reference semantics (``algorithms/cluster.py:44-80``): per-node triangle
counts on the undirected graph with self-edges EXCLUDED; total count via the
masked lower-triangle SpGEMM ``plus_pair(L @ U.T).new(mask=L.S)`` ("SandiaDot",
``cluster.py:67-71``); ``transitivity = 6*total/Σd(d-1)``; ``clustering_v =
2*tri_v/(d_v(d_v-1))`` (``cluster.py:94-126``).

Ray-Data formulation (SURVEY.md §2.4): the ordering trick becomes the
*forward-adjacency* graph ``adj+(u) = {v > u : {u,v} ∈ E}`` (= the strict
upper triangle U-). Every triangle u<a<b is generated exactly once as a
wedge (a, b) ∈ adj+(u) × adj+(u), then confirmed by a hash-partitioned
membership probe of the closing edge (a, b) against the same forward CSR
shards:

  wedge gen   : streamed generator over CSR shards (bounded output chunks —
                the explicit source-range chunking the reference applies to
                its quadratic ops, nxapi/cluster.py:95-121)
  probe       : groupby(part)·map_groups against shard (a*n+b) key arrays —
                sorted, so membership is one searchsorted (no Python loop)
  corner count: pre-aggregated per batch, groupby(part) combine

Scale/skew: wedge volume is Σ C(d+,2) where d+ is the *forward* degree; the
u<a<b orientation caps hub fan-out exactly like the reference's L-mask, and
the generator yields fixed-size chunks so no task materializes a hub's full
wedge set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import named, universe, universe_size
from ..stages import spmv

_CHUNK_PAIRS = 2_000_000


def _degree_rank(g):
    """rank[v] = position of v in the (degree, id) total order, and the
    inverse permutation perm[rank] = v.

    Degree-ordered orientation bounds every vertex's FORWARD degree by
    O(sqrt(m)) (arboricity bound) — without it a min-id hub with k
    in-links generates C(k,2) wedges (the quadratic blow-up the reference
    avoids with its L-mask + heuristics). Driver-side argsort here is fine
    to ~1e8 vertices; beyond that reuse the distributed sample-splitter
    dense-rank from sources/extract.build_vertex_dictionary on the degree
    table (same algorithm, integer keys)."""
    degs = np.zeros(g.n, dtype=np.int64)
    for k in range(g.num_parts):
        aux = ray.get(g.aux_refs[k])
        d = aux["out_cnt"] - aux["out_self"]
        degs[k :: g.num_parts] = d
    perm = np.lexsort((np.arange(g.n), degs))  # rank -> original id
    rank = np.empty(g.n, dtype=np.int64)
    rank[perm] = np.arange(g.n)  # original id -> rank
    return rank, perm


def _forward_graph(G):
    """Degree-ordered forward orientation: edges (rank(u) → rank(v)) with
    rank(u) < rank(v), in RANK space (dense 0..n-1). Returns
    (undirected graph, forward Graph, rank_ref, perm_ref)."""
    from ..state.graph import Graph

    g = G.to_undirected() if G.directed else G
    g._ensure_built()

    key = "triangle_forward"
    if key not in g._cache:
        rank, perm = _degree_rank(g)
        rank_ref, perm_ref = ray.put(rank), ray.put(perm)

        class _Canon:
            def __init__(self):
                self._rank = None

            def __call__(self, t: pa.Table) -> pa.Table:
                if self._rank is None:
                    self._rank = ray.get(rank_ref)
                s = self._rank[t["src"].to_numpy(zero_copy_only=False)]
                d = self._rank[t["dst"].to_numpy(zero_copy_only=False)]
                m = s < d  # drops self loops, keeps the low-rank→high-rank arc
                return pa.table({"src": pa.array(s[m]), "dst": pa.array(d[m])})

        fg = Graph(
            g.edges_ds().map_batches(_Canon(), batch_format="pyarrow"),
            n=g.n,
            directed=True,
            num_parts=g.num_parts,
            name=g.name + "_fwd",
        )
        fg._ensure_built()
        g._cache[key] = (fg, rank_ref, perm_ref)
    fg, rank_ref, perm_ref = g._cache[key]
    return g, fg, rank_ref, perm_ref


class _WedgeGen:
    """Yield wedge chunks (part(a), a, b, corner u) from forward CSR shards."""

    def __init__(self, csr_refs, num_parts):
        self.csr_refs = csr_refs
        self.P = num_parts

    def __call__(self, t: pa.Table):
        yielded = False
        for k in t["id"].to_numpy(zero_copy_only=False):
            csr = ray.get(self.csr_refs[int(k)])
            srcs, indptr, dst = csr["srcs"], csr["indptr"], csr["dst"]
            bufs_a, bufs_b, bufs_u, size = [], [], [], 0
            for i in range(srcs.size):
                lo, hi = indptr[i], indptr[i + 1]
                d = hi - lo
                if d < 2:
                    continue
                nb = dst[lo:hi]
                # all ordered pairs (a, b), a<b, from nb (nb is sorted)
                ii, jj = np.triu_indices(d, k=1)
                bufs_a.append(nb[ii])
                bufs_b.append(nb[jj])
                bufs_u.append(np.full(ii.size, srcs[i], np.int64))
                size += ii.size
                if size >= _CHUNK_PAIRS:
                    yield self._emit(bufs_a, bufs_b, bufs_u)
                    bufs_a, bufs_b, bufs_u, size = [], [], [], 0
                    yielded = True
            if size:
                yield self._emit(bufs_a, bufs_b, bufs_u)
                yielded = True
        if not yielded:
            yield pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "u": pa.array([], pa.int64()),
                }
            )

    def _emit(self, bufs_a, bufs_b, bufs_u):
        a = np.concatenate(bufs_a)
        b = np.concatenate(bufs_b)
        u = np.concatenate(bufs_u)
        return pa.table(
            {
                "part": pa.array((a % self.P).astype(np.int32)),
                "a": pa.array(a),
                "b": pa.array(b),
                "u": pa.array(u),
            }
        )


class _ProbeAndCount:
    """Confirm closing edges (a,b) in shard part(a); emit per-corner counts."""

    def __init__(self, csr_refs, n, num_parts):
        self.csr_refs = csr_refs
        self.n, self.P = n, num_parts
        self._keys: dict[int, np.ndarray] = {}

    def _shard_keys(self, k: int) -> np.ndarray:
        if k not in self._keys:
            csr = ray.get(self.csr_refs[k])
            cnt = np.diff(csr["indptr"])
            # rows sorted by src, dst sorted within row → globally sorted keys
            self._keys[k] = np.repeat(csr["srcs"], cnt) * np.int64(self.n) + csr["dst"]
        return self._keys[k]

    def __call__(self, g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"part": pa.array([], pa.int32()), "v": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
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
            ok = np.zeros(want.size, dtype=bool)
        corners = np.concatenate([u[ok], a[ok], b[ok]])
        uv, cnts = np.unique(corners, return_counts=True)
        return pa.table(
            {
                "part": pa.array((uv % self.P).astype(np.int32)),
                "v": pa.array(uv),
                "c": pa.array(cnts.astype(np.int64)),
            }
        )


class _SumPerVertex:
    def __init__(self, n, num_parts, col):
        self.n, self.P, self.col = n, num_parts, col

    def __call__(self, g: pa.Table) -> pa.Table:
        k = int(g["part"][0].as_py())
        usize = universe_size(k, self.n, self.P)
        acc = np.zeros(usize, dtype=np.int64)
        v = g["v"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        np.add.at(acc, v // self.P, c)
        return pa.table(
            {"v": pa.array(universe(k, self.n, self.P)), self.col: pa.array(acc)}
        )


class _FillMissingParts:
    """Emit zero rows for parts that received no triangle corners."""

    def __init__(self, n, num_parts, col):
        self.n, self.P, self.col = n, num_parts, col

    def __call__(self, t: pa.Table) -> pa.Table:
        out_v, out_c = [], []
        for k in t["id"].to_numpy(zero_copy_only=False):
            uni = universe(int(k), self.n, self.P)
            out_v.append(uni)
            out_c.append(np.zeros(uni.size, np.int64))
        return pa.table(
            {
                "v": pa.array(np.concatenate(out_v) if out_v else np.empty(0, np.int64)),
                self.col: pa.array(np.concatenate(out_c) if out_c else np.empty(0, np.int64)),
            }
        )


def _corner_counts(G) -> tuple:
    """(graph, fwd graph, rank/perm refs, corner-count Dataset in RANK
    space, pre-aggregated per probe)."""
    g, fg, rank_ref, perm_ref = _forward_graph(G)
    P = fg.num_parts
    wedges = ray.data.range(P, override_num_blocks=P).map_batches(
        _WedgeGen(fg.csr_refs, P), batch_format="pyarrow"
    )
    counts = (
        wedges.groupby("part")
        .map_groups(named(_ProbeAndCount(fg.csr_refs, fg.n, P)), batch_format="pyarrow")
    )
    return g, fg, rank_ref, perm_ref, counts


def triangles(G) -> ray.data.Dataset:
    """Per-node triangle counts over the full universe (0 for others).

    Reference ``algorithms/cluster.py:44-64`` (unweighted path)."""
    g, fg, rank_ref, perm_ref, counts = _corner_counts(G)
    P = fg.num_parts
    per_part = (
        counts.groupby("part")
        .map_groups(named(_SumPerVertex(fg.n, P, "triangles")), batch_format="pyarrow")
        .materialize()
    )
    # parts with zero corners never appear in the groupby output; fill them
    have = set()
    for r in per_part.map_batches(
        lambda t: pa.table({"p": pa.array(np.unique(t["v"].to_numpy(zero_copy_only=False) % P).astype(np.int32))}),
        batch_format="pyarrow",
    ).take_all():
        have.add(int(r["p"]))
    missing = [k for k in range(P) if k not in have and universe_size(k, fg.n, P)]
    if missing:
        fill = ray.data.from_items([{"id": k} for k in missing]).map_batches(
            _FillMissingParts(fg.n, P, "triangles"), batch_format="pyarrow"
        )
        per_part = per_part.union(fill)

    # map rank-space vertex ids back to original ids
    class _Back:
        def __init__(self):
            self._perm = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._perm is None:
                self._perm = ray.get(perm_ref)
            return pa.table(
                {
                    "v": pa.array(self._perm[t["v"].to_numpy(zero_copy_only=False)]),
                    "triangles": t["triangles"],
                }
            )

    return per_part.map_batches(_Back(), batch_format="pyarrow")


def triangles_dict(G) -> dict:
    df = triangles(G).to_pandas()
    return dict(zip(df["v"].astype(int), df["triangles"].astype(int)))


def total_triangles(G) -> int:
    """Global triangle count (``cluster.py:67-71`` SandiaDot equivalent)."""
    _, _, _, _, counts = _corner_counts(G)
    s = counts.sum("c")
    return int((s or 0) // 3)


def _degree_sq_sum(g) -> float:
    """Σ d(d-1) over degrees excluding self-edges (degrees-)."""
    import pyarrow.compute as pc

    deg = g.degrees_ds("out", include_self=False)
    return float(
        deg.map_batches(
            lambda t: pa.table(
                {"x": pc.multiply(t["degree"], pc.subtract(t["degree"], 1))}
            ),
            batch_format="pyarrow",
        ).sum("x")
        or 0
    )


def transitivity(G) -> float:
    """6·total_triangles / Σ d(d-1)  (``cluster.py:74-80``)."""
    g = G.to_undirected() if G.directed else G
    denom = _degree_sq_sum(g)
    if denom == 0:
        return 0.0
    return 6.0 * total_triangles(g) / denom


def clustering(G) -> ray.data.Dataset:
    """Per-node clustering coefficient 2·tri/(d(d-1)), 0 where d<2
    (``cluster.py:94-108``). Dataset (v, clustering)."""
    g = G.to_undirected() if G.directed else G
    tri = triangles(g)
    aux_refs, n, P = g.aux_refs, g.n, g.num_parts

    class _Div:
        def __call__(self, t: pa.Table) -> pa.Table:
            v = t["v"].to_numpy(zero_copy_only=False)
            tr = t["triangles"].to_numpy(zero_copy_only=False)
            out = np.zeros(v.size, dtype=np.float64)
            for k in np.unique((v % P).astype(np.int64)):
                sel = (v % P) == k
                aux = ray.get(aux_refs[int(k)])
                d = (aux["out_cnt"] - aux["out_self"])[v[sel] // P]
                denom = d * (d - 1)
                o = np.zeros(sel.sum(), dtype=np.float64)
                nz = denom > 0
                o[nz] = 2.0 * tr[sel][nz] / denom[nz]
                out[sel] = o
            return pa.table({"v": t["v"], "clustering": pa.array(out)})

    return tri.map_batches(_Div(), batch_format="pyarrow")


def average_clustering(G, count_zeros: bool = True) -> float:
    """``cluster.py:176-193``."""
    df = clustering(G).to_pandas()
    vals = df["clustering"].values
    if not count_zeros:
        # reference divides by c.nvals = nodes with NONZERO clustering
        # (nodes in >=1 triangle), not nodes with degree >= 2
        vals = vals[vals > 0]
    return float(vals.mean()) if vals.size else 0.0
