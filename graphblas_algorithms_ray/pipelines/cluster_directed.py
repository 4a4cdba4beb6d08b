"""Directed clustering (Fagiolo) + directed transitivity.

Reference ``algorithms/cluster.py:83-126``: directed clustering uses three
masked SpGEMMs over A/Aᵀ; the equivalent formulation (what NetworkX
implements and the reference validates against) is over B = A + Aᵀ
(entry ∈ {0,1,2} = number of directions):

    T(v)   = (B³)_vv / 2 = Σ_{triangles {v,u,w}} B_vu·B_uw·B_wv
    c(v)   = T(v) / (2·(d_tot(v)·(d_tot(v)-1) - 2·d_recip(v)))

Physical plan: the triangle wedge join of pipelines/triangles run on the
weight-carrying symmetrized graph (weight = #directions), scattering the
edge-weight PRODUCT to all three corners; degrees/reciprocal degrees come
from the aux arrays + the reciprocity probe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import named, universe, universe_size
from ..state.graph import Graph
from ..stages import spmv as spmv_mod


def _b_graph(G, weighted: bool = False) -> Graph:
    """B = A + Aᵀ as a weighted graph, self-loops dropped.

    Unweighted: per-direction contribution 1 (entries ∈ {1, 2}).
    Weighted (Fagiolo, nx ``clustering(DiGraph, weight=)`` parity):
    per-direction contribution cbrt(w / max_w) BEFORE the sum, so
    B = Ŵ^{1/3} + (Ŵᵀ)^{1/3} and diag(B³)/2 is the weighted T(v)."""
    G._ensure_built()
    max_w = 1.0
    if weighted and G.weighted:
        max_w = float(G.edges_ds().max("weight") or 1.0) or 1.0

    def _strip_self(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        m = s != d
        if weighted and "weight" in t.column_names:
            w = np.cbrt(t["weight"].to_numpy(zero_copy_only=False)[m] / max_w)
        else:
            w = np.ones(int(m.sum()))
        return pa.table(
            {
                "src": pa.array(s[m]),
                "dst": pa.array(d[m]),
                "weight": pa.array(w.astype(np.float64)),
            }
        )

    def _swap(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["dst"], "dst": t["src"], "weight": t["weight"]})

    e = G.edges_ds().map_batches(_strip_self, batch_format="pyarrow")
    both = e.union(e.map_batches(_swap, batch_format="pyarrow"))
    # dup='sum' → parallel (u,v) from both directions sum to weight 2
    b = Graph(
        both, n=G.n, directed=True, weighted=True, dup="sum", num_parts=G.num_parts
    )
    b._ensure_built()
    return b


class _WWedgeGen:
    """Weighted wedges from the forward-oriented weighted CSR: emit
    (part(a), a, b, corner, w_corner_a * w_corner_b)."""

    def __init__(self, csr_refs, num_parts):
        self.csr_refs, self.P = csr_refs, num_parts

    def __call__(self, t: pa.Table):
        yielded = False
        for k in t["id"].to_numpy(zero_copy_only=False):
            csr = ray.get(self.csr_refs[int(k)])
            srcs, indptr, dst, w = csr["srcs"], csr["indptr"], csr["dst"], csr["weight"]
            bufs = {"a": [], "b": [], "u": [], "wp": []}
            size = 0
            for i in range(srcs.size):
                lo, hi = indptr[i], indptr[i + 1]
                d = hi - lo
                if d < 2:
                    continue
                nb, nw = dst[lo:hi], w[lo:hi]
                ii, jj = np.triu_indices(d, k=1)
                bufs["a"].append(nb[ii])
                bufs["b"].append(nb[jj])
                bufs["u"].append(np.full(ii.size, srcs[i], np.int64))
                bufs["wp"].append(nw[ii] * nw[jj])
                size += ii.size
                if size >= 2_000_000:
                    yield self._emit(bufs)
                    bufs = {"a": [], "b": [], "u": [], "wp": []}
                    size = 0
                    yielded = True
            if size:
                yield self._emit(bufs)
                yielded = True
        if not yielded:
            yield pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "u": pa.array([], pa.int64()),
                    "wp": pa.array([], pa.float64()),
                }
            )

    def _emit(self, bufs):
        a = np.concatenate(bufs["a"])
        return pa.table(
            {
                "part": pa.array((a % self.P).astype(np.int32)),
                "a": pa.array(a),
                "b": pa.array(np.concatenate(bufs["b"])),
                "u": pa.array(np.concatenate(bufs["u"])),
                "wp": pa.array(np.concatenate(bufs["wp"])),
            }
        )


class _WProbeCount:
    """Probe closing edge (a,b); per confirmed triangle scatter
    wp * w_ab to corners u, a, b (pre-summed)."""

    def __init__(self, csr_refs, n, num_parts):
        self.csr_refs, self.n, self.P = csr_refs, n, num_parts
        self._cache = {}

    def _shard(self, k):
        if k not in self._cache:
            csr = ray.get(self.csr_refs[k])
            cnt = np.diff(csr["indptr"])
            keys = np.repeat(csr["srcs"], cnt) * np.int64(self.n) + csr["dst"]
            self._cache[k] = (keys, csr["weight"])
        return self._cache[k]

    def __call__(self, g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"part": pa.array([], pa.int32()), "v": pa.array([], pa.int64()), "c": pa.array([], pa.float64())}
            )
        k = int(g["part"][0].as_py())
        keys, w = self._shard(k)
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        u = g["u"].to_numpy(zero_copy_only=False)
        wp = g["wp"].to_numpy(zero_copy_only=False)
        want = a * np.int64(self.n) + b
        if keys.size == 0:
            ok = np.zeros(a.size, dtype=bool)
            pos = np.zeros(a.size, np.int64)
        else:
            pos = np.minimum(np.searchsorted(keys, want), keys.size - 1)
            ok = keys[pos] == want
        prod = wp[ok] * w[pos[ok]]
        corners = np.concatenate([u[ok], a[ok], b[ok]])
        vals = np.concatenate([prod, prod, prod])
        uv, inv = np.unique(corners, return_inverse=True)
        acc = np.zeros(uv.size)
        np.add.at(acc, inv, vals)
        return pa.table(
            {
                "part": pa.array((uv % self.P).astype(np.int32)),
                "v": pa.array(uv),
                "c": pa.array(acc),
            }
        )


def directed_triangle_products(G, weighted: bool = False) -> ray.data.Dataset:
    """(v, t) with t(v) = Σ_{triangles at v} B_vu·B_uw·B_wv (Fagiolo T)."""
    from .triangles import _degree_rank

    b = _b_graph(G, weighted=weighted)
    rank, perm = _degree_rank(b)
    rank_ref, perm_ref = ray.put(rank), ray.put(perm)

    class _Canon:
        def __init__(self):
            self._rank = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._rank is None:
                self._rank = ray.get(rank_ref)
            s = self._rank[t["src"].to_numpy(zero_copy_only=False)]
            d = self._rank[t["dst"].to_numpy(zero_copy_only=False)]
            m = s < d
            return pa.table(
                {
                    "src": pa.array(s[m]),
                    "dst": pa.array(d[m]),
                    "weight": t["weight"].filter(pa.array(m)),
                }
            )

    fb = Graph(
        b.edges_ds().map_batches(_Canon(), batch_format="pyarrow"),
        n=b.n,
        directed=True,
        weighted=True,
        num_parts=b.num_parts,
    )
    fb._ensure_built()
    P = fb.num_parts
    nn = fb.n

    def _seed(t: pa.Table) -> pa.Table:
        # one zero row per NONEMPTY part: forces every part group to exist
        # so _SumF emits the full universe even when a part produced no
        # wedges at all (triangle-free digraphs returned ZERO rows before —
        # found by the borrowed nx test suite, TestDirectedClustering)
        ks = [
            int(k)
            for k in t["id"].to_pylist()
            if universe_size(int(k), nn, P) > 0
        ]
        return pa.table(
            {
                "part": pa.array(ks, pa.int32()),
                "v": pa.array(ks, pa.int64()),  # k is in part k's universe
                "c": pa.array([0.0] * len(ks), pa.float64()),
            }
        )

    seed = ray.data.range(P, override_num_blocks=1).map_batches(
        _seed, batch_format="pyarrow"
    )
    counts = (
        ray.data.range(P, override_num_blocks=P)
        .map_batches(_WWedgeGen(fb.csr_refs, P), batch_format="pyarrow")
        .groupby("part")
        .map_groups(named(_WProbeCount(fb.csr_refs, fb.n, P)), batch_format="pyarrow")
        .union(seed)
        .groupby("part")
        .map_groups(named(_SumF(fb.n, P)), batch_format="pyarrow")
    )

    class _Back:
        def __init__(self):
            self._perm = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._perm is None:
                self._perm = ray.get(perm_ref)
            return pa.table(
                {
                    "v": pa.array(self._perm[t["v"].to_numpy(zero_copy_only=False)]),
                    "t": t["t"],
                }
            )

    return counts.map_batches(_Back(), batch_format="pyarrow")


class _SumF:
    def __init__(self, n, num_parts):
        self.n, self.P = n, num_parts

    def __call__(self, g: pa.Table) -> pa.Table:
        k = int(g["part"][0].as_py())
        usize = universe_size(k, self.n, self.P)
        acc = np.zeros(usize)
        v = g["v"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        np.add.at(acc, v // self.P, c)
        return pa.table(
            {"v": pa.array(universe(k, self.n, self.P)), "t": pa.array(acc)}
        )


def clustering_directed(G, weighted: bool = False) -> ray.data.Dataset:
    """(v, clustering) matching nx.clustering on DiGraphs, incl. the
    weighted (Fagiolo cbrt) variant (reference ``cluster.py:94-126``)."""
    from .structure import _EdgeProbe

    G._ensure_built()
    tri = directed_triangle_products(G, weighted=weighted)
    out_aux = G.aux_refs
    in_aux = G.reverse().aux_refs
    n, P = G.n, G.num_parts
    probe = _EdgeProbe(G.csr_refs, n)

    class _Div:
        def __init__(self):
            self._recip = {}

        def recip(self, k):
            # d_recip(v) for universe_k: count of u with v→u and u→v
            if k not in self._recip:
                csr = ray.get(G.csr_refs[k])
                srcs, indptr, dst = csr["srcs"], csr["indptr"], csr["dst"]
                cnt = np.diff(indptr)
                s = np.repeat(srcs, cnt)
                ok = np.zeros(s.size, dtype=bool)
                for kk in np.unique(dst % P):
                    sel = (dst % P) == kk
                    ok[sel] = probe.member(int(kk), dst[sel], s[sel])
                ok &= s != dst
                usize = universe_size(k, n, P)
                r = np.zeros(usize, np.int64)
                np.add.at(r, s[ok] // P, 1)
                self._recip[k] = r
            return self._recip[k]

        def __call__(self, t: pa.Table) -> pa.Table:
            v = t["v"].to_numpy(zero_copy_only=False)
            tv = t["t"].to_numpy(zero_copy_only=False)
            out = np.zeros(v.size)
            for k in np.unique(v % P):
                k = int(k)
                sel = (v % P) == k
                li = v[sel] // P
                oa, ia = ray.get(out_aux[k]), ray.get(in_aux[k])
                dtot = (oa["out_cnt"] - oa["out_self"] + ia["out_cnt"] - ia["out_self"])[li]
                drec = self.recip(k)[li]
                # nx: c = (B³)_vv / (2(d_tot(d_tot-1) - 2 d_recip));
                # our t = (B³)_vv / 2  ⇒  c = t / (d_tot(d_tot-1) - 2 d_recip)
                denom = dtot * (dtot - 1.0) - 2.0 * drec
                o = np.zeros(int(sel.sum()))
                nz = denom > 0
                o[nz] = tv[sel][nz] / denom[nz]
                out[sel] = o
            return pa.table({"v": t["v"], "clustering": pa.array(out)})

    return tri.map_batches(_Div(), batch_format="pyarrow")


def _node_row(G, v: int):
    """One node's CSR row (neighbors, weights), self-edge excluded."""
    k = v % G.num_parts
    csr = ray.get(G.csr_refs[k])
    pos = int(np.searchsorted(csr["srcs"], v))
    if pos >= csr["srcs"].size or csr["srcs"][pos] != v:
        return np.empty(0, np.int64), None
    lo, hi = int(csr["indptr"][pos]), int(csr["indptr"][pos + 1])
    nb = csr["dst"][lo:hi]
    w = csr["weight"][lo:hi] if csr.get("weight") is not None else None
    m = nb != v
    return nb[m], (w[m] if w is not None else None)


def single_clustering_directed(G, node, *, weighted: bool = False) -> float:
    """Directed (Fagiolo) clustering of ONE node without the all-nodes
    join (reference ``cluster.py:151-173``): fetch the node's out/in rows,
    probe the O(|N|²) closing arcs in both directions, combine with
    B_vu = dir(v→u) + dir(u→v) (cbrt(w/max_w) per direction when
    weighted); c = T / (d_tot(d_tot−1) − 2·d_recip)."""
    from .triangles import _probe_pairs, _shard_max_weight

    G._ensure_built()
    v = int(node)
    rv = G.reverse()
    rv._ensure_built()
    out_nb, out_w = _node_row(G, v)
    in_nb, in_w = _node_row(rv, v)
    dtot = out_nb.size + in_nb.size
    drecip = np.intersect1d(out_nb, in_nb).size
    denom = dtot * (dtot - 1) - 2 * drecip
    if denom <= 0:
        return 0.0
    max_w = 1.0
    if weighted:
        if not G.weighted:
            raise ValueError("weighted single_clustering_directed needs weights")
        max_w = (
            max(ray.get([_shard_max_weight.remote(r) for r in G.csr_refs]) + [0.0])
            or 1.0
        )
    N = np.unique(np.concatenate([out_nb, in_nb]))
    if N.size < 2:
        return 0.0
    bv = np.zeros(N.size)
    if weighted:
        bv[np.searchsorted(N, out_nb)] += np.cbrt(out_w / max_w)
        bv[np.searchsorted(N, in_nb)] += np.cbrt(in_w / max_w)
    else:
        bv[np.searchsorted(N, out_nb)] += 1.0
        bv[np.searchsorted(N, in_nb)] += 1.0
    iu, jw = np.triu_indices(N.size, k=1)
    a, b = N[iu], N[jw]
    buw = np.zeros(a.size)
    for x, y in ((a, b), (b, a)):  # both arc directions of the closer
        parts = (x % G.num_parts).astype(np.int64)
        for k in np.unique(parts):
            sel = np.nonzero(parts == k)[0]
            ok, w_ab = ray.get(
                _probe_pairs.remote(G.csr_refs[int(k)], G.n, x[sel], y[sel])
            )
            if weighted:
                add = np.zeros(sel.size)
                if w_ab is not None and ok.any():
                    # w_ab is None when the probed shard has no edges
                    add[ok] = np.cbrt(np.asarray(w_ab) / max_w)
                buw[sel] += add
            else:
                buw[sel] += ok.astype(np.float64)
    tri = float((bv[iu] * buw * bv[jw]).sum())
    if tri == 0.0:
        return 0.0
    return tri / denom


def average_clustering_directed(
    G, count_zeros: bool = True, weighted: bool = False
) -> float:
    ds = clustering_directed(G, weighted=weighted)
    if count_zeros:
        m = ds.mean("clustering")
        return float(m) if m is not None else 0.0
    import pyarrow.compute as pc

    agg = ds.map_batches(
        lambda t: pa.table(
            {
                "s": pa.array(
                    [float(pc.sum(t["clustering"]).as_py() or 0.0)], pa.float64()
                ),
                "c": pa.array(
                    [
                        float(
                            pc.sum(
                                pc.cast(pc.greater(t["clustering"], 0.0), pa.int64())
                            ).as_py()
                            or 0
                        )
                    ],
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    s, c = agg.sum("s") or 0.0, agg.sum("c") or 0.0
    return float(s / c) if c else 0.0


def transitivity_directed(G) -> float:
    """Reference ``cluster.py:83-91``: Σ_{(u,w)∈E} |N⁺(u) ∩ N⁻(w)... the
    reference computes plus_pair(A @ A.T) masked by A.S:
    numerator = Σ_{(u,w)∈E} |{v : u→v and w→v}|, denominator Σ d⁺(d⁺-1)
    over out-degrees excluding self-edges."""
    from .structure import _EdgeProbe

    G._ensure_built()
    n, P = G.n, G.num_parts
    # numerator: for each edge (u,w), count common out-neighbors
    # |{v : u→v ∧ w→v}| — iterate u's out-row, probe (w, v) membership
    probe = _EdgeProbe(G.csr_refs, n)

    class _Num:
        def __init__(self):
            self._csr = {}

        def csr(self, k):
            if k not in self._csr:
                self._csr[k] = ray.get(G.csr_refs[k])
            return self._csr[k]

        def __call__(self, t: pa.Table) -> pa.Table:
            u = t["src"].to_numpy(zero_copy_only=False)
            w = t["dst"].to_numpy(zero_copy_only=False)
            total = 0
            for k in np.unique(u % P):
                k = int(k)
                sel = (u % P) == k
                csr = self.csr(k)
                rows, pos = spmv_mod.match_sources(csr, u[sel])
                ws = w[sel][rows]
                indptr = csr["indptr"]
                lens = indptr[pos + 1] - indptr[pos]
                idx = spmv_mod.concat_ranges(indptr[pos], lens)
                vs = csr["dst"][idx]
                wrep = np.repeat(ws, lens)
                ok = np.zeros(vs.size, dtype=bool)
                for kk in np.unique(wrep % P):
                    s2 = (wrep % P) == kk
                    ok[s2] = probe.member(int(kk), wrep[s2], vs[s2])
                total += int(ok.sum())
            return pa.table({"x": pa.array([total], pa.int64())})

    num = float(G.edges_ds().map_batches(_Num(), batch_format="pyarrow").sum("x") or 0)
    degs = 0.0
    for k in range(P):
        a = ray.get(G.aux_refs[k])
        d = (a["out_cnt"] - a["out_self"]).astype(np.float64)
        degs += float((d * (d - 1)).sum())
    return num / degs if degs else 0.0
