"""Weighted shortest paths — frontier-pruned Bellman-Ford (min_plus SpMV).

Reference: ``algorithms/shortest_paths/weighted.py:17-105``
(``single_source_bellman_ford_path_length``): iterate relaxations over
``offdiag`` with the min_plus semiring, keep only improved vertices in the
frontier, detect negative cycles by improvement past n-1 rounds (raises
Unbounded, ``:87-100``). Iso/non-negative graphs could downgrade to level
BFS (``:25-38``) — we keep the general kernel and expose BFS separately.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import STAT_CHANGED, state_table, stats_rows, universe, universe_size
from ..stages import spmv
from ..stages.fixpoint import run_iteration

_INF = np.inf


class Unbounded(RuntimeError):
    """Negative cycle reachable from the source (reference ``weighted.py:100``)."""


@ray.remote
def _aux_has_neg_self(aux) -> bool:
    return bool((aux["out_self_wmin"] < 0).any())


def _any_negative_self_loop(G) -> bool:
    """True iff any vertex has a negative self-loop (reference
    ``has_negative_diagonal``). O(P) bools to the driver; aux arrays stay put."""
    if not G.weighted:
        return False
    return any(ray.get([_aux_has_neg_self.remote(r) for r in G.aux_refs]))


def _raise_if_reached_negative_self_loop(G, state):
    """Reference parity (``weighted.py:87-100``): a vertex with a negative
    self-loop that is REACHED (finite dist) means the walk is unbounded.
    Distributed check: per-part count of finite-dist vertices whose
    ``out_self_wmin`` is negative."""
    if not G.weighted:
        return
    aux_refs, P = G.aux_refs, G.num_parts

    class _Check:
        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(
                pc.and_(
                    pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)),
                    pc.less(t["f0"], np.inf),
                )
            )
            v = t["v"].to_numpy(zero_copy_only=False)
            hits = 0
            for k in np.unique((v % P).astype(np.int64)):
                sel = (v % P) == k
                wmin = ray.get(aux_refs[int(k)])["out_self_wmin"]
                hits += int((wmin[v[sel] // P] < 0).sum())
            return pa.table({"neg": pa.array([hits], pa.int64())})

    total = sum(r["neg"] for r in state.map_batches(_Check(), batch_format="pyarrow").take_all())
    if total:
        raise Unbounded("negative self-loop on a reached vertex")


class _BFInit:
    def __init__(self, n, num_parts, source):
        self.n, self.P, self.src = n, num_parts, int(source)

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for k in t["id"].to_numpy(zero_copy_only=False):
            k = int(k)
            uni = universe(k, self.n, self.P)
            if uni.size == 0:
                continue
            dist = np.full(uni.size, _INF)
            act = np.zeros(uni.size, np.int64)
            if self.src % self.P == k:
                dist[self.src // self.P] = 0.0
                act[self.src // self.P] = 1
            out.append(state_table(k, 0, uni, f0=dist, i0=act))
        if not out:
            return state_table(0, 0, np.empty(0, np.int64))
        return pa.concat_tables(out)


class _BFSpMV:
    """Active rows relax: scatter (dst, dist + w), min-combined per batch.

    Self-loops are skipped (offdiag semantics, ``weighted.py:17-24``)."""

    def __init__(self, csr_refs, num_parts, weighted):
        self.cache = spmv.CsrCache(csr_refs)
        self.P = num_parts
        self.weighted = weighted

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        if t.num_rows == 0:
            return state_table(0, 0, np.empty(0, np.int64))
        b = spmv.batch_numpy(t)
        out = [t]
        active = b["i0"] == 1
        for k, sel in spmv.iter_parts(b):
            csr = self.cache.get(k)
            idx = np.nonzero(active)[0] if isinstance(sel, slice) else sel[active[sel]]
            v, dist = b["v"][idx], b["f0"][idx]
            rows, pos = spmv.match_sources(csr, v)
            if rows.size == 0:
                continue
            indptr = csr["indptr"]
            lens = indptr[pos + 1] - indptr[pos]
            eidx = spmv.concat_ranges(indptr[pos], lens)
            dsts = csr["dst"][eidx]
            base = np.repeat(dist[rows], lens)
            srcs = np.repeat(v[rows], lens)
            w = (
                csr["weight"][eidx]
                if self.weighted and csr.get("weight") is not None
                else 1.0
            )
            vals = base + w
            keep = dsts != srcs  # offdiag: self-loops never relax
            ud, mins = spmv.precombine_min(dsts[keep], vals[keep])
            out.append(state_table((ud % self.P).astype(np.int32), 1, ud, f0=mins))
        return pa.concat_tables(out)


class _BFCombine:
    def __init__(self, n, num_parts):
        self.n, self.P = n, num_parts

    def __call__(self, g: pa.Table) -> pa.Table:
        b = spmv.batch_numpy(g)
        k = int(b["part"][0])
        usize = universe_size(k, self.n, self.P)
        kind, v = b["kind"], b["v"]
        st = (kind == 0) & (v >= 0)
        dist = np.full(usize, _INF)
        dist[v[st] // self.P] = b["f0"][st]
        new = dist.copy()
        msg = kind == 1
        np.minimum.at(new, v[msg] // self.P, b["f0"][msg])
        improved = new < dist
        uni = universe(k, self.n, self.P)
        return pa.concat_tables(
            [
                state_table(k, 0, uni, f0=new, i0=improved.astype(np.int64)),
                stats_rows(k, {STAT_CHANGED: float(improved.sum())}),
            ]
        )


def bellman_ford_path_length(G, source) -> ray.data.Dataset:
    """(v, dist) for reachable vertices. Raises Unbounded on a reachable
    negative cycle."""
    G._ensure_built()
    n, P = G.n, G.num_parts
    state = (
        ray.data.range(P, override_num_blocks=P)
        .map_batches(_BFInit(n, P, source), batch_format="pyarrow")
        .materialize()
    )
    it = 0
    while True:
        state, stats = run_iteration(
            state, _BFSpMV(G.csr_refs, P, G.weighted), _BFCombine(n, P)
        )
        it += 1
        if stats.get(STAT_CHANGED, 0.0) == 0:
            break
        if it > n:
            raise Unbounded("negative cycle reachable from source")
    _raise_if_reached_negative_self_loop(G, state)

    def _strip(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(
            pc.and_(
                pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)),
                pc.less(t["f0"], np.inf),
            )
        )
        return pa.table({"v": t["v"], "dist": t["f0"]})

    return state.map_batches(_strip, batch_format="pyarrow")


def bellman_ford_dict(G, source) -> dict:
    df = bellman_ford_path_length(G, source).to_pandas()
    return dict(zip(df["v"].astype(int), df["dist"].astype(float)))


class _BFParentSpMV(_BFSpMV):
    """Relaxations carrying (dist, parent): f0 = candidate dist, message
    i0 = the relaxing source vertex (parent candidate). State i0 packs
    ((parent+1) << 1) | active. Min combine is lexicographic (dist, parent)
    — the reference reverse-engineers the producing edge
    (``weighted.py:268-284``); carrying the parent through the min-combine
    is the simpler equivalent (SURVEY.md §2.6)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        if t.num_rows == 0:
            return state_table(0, 0, np.empty(0, np.int64))
        b = spmv.batch_numpy(t)
        out = [t]
        active = (b["i0"] & 1) == 1
        for k, sel in spmv.iter_parts(b):
            csr = self.cache.get(k)
            idx = np.nonzero(active)[0] if isinstance(sel, slice) else sel[active[sel]]
            v, dist = b["v"][idx], b["f0"][idx]
            rows, pos = spmv.match_sources(csr, v)
            if rows.size == 0:
                continue
            indptr = csr["indptr"]
            lens = indptr[pos + 1] - indptr[pos]
            eidx = spmv.concat_ranges(indptr[pos], lens)
            dsts = csr["dst"][eidx]
            srcs = np.repeat(v[rows], lens)
            w = (
                csr["weight"][eidx]
                if self.weighted and csr.get("weight") is not None
                else 1.0
            )
            vals = np.repeat(dist[rows], lens) + w
            keep = dsts != srcs
            dsts, vals, srcs = dsts[keep], vals[keep], srcs[keep]
            # lexicographic (dist, parent) min per dst
            order = np.lexsort((srcs, vals, dsts))
            d_s, v_s, p_s = dsts[order], vals[order], srcs[order]
            first = np.ones(d_s.size, dtype=bool)
            first[1:] = d_s[1:] != d_s[:-1]
            out.append(
                state_table(
                    (d_s[first] % self.P).astype(np.int32),
                    1,
                    d_s[first],
                    f0=v_s[first],
                    i0=p_s[first],
                )
            )
        return pa.concat_tables(out)


class _BFParentCombine(_BFCombine):
    """State: f0 = dist, i0 packs ((parent+1) << 1) | active."""

    def __call__(self, g: pa.Table) -> pa.Table:
        b = spmv.batch_numpy(g)
        k = int(b["part"][0])
        usize = universe_size(k, self.n, self.P)
        kind, v = b["kind"], b["v"]
        st = (kind == 0) & (v >= 0)
        dist = np.full(usize, _INF)
        parent = np.full(usize, -1, np.int64)
        li = v[st] // self.P
        dist[li] = b["f0"][st]
        parent[li] = (b["i0"][st] >> 1) - 1
        new = dist.copy()
        newp = parent.copy()
        msg = kind == 1
        if msg.any():
            mi = v[msg] // self.P
            md = b["f0"][msg]
            mp = b["i0"][msg]
            order = np.lexsort((mp, md, mi))
            mi_s, md_s, mp_s = mi[order], md[order], mp[order]
            first = np.ones(mi_s.size, dtype=bool)
            first[1:] = mi_s[1:] != mi_s[:-1]
            mi_s, md_s, mp_s = mi_s[first], md_s[first], mp_s[first]
            better = md_s < new[mi_s]
            new[mi_s[better]] = md_s[better]
            newp[mi_s[better]] = mp_s[better]
        improved = new < dist
        uni = universe(k, self.n, self.P)
        packed = ((newp + 1) << 1) | improved.astype(np.int64)
        return pa.concat_tables(
            [
                state_table(k, 0, uni, f0=new, i0=packed),
                stats_rows(k, {STAT_CHANGED: float(improved.sum())}),
            ]
        )


def bellman_ford_path(G, source: int, target: int):
    """Shortest path (list of vertices) source→target; reference
    ``weighted.py:213-308``. Raises Unbounded on negative cycles."""
    G._ensure_built()
    n, P = G.n, G.num_parts

    class _Init(_BFInit):
        def __call__(self, t: pa.Table) -> pa.Table:
            out = []
            for k in t["id"].to_numpy(zero_copy_only=False):
                k = int(k)
                uni = universe(k, n, P)
                if uni.size == 0:
                    continue
                dist = np.full(uni.size, _INF)
                packed = np.zeros(uni.size, np.int64)
                if self.src % P == k:
                    dist[self.src // P] = 0.0
                    packed[self.src // P] = ((self.src + 1) << 1) | 1
                out.append(state_table(k, 0, uni, f0=dist, i0=packed))
            if not out:
                return state_table(0, 0, np.empty(0, np.int64))
            return pa.concat_tables(out)

    state = (
        ray.data.range(P, override_num_blocks=P)
        .map_batches(_Init(n, P, source), batch_format="pyarrow")
        .materialize()
    )
    it = 0
    while True:
        state, stats = run_iteration(
            state, _BFParentSpMV(G.csr_refs, P, G.weighted), _BFParentCombine(n, P)
        )
        it += 1
        if stats.get(STAT_CHANGED, 0.0) == 0:
            break
        if it > n:
            raise Unbounded("negative cycle reachable from source")
    _raise_if_reached_negative_self_loop(G, state)

    import pyarrow.compute as pc

    df = state.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0))
        ),
        batch_format="pyarrow",
    ).to_pandas()
    dist = dict(zip(df["v"].astype(int), df["f0"].astype(float)))
    packed = df["i0"].to_numpy().astype(np.int64)
    parent = dict(zip(df["v"].astype(int), (packed >> 1) - 1))
    if not np.isfinite(dist.get(int(target), np.inf)):
        raise KeyError(f"no path {source} -> {target}")
    path = [int(target)]
    while path[-1] != int(source):
        p = parent[path[-1]]
        if p < 0:
            raise KeyError(f"no path {source} -> {target}")
        path.append(p)
    return list(reversed(path))


_MBF_ACTIVE = np.int64(1) << np.int64(62)
_MBF_SHIFT = np.int64(31)  # key = v << 31 | source; n, |sources| < 2^31
_MBF_SRC31 = (np.int64(1) << _MBF_SHIFT) - np.int64(1)  # low 31 bits = source


class _MBFInit:
    def __init__(self, num_parts, sources):
        self.P = num_parts
        self.sources = np.asarray(sorted(set(int(s) for s in sources)), np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for k in t["id"].to_numpy(zero_copy_only=False):
            k = int(k)
            mine = self.sources[self.sources % self.P == k]
            if mine.size == 0:
                continue
            out.append(
                state_table(
                    k, 0, mine, f0=np.zeros(mine.size), i0=mine | _MBF_ACTIVE
                )
            )
        if not out:
            return state_table(0, 0, np.empty(0, np.int64))
        return pa.concat_tables(out)


class _MBFSpMV:
    """Packed-parallel relaxation: every active (v, source) pair relaxes in
    the SAME superstep (reference ``weighted.py:118-197`` runs one
    levels-matrix row per source in a single loop; this is its (v, source)
    state-row form — VERDICT r1 #7 replaces the per-source composition)."""

    def __init__(self, csr_refs, num_parts, weighted):
        self.cache = spmv.CsrCache(csr_refs)
        self.P = num_parts
        self.weighted = weighted

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        if t.num_rows == 0:
            return state_table(0, 0, np.empty(0, np.int64))
        b = spmv.batch_numpy(t)
        out = [t]
        active = (b["i0"] & _MBF_ACTIVE) != 0
        for k, sel in spmv.iter_parts(b):
            idx = np.nonzero(active)[0] if isinstance(sel, slice) else sel[active[sel]]
            if idx.size == 0:
                continue
            csr = self.cache.get(k)
            v = b["v"][idx]
            src_of = b["i0"][idx] & _MBF_SRC31
            dist = b["f0"][idx]
            rows, pos = spmv.match_sources(csr, v)
            if rows.size == 0:
                continue
            indptr = csr["indptr"]
            lens = indptr[pos + 1] - indptr[pos]
            eidx = spmv.concat_ranges(indptr[pos], lens)
            dsts = csr["dst"][eidx]
            w = (
                csr["weight"][eidx]
                if self.weighted and csr.get("weight") is not None
                else 1.0
            )
            vals = np.repeat(dist[rows], lens) + w
            srcs = np.repeat(src_of[rows], lens)
            keep = dsts != np.repeat(v[rows], lens)  # offdiag semantics
            dsts, vals, srcs = dsts[keep], vals[keep], srcs[keep]
            if dsts.size == 0:
                continue
            key = (dsts << _MBF_SHIFT) | srcs
            uk, inv = np.unique(key, return_inverse=True)
            mmin = np.full(uk.size, np.inf)
            np.minimum.at(mmin, inv, vals)
            ud = uk >> _MBF_SHIFT
            out.append(
                state_table(
                    (ud % self.P).astype(np.int32), 1, ud, f0=mmin, i0=uk & _MBF_SRC31
                )
            )
        return pa.concat_tables(out)


class _MBFCombine:
    def __init__(self, num_parts):
        self.P = num_parts

    def __call__(self, g: pa.Table) -> pa.Table:
        b = spmv.batch_numpy(g)
        k = int(b["part"][0])
        kind, v = b["kind"], b["v"]
        st = (kind == 0) & (v >= 0)
        known_key = (v[st] << _MBF_SHIFT) | (b["i0"][st] & _MBF_SRC31)
        known_dist = b["f0"][st]
        order = np.argsort(known_key)
        known_key, known_dist = known_key[order], known_dist[order]

        changed = 0
        out = []
        msg = kind == 1
        fresh_keys = np.empty(0, np.int64)
        fresh_dist = np.empty(0, np.float64)
        active_known = np.zeros(known_key.size, dtype=bool)
        if msg.any():
            mk = (v[msg] << _MBF_SHIFT) | b["i0"][msg]
            uk, inv = np.unique(mk, return_inverse=True)
            mmin = np.full(uk.size, np.inf)
            np.minimum.at(mmin, inv, b["f0"][msg])
            if known_key.size:
                pos = np.searchsorted(known_key, uk)
                posc = np.minimum(pos, known_key.size - 1)
                exists = known_key[posc] == uk
                better = exists & (mmin < known_dist[posc])
                known_dist[posc[better]] = mmin[better]
                active_known[posc[better]] = True
            else:
                exists = np.zeros(uk.size, dtype=bool)
                better = exists
            freshm = ~exists
            fresh_keys, fresh_dist = uk[freshm], mmin[freshm]
            changed = int(better.sum()) + int(freshm.sum())
        keys = np.concatenate([known_key, fresh_keys])
        dists = np.concatenate([known_dist, fresh_dist])
        act = np.concatenate([active_known, np.ones(fresh_keys.size, dtype=bool)])
        i0 = (keys & _MBF_SRC31) | np.where(act, _MBF_ACTIVE, np.int64(0))
        out.append(state_table(k, 0, keys >> _MBF_SHIFT, f0=dists, i0=i0))
        out.append(stats_rows(k, {STAT_CHANGED: float(changed)}))
        return pa.concat_tables(out)


def bellman_ford_path_lengths(G, sources) -> ray.data.Dataset:
    """Multi-source Bellman-Ford (reference ``weighted.py:118-197``):
    Dataset (source, v, dist). ALL sources relax in one packed BSP loop —
    state rows keyed (v, source), exactly the multi-source BFS pattern
    (``allpairs.py``) with min-plus messages."""
    G._ensure_built()
    n, P = G.n, G.num_parts
    state = (
        ray.data.range(P, override_num_blocks=P)
        .map_batches(_MBFInit(P, sources), batch_format="pyarrow")
        .materialize()
    )
    it = 0
    while True:
        state, stats = run_iteration(
            state, _MBFSpMV(G.csr_refs, P, G.weighted), _MBFCombine(P)
        )
        it += 1
        if stats.get(STAT_CHANGED, 0.0) == 0:
            break
        if it > n:
            raise Unbounded("negative cycle reachable from a source")
    _raise_if_reached_negative_self_loop(G, state)

    def _strip(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        return pa.table(
            {
                "source": pa.array(t["i0"].to_numpy(zero_copy_only=False) & _MBF_SRC31),
                "v": t["v"],
                "dist": t["f0"],
            }
        )

    return state.map_batches(_strip, batch_format="pyarrow")


def negative_edge_cycle(G) -> bool:
    """Reference ``weighted.py:311-348`` — any negative cycle in the graph:
    run BF from a virtual super-source (dist 0 everywhere) and watch for
    improvement past n rounds."""
    G._ensure_built()
    if _any_negative_self_loop(G):
        return True  # negative diagonal entry IS a negative cycle
    n, P = G.n, G.num_parts

    class _AllInit(_BFInit):
        def __call__(self, t: pa.Table) -> pa.Table:
            out = []
            for k in t["id"].to_numpy(zero_copy_only=False):
                k = int(k)
                uni = universe(k, n, P)
                if uni.size == 0:
                    continue
                out.append(
                    state_table(
                        k, 0, uni, f0=np.zeros(uni.size), i0=np.ones(uni.size, np.int64)
                    )
                )
            if not out:
                return state_table(0, 0, np.empty(0, np.int64))
            return pa.concat_tables(out)

    state = (
        ray.data.range(P, override_num_blocks=P)
        .map_batches(_AllInit(n, P, 0), batch_format="pyarrow")
        .materialize()
    )
    it = 0
    while True:
        state, stats = run_iteration(
            state, _BFSpMV(G.csr_refs, P, G.weighted), _BFCombine(n, P)
        )
        it += 1
        if stats.get(STAT_CHANGED, 0.0) == 0:
            return False
        if it > n:
            return True
