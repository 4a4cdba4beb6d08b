"""Label propagation community detection — synchronous, deterministic.

Not present in the reference (its community module has only ``quality.py``);
required by the north rule. Engine spec (SURVEY.md §2.4): init
``label_v = v``; each superstep every vertex adopts the most frequent label
among its neighbors (self-loop counts itself), ties broken by the MINIMUM
label; vertices with no neighbors keep their label; stop at fixpoint or
``max_iter``. Synchronous + min-tie-break ⇒ the result is a pure function of
the edge set, independent of partitioning and combine order — exactly
matchable by a tiny pure-python oracle (tests) or unrolled SQL.

Physical plan: scatter ``(dst, label)`` pre-counted per batch →
``groupby(part)`` → per-part count aggregation + argmax-with-min-tie →
compare-and-swap; the changed-count stats row drives the driver loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .._util import STAT_CHANGED, state_table, stats_rows, universe, universe_size
from ..stages import spmv
from ..stages.fixpoint import collect_stats, extract_vertex_values, run_iteration


class _LPAInit:
    def __init__(self, n, num_parts):
        self.n, self.P = n, num_parts

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for k in t["id"].to_numpy(zero_copy_only=False):
            k = int(k)
            uni = universe(k, self.n, self.P)
            if uni.size == 0:
                continue
            out.append(state_table(k, 0, uni, i0=uni))
        if not out:
            return state_table(0, 0, np.empty(0, np.int64))
        return pa.concat_tables(out)


class _LPASpMV:
    """Scatter (dst, src_label) counted per batch — the combiner for the
    mode aggregate."""

    def __init__(self, csr_refs, num_parts, drop_stale_stats=False):
        self.cache = spmv.CsrCache(csr_refs)
        self.P = num_parts
        self.drop_stale_stats = drop_stale_stats

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        passthru = None if self.drop_stale_stats else t.filter(pc.equal(t["kind"], 3))
        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        if t.num_rows == 0:
            return state_table(0, 0, np.empty(0, np.int64))
        b = spmv.batch_numpy(t)
        out = [t]
        if passthru is not None and passthru.num_rows:
            out.append(passthru)
        for k, sel in spmv.iter_parts(b):
            csr = self.cache.get(k)
            v, lab = b["v"][sel], b["i0"][sel]
            rows, pos = spmv.match_sources(csr, v)
            if rows.size == 0:
                continue
            indptr = csr["indptr"]
            lens = indptr[pos + 1] - indptr[pos]
            idx = spmv.concat_ranges(indptr[pos], lens)
            dsts = csr["dst"][idx]
            labels = np.repeat(lab[rows], lens)
            ud, ulab, cnt = spmv.precombine_label_count(dsts, labels)
            out.append(
                state_table((ud % self.P).astype(np.int32), 1, ud, f0=cnt, i0=ulab)
            )
        return pa.concat_tables(out)


class _LPACombine:
    def __init__(self, n, num_parts, superstep=0):
        self.n, self.P, self.superstep = n, num_parts, superstep

    def __call__(self, g: pa.Table) -> pa.Table:
        b = spmv.batch_numpy(g)
        k = int(b["part"][0])
        usize = universe_size(k, self.n, self.P)
        kind, v = b["kind"], b["v"]
        st = (kind == 0) & (v >= 0)
        prev = np.zeros(usize, dtype=np.int64)
        prev[v[st] // self.P] = b["i0"][st]
        new = prev.copy()

        msg = kind == 1
        if msg.any():
            dl = v[msg] // self.P
            lab = b["i0"][msg]
            cnt = b["f0"][msg]
            # re-aggregate counts by (dst, label) across batches
            key = np.stack([dl, lab], axis=1)
            ukey, inv = np.unique(key, axis=0, return_inverse=True)
            csum = np.zeros(ukey.shape[0], dtype=np.float64)
            np.add.at(csum, inv, cnt)
            # winner per dst: max count, tie → min label.
            # ukey is sorted by (dst, label); stable-sort by -count keeps
            # label ascending within equal counts → first row per dst wins.
            order = np.argsort(-csum, kind="stable")
            dso, lso = ukey[order, 0], ukey[order, 1]
            _, first = np.unique(dso, return_index=True)
            new[dso[first]] = lso[first]

        changed = new != prev
        uni = universe(k, self.n, self.P)
        out = [
            state_table(k, 0, uni, i0=new),
            pa.table(
                {
                    "part": pa.array([k], pa.int32()),
                    "kind": pa.array([3], pa.int8()),
                    "v": pa.array([STAT_CHANGED], pa.int64()),
                    "f0": pa.array([float(changed.sum())], pa.float64()),
                    "i0": pa.array([self.superstep], pa.int64()),
                }
            ),
        ]
        stale = kind == 3
        if stale.any():
            out.append(g.filter(pa.array(stale)))
        return pa.concat_tables(out)


@ray.remote
def _build_lpa_layout(csr, n, P):
    """One part's LPA edge layout (dst-part-sorted gather indices +
    premultiplied destination keys) as a plasma object: task-built once
    per graph, shared ZERO-COPY by every mesh worker (read-only arrays),
    and prefetchable (Graph.prefetch_derived) so LPA's first superstep
    doesn't pay the argsort/repeat build."""
    dt = np.int32 if n <= np.iinfo(np.int32).max else np.int64
    dst = csr["dst"]
    nrows = csr["srcs"].size
    edge_row = np.repeat(np.arange(nrows, dtype=dt), csr["row_cnt"])
    dpart = (dst % P).astype(dt)
    order = np.argsort(dpart, kind="stable")
    return {
        "srcs_local": (csr["srcs"] // P).astype(dt),
        "edge_row": edge_row[order],
        "dmul": (dst // P)[order].astype(np.int64) * np.int64(n),
        "bounds": np.searchsorted(dpart[order], np.arange(P + 1)),
        "fe": None,
    }


def lpa_layout_refs(g):
    """Per-part plasma LPA layouts for an (undirected) graph; cached on
    the graph, safe against a prefetch thread racing the kernel."""
    g._ensure_built()
    with g._derive_lock:
        if "lpa_layout_refs" not in g._cache:
            g._cache["lpa_layout_refs"] = [
                _build_lpa_layout.remote(r, g.n, g.num_parts) for r in g.csr_refs
            ]
        return g._cache["lpa_layout_refs"]


class _LPADenseProg:
    """Dense-layout LPA for the fused mesh (bsp_actors.DensePool).

    Messages worker→part j are pre-combined ``(key, count)`` pairs with
    ``key = dst_local * n + label`` (sorted unique int64 keys — valid while
    (n/P)·n < 2^63, i.e. n ≲ 3e9·√P). Per superstep: ONE fancy-index gather
    of per-edge source labels over a per-part edge layout precomputed once
    (edges sorted by destination part), then ``np.unique`` per destination
    slice for the local (dst,label) count combiner. Combine re-aggregates
    counts across workers and picks max-count / min-label per destination
    (the deterministic synchronous rule above). ``merge_pieces`` overrides
    the mesh's additive slab merge — counts concatenate and re-unique."""

    def __init__(self, csr_refs, n, P, hub=None, layout_refs=None):
        self.csr_refs = csr_refs
        self.n, self.P = n, P
        # stages/hubsplit: hub rows leave the owner's CSR; their label
        # votes are counted in combine() from per-dst-part foreign arrays,
        # with hub labels riding the round's scalar all-reduce.
        self.hub = hub
        # pre-built plasma layouts (lpa_layout_refs) — hub-free graphs
        # only (the hub filter changes the layout's edge set)
        self.layout_refs = layout_refs if hub is None else None
        # int32 tier: label values are vertex ids (< n) and the per-edge
        # index streams (edge_row, srcs_local) fit int32 at any n the
        # dense mesh handles — halves the DRAM traffic of the superstep
        # gathers (the stage is bandwidth-bound at 8 saturated cores).
        # The (dst_local, label) composite COUNT key stays int64.
        self.dt = np.int32 if n <= np.iinfo(np.int32).max else np.int64
        self._l = {}  # keyed by part: workers own range(aid, P, A) parts

    def _layout(self, part):
        if part not in self._l:
            # worker-process layout store (bsp_actors._DenseWorker): reuse
            # structural layouts across prog instances on the same graph
            store = getattr(self, "_store", None)
            skey = None
            if store is not None:
                skey = (
                    "lpa",
                    self.csr_refs[part].hex(),
                    self.hub["fe_refs"][part].hex() if self.hub else None,
                )
                if skey in store:
                    self._l[part] = store[skey]
                    return self._l[part]
            if self.layout_refs is not None:
                # task-built plasma layout: zero-copy read-only arrays,
                # shared by every worker (and possibly already built by a
                # prefetch_derived thread while an earlier kernel ran)
                self._l[part] = ray.get(self.layout_refs[part])
                if store is not None:
                    store[skey] = self._l[part]
                return self._l[part]
            csr = ray.get(self.csr_refs[part])
            P = self.P
            dt = self.dt
            dst = csr["dst"]
            nrows = csr["srcs"].size
            edge_row = np.repeat(np.arange(nrows, dtype=dt), csr["row_cnt"])
            fe = None
            if self.hub is not None:
                from ..stages.hubsplit import hub_edge_keep

                keep = hub_edge_keep(csr, self.hub["vids"])
                if keep is not None:
                    dst = dst[keep]
                    edge_row = edge_row[keep]
                fe = ray.get(self.hub["fe_refs"][part])
            dpart = (dst % P).astype(dt)
            order = np.argsort(dpart, kind="stable")
            self._l[part] = {
                "srcs_local": (csr["srcs"] // P).astype(dt),
                "edge_row": edge_row[order],
                # premultiplied destination key (static): key = dmul + lab
                # per superstep — one add, no runtime multiply/astype
                "dmul": (dst // P)[order].astype(np.int64) * np.int64(self.n),
                "bounds": np.searchsorted(dpart[order], np.arange(P + 1)),
                "fe": fe,
            }
            if store is not None:
                store[skey] = self._l[part]
        return self._l[part]

    def init_state(self, part):
        return universe(part, self.n, self.P).astype(self.dt)

    @staticmethod
    def merge_pieces(cur, arr):
        k = np.concatenate([cur[0], arr[0]])
        c = np.concatenate([cur[1], arr[1]])
        uk, inv = np.unique(k, return_inverse=True)
        out = np.zeros(uk.size, dtype=np.int64)
        np.add.at(out, inv, c)
        return (uk, out)

    def make_pieces(self, part, x, gscalars):
        l = self._layout(part)
        sc = {}
        if self.hub is not None:
            from ..stages.hubsplit import HUB_STAT_BASE

            gi, loc = self.hub["own"].get(part, (None, None))
            if gi is not None:
                for i, lo in zip(gi, loc):
                    sc[HUB_STAT_BASE + int(i)] = float(x[lo])
        lab = x[l["srcs_local"]][l["edge_row"]]
        b = l["bounds"]
        pieces = []
        for j in range(self.P):
            s0, s1 = int(b[j]), int(b[j + 1])
            if s1 > s0:
                key = l["dmul"][s0:s1] + lab[s0:s1]
                uk, cnt = np.unique(key, return_counts=True)
                pieces.append((uk, cnt.astype(np.int64)))
            else:
                pieces.append(None)
        return pieces, sc

    def combine(self, part, pieces, gscalars, x_prev):
        live = [p for p in pieces if p is not None]
        l = self._layout(part)
        if l["fe"] is not None:
            from ..stages.hubsplit import hub_values

            fe = l["fe"]
            hl = hub_values(
                gscalars, None, self.hub["vids"].size,
                self.hub["vids"].astype(np.float64),
            ).astype(np.int64)
            key_f = fe["dlocal"].astype(np.int64) * self.n + hl[fe["fsrc"]]
            uk_f, cnt_f = np.unique(key_f, return_counts=True)
            live.append((uk_f, cnt_f.astype(np.int64)))
        new = x_prev.copy()  # vertices with no in-messages keep their label
        if live:
            k = np.concatenate([p[0] for p in live])
            c = np.concatenate([p[1] for p in live])
            uk, inv = np.unique(k, return_inverse=True)
            csum = np.zeros(uk.size, dtype=np.int64)
            np.add.at(csum, inv, c)
            # winner per dst: max count, tie → min label. uk ascending =
            # (dst, label) ascending; stable sort by -count keeps label
            # ascending within equal counts; first occurrence per dst wins.
            order = np.argsort(-csum, kind="stable")
            ko = uk[order]
            dso, lso = ko // self.n, ko % self.n
            _, first = np.unique(dso, return_index=True)
            new[dso[first]] = lso[first].astype(new.dtype)
        changed = int((new != x_prev).sum())
        return new, {STAT_CHANGED: float(changed)}

    def extract(self, part, x):
        uni = universe(part, self.n, self.P)
        return pa.table(
            {"v": pa.array(uni, pa.int64()),
             "label": pa.array(x.astype(np.int64, copy=False), pa.int64())}
        )


def label_propagation(G, max_iter: int = 30, chain: int = 5, executor: str = "dataset"):
    """Community labels after synchronous LPA; Dataset (v, label).

    Directed input is symmetrized (community detection is defined on the
    undirected structure). Supersteps run `chain` at a time in one Ray Data
    job — the synchronous rule is stable at fixpoint, so overshoot is exact."""
    from ..stages.fixpoint import run_chain

    g = G.to_undirected() if G.directed else G
    g._ensure_built()
    n, P = g.n, g.num_parts

    from ..stages.bsp_actors import fused_min_edges

    if executor == "actors_dense" or (
        executor == "actors" and g.m >= fused_min_edges()
    ):
        # dense-layout fused mesh — the large-graph throughput path
        # (checked before any row-state init; the mesh builds its own state)
        from ..stages.bsp_actors import DensePool, StatBelow, dense_actors_for

        pool = DensePool(
            # sized by the semantic (directed) m so CC/LPA/pagerank share
            # one cached mesh instead of spawning a 2m-sized sibling
            P,
            _LPADenseProg(g.csr_refs, n, P, layout_refs=lpa_layout_refs(g)),
            # LPA's per-superstep label bincounts dominate the exchange —
            # the full-width mesh wins despite the contention tax
            num_actors=dense_actors_for(G.m, heavy=True),
        )
        it = 0
        while it < max_iter:
            k = min(8, max_iter - it)
            hist, done, stopped = pool.run_fused(
                k, StatBelow(STAT_CHANGED, 0.5), start_step=it
            )
            it += done
            changed = hist.get(it - 1, {}).get(STAT_CHANGED, 0.0)
            if stopped or changed == 0.0:
                break
        return pool.extract()

    state = (
        ray.data.range(P, override_num_blocks=P)
        .map_batches(_LPAInit(n, P), batch_format="pyarrow")
        .materialize()
    )
    if executor in ("actors", "actors_fused"):
        from ..stages.bsp_actors import BSPPool, StatBelow

        pool = BSPPool.shared(P, state)
        pool.register(
            _LPASpMV(g.csr_refs, P, drop_stale_stats=True),
            _LPACombine(n, P, superstep=0),
        )
        use_fused = executor == "actors_fused"
        try:
            it = 0
            stop = StatBelow(STAT_CHANGED, 0.5)  # changed == 0
            while it < max_iter:
                if use_fused:
                    k = min(8, max_iter - it)
                    hist, done, stopped = pool.run_fused(k, stop, start_step=it)
                    it += done
                    changed = hist.get(it - 1, {}).get(STAT_CHANGED, 0.0)
                else:
                    stats = pool.superstep()
                    it += 1
                    stopped = False
                    changed = stats.get(0, {}).get(STAT_CHANGED, 0.0)
                if stopped or changed == 0.0:
                    break
            final = pool.gather_state().materialize()
            return extract_vertex_values(final, "label", use_int=True)
        finally:
            pool.shutdown()

    it = 0
    while it < max_iter:
        k = min(chain, max_iter - it)
        state, chain_stats = run_chain(
            state,
            lambda i: _LPASpMV(g.csr_refs, P, drop_stale_stats=(i == 0)),
            lambda i: _LPACombine(n, P, superstep=i),
            k,
        )
        it += k
        if any(
            chain_stats.get(s, {}).get(STAT_CHANGED, 0.0) == 0.0 for s in range(k)
        ):
            break
    return extract_vertex_values(state, "label", use_int=True)


def label_propagation_dict(G, max_iter: int = 30, **kw) -> dict:
    df = label_propagation(G, max_iter=max_iter, **kw).to_pandas()
    return dict(zip(df["v"].astype(int), df["label"].astype(int)))


def lpa_oracle(edges, n: int, max_iter: int = 30) -> dict:
    """~20-line pure-python reference for the spec'd LPA rule (tests/SQL
    validation only — this is the committed oracle from FIXTURES.md §3.5)."""
    from collections import Counter, defaultdict

    adj = defaultdict(list)
    for u, vv in edges:
        adj[u].append(vv)
        if u != vv:
            adj[vv].append(u)
    # dedup neighbor lists (edge table semantics: simple graph)
    adj = {u: sorted(set(vs)) for u, vs in adj.items()}
    lab = {v: v for v in range(n)}
    for _ in range(max_iter):
        new = {}
        for v in range(n):
            ns = adj.get(v, [])
            if not ns:
                new[v] = lab[v]
                continue
            cnt = Counter(lab[u] for u in ns)
            best = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == best)
        if new == lab:
            break
        lab = new
    return lab
