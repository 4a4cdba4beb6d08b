"""Connected components — synchronous min-label propagation to fixpoint.

The reference only exposes reachability (``algorithms/components/connected.py:5-12``
BFS-based ``is_connected`` / ``node_connected_component``); the engine's full
labeling (north-rule tier 1) uses the equivalent formulation
``label_v ← min(label_v, min_{u~v} label_u)`` on the symmetrized edge table,
init ``label_v = v``. The final label of every vertex is the minimum vertex
id in its component — deterministic and exact regardless of partitioning or
combine order (min is a commutative idempotent monoid).

Changed-only frontier: after the first superstep only vertices whose label
improved re-send (delta propagation), so late iterations touch a shrinking
frontier — the same optimization as the reference's masked BFS
(``algorithms/_bfs.py:33-39`` ``q(~v.S, replace) << q @ A``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .._util import STAT_CHANGED, state_table, stats_rows, universe, universe_size
from ..stages import spmv
from ..stages.fixpoint import (
    checkpoint_state,
    extract_vertex_values,
    latest_checkpoint,
)


def _fused_min_edges_cc() -> int:
    from ..stages.bsp_actors import fused_min_edges

    return fused_min_edges()

_I64MAX = np.iinfo(np.int64).max


class _CCInit:
    def __init__(self, n, num_parts):
        self.n, self.P = n, num_parts

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for k in t["id"].to_numpy(zero_copy_only=False):
            k = int(k)
            uni = universe(k, self.n, self.P)
            if uni.size == 0:
                continue
            # f0=1.0 → active (everyone sends in superstep 1)
            out.append(state_table(k, 0, uni, f0=np.ones(uni.size), i0=uni))
            out.append(stats_rows(k, {STAT_CHANGED: float(uni.size)}))
        if not out:
            return state_table(0, 0, np.empty(0, np.int64))
        return pa.concat_tables(out)


class _CCDenseProg:
    """Dense min-label CC for the fused mesh (bsp_actors.DensePool).

    Messages worker→part j are dense int64 slabs over part j's universe
    (I64MAX where nothing arrives), built with ONE gather + ONE
    np.minimum.reduceat over a per-part edge layout precomputed once
    (edges lexsorted by (dest part, dest local); segment = one distinct
    destination). Combine is an elementwise min. Full re-send per round
    (no frontier) — min-label CC converges in O(diameter-ish) rounds, and
    a full round is one cheap edge stream; the row path keeps the
    frontier optimization for the Dataset/checkpoint formulation."""

    def __init__(self, csr_refs, n, P, hub=None, resume_refs=None):
        self.csr_refs = csr_refs
        self.n, self.P = n, P
        # stages/hubsplit: hub rows leave the owner's CSR; their edges are
        # min-applied in combine() from per-dst-part foreign arrays, with
        # hub labels riding the round's scalar all-reduce (int64 < 2^53 —
        # exact through the float64 channel).
        self.hub = hub
        # {part: ObjectRef(label array)} from a dense checkpoint
        self.resume_refs = resume_refs
        # keyed by part: a _DenseWorker owns range(aid, P, A) parts, so a
        # single cached layout would reuse the first part's edges for all.
        self._l = {}

    def _layout(self, part):
        if part not in self._l:
            # worker-process layout store — see _PRDenseProg._layout
            store = getattr(self, "_store", None)
            skey = None
            if store is not None:
                skey = (
                    "cc",
                    self.csr_refs[part].hex(),
                    self.hub["fe_refs"][part].hex() if self.hub else None,
                )
                if skey in store:
                    self._l[part] = store[skey]
                    return self._l[part]
            csr = ray.get(self.csr_refs[part])
            P, n = self.P, self.n
            dst = csr["dst"]
            nrows = csr["srcs"].size
            edge_row = np.repeat(np.arange(nrows, dtype=np.int64), csr["row_cnt"])
            fe = None
            if self.hub is not None:
                from ..stages.hubsplit import hub_edge_keep

                keep = hub_edge_keep(csr, self.hub["vids"])
                if keep is not None:
                    dst = dst[keep]
                    edge_row = edge_row[keep]
                fe = ray.get(self.hub["fe_refs"][part])
            dpart = (dst % P).astype(np.int64)
            dlocal = dst // P
            order = np.lexsort((dlocal, dpart))
            dpart_s, dlocal_s = dpart[order], dlocal[order]
            # segment starts: first edge of each distinct (dpart, dlocal)
            seg_start = np.ones(dst.size, dtype=bool)
            if dst.size:
                seg_start[1:] = (dpart_s[1:] != dpart_s[:-1]) | (
                    dlocal_s[1:] != dlocal_s[:-1]
                )
            starts = np.nonzero(seg_start)[0]
            seg_dlocal = dlocal_s[starts]
            seg_dpart = dpart_s[starts]
            pb = np.searchsorted(seg_dpart, np.arange(P + 1))
            self._l[part] = {
                "srcs_local": csr["srcs"] // P,
                "edge_row_sorted": edge_row[order],
                "starts": starts,
                "seg_dlocal": seg_dlocal,
                "part_bounds": pb,
                "usizes": [universe_size(j, n, P) for j in range(P)],
                "fe": fe,
            }
            if skey is not None:
                store[skey] = self._l[part]
        return self._l[part]

    def init_state(self, part):
        if self.resume_refs is not None:
            return ray.get(self.resume_refs[part]).astype(np.int64, copy=False)
        return universe(part, self.n, self.P).astype(np.int64)

    @staticmethod
    def merge_pieces(cur, arr):
        # local pre-combine across a worker's owned parts: elementwise min
        # (the default additive merge would overflow the I64MAX sentinels)
        return np.minimum(cur, arr)

    def make_pieces(self, part, x, gscalars):
        l = self._layout(part)
        sc = {}
        if self.hub is not None:
            from ..stages.hubsplit import HUB_STAT_BASE

            gi, loc = self.hub["own"].get(part, (None, None))
            if gi is not None:
                for i, lo in zip(gi, loc):
                    sc[HUB_STAT_BASE + int(i)] = float(x[lo])
        if l["starts"].size == 0:
            return [None] * self.P, sc
        ev = x[l["srcs_local"]][l["edge_row_sorted"]]
        seg_min = np.minimum.reduceat(ev, l["starts"])
        pb = l["part_bounds"]
        pieces = []
        for j in range(self.P):
            s0, s1 = int(pb[j]), int(pb[j + 1])
            if s1 > s0:
                slab = np.full(l["usizes"][j], _I64MAX, dtype=np.int64)
                slab[l["seg_dlocal"][s0:s1]] = seg_min[s0:s1]
                pieces.append(slab)
            else:
                pieces.append(None)
        return pieces, sc

    def combine(self, part, pieces, gscalars, x_prev):
        new = x_prev
        for p in pieces:
            new = np.minimum(new, p)
        l = self._layout(part)
        if l["fe"] is not None:
            from ..stages.hubsplit import hub_values

            fe = l["fe"]
            # default = the hub's own vid (its initial label); unreachable
            # in practice — owners emit every round
            hl = hub_values(
                gscalars, None, self.hub["vids"].size,
                self.hub["vids"].astype(np.float64),
            ).astype(np.int64)
            if new is x_prev:
                new = x_prev.copy()
            np.minimum.at(new, fe["dlocal"], hl[fe["fsrc"]])
        changed = int((new < x_prev).sum())
        return new, {STAT_CHANGED: float(changed)}

    def extract(self, part, x):
        uni = universe(part, self.n, self.P)
        return pa.table(
            {"v": pa.array(uni, pa.int64()), "component": pa.array(x, pa.int64())}
        )


@ray.remote
def _cc_orient_shard(csr, n, P, in_thr):
    """One DIRECTED CSR shard → its split-orientation CC layout.

    Returns (called with ``num_returns=P+2``):
      [0]      forward layout for this shard's own part: per-edge source
               locals grouped by (dst part, dst local) — one fused-key
               argsort, int32 when ids fit
      [1..P]   backward fragments: fragment p holds this shard's edges
               whose DESTINATION lives in part p, grouped by source local
               — at runtime part p gathers x[d//P] and sends the per-source
               minima back to THIS shard's part
      [P+1]    in-hub flag: some destination receives ≥ in_thr edges from
               this one shard (pigeonhole screen: a global in-degree hub
               ≥ P·in_thr must trip it in at least one shard)
    """
    dst = csr["dst"]
    E = dst.size
    usz = (n + P - 1) // P or 1
    # fused key max is P·usz ≈ n+P — need headroom beyond the id range
    dt = np.int32 if n + P <= np.iinfo(np.int32).max else np.int64
    slocal_rows = (csr["srcs"] // P).astype(dt)
    gather = np.repeat(slocal_rows, csr["row_cnt"])
    if E == 0:
        fwd = {
            "gather": gather,
            "starts": np.empty(0, np.int64),
            "seg_dlocal": np.empty(0, dt),
            "pb": np.zeros(P + 1, np.int64),
        }
        return (fwd, *([None] * P), False)
    # fused sort key (dst part major, dst local minor); int32 arithmetic
    # when every id fits — halves sort + gather bandwidth
    d = dst.astype(dt, copy=False)
    dpart = d % P
    dlocal = d // P
    key = dpart * dt(usz) + dlocal
    order = np.argsort(key, kind="stable")
    ks = key[order]
    starts = np.nonzero(np.r_[True, ks[1:] != ks[:-1]])[0]
    seg_sizes = np.diff(starts, append=E)
    hub_hit = bool(seg_sizes.max() >= in_thr)
    bounds = (np.arange(P + 1, dtype=np.int64) * usz).astype(dt)
    fwd = {
        "gather": gather[order],
        "starts": starts,
        "seg_dlocal": dlocal[order][starts],
        "pb": np.searchsorted(ks[starts], bounds),
    }
    # backward: group by (dst part major, SOURCE local minor) — fragment p
    # is handed to part p, which owns x[d] for every edge in it
    key_b = dpart * dt(usz) + gather
    order_b = np.argsort(key_b, kind="stable")
    kbs = key_b[order_b]
    qb = np.searchsorted(kbs, bounds)
    dl_b = dlocal[order_b]
    frags = []
    for p in range(P):
        s0, s1 = int(qb[p]), int(qb[p + 1])
        if s1 == s0:
            frags.append(None)
            continue
        seg = kbs[s0:s1]
        st = np.nonzero(np.r_[True, seg[1:] != seg[:-1]])[0]
        frags.append(
            {"g": dl_b[s0:s1], "s": st, "v": (seg[st] - dt(p) * dt(usz)).astype(dt)}
        )
    return (fwd, *frags, hub_hit)


@ray.remote
def _cc_assemble_frags(P, *frags):
    """Concatenate one part's P backward fragments into a single layout
    object shaped like the forward one (gather / starts / seg_vals / pb) —
    the prog then carries 2·P refs instead of P² (ref pickling into the
    mesh workers was the dominant pool-construction cost) and the
    backward pass is ONE reduceat instead of P."""
    gs, sts, vals, pb = [], [], [], [0]
    e_off = s_off = 0
    for fr in frags:
        if fr is None:
            pb.append(s_off)
            continue
        gs.append(fr["g"])
        sts.append(fr["s"] + e_off)
        vals.append(fr["v"])
        e_off += fr["g"].size
        s_off += fr["s"].size
        pb.append(s_off)
    if not gs:
        z = np.empty(0, np.int64)
        return {"gather": z, "starts": z, "seg_vals": z, "pb": np.zeros(P + 1, np.int64)}
    return {
        "gather": np.concatenate(gs),
        "starts": np.concatenate(sts),
        "seg_vals": np.concatenate(vals),
        "pb": np.asarray(pb, np.int64),
    }


class _CCSplitProg:
    """Min-label CC directly over the DIRECTED CSR shards, both orientations.

    Eliminates ``to_undirected`` from the CC stage: min is an idempotent
    commutative monoid, so propagating over the raw directed edge set in
    both directions (forward: owner of s sends x[s] to d; backward: owner
    of d sends x[d] to s) converges to exactly the weakly-connected labels
    — duplicate arcs (reciprocal edges that symmetrize would dedup) are
    no-ops under min. Labels are int32 when ids fit (halves superstep
    gather + exchange bandwidth). Hub-bearing graphs fall back to the
    symmetrized ``_CCDenseProg`` path, whose hub machinery is exact.

    Part-level frontier: a part whose labels did not change in the last
    combine would re-send byte-identical pieces, already folded at every
    destination — idempotence makes skipping the send exact."""

    def __init__(self, fwd_refs, bk_refs, n, P, resume_refs=None):
        self.fwd_refs = fwd_refs  # [P] → forward layout dicts
        self.bk_refs = bk_refs  # [P] → assembled backward layout dicts
        self.n, self.P = n, P
        self.resume_refs = resume_refs
        self.dt = np.int32 if n <= np.iinfo(np.int32).max else np.int64
        self.sent = np.iinfo(self.dt).max
        self._l = {}
        self._quiet: set[int] = set()

    merge_pieces = staticmethod(np.minimum)

    def _layout(self, part):
        if part not in self._l:
            store = getattr(self, "_store", None)
            skey = ("ccs", self.fwd_refs[part].hex())
            if store is not None and skey in store:
                self._l[part] = store[skey]
                return self._l[part]
            l = {
                "fwd": ray.get(self.fwd_refs[part]),
                "bk": ray.get(self.bk_refs[part]),
                "usizes": [universe_size(j, self.n, self.P) for j in range(self.P)],
            }
            self._l[part] = l
            if store is not None:
                store[skey] = l
        return self._l[part]

    def init_state(self, part):
        if self.resume_refs is not None:
            return ray.get(self.resume_refs[part]).astype(self.dt)
        return universe(part, self.n, self.P).astype(self.dt)

    def make_pieces(self, part, x, gscalars):
        if part in self._quiet:
            return [None] * self.P, {}
        l = self._layout(part)
        fwd, usizes = l["fwd"], l["usizes"]
        pieces = [None] * self.P
        if fwd["starts"].size:
            segm = np.minimum.reduceat(x[fwd["gather"]], fwd["starts"])
            pb = fwd["pb"]
            for j in range(self.P):
                s0, s1 = int(pb[j]), int(pb[j + 1])
                if s1 > s0:
                    slab = np.full(usizes[j], self.sent, self.dt)
                    slab[fwd["seg_dlocal"][s0:s1]] = segm[s0:s1]
                    pieces[j] = slab
        bk = l["bk"]
        if bk["starts"].size:
            segb = np.minimum.reduceat(x[bk["gather"]], bk["starts"])
            qb, vals = bk["pb"], bk["seg_vals"]
            for j in range(self.P):
                s0, s1 = int(qb[j]), int(qb[j + 1])
                if s1 == s0:
                    continue
                slab = pieces[j]
                if slab is None:
                    slab = np.full(usizes[j], self.sent, self.dt)
                    slab[vals[s0:s1]] = segb[s0:s1]
                    pieces[j] = slab
                else:
                    # seg positions are unique → gather/min/scatter beats .at
                    slab[vals[s0:s1]] = np.minimum(slab[vals[s0:s1]], segb[s0:s1])
        return pieces, {}

    def combine(self, part, pieces, gscalars, x_prev):
        new = x_prev
        for p in pieces:
            new = np.minimum(new, p)
        changed = 0 if new is x_prev else int((new < x_prev).sum())
        if changed:
            self._quiet.discard(part)
        else:
            self._quiet.add(part)
            new = x_prev
        return new, {STAT_CHANGED: float(changed)}

    def extract(self, part, x):
        uni = universe(part, self.n, self.P)
        return pa.table(
            {
                "v": pa.array(uni, pa.int64()),
                "component": pa.array(x.astype(np.int64)),
            }
        )


def _dense_cc_loop(pool, lineage, checkpoint_dir, checkpoint_every, max_iter, start_it):
    """Shared driver loop for the dense CC meshes (sym and split-orientation):
    run chained supersteps to fixpoint with periodic + final checkpoints."""
    from ..stages.bsp_actors import StatBelow

    it = start_it
    while True:
        k = 8 if max_iter is None else max(1, min(8, max_iter - it))
        if checkpoint_every:
            k = min(k, checkpoint_every)
        hist, done, stopped = pool.run_fused(
            k, StatBelow(STAT_CHANGED, 0.5), start_step=it
        )
        it += done
        changed = hist.get(it - 1, {}).get(STAT_CHANGED, 0.0)
        converged = stopped or changed == 0.0
        periodic = checkpoint_every and done and (it - 1) % checkpoint_every < done
        if checkpoint_dir and (periodic or converged):
            pool.checkpoint(
                checkpoint_dir,
                it - 1,
                {STAT_CHANGED: changed if not stopped else 0.0},
                {**lineage, "converged": bool(converged)},
            )
        if converged:
            break
        if max_iter is not None and it >= max_iter:
            break
    return pool.extract()


def cc_split_layout_refs(G):
    """Task-built split-orientation layouts (fwd_refs, bk_refs) for CC,
    cached on the graph; None when an in-degree hub makes the symmetrized
    path the right owner. Lock-guarded: Graph.prefetch_derived may build
    this on a background thread while PageRank runs."""
    from ..stages.hubsplit import hub_threshold

    n, P = G.n, G.num_parts
    with G._derive_lock:
        if "cc_split_layout" not in G._cache:
            in_thr = max(1, hub_threshold(2 * G.m, P) // P)
            rets = [
                _cc_orient_shard.options(num_returns=P + 2).remote(
                    G.csr_refs[q], n, P, in_thr
                )
                for q in range(P)
            ]
            if any(ray.get([r[P + 1] for r in rets])):
                G._cache["cc_split_layout"] = None
            else:
                fwd_refs = [r[0] for r in rets]
                bk_refs = [
                    _cc_assemble_frags.remote(P, *[rets[q][1 + p] for q in range(P)])
                    for p in range(P)
                ]
                G._cache["cc_split_layout"] = (fwd_refs, bk_refs)
        return G._cache["cc_split_layout"]


def _cc_split_orientation(G, *, max_iter, checkpoint_dir, checkpoint_every, resume):
    """Split-orientation dense CC over a directed graph, or None to fall
    back (row-format checkpoint to resume, or a hub that the symmetrized
    path's hub machinery should own)."""
    from ..stages.bsp_actors import (
        DensePool,
        dense_actors_for,
        dense_part_refs,
        latest_dense_checkpoint,
    )
    from ..stages.hubsplit import hub_split, hub_threshold

    n, P = G.n, G.num_parts
    if resume and checkpoint_dir:
        if latest_dense_checkpoint(checkpoint_dir) is None and (
            latest_checkpoint(checkpoint_dir) is not None
        ):
            return None  # row-format checkpoint resumes on the Dataset path
    if hub_split(G) is not None:
        return None  # out-degree hubs: sym path splits them across actors
    layout = cc_split_layout_refs(G)
    if layout is None:
        return None  # in-degree hub (pigeonhole screen): sym path owns it
    fwd_refs, bk_refs = layout
    start_it, resume_refs = 0, None
    if resume and checkpoint_dir:
        dck = latest_dense_checkpoint(checkpoint_dir)
        if dck is not None:
            ck_it, sdir, ck_stats = dck
            if ck_stats.get(STAT_CHANGED, np.inf) == 0.0:
                return ray.data.read_parquet(sdir)  # already converged
            start_it = ck_it + 1
            resume_refs = dense_part_refs(sdir)
    pool = DensePool(
        P,
        _CCSplitProg(fwd_refs, bk_refs, n, P, resume_refs=resume_refs),
        num_actors=dense_actors_for(G.m),
    )
    lineage = {
        "algo": "connected_components",
        "graph": G.workdir,
        "n": n,
        "m": G.m,
        "orientation": "split",
    }
    return _dense_cc_loop(pool, lineage, checkpoint_dir, checkpoint_every, max_iter, start_it)


class _CCSpMV:
    def __init__(self, csr_refs, num_parts, drop_stale_stats=False):
        self.cache = spmv.CsrCache(csr_refs)
        self.P = num_parts
        self.drop_stale_stats = drop_stale_stats

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        passthru = (
            None
            if self.drop_stale_stats
            else t.filter(pc.equal(t["kind"], 3))
        )
        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        if t.num_rows == 0:
            return state_table(0, 0, np.empty(0, np.int64))
        b = spmv.batch_numpy(t)
        out = [t]
        if passthru is not None and passthru.num_rows:
            out.append(passthru)
        active = b["f0"] > 0
        for k, sel in spmv.iter_parts(b):
            csr = self.cache.get(k)
            idx = np.nonzero(active)[0] if isinstance(sel, slice) else sel[active[sel]]
            v, lab = b["v"][idx], b["i0"][idx]
            rows, pos = spmv.match_sources(csr, v)
            if rows.size == 0:
                continue
            dsts, vals = spmv.expand_adjacency(csr, pos, lab[rows].astype(np.float64), False)
            ud, mins = spmv.precombine_min(dsts, vals)
            out.append(
                state_table(
                    (ud % self.P).astype(np.int32), 1, ud, i0=mins.astype(np.int64)
                )
            )
        return pa.concat_tables(out)


class _CCCombine:
    def __init__(self, n, num_parts, superstep=0):
        self.n, self.P, self.superstep = n, num_parts, superstep

    def __call__(self, g: pa.Table) -> pa.Table:
        b = spmv.batch_numpy(g)
        k = int(b["part"][0])
        usize = universe_size(k, self.n, self.P)
        kind, v = b["kind"], b["v"]
        st = (kind == 0) & (v >= 0)
        prev = np.full(usize, _I64MAX, dtype=np.int64)
        prev[v[st] // self.P] = b["i0"][st]
        new = prev.copy()
        msg = kind == 1
        np.minimum.at(new, v[msg] // self.P, b["i0"][msg])
        changed = new < prev
        uni = universe(k, self.n, self.P)
        out = [
            state_table(k, 0, uni, f0=changed.astype(np.float64), i0=new),
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


def connected_components(
    G,
    *,
    max_iter: int | None = None,
    chain: int = 4,
    executor: str = "dataset",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
):
    """Per-vertex component labels (label = min vertex id in component).

    Directed input is symmetrized first (weakly connected components,
    reference ``algorithms/components/weakly_connected.py:5-8``).
    Supersteps run `chain` at a time in one Ray Data job — min-label
    propagation is idempotent at fixpoint, so overshooting is exact."""
    from ..stages.fixpoint import run_chain

    if G.n == 0:
        raise ValueError("null graph (PointlessConcept)")
    if G.directed and executor in ("actors", "actors_dense"):
        # Split-orientation fast path: skip to_undirected entirely and run
        # min-label over the directed shards in both orientations (exact —
        # min is idempotent, so parallel/duplicate arcs are no-ops).
        # 2·m bounds the symmetrized edge count (dedup only shrinks it).
        G._ensure_built()
        if executor == "actors_dense" or 2 * G.m >= _fused_min_edges_cc():
            ds = _cc_split_orientation(
                G,
                max_iter=max_iter,
                checkpoint_dir=checkpoint_dir,
                checkpoint_every=checkpoint_every,
                resume=resume,
            )
            if ds is not None:
                return ds
    g = G.to_undirected() if G.directed else G
    g._ensure_built()
    n, P = g.n, g.num_parts

    dense_route = executor == "actors_dense" or (
        executor == "actors" and g.m >= _fused_min_edges_cc()
    )
    if dense_route and resume and checkpoint_dir:
        # row-format checkpoints resume on the Dataset path below
        from ..stages.bsp_actors import latest_dense_checkpoint

        if latest_dense_checkpoint(checkpoint_dir) is None and (
            latest_checkpoint(checkpoint_dir) is not None
        ):
            dense_route = False
    if dense_route:
        # dense min-label mesh — the large-graph throughput path (checked
        # before any row-state init; the mesh builds its own state).
        # Checkpoints: per-iteration per-partition parquet written by the
        # mesh workers (DensePool.checkpoint); resume feeds the saved
        # labels into init_state via per-part refs.
        from ..stages.bsp_actors import (
            DensePool,
            StatBelow,
            dense_part_refs,
            latest_dense_checkpoint,
        )
        from ..stages.hubsplit import hub_split

        start_it = 0
        resume_refs = None
        if resume and checkpoint_dir:
            dck = latest_dense_checkpoint(checkpoint_dir)
            if dck is not None:
                ck_it, sdir, ck_stats = dck
                if ck_stats.get(STAT_CHANGED, np.inf) == 0.0:
                    return ray.data.read_parquet(sdir)  # already converged
                start_it = ck_it + 1
                resume_refs = dense_part_refs(sdir)
        from ..stages.bsp_actors import dense_actors_for

        pool = DensePool(
            P,
            _CCDenseProg(g.csr_refs, n, P, hub=hub_split(g), resume_refs=resume_refs),
            # size by the SEMANTIC input (directed m): symmetrizing merely
            # stores each edge twice, and sizing by 2m would spawn a
            # second mesh one pow2 step above the one pagerank already
            # warmed (the r3 CC-stage regression)
            num_actors=dense_actors_for(G.m),
        )
        lineage = {"algo": "connected_components", "graph": g.workdir, "n": n, "m": g.m}
        return _dense_cc_loop(
            pool, lineage, checkpoint_dir, checkpoint_every, max_iter, start_it
        )

    start_it, state = 0, None
    if resume and checkpoint_dir:
        ck = latest_checkpoint(checkpoint_dir)
        if ck is not None:
            start_it, state, stats = ck
            start_it += 1
    if state is None:
        state = (
            ray.data.range(P, override_num_blocks=P)
            .map_batches(_CCInit(n, P), batch_format="pyarrow")
            .materialize()
        )

    if executor in ("actors", "actors_fused"):
        from ..stages.bsp_actors import BSPPool, StatBelow, fused_min_edges

        pool = BSPPool.shared(P, state)
        pool.register(
            _CCSpMV(g.csr_refs, P, drop_stale_stats=True),
            _CCCombine(n, P, superstep=0),
        )
        use_fused = executor == "actors_fused" or g.m >= fused_min_edges()
        try:
            it = start_it
            stop = StatBelow(STAT_CHANGED, 0.5)  # changed == 0
            while True:
                if use_fused:
                    k = 8 if max_iter is None else max(1, min(8, max_iter - it))
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
                if max_iter is not None and it >= max_iter:
                    break
            final = pool.gather_state().materialize()
            if checkpoint_dir:
                checkpoint_state(final, checkpoint_dir, it, {STAT_CHANGED: 0.0}, {"algo": "cc", "converged": True})
            return extract_vertex_values(final, "component", use_int=True)
        finally:
            pool.shutdown()

    it = start_it
    done = False
    while not done:
        k = chain if max_iter is None else max(1, min(chain, max_iter - it))
        state, chain_stats = run_chain(
            state,
            lambda i: _CCSpMV(g.csr_refs, P, drop_stale_stats=(i == 0)),
            lambda i: _CCCombine(n, P, superstep=i),
            k,
        )
        changed_last = None
        for s in range(k):
            changed_last = chain_stats.get(s, {}).get(STAT_CHANGED, 0.0)
            if changed_last == 0.0:
                done = True
                break
        it += k
        periodic = checkpoint_every and (it - 1) % checkpoint_every < k
        if checkpoint_dir and (periodic or done):
            checkpoint_state(
                state, checkpoint_dir, it - 1, {STAT_CHANGED: changed_last or 0.0}, {"algo": "cc", "converged": done}
            )
        if max_iter is not None and it >= max_iter:
            break
    return extract_vertex_values(state, "component", use_int=True)


def components_dict(G, **kw) -> dict:
    df = connected_components(G, **kw).to_pandas()
    return dict(zip(df["v"].astype(int), df["component"].astype(int)))


def is_connected(G) -> bool:
    """Reference ``algorithms/components/connected.py:5-8``."""
    labels = connected_components(G)
    import pyarrow.compute as pc

    # distinct label count == 1
    return labels.map_batches(
        lambda t: pa.table({"component": pc.unique(t["component"])}),
        batch_format="pyarrow",
    ).unique("component").__len__() == 1


def is_weakly_connected(G) -> bool:
    """True iff the symmetrized digraph has one component
    (reference ``algorithms/components/weakly_connected.py:5-8``).

    ``connected_components`` already symmetrizes directed input, so
    this is the same distinct-label-count check as ``is_connected``;
    the separate name mirrors the reference API (directed-only)."""
    if not G.directed:
        raise ValueError("is_weakly_connected is for directed graphs")
    return is_connected(G)


def node_connected_component(G, v: int):
    """Vertex set of v's component (``connected.py:11-12``)."""
    import pyarrow.compute as pc

    labels = connected_components(G).materialize()
    vv = int(v)
    target = labels.map_batches(
        lambda t: t.filter(pc.equal(t["v"], vv)), batch_format="pyarrow"
    ).take_all()[0]["component"]
    tgt = int(target)
    return labels.map_batches(
        lambda t: t.filter(pc.equal(t["component"], tgt)), batch_format="pyarrow"
    ).select_columns(["v"])
