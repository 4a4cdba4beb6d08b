"""BFS family — frontier kernels on the fixpoint harness.

Reference: ``algorithms/_bfs.py`` — ``_bfs_plain`` (any_pair reachability,
:15-45), ``_bfs_level`` (:48-71), ``_bfs_parent`` (min_first parents,
:110-137), plus the thin wrappers ``bfs_layers``, ``descendants_at_distance``
(``algorithms/traversal/breadth_first_search.py``), ``descendants/ancestors``
(``algorithms/dag.py:6-17``) and ``single_source/target_shortest_path_length``
(``shortest_paths/unweighted.py:14-19``).

State: f0 = level (-1 = unvisited), i0 = {frontier flag | parent}. Each
superstep only frontier rows scatter (the masked ``q(~v.S) << q @ A`` of the
reference); newly visited vertices form the next frontier; the driver stops
on the changed-count stat.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import STAT_CHANGED, state_table, stats_rows, universe, universe_size
from ..stages import spmv
from ..stages.fixpoint import collect_stats, run_iteration

_UNVISITED = -1.0


class _BFSInit:
    def __init__(self, n, num_parts, sources):
        self.n, self.P = n, num_parts
        self.sources = np.asarray(sorted(sources), dtype=np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for k in t["id"].to_numpy(zero_copy_only=False):
            k = int(k)
            uni = universe(k, self.n, self.P)
            if uni.size == 0:
                continue
            lvl = np.full(uni.size, _UNVISITED)
            frontier = np.zeros(uni.size, np.int64)
            mine = self.sources[self.sources % self.P == k]
            lvl[mine // self.P] = 0.0
            frontier[mine // self.P] = 1
            out.append(state_table(k, 0, uni, f0=lvl, i0=frontier))
        if not out:
            return state_table(0, 0, np.empty(0, np.int64))
        return pa.concat_tables(out)


class _BFSSpMV:
    """Frontier rows scatter (dst, my_level + 1); pre-combined min."""

    def __init__(self, csr_refs, num_parts):
        self.cache = spmv.CsrCache(csr_refs)
        self.P = num_parts

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        if t.num_rows == 0:
            return state_table(0, 0, np.empty(0, np.int64))
        b = spmv.batch_numpy(t)
        out = [t]
        frontier = b["i0"] == 1
        for k, sel in spmv.iter_parts(b):
            csr = self.cache.get(k)
            idx = np.nonzero(frontier)[0] if isinstance(sel, slice) else sel[frontier[sel]]
            v, lvl = b["v"][idx], b["f0"][idx]
            rows, pos = spmv.match_sources(csr, v)
            if rows.size == 0:
                continue
            dsts, vals = spmv.expand_adjacency(csr, pos, lvl[rows] + 1.0, False)
            ud, mins = spmv.precombine_min(dsts, vals)
            out.append(state_table((ud % self.P).astype(np.int32), 1, ud, f0=mins))
        return pa.concat_tables(out)


class _BFSCombine:
    def __init__(self, n, num_parts, cutoff=None):
        self.n, self.P, self.cutoff = n, num_parts, cutoff

    def __call__(self, g: pa.Table) -> pa.Table:
        b = spmv.batch_numpy(g)
        k = int(b["part"][0])
        usize = universe_size(k, self.n, self.P)
        kind, v = b["kind"], b["v"]
        st = (kind == 0) & (v >= 0)
        lvl = np.full(usize, _UNVISITED)
        lvl[v[st] // self.P] = b["f0"][st]
        frontier = np.zeros(usize, np.int64)
        msg = kind == 1
        if msg.any():
            cand_idx = v[msg] // self.P
            cand_lvl = b["f0"][msg]
            newly = lvl[cand_idx] == _UNVISITED
            if self.cutoff is not None:
                newly &= cand_lvl <= self.cutoff
            lvl[cand_idx[newly]] = cand_lvl[newly]
            frontier[cand_idx[newly]] = 1
        uni = universe(k, self.n, self.P)
        return pa.concat_tables(
            [
                state_table(k, 0, uni, f0=lvl, i0=frontier),
                stats_rows(k, {STAT_CHANGED: float(frontier.sum())}),
            ]
        )


def bfs_levels(G, sources, *, cutoff=None, reverse: bool = False) -> ray.data.Dataset:
    """(v, level) for vertices reachable from `sources` (level of nearest
    source); unreachable vertices are omitted."""
    g = G.reverse() if reverse else G
    g._ensure_built()
    n, P = g.n, g.num_parts
    if isinstance(sources, (int, np.integer)):
        sources = [int(sources)]
    state = (
        ray.data.range(P, override_num_blocks=P)
        .map_batches(_BFSInit(n, P, sources), batch_format="pyarrow")
        .materialize()
    )
    while True:
        state, stats = run_iteration(state, _BFSSpMV(g.csr_refs, P), _BFSCombine(n, P, cutoff))
        if stats.get(STAT_CHANGED, 0.0) == 0:
            break

    def _strip(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(
            pc.and_(
                pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)),
                pc.greater_equal(t["f0"], 0),
            )
        )
        lvl = t["f0"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": t["v"], "level": pa.array(lvl)})

    return state.map_batches(_strip, batch_format="pyarrow")


def single_source_shortest_path_length(G, source, cutoff=None):
    """Reference ``shortest_paths/unweighted.py:14-16`` (_bfs_level)."""
    return bfs_levels(G, source, cutoff=cutoff)


def single_target_shortest_path_length(G, target, cutoff=None):
    """``shortest_paths/unweighted.py:17-19`` — BFS on the transpose."""
    return bfs_levels(G, target, cutoff=cutoff, reverse=G.directed)


def descendants(G, source) -> set:
    """``algorithms/dag.py:6-11`` — reachable set minus source."""
    df = bfs_levels(G, source).to_pandas()
    return set(df[df["level"] > 0]["v"].astype(int))


def ancestors(G, source) -> set:
    """``algorithms/dag.py:12-17`` — reverse reachability minus source."""
    df = bfs_levels(G, source, reverse=G.directed).to_pandas()
    return set(df[df["level"] > 0]["v"].astype(int))


def descendants_at_distance(G, source, distance: int) -> set:
    """``traversal/breadth_first_search.py:30-45``."""
    df = bfs_levels(G, source, cutoff=distance).to_pandas()
    return set(df[df["level"] == distance]["v"].astype(int))


def bfs_layers(G, sources):
    """``traversal/breadth_first_search.py:10-27`` — list of per-layer node
    lists (generator semantics flattened; each layer sorted)."""
    df = bfs_levels(G, sources).to_pandas()
    out = []
    for lvl in sorted(df["level"].unique()):
        out.append(sorted(df[df["level"] == lvl]["v"].astype(int)))
    return out


def has_path(G, u, v) -> bool:
    """``shortest_paths/generic.py:7-12``."""
    df = bfs_levels(G, u).to_pandas()
    return int(v) in set(df["v"].astype(int))


def bfs_parents(G, source) -> ray.data.Dataset:
    """(v, parent): BFS tree parents, min parent id wins on ties —
    the reference's min_first semiring (``_bfs.py:110-137``).

    Implemented as BFS levels + one extra min-combine per superstep: the
    parent of v is the min-id frontier vertex that discovered v."""
    g = G
    g._ensure_built()
    n, P = g.n, g.num_parts
    src = int(source)

    state = (
        ray.data.range(P, override_num_blocks=P)
        .map_batches(_BFSParentInit(n, P, src), batch_format="pyarrow")
        .materialize()
    )
    while True:
        state, stats = run_iteration(
            state, _BFSParentSpMV(g.csr_refs, P), _BFSParentCombine(n, P)
        )
        if stats.get(STAT_CHANGED, 0.0) == 0:
            break

    def _strip(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(
            pc.and_(
                pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)),
                pc.greater_equal(t["i0"], 0),
            )
        )
        return pa.table({"v": t["v"], "parent": t["i0"]})

    return state.map_batches(_strip, batch_format="pyarrow")


class _BFSParentInit:
    def __init__(self, n, num_parts, src):
        self.n, self.P, self.src = n, num_parts, src

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for k in t["id"].to_numpy(zero_copy_only=False):
            k = int(k)
            uni = universe(k, self.n, self.P)
            if uni.size == 0:
                continue
            parent = np.full(uni.size, -1, np.int64)
            f = np.zeros(uni.size)
            if self.src % self.P == k:
                parent[self.src // self.P] = self.src  # root is its own parent
                f[self.src // self.P] = 1.0
            out.append(state_table(k, 0, uni, f0=f, i0=parent))
        if not out:
            return state_table(0, 0, np.empty(0, np.int64))
        return pa.concat_tables(out)


class _BFSParentSpMV:
    def __init__(self, csr_refs, num_parts):
        self.cache = spmv.CsrCache(csr_refs)
        self.P = num_parts

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        if t.num_rows == 0:
            return state_table(0, 0, np.empty(0, np.int64))
        b = spmv.batch_numpy(t)
        out = [t]
        frontier = b["f0"] == 1.0
        for k, sel in spmv.iter_parts(b):
            csr = self.cache.get(k)
            idx = np.nonzero(frontier)[0] if isinstance(sel, slice) else sel[frontier[sel]]
            v = b["v"][idx]
            rows, pos = spmv.match_sources(csr, v)
            if rows.size == 0:
                continue
            # scatter (dst, src_id); min src wins (min_first)
            dsts, vals = spmv.expand_adjacency(
                csr, pos, v[rows].astype(np.float64), False
            )
            ud, mins = spmv.precombine_min(dsts, vals)
            out.append(
                state_table(
                    (ud % self.P).astype(np.int32), 1, ud, i0=mins.astype(np.int64)
                )
            )
        return pa.concat_tables(out)


class _BFSParentCombine:
    def __init__(self, n, num_parts):
        self.n, self.P = n, num_parts

    def __call__(self, g: pa.Table) -> pa.Table:
        b = spmv.batch_numpy(g)
        k = int(b["part"][0])
        usize = universe_size(k, self.n, self.P)
        kind, v = b["kind"], b["v"]
        st = (kind == 0) & (v >= 0)
        parent = np.full(usize, -1, np.int64)
        parent[v[st] // self.P] = b["i0"][st]
        frontier = np.zeros(usize)
        msg = kind == 1
        if msg.any():
            ci = v[msg] // self.P
            cp = b["i0"][msg]
            newly = parent[ci] == -1
            # min across message rows for the same dst
            order = np.argsort(ci, kind="stable")
            ci_s, cp_s = ci[order], cp[order]
            first = np.ones(ci_s.size, dtype=bool)
            first[1:] = ci_s[1:] != ci_s[:-1]
            mins = np.minimum.reduceat(cp_s, np.nonzero(first)[0]) if ci_s.size else cp_s
            uci = ci_s[first]
            newly = parent[uci] == -1
            parent[uci[newly]] = mins[newly]
            frontier[uci[newly]] = 1.0
        uni = universe(k, self.n, self.P)
        return pa.concat_tables(
            [
                state_table(k, 0, uni, f0=frontier, i0=parent),
                stats_rows(k, {STAT_CHANGED: float(frontier.sum())}),
            ]
        )
