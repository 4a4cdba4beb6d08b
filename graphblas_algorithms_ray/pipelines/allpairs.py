"""Multi-source BFS (matrix BFS) + all-pairs shortest path lengths.

Reference ``algorithms/_bfs.py:48-107`` (``_bfs_levels``: one levels-matrix
row per source) and ``shortest_paths/unweighted.py:22-29`` (all-pairs,
source-chunked exactly like ``nxapi/shortest_paths/unweighted.py:30-45``).

State rows are keyed (vertex, source): part = v % P, v = vertex,
i0 = source | frontier-bit (bit 62), f0 = level. The combine de-duplicates
on the packed (v, source) key, so the state grows only by newly-discovered
pairs and the frontier is exactly the new pairs — the multi-source analog of
the masked ``q(~v.S) << q @ A``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import STAT_CHANGED, state_table, stats_rows
from ..stages import spmv
from ..stages.fixpoint import run_iteration

_FRONTIER_BIT = np.int64(1) << np.int64(62)
_SRC_MASK = _FRONTIER_BIT - np.int64(1)


class _MBFSInit:
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
                    k,
                    0,
                    mine,
                    f0=np.zeros(mine.size),
                    i0=mine | _FRONTIER_BIT,
                )
            )
        if not out:
            return state_table(0, 0, np.empty(0, np.int64))
        return pa.concat_tables(out)


class _MBFSSpMV:
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
        frontier = (b["i0"] & _FRONTIER_BIT) != 0
        for k, sel in spmv.iter_parts(b):
            idx = np.nonzero(frontier)[0] if isinstance(sel, slice) else sel[frontier[sel]]
            if idx.size == 0:
                continue
            csr = self.cache.get(k)
            v = b["v"][idx]
            src_of = b["i0"][idx] & _SRC_MASK
            lvl = b["f0"][idx]
            # group frontier rows by vertex for one expansion per vertex row
            rows, pos = spmv.match_sources(csr, v)
            if rows.size == 0:
                continue
            indptr = csr["indptr"]
            lens = indptr[pos + 1] - indptr[pos]
            eidx = spmv.concat_ranges(indptr[pos], lens)
            dsts = csr["dst"][eidx]
            srcs = np.repeat(src_of[rows], lens)
            lvls = np.repeat(lvl[rows], lens) + 1.0
            # pre-combine per (dst, source): min level
            key = dsts * np.int64(1 << 31) + srcs  # n, |sources| < 2^31
            uk, inv = np.unique(key, return_inverse=True)
            ml = np.full(uk.size, np.inf)
            np.minimum.at(ml, inv, lvls)
            ud = uk >> 31
            us = uk & np.int64((1 << 31) - 1)
            out.append(
                state_table(
                    (ud % self.P).astype(np.int32), 1, ud, f0=ml, i0=us
                )
            )
        return pa.concat_tables(out)


class _MBFSCombine:
    def __init__(self, num_parts):
        self.P = num_parts

    def __call__(self, g: pa.Table) -> pa.Table:
        b = spmv.batch_numpy(g)
        k = int(b["part"][0])
        kind, v = b["kind"], b["v"]
        st = (kind == 0) & (v >= 0)
        known_key = v[st] * np.int64(1 << 31) + (b["i0"][st] & _SRC_MASK)
        known_lvl = b["f0"][st]
        order = np.argsort(known_key)
        known_key, known_lvl = known_key[order], known_lvl[order]

        msg = kind == 1
        out = [
            state_table(
                k,
                0,
                known_key >> 31,
                f0=known_lvl,
                i0=(known_key & np.int64((1 << 31) - 1)),  # frontier bit cleared
            )
        ]
        new_count = 0
        if msg.any():
            mk = v[msg] * np.int64(1 << 31) + b["i0"][msg]
            ml = b["f0"][msg]
            # combine duplicate messages across batches
            uk, inv = np.unique(mk, return_inverse=True)
            mmin = np.full(uk.size, np.inf)
            np.minimum.at(mmin, inv, ml)
            # drop already-known pairs
            pos = np.searchsorted(known_key, uk)
            exists = (pos < known_key.size) & (known_key[np.minimum(pos, max(known_key.size - 1, 0))] == uk) if known_key.size else np.zeros(uk.size, bool)
            fresh = ~exists
            new_count = int(fresh.sum())
            if new_count:
                out.append(
                    state_table(
                        k,
                        0,
                        uk[fresh] >> 31,
                        f0=mmin[fresh],
                        i0=(uk[fresh] & np.int64((1 << 31) - 1)) | _FRONTIER_BIT,
                    )
                )
        out.append(stats_rows(k, {STAT_CHANGED: float(new_count)}))
        return pa.concat_tables(out)


def multi_source_bfs(G, sources) -> ray.data.Dataset:
    """(source, v, level) for every (source, reachable vertex) pair."""
    G._ensure_built()
    P = G.num_parts
    state = (
        ray.data.range(P, override_num_blocks=P)
        .map_batches(_MBFSInit(P, sources), batch_format="pyarrow")
        .materialize()
    )
    while True:
        state, stats = run_iteration(state, _MBFSSpMV(G.csr_refs, P), _MBFSCombine(P))
        if stats.get(STAT_CHANGED, 0.0) == 0:
            break

    def _strip(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        return pa.table(
            {
                "source": pa.array(
                    t["i0"].to_numpy(zero_copy_only=False) & _SRC_MASK
                ),
                "v": t["v"],
                "level": pa.array(
                    t["f0"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    return state.map_batches(_strip, batch_format="pyarrow")


def all_pairs_shortest_path_length(G, sources=None, chunk: int = 64) -> ray.data.Dataset:
    """Source-chunked all-pairs BFS (``unweighted.py:22-29`` with the
    nxapi chunking); Dataset (source, v, level)."""
    G._ensure_built()
    if sources is None:
        sources = range(G.n)
    sources = [int(s) for s in sources]
    outs = []
    for i in range(0, len(sources), chunk):
        outs.append(multi_source_bfs(G, sources[i : i + chunk]))
    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)
    return ds


def bidirectional_shortest_path_length(G, u: int, v: int):
    """``shortest_paths/unweighted.py:32-64``: length of the shortest u→v
    path, None if unreachable. (Composed from forward BFS; the alternating
    two-frontier variant is an optimization with identical results.)"""
    from .traversal import bfs_levels

    df = bfs_levels(G, u).to_pandas()
    hit = df[df["v"] == int(v)]
    return int(hit["level"].iloc[0]) if not hit.empty else None
