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
    collect_stats,
    extract_vertex_values,
    latest_checkpoint,
    run_iteration,
)

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


class _CCSpMV:
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
    def __init__(self, n, num_parts):
        self.n, self.P = n, num_parts

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
        return pa.concat_tables(
            [
                state_table(k, 0, uni, f0=changed.astype(np.float64), i0=new),
                stats_rows(k, {STAT_CHANGED: float(changed.sum())}),
            ]
        )


def connected_components(
    G,
    *,
    max_iter: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
):
    """Per-vertex component labels (label = min vertex id in component).

    Directed input is symmetrized first (weakly connected components,
    reference ``algorithms/components/weakly_connected.py:5-8``)."""
    g = G.to_undirected() if G.directed else G
    g._ensure_built()
    n, P = g.n, g.num_parts
    if n == 0:
        raise ValueError("null graph (PointlessConcept)")

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
        stats = collect_stats(state)

    it = start_it
    while stats.get(STAT_CHANGED, 1.0) > 0:
        if max_iter is not None and it >= max_iter:
            break
        state, stats = run_iteration(state, _CCSpMV(g.csr_refs, P), _CCCombine(n, P))
        if checkpoint_dir and checkpoint_every and (it % checkpoint_every == 0):
            checkpoint_state(state, checkpoint_dir, it, stats, {"algo": "cc"})
        it += 1
    if checkpoint_dir:
        checkpoint_state(state, checkpoint_dir, it, stats, {"algo": "cc", "converged": True})
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
