"""PageRank — power iteration with damping/teleport/dangling handling.

Reference semantics (must match to allclose 1e-6):
``algorithms/link_analysis/pagerank_alg.py:12-101``:
  * x0 = nstart/sum(nstart) or uniform 1/N
  * p  = personalization/sum(...) or uniform 1/N  (teleport distribution)
  * per iteration:
        x = alpha * ( (xprev / outdeg) @ A  +  danglesum * dangling_weights )
            + (1 - alpha) * p
    where danglesum = sum(xprev over out-degree-0 vertices) and
    dangling_weights defaults to p (``pagerank_alg.py:62-75``)
  * converge when  sum|x - xprev| < N * tol  (``:98``), else
    ConvergenceFailure after max_iter (``:101``)
  * weighted graphs divide by weighted out-degree; unweighted graphs take
    the iso-value ``plus_first`` fast path (no per-edge multiply,
    ``pagerank_alg.py:53-60``)

Physical plan per iteration: see ``stages/fixpoint.py``. The dangling mass
for iteration t is computed as a per-part stats row by iteration t-1's
combine (no extra pass over the data) and fed back in as a scalar.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .._util import (
    STAT_DANGLING,
    STAT_DELTA,
    state_table,
    stats_rows,
    universe,
    universe_size,
)
from ..stages import spmv
from ..stages.fixpoint import (
    ConvergenceFailure,
    checkpoint_state,
    collect_stats,
    extract_vertex_values,
    latest_checkpoint,
    run_iteration,
)


def _dict_to_dense_ref(d: dict | None, n: int, normalize: bool = True):
    """Small user dict → normalized dense vector in the object store.

    Broadcast once (ray.put), sliced per part with a zero-copy stride view
    inside the stages — never re-shipped per batch. (User-supplied dicts are
    small; a full-length nstart at 10^12 vertices would instead be passed as
    a vertex-table Dataset — not needed by any current caller.)"""
    if d is None:
        return None
    arr = np.zeros(n, dtype=np.float64)
    for k, v in d.items():
        arr[int(k)] = float(v)
    s = arr.sum()
    if normalize:
        if s == 0:
            raise ZeroDivisionError("zero-sum vector")
        arr = arr / s
    return ray.put(arr)


class _PRInit:
    def __init__(self, aux_refs, n, num_parts, x0_ref):
        self.aux_refs, self.n, self.P, self.x0_ref = aux_refs, n, num_parts, x0_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        x0_full = ray.get(self.x0_ref) if self.x0_ref is not None else None
        for k in t["id"].to_numpy(zero_copy_only=False):
            k = int(k)
            uni = universe(k, self.n, self.P)
            if uni.size == 0:
                continue
            x0 = (
                x0_full[k :: self.P].astype(np.float64)
                if x0_full is not None
                else np.full(uni.size, 1.0 / self.n)
            )
            aux = ray.get(self.aux_refs[k])
            dm = float(x0[aux["out_wsum"] == 0].sum())
            out.append(state_table(k, 0, uni, f0=x0))
            out.append(stats_rows(k, {STAT_DANGLING: dm}))
        if not out:
            return state_table(0, 0, np.empty(0, np.int64))
        return pa.concat_tables(out)


class _PRSpMV:
    """Gather alpha*x/outdeg per source, scatter along CSR, pre-combine."""

    def __init__(self, csr_refs, num_parts, alpha, weighted):
        self.cache = spmv.CsrCache(csr_refs)
        self.P = num_parts
        self.alpha = alpha
        self.weighted = weighted

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        if t.num_rows == 0:
            return state_table(0, 0, np.empty(0, np.int64))
        b = spmv.batch_numpy(t)
        out = [t]  # passthrough: combine needs prev state + universe
        for k, sel in spmv.iter_parts(b):
            csr = self.cache.get(k)
            v, x = b["v"][sel], b["f0"][sel]
            rows, pos = spmv.match_sources(csr, v)
            if rows.size == 0:
                continue
            seed = self.alpha * x[rows] / csr["row_wsum"][pos]
            dsts, vals = spmv.expand_adjacency(csr, pos, seed, self.weighted)
            ud, acc = spmv.precombine_sum(dsts, vals)
            out.append(state_table((ud % self.P).astype(np.int32), 1, ud, f0=acc))
        return pa.concat_tables(out)


class _PRCombine:
    def __init__(self, aux_refs, n, num_parts, alpha, dm_prev, p_ref, dw_ref):
        self.aux_refs = aux_refs
        self.n, self.P, self.alpha = n, num_parts, alpha
        self.dm_prev = dm_prev
        self.p_ref, self.dw_ref = p_ref, dw_ref

    def __call__(self, g: pa.Table) -> pa.Table:
        b = spmv.batch_numpy(g)
        k = int(b["part"][0])
        usize = universe_size(k, self.n, self.P)
        kind = b["kind"]
        v, f0 = b["v"], b["f0"]
        st = (kind == 0) & (v >= 0)
        prev = np.zeros(usize, dtype=np.float64)
        prev[v[st] // self.P] = f0[st]
        acc = np.zeros(usize, dtype=np.float64)
        msg = kind == 1
        np.add.at(acc, v[msg] // self.P, f0[msg])

        p_k = (
            ray.get(self.p_ref)[k :: self.P]
            if self.p_ref is not None
            else 1.0 / self.n
        )
        dw_k = ray.get(self.dw_ref)[k :: self.P] if self.dw_ref is not None else p_k
        new = acc + self.alpha * self.dm_prev * dw_k + (1.0 - self.alpha) * p_k

        aux = ray.get(self.aux_refs[k])
        dm_new = float(new[aux["out_wsum"] == 0].sum())
        delta = float(np.abs(new - prev).sum())
        uni = universe(k, self.n, self.P)
        return pa.concat_tables(
            [
                state_table(k, 0, uni, f0=new),
                stats_rows(k, {STAT_DELTA: delta, STAT_DANGLING: dm_new}),
            ]
        )


def pagerank(
    G,
    alpha: float = 0.85,
    personalization: dict | None = None,
    max_iter: int = 100,
    tol: float = 1e-6,
    nstart: dict | None = None,
    dangling: dict | None = None,
    *,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    raise_on_failure: bool = True,
):
    """Distributed PageRank; returns a vertex-table Dataset (v, pagerank)."""
    G._ensure_built()
    n, P = G.n, G.num_parts
    if n == 0:
        raise ValueError("pagerank of the null graph (PointlessConcept)")

    p_ref = _dict_to_dense_ref(personalization, n)
    dw_ref = _dict_to_dense_ref(dangling, n)
    x0_ref = _dict_to_dense_ref(nstart, n)

    start_it = 0
    state = None
    if resume and checkpoint_dir:
        ck = latest_checkpoint(checkpoint_dir)
        if ck is not None:
            start_it, state, stats = ck
            if stats.get(STAT_DELTA, np.inf) < n * tol:
                # checkpoint is already the converged iterate
                return extract_vertex_values(state, "pagerank")
            start_it += 1
    if state is None:
        state = (
            ray.data.range(P, override_num_blocks=P)
            .map_batches(_PRInit(G.aux_refs, n, P, x0_ref), batch_format="pyarrow")
            .materialize()
        )
        stats = collect_stats(state)

    for it in range(start_it, max_iter):
        spmv_stage = _PRSpMV(G.csr_refs, P, alpha, G.weighted)
        combine = _PRCombine(
            G.aux_refs, n, P, alpha, stats.get(STAT_DANGLING, 0.0), p_ref, dw_ref
        )
        state, stats = run_iteration(state, spmv_stage, combine)
        if checkpoint_dir and checkpoint_every and (it % checkpoint_every == 0):
            checkpoint_state(state, checkpoint_dir, it, stats, {"algo": "pagerank"})
        if stats.get(STAT_DELTA, np.inf) < n * tol:
            if checkpoint_dir:
                checkpoint_state(state, checkpoint_dir, it, stats, {"algo": "pagerank", "converged": True})
            return extract_vertex_values(state, "pagerank")
    if raise_on_failure:
        raise ConvergenceFailure(f"pagerank failed to converge in {max_iter} iterations")
    return extract_vertex_values(state, "pagerank")


def pagerank_dict(G, **kw) -> dict:
    """Small-graph convenience (tests): full result as {v: score}."""
    df = pagerank(G, **kw).to_pandas()
    return dict(zip(df["v"].astype(int), df["pagerank"].astype(float)))
