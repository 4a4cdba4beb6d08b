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

Physical plan: see ``stages/fixpoint.py``. Supersteps are CHAINED ``chain``
at a time into one Ray Data job; the global dangling-mass scalar crosses
supersteps as kind-2 broadcast partials inside the shuffle (an all-reduce
through the groupby — no driver barrier), and per-superstep L1 deltas ride
along as kind-3 passthrough rows read once per chunk. ``chain=1``
reproduces the reference's stop-at-first-converged-iterate exactly;
``chain>1`` may overshoot convergence by up to chain-1 extra supersteps
(still converged, used for fixed-iteration oracle runs and benchmarks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import (
    STAT_DANGLING,
    STAT_DELTA,
    sparse_part_slice,
    sparse_vec_ref,
    state_table,
    universe,
    universe_size,
)
from ..stages import spmv
from ..stages.fixpoint import (
    ConvergenceFailure,
    checkpoint_state,
    extract_vertex_values,
    latest_checkpoint,
    run_chain,
)

# filled after each pagerank() call: iterations run, final L1 delta
LAST_RUN_INFO: dict = {}




def _scalar_broadcast_rows(num_parts: int, stat_id: int, value: float) -> pa.Table:
    """kind-2 rows carrying a per-part scalar partial to EVERY part."""
    parts = np.arange(num_parts, dtype=np.int32)
    return pa.table(
        {
            "part": pa.array(parts, pa.int32()),
            "kind": pa.array(np.full(num_parts, 2, np.int8), pa.int8()),
            "v": pa.array(np.full(num_parts, stat_id, np.int64), pa.int64()),
            "f0": pa.array(np.full(num_parts, value, np.float64), pa.float64()),
            "i0": pa.array(np.zeros(num_parts, np.int64), pa.int64()),
        }
    )


def _delta_row(part: int, stat_id: int, value: float, superstep: int) -> pa.Table:
    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "kind": pa.array([3], pa.int8()),
            "v": pa.array([stat_id], pa.int64()),
            "f0": pa.array([value], pa.float64()),
            "i0": pa.array([superstep], pa.int64()),
        }
    )


class _PRInit:
    def __init__(self, aux_refs, n, num_parts, x0_ref):
        self.aux_refs, self.n, self.P, self.x0_ref = aux_refs, n, num_parts, x0_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        x0_sp = ray.get(self.x0_ref) if self.x0_ref is not None else None
        for k in t["id"].to_numpy(zero_copy_only=False):
            k = int(k)
            uni = universe(k, self.n, self.P)
            if uni.size == 0:
                continue
            x0 = (
                sparse_part_slice(x0_sp, k, self.P, uni.size)
                if x0_sp is not None
                else np.full(uni.size, 1.0 / self.n)
            )
            aux = ray.get(self.aux_refs[k])
            dm = float(x0[aux["out_wsum"] == 0].sum())
            out.append(state_table(k, 0, uni, f0=x0))
            out.append(_scalar_broadcast_rows(self.P, STAT_DANGLING, dm))
        if not out:
            return state_table(0, 0, np.empty(0, np.int64))
        return pa.concat_tables(out)


class _PRSpMV:
    """Gather alpha*x/outdeg per source, scatter along CSR, pre-combine.
    Passes through state (kind 0), scalar partials (kind 2) and — unless at
    a chunk boundary — stats records (kind 3)."""

    def __init__(self, csr_refs, num_parts, alpha, weighted, drop_stale_stats=False):
        self.cache = spmv.CsrCache(csr_refs)
        self.P = num_parts
        self.alpha = alpha
        self.weighted = weighted
        self.drop_stale_stats = drop_stale_stats

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.or_(pc.equal(t["kind"], 2), pc.equal(t["kind"], 3))
        if self.drop_stale_stats:
            keep = pc.equal(t["kind"], 2)
        passthru_aux = t.filter(keep)
        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        out = [passthru_aux, t] if passthru_aux.num_rows else [t]
        if t.num_rows == 0:
            return pa.concat_tables(out) if out else state_table(0, 0, np.empty(0, np.int64))
        b = spmv.batch_numpy(t)
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
    def __init__(self, aux_refs, n, num_parts, alpha, p_ref, dw_ref, superstep):
        self.aux = spmv.CsrCache(aux_refs)
        self.n, self.P, self.alpha = n, num_parts, alpha
        self.p_ref, self.dw_ref = p_ref, dw_ref
        self.superstep = superstep
        self._p_full = self._dw_full = None

    def __call__(self, g: pa.Table) -> pa.Table:
        b = spmv.batch_numpy(g)
        k = int(b["part"][0])
        usize = universe_size(k, self.n, self.P)
        kind, v, f0 = b["kind"], b["v"], b["f0"]

        st = (kind == 0) & (v >= 0)
        prev = np.zeros(usize, dtype=np.float64)
        prev[v[st] // self.P] = f0[st]

        acc = np.zeros(usize, dtype=np.float64)
        msg = kind == 1
        np.add.at(acc, v[msg] // self.P, f0[msg])

        # all-reduced dangling mass of the PREVIOUS iterate (kind-2 partials)
        dm_prev = float(f0[(kind == 2) & (v == STAT_DANGLING)].sum())

        if self.p_ref is not None and self._p_full is None:
            self._p_full = ray.get(self.p_ref)
        if self.dw_ref is not None and self._dw_full is None:
            self._dw_full = ray.get(self.dw_ref)
        p_k = (
            sparse_part_slice(self._p_full, k, self.P, usize)
            if self._p_full is not None
            else 1.0 / self.n
        )
        dw_k = (
            sparse_part_slice(self._dw_full, k, self.P, usize)
            if self._dw_full is not None
            else p_k
        )
        new = acc + self.alpha * dm_prev * dw_k + (1.0 - self.alpha) * p_k

        aux = self.aux.get(k)
        dm_new = float(new[aux["out_wsum"] == 0].sum())
        delta = float(np.abs(new - prev).sum())
        uni = universe(k, self.n, self.P)
        out = [
            state_table(k, 0, uni, f0=new),
            _scalar_broadcast_rows(self.P, STAT_DANGLING, dm_new),
            _delta_row(k, STAT_DELTA, delta, self.superstep),
        ]
        stale = kind == 3
        if stale.any():
            out.append(g.filter(pa.array(stale)))
        return pa.concat_tables(out)


class _PRDenseProg:
    """Dense-accumulator PageRank for the fused mesh (bsp_actors.DensePool).

    Messages worker→part j are dense float64 slabs over part j's universe
    (n/P entries), pre-accumulated locally with np.bincount over a
    PRECOMPUTED per-part edge layout (edges sorted by destination part
    once at setup — no per-step sort, no row format). Combine is a
    vectorized array sum + the reference's teleport/dangling update
    (``pagerank_alg.py:83-101``). The dangling-mass scalar rides with the
    deposits (an all-reduce through the mesh)."""

    def __init__(
        self, csr_refs, aux_refs, n, P, alpha, p_ref, dw_ref, x0_ref, weighted,
        hub=None, resume_refs=None,
    ):
        self.csr_refs, self.aux_refs = csr_refs, aux_refs
        self.n, self.P, self.alpha = n, P, alpha
        self.p_ref, self.dw_ref, self.x0_ref = p_ref, dw_ref, x0_ref
        self.weighted = weighted
        # {part: ObjectRef(value array)} from a dense checkpoint — resume
        # picks up the iterate exactly where the saved run stopped
        self.resume_refs = resume_refs
        # stages/hubsplit split: hub rows leave the owner's CSR; their
        # edges are applied in combine() from per-dst-part foreign arrays,
        # with hub x values riding the round's scalar all-reduce.
        self.hub = hub
        # per-part layouts, built once per actor PER OWNED PART — a
        # _DenseWorker owns every part in range(aid, P, A), so the cache
        # must be keyed by part (a single cached layout silently reuses
        # part 0's edges for all owned parts when A < P).
        self._l = {}

    def _layout(self, part):
        if part not in self._l:
            # worker-process layout store (bsp_actors._DenseWorker): reuse
            # the structural layout across prog INSTANCES on the same
            # graph — keyed by the csr shard ref, so graph identity is
            # exact. p/dw/x0 refs are in the key (p_k/dw_k are baked in).
            store = getattr(self, "_store", None)
            skey = None
            if store is not None:
                skey = (
                    "pr",
                    self.csr_refs[part].hex(),
                    self.weighted,
                    self.p_ref.hex() if self.p_ref is not None else None,
                    self.dw_ref.hex() if self.dw_ref is not None else None,
                    # hub split filters edges out of the layout — same
                    # graph with split on/off must not share (skew bench)
                    self.hub["fe_refs"][part].hex() if self.hub else None,
                )
                if skey in store:
                    self._l[part] = store[skey]
                    return self._l[part]
            csr = ray.get(self.csr_refs[part])
            aux = ray.get(self.aux_refs[part])
            P, n = self.P, self.n
            dst = csr["dst"]
            nrows = csr["srcs"].size
            edge_row_full = np.repeat(np.arange(nrows, dtype=np.int64), csr["row_cnt"])
            w_full = (
                csr["weight"]
                if self.weighted and csr.get("weight") is not None
                else None
            )
            fe = None
            if self.hub is not None:
                from ..stages.hubsplit import hub_edge_keep

                keep = hub_edge_keep(csr, self.hub["vids"])
                if keep is not None:
                    dst = dst[keep]
                    edge_row_full = edge_row_full[keep]
                    if w_full is not None:
                        w_full = w_full[keep]
                fe = ray.get(self.hub["fe_refs"][part])
            dpart = (dst % P).astype(np.int64)
            order = np.argsort(dpart, kind="stable")
            usize_k = universe_size(part, n, P)
            p_sp = ray.get(self.p_ref) if self.p_ref is not None else None
            dw_sp = ray.get(self.dw_ref) if self.dw_ref is not None else None
            p_k = (
                sparse_part_slice(p_sp, part, P, usize_k)
                if p_sp is not None
                else 1.0 / n
            )
            dw_k = (
                sparse_part_slice(dw_sp, part, P, usize_k)
                if dw_sp is not None
                else p_k
            )
            # edge -> csr-row index, pre-permuted into dst-part order: per
            # step the seed gather is ONE fancy-index over the row array
            # (no np.repeat temporary)
            self._l[part] = {
                "srcs_local": csr["srcs"] // P,
                "row_wsum": csr["row_wsum"],
                "edge_row": edge_row_full[order],
                "dlocal": (dst // P)[order],
                "bounds": np.searchsorted(dpart[order], np.arange(P + 1)),
                "usizes": [universe_size(j, n, P) for j in range(P)],
                "dangling_mask": aux["out_wsum"] == 0,
                "weight": w_full[order] if w_full is not None else None,
                "p_k": p_k,
                "dw_k": dw_k,
                "fe": fe,
            }
            if skey is not None:
                store[skey] = self._l[part]
        return self._l[part]

    def init_state(self, part):
        usize = universe_size(part, self.n, self.P)
        if self.resume_refs is not None:
            return ray.get(self.resume_refs[part]).astype(np.float64, copy=False)
        if self.x0_ref is not None:
            return sparse_part_slice(ray.get(self.x0_ref), part, self.P, usize)
        return np.full(usize, 1.0 / self.n)

    def make_pieces(self, part, x, gscalars):
        l = self._layout(part)
        seed = self.alpha * x[l["srcs_local"]] / l["row_wsum"]
        ev = seed[l["edge_row"]]
        if l["weight"] is not None:
            ev = ev * l["weight"]
        b = l["bounds"]
        pieces = []
        for j in range(self.P):
            s0, s1 = int(b[j]), int(b[j + 1])
            if s1 > s0:
                pieces.append(
                    np.bincount(
                        l["dlocal"][s0:s1], weights=ev[s0:s1], minlength=l["usizes"][j]
                    )
                )
            else:
                pieces.append(None)
        dm = float(x[l["dangling_mask"]].sum())
        sc = {STAT_DANGLING: dm}
        if self.hub is not None:
            # owner emission: this round's hub x values ride the scalar
            # all-reduce so every part's combine() sees them this superstep
            from ..stages.hubsplit import HUB_STAT_BASE

            gi, loc = self.hub["own"].get(part, (None, None))
            if gi is not None:
                for i, lo in zip(gi, loc):
                    sc[HUB_STAT_BASE + int(i)] = float(x[lo])
        return pieces, sc

    def combine(self, part, pieces, gscalars, x_prev):
        l = self._layout(part)
        usize = universe_size(part, self.n, self.P)
        acc = np.zeros(usize, dtype=np.float64)
        for p in pieces:
            acc += p
        if l["fe"] is not None:
            # foreign hub edges destined to this part (stages/hubsplit):
            # seed from the hub x values all-reduced with this round
            from ..stages.hubsplit import hub_values

            fe = l["fe"]
            hx = hub_values(gscalars, None, self.hub["vids"].size, 1.0 / self.n)
            seed = self.alpha * hx / self.hub["wsum"]
            ev = seed[fe["fsrc"]]
            if self.weighted and fe["weight"] is not None:
                ev = ev * fe["weight"]
            acc += np.bincount(fe["dlocal"], weights=ev, minlength=usize)
        dm = gscalars.get(STAT_DANGLING, 0.0)
        new = acc + self.alpha * dm * l["dw_k"] + (1.0 - self.alpha) * l["p_k"]
        delta = float(np.abs(new - x_prev).sum())
        return new, {STAT_DELTA: delta}

    def extract(self, part, x):
        uni = universe(part, self.n, self.P)
        return pa.table(
            {"v": pa.array(uni, pa.int64()), "pagerank": pa.array(x, pa.float64())}
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
    chain: int = 1,
    executor: str = "dataset",
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

    p_ref = sparse_vec_ref(personalization)
    dw_ref = sparse_vec_ref(dangling)
    x0_ref = sparse_vec_ref(nstart)
    from ..stages.bsp_actors import fused_min_edges as _fused_min_edges

    dense_route = executor == "actors_dense" or (
        executor == "actors" and G.m >= _fused_min_edges()
    )
    if dense_route and resume and checkpoint_dir:
        # a row-format checkpoint (written by the Dataset path) resumes on
        # the Dataset path below; dense resumes stay on the mesh
        from ..stages.bsp_actors import latest_dense_checkpoint

        if latest_dense_checkpoint(checkpoint_dir) is None and (
            latest_checkpoint(checkpoint_dir) is not None
        ):
            dense_route = False
    if dense_route:
        # dense-accumulator fused mesh — the large-graph throughput path.
        # Checkpoints are per-iteration per-partition parquet written by
        # the mesh workers themselves (DensePool.checkpoint); resume feeds
        # the saved iterate straight into init_state via per-part refs.
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
                if ck_stats.get(STAT_DELTA, np.inf) < n * tol:
                    return ray.data.read_parquet(sdir)  # already converged
                start_it = ck_it + 1
                resume_refs = dense_part_refs(sdir)
        from ..stages.bsp_actors import dense_actors_for

        pool = DensePool(
            P,
            _PRDenseProg(
                G.csr_refs, G.aux_refs, n, P, alpha, p_ref, dw_ref, x0_ref,
                G.weighted, hub=hub_split(G), resume_refs=resume_refs,
            ),
            num_actors=dense_actors_for(G.m),
        )
        lineage = {
            "algo": "pagerank",
            "graph": G.workdir,
            "n": n,
            "m": G.m,
            "params": {"alpha": alpha, "tol": tol, "max_iter": max_iter},
        }
        it = start_it
        while it < max_iter:
            k = min(16, max_iter - it)
            if checkpoint_every:
                k = min(k, checkpoint_every)
            hist, done, stopped = pool.run_fused(
                k, StatBelow(STAT_DELTA, n * tol), start_step=it
            )
            it += done
            delta = hist.get(it - 1, {}).get(STAT_DELTA, np.inf)
            LAST_RUN_INFO.update(iterations=it, delta=delta)
            converged = stopped or delta < n * tol
            periodic = checkpoint_every and done and (it - 1) % checkpoint_every < done
            if checkpoint_dir and (periodic or converged):
                pool.checkpoint(
                    checkpoint_dir,
                    it - 1,
                    {STAT_DELTA: delta},
                    {**lineage, "converged": bool(converged)},
                )
            if converged:
                return pool.extract()
        if raise_on_failure:
            raise ConvergenceFailure(
                f"pagerank failed to converge in {max_iter} iterations"
            )
        return pool.extract()

    start_it = 0
    state = None
    if resume and checkpoint_dir:
        ck = latest_checkpoint(checkpoint_dir)
        if ck is not None:
            start_it, state, stats = ck
            if stats.get(STAT_DELTA, np.inf) < n * tol:
                return extract_vertex_values(state, "pagerank")
            start_it += 1
    if state is None:
        state = (
            ray.data.range(P, override_num_blocks=P)
            .map_batches(_PRInit(G.aux_refs, n, P, x0_ref), batch_format="pyarrow")
            .materialize()
        )

    if executor in ("actors", "actors_fused"):
        # low-latency BSP exchange (stages/bsp_actors.py) running the SAME
        # stage callables; used by the bench/scaling path
        from ..stages.bsp_actors import BSPPool, StatBelow, fused_min_edges

        pool = BSPPool.shared(P, state)
        pool.register(
            _PRSpMV(G.csr_refs, P, alpha, G.weighted, drop_stale_stats=True),
            _PRCombine(G.aux_refs, n, P, alpha, p_ref, dw_ref, 0),
        )
        use_fused = executor == "actors_fused" or G.m >= fused_min_edges()
        if use_fused and not checkpoint_dir and not checkpoint_every:
            # fused path: supersteps run entirely inside the actor mesh
            # (driver pays ONE rpc per chunk, not two per superstep)
            try:
                it = start_it
                while it < max_iter:
                    k = min(16, max_iter - it)
                    hist, done, stopped = pool.run_fused(
                        k, StatBelow(STAT_DELTA, n * tol), start_step=it
                    )
                    it += done
                    delta = hist.get(it - 1, {}).get(STAT_DELTA, np.inf)
                    LAST_RUN_INFO.update(iterations=it, delta=delta)
                    if stopped or delta < n * tol:
                        final = pool.gather_state().materialize()
                        return extract_vertex_values(final, "pagerank")
                if raise_on_failure:
                    raise ConvergenceFailure(
                        f"pagerank failed to converge in {max_iter} iterations"
                    )
                final = pool.gather_state().materialize()
                return extract_vertex_values(final, "pagerank")
            finally:
                pool.shutdown()
        try:
            it = start_it
            while it < max_iter:
                stats = pool.superstep()
                delta = stats.get(0, {}).get(STAT_DELTA, np.inf)
                it += 1
                LAST_RUN_INFO.update(iterations=it, delta=delta)
                converged = delta < n * tol
                periodic = checkpoint_every and (it - 1) % checkpoint_every == 0
                if checkpoint_dir and (periodic or converged):
                    checkpoint_state(
                        pool.gather_state().materialize(),
                        checkpoint_dir,
                        it - 1,
                        {STAT_DELTA: delta},
                        {"algo": "pagerank", "converged": converged},
                    )
                if converged:
                    final = pool.gather_state().materialize()
                    return extract_vertex_values(final, "pagerank")
            if raise_on_failure:
                raise ConvergenceFailure(
                    f"pagerank failed to converge in {max_iter} iterations"
                )
            final = pool.gather_state().materialize()
            return extract_vertex_values(final, "pagerank")
        finally:
            pool.shutdown()

    it = start_it
    while it < max_iter:
        k = min(chain, max_iter - it)
        state, chain_stats = run_chain(
            state,
            lambda i: _PRSpMV(G.csr_refs, P, alpha, G.weighted, drop_stale_stats=(i == 0)),
            lambda i: _PRCombine(G.aux_refs, n, P, alpha, p_ref, dw_ref, i),
            k,
        )
        converged = False
        last_delta = np.inf
        for s in range(k):
            last_delta = chain_stats.get(s, {}).get(STAT_DELTA, np.inf)
            LAST_RUN_INFO.update(iterations=it + s + 1, delta=last_delta)
            if last_delta < n * tol:
                converged = True
                break
        it += k
        periodic = checkpoint_every and (it - 1) % checkpoint_every < k
        if checkpoint_dir and (periodic or converged):
            checkpoint_state(
                state,
                checkpoint_dir,
                it - 1,
                {STAT_DELTA: last_delta},
                {
                    "algo": "pagerank",
                    "converged": converged,
                    # lineage: which graph + parameters produced this iterate
                    "graph": G.workdir,
                    "n": n,
                    "m": G.m,
                    "params": {"alpha": alpha, "tol": tol, "chain": chain},
                },
            )
        if converged:
            return extract_vertex_values(state, "pagerank")
    if raise_on_failure:
        raise ConvergenceFailure(f"pagerank failed to converge in {max_iter} iterations")
    return extract_vertex_values(state, "pagerank")


def pagerank_dict(G, **kw) -> dict:
    """Small-graph convenience (tests): full result as {v: score}."""
    df = pagerank(G, **kw).to_pandas()
    return dict(zip(df["v"].astype(int), df["pagerank"].astype(float)))
