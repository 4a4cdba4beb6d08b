"""HITS, Katz, and eigenvector centrality — power-iteration kernels on the
same SpMV harness as PageRank (SURVEY.md §7.4: "swap semiring +
normalization").

Semantics match NetworkX's pure-python implementations (which the reference
validates against through the dispatch test suite):

  eigenvector (``algorithms/centrality/eigenvector.py:9-33``):
      y_t = x_{t-1} + x_{t-1} @ A ;  x_t = y_t / ||y_t||_2 ;
      stop when Σ|x_t - x_{t-1}| < n·tol
  katz (``algorithms/centrality/katz.py:11-55``):
      x_t = α·(x_{t-1} @ A) + β ;  stop when Σ|x_t - x_{t-1}| < n·tol ;
      final L2 normalization
  hits (``algorithms/link_analysis/hits_alg.py:9-62``):
      a_t = h_{t-1} @ A ; h_t = A @ a_t ; Linf-normalize both ;
      stop when Σ|h_t - h_{t-1}| < tol ; optional final L1 normalization

Per-iteration global scalars (norms) are carried between supersteps as
stats rows; normalization is applied lazily inside the next superstep's
stages (scalar broadcast, no extra pass over the data). The previous
NORMALIZED iterate needed for the convergence check is carried bit-exactly
in the state's i0 slot (float64 → int64 view).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import (
    sparse_part_slice,
    sparse_vec_ref,
    STAT_DELTA,
    STAT_SUMSQ,
    STAT_MAX,
    state_table,
    stats_rows,
    universe,
    universe_size,
)
from ..stages import spmv
from ..stages.fixpoint import ConvergenceFailure, collect_stats, run_iteration


def _f2i(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float64).view(np.int64)


def _i2f(x: np.ndarray) -> np.ndarray:
    return x.view(np.float64)


class _UniformInit:
    """State f0 = value (uniform or dict-override), i0 = f0 bits (as 'prev')."""

    def __init__(self, n, num_parts, value, nstart_ref=None, extra_stats=None):
        self.n, self.P, self.value = n, num_parts, value
        self.nstart_ref = nstart_ref
        self.extra_stats = extra_stats or {}

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        sp = ray.get(self.nstart_ref) if self.nstart_ref is not None else None
        for k in t["id"].to_numpy(zero_copy_only=False):
            k = int(k)
            uni = universe(k, self.n, self.P)
            if uni.size == 0:
                continue
            x = (
                sparse_part_slice(sp, k, self.P, uni.size)
                if sp is not None
                else np.full(uni.size, self.value)
            )
            out.append(state_table(k, 0, uni, f0=x, i0=_f2i(x)))
            if self.extra_stats:
                ss = {}
                for key, kind in self.extra_stats.items():
                    if kind == "sumsq":
                        ss[key] = float((x * x).sum())
                    elif kind == "max":
                        ss[key] = float(x.max()) if x.size else 0.0
                out.append(stats_rows(k, ss))
        if not out:
            return state_table(0, 0, np.empty(0, np.int64))
        return pa.concat_tables(out)


class _ScaledSpMV:
    """Scatter scale·(f0/divisor)[src] along CSR; passthrough state."""

    def __init__(self, csr_refs, num_parts, weighted, scale=1.0, divisor=1.0):
        self.cache = spmv.CsrCache(csr_refs)
        self.P, self.weighted = num_parts, weighted
        self.scale, self.divisor = scale, divisor

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        if t.num_rows == 0:
            return state_table(0, 0, np.empty(0, np.int64))
        b = spmv.batch_numpy(t)
        out = [t]
        for k, sel in spmv.iter_parts(b):
            csr = self.cache.get(k)
            v, x = b["v"][sel], b["f0"][sel]
            rows, pos = spmv.match_sources(csr, v)
            if rows.size == 0:
                continue
            seed = self.scale * (x[rows] / self.divisor)
            dsts, vals = spmv.expand_adjacency(csr, pos, seed, self.weighted)
            ud, acc = spmv.precombine_sum(dsts, vals)
            out.append(state_table((ud % self.P).astype(np.int32), 1, ud, f0=acc))
        return pa.concat_tables(out)


class _EigCombine:
    """y = prev/norm_prev + msgs (msgs already scaled by 1/norm_prev);
    x = y (normalized lazily next step). Emits SUMSQ(y) and the delta of the
    previous two normalized iterates (carried in i0)."""

    def __init__(self, n, num_parts, norm_prev):
        self.n, self.P, self.norm = n, num_parts, norm_prev

    def __call__(self, g: pa.Table) -> pa.Table:
        b = spmv.batch_numpy(g)
        k = int(b["part"][0])
        usize = universe_size(k, self.n, self.P)
        kind, v = b["kind"], b["v"]
        st = (kind == 0) & (v >= 0)
        y_prev = np.zeros(usize)
        y_prev[v[st] // self.P] = b["f0"][st]
        xprev2 = np.zeros(usize)
        xprev2[v[st] // self.P] = _i2f(b["i0"][st])
        x_prev = y_prev / self.norm
        acc = np.zeros(usize)
        msg = kind == 1
        np.add.at(acc, v[msg] // self.P, b["f0"][msg])
        y = x_prev + acc
        delta = float(np.abs(x_prev - xprev2).sum())
        uni = universe(k, self.n, self.P)
        return pa.concat_tables(
            [
                state_table(k, 0, uni, f0=y, i0=_f2i(x_prev)),
                stats_rows(k, {STAT_SUMSQ: float((y * y).sum()), STAT_DELTA: delta}),
            ]
        )


def eigenvector_centrality(
    G, max_iter=100, tol=1e-6, nstart: dict | None = None, raise_on_failure: bool = True
):
    """Dataset (v, centrality); matches nx.eigenvector_centrality."""
    G._ensure_built()
    n, P = G.n, G.num_parts
    nstart_ref = sparse_vec_ref(nstart, normalize=False)
    state = (
        ray.data.range(P, override_num_blocks=P)
        .map_batches(
            _UniformInit(n, P, 1.0 / n, nstart_ref, {STAT_SUMSQ: "sumsq"}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    stats = collect_stats(state)
    # nx convention: messages flow u → nbr (x[nbr] += x[u]), i.e. along edges.
    # The delta stat of superstep t compares x_{t-1} with x_{t-2} (it is
    # computed one step late), so on convergence we return the PREVIOUS
    # iterate — exactly the x_T networkx returns.
    prev_state, prev_norm = None, 1.0
    for it in range(max_iter + 1):
        norm = np.sqrt(stats.get(STAT_SUMSQ, 1.0)) or 1.0
        new_state, new_stats = run_iteration(
            state,
            _ScaledSpMV(G.csr_refs, P, G.weighted, divisor=norm),
            _EigCombine(n, P, norm),
        )
        if it >= 1 and new_stats.get(STAT_DELTA, np.inf) < n * tol:
            prev_state, prev_norm = state, norm
            break
        state, stats = new_state, new_stats
    else:
        if raise_on_failure:
            raise ConvergenceFailure(f"eigenvector failed in {max_iter} iterations")
        # fixed-iteration mode (oracle runs): return the final iterate,
        # L2-normalized — max_iter+1 supersteps have run at this point
        prev_state = state
        prev_norm = float(np.sqrt(stats.get(STAT_SUMSQ, 1.0)) or 1.0)

    def _strip(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        x = t["f0"].to_numpy(zero_copy_only=False) / prev_norm
        return pa.table({"v": t["v"], "centrality": pa.array(x)})

    return prev_state.map_batches(_strip, batch_format="pyarrow")


class _KatzCombine:
    def __init__(self, n, num_parts, beta_ref, beta_scalar):
        self.n, self.P = n, num_parts
        self.beta_ref, self.beta_scalar = beta_ref, beta_scalar
        self._beta_sp = None

    def __call__(self, g: pa.Table) -> pa.Table:
        b = spmv.batch_numpy(g)
        k = int(b["part"][0])
        usize = universe_size(k, self.n, self.P)
        kind, v = b["kind"], b["v"]
        st = (kind == 0) & (v >= 0)
        prev = np.zeros(usize)
        prev[v[st] // self.P] = b["f0"][st]
        acc = np.zeros(usize)
        msg = kind == 1
        np.add.at(acc, v[msg] // self.P, b["f0"][msg])
        if self.beta_ref is not None and self._beta_sp is None:
            self._beta_sp = ray.get(self.beta_ref)
        beta = (
            sparse_part_slice(self._beta_sp, k, self.P, usize)
            if self._beta_sp is not None
            else self.beta_scalar
        )
        new = acc + beta
        delta = float(np.abs(new - prev).sum())
        uni = universe(k, self.n, self.P)
        return pa.concat_tables(
            [
                state_table(k, 0, uni, f0=new),
                stats_rows(
                    k, {STAT_DELTA: delta, STAT_SUMSQ: float((new * new).sum())}
                ),
            ]
        )


def katz_centrality(
    G, alpha=0.1, beta=1.0, max_iter=1000, tol=1e-6, nstart: dict | None = None,
    normalized: bool = True, raise_on_failure: bool = True,
):
    """Dataset (v, centrality); matches nx.katz_centrality."""
    G._ensure_built()
    n, P = G.n, G.num_parts
    beta_scalar = float(beta) if not isinstance(beta, dict) else 0.0
    beta_ref = sparse_vec_ref(beta, normalize=False) if isinstance(beta, dict) else None
    nstart_ref = sparse_vec_ref(nstart, normalize=False)
    state = (
        ray.data.range(P, override_num_blocks=P)
        .map_batches(_UniformInit(n, P, 0.0, nstart_ref), batch_format="pyarrow")
        .materialize()
    )
    stats = {}
    for _ in range(max_iter):
        state, stats = run_iteration(
            state,
            _ScaledSpMV(G.csr_refs, P, G.weighted, scale=float(alpha)),
            _KatzCombine(n, P, beta_ref, beta_scalar),
        )
        if stats.get(STAT_DELTA, np.inf) < n * tol:
            break
    else:
        if raise_on_failure:
            raise ConvergenceFailure(f"katz failed in {max_iter} iterations")
    s = 1.0 / (np.sqrt(stats.get(STAT_SUMSQ, 0.0)) or 1.0) if normalized else 1.0

    def _strip(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        x = t["f0"].to_numpy(zero_copy_only=False) * s
        return pa.table({"v": t["v"], "centrality": pa.array(x)})

    return state.map_batches(_strip, batch_format="pyarrow")


class _HitsCombine:
    """Plain sum-combine into a fresh vector. Two roles in the HITS loop
    (VERDICT r1 #6 — the convergence delta is computed IN-PIPELINE, no
    driver-side vertex-table materialization):

    * a-side (``carry_prev=True``): input rows are h_t (f0 raw, i0 =
      h_{t-1} normalized bits). Emits a_raw rows with i0 = h_t normalized
      (``norm_prev`` = max of h_t), plus STAT_DELTA = Σ|h_t_norm −
      h_{t-1}_norm| — the reference's ``err`` one iteration late.
    * h-side (``pass_i0=True``): input rows are a_raw with i0 carrying
      h_t_norm; emits h_{t+1} raw rows with i0 passed through, so the next
      a-side combine can emit the next delta."""

    def __init__(self, n, num_parts, carry_prev=False, norm_prev=1.0, pass_i0=False):
        self.n, self.P = n, num_parts
        self.carry_prev = carry_prev
        self.norm_prev = norm_prev
        self.pass_i0 = pass_i0

    def __call__(self, g: pa.Table) -> pa.Table:
        b = spmv.batch_numpy(g)
        k = int(b["part"][0])
        usize = universe_size(k, self.n, self.P)
        kind, v = b["kind"], b["v"]
        st = (kind == 0) & (v >= 0)
        prev = np.zeros(usize)
        prev[v[st] // self.P] = b["f0"][st]
        acc = np.zeros(usize)
        msg = kind == 1
        np.add.at(acc, v[msg] // self.P, b["f0"][msg])
        uni = universe(k, self.n, self.P)
        stats = {STAT_MAX: float(acc.max()) if acc.size else 0.0}
        i0 = None
        if self.carry_prev:
            prev_norm = prev / self.norm_prev
            xprev2 = np.zeros(usize)
            xprev2[v[st] // self.P] = _i2f(b["i0"][st])
            stats[STAT_DELTA] = float(np.abs(prev_norm - xprev2).sum())
            i0 = _f2i(prev_norm)
        elif self.pass_i0:
            i0 = np.zeros(usize, dtype=np.int64)
            i0[v[st] // self.P] = b["i0"][st]
        return pa.concat_tables(
            [
                state_table(k, 0, uni, f0=acc, i0=i0 if i0 is not None else None),
                stats_rows(k, stats),
            ]
        )


def hits(G, max_iter=100, tol=1e-8, normalized=True, raise_on_failure=True):
    """(hubs, authorities) as Datasets (v, hub) / (v, authority);
    matches networkx _hits_python (power iteration, Linf per-iteration
    normalization folded into the seeds, absolute-tol L1 convergence)."""
    G._ensure_built()
    n, P = G.n, G.num_parts
    Grev = G.reverse() if G.directed else G

    # h state; a is recomputed every iteration
    h_state = (
        ray.data.range(P, override_num_blocks=P)
        .map_batches(_UniformInit(n, P, 1.0 / n), batch_format="pyarrow")
        .materialize()
    )
    h_max = 1.0  # applied lazily
    converged = False
    a_state = None
    prev_a = None
    # The a-side combine of iteration t emits delta(h_t, h_{t-1}) — the
    # reference's err, read one iteration late from the stats rows. On
    # convergence the matching authorities are the PREVIOUS a-state (the
    # one computed from h_{t-1}); one a-side SpMV is wasted per converged
    # run, the price of zero per-iteration driver materialization.
    for it in range(max_iter + 1):
        a_state, a_stats = run_iteration(
            h_state,
            _ScaledSpMV(G.csr_refs, P, G.weighted, divisor=h_max),
            _HitsCombine(n, P, carry_prev=True, norm_prev=h_max),
        )
        delta = a_stats.get(STAT_DELTA, np.inf)
        if it > 0 and delta < tol:
            a_state = prev_a
            converged = True
            break
        if it == max_iter:
            break
        prev_a = a_state
        # h_raw = A @ a_raw  → scatter a along reversed edges
        h_state, h_stats = run_iteration(
            a_state,
            _ScaledSpMV(Grev.csr_refs, P, G.weighted),
            _HitsCombine(n, P, pass_i0=True),
        )
        h_max = h_stats.get(STAT_MAX, 1.0) or 1.0
    if not converged and raise_on_failure:
        raise ConvergenceFailure(f"hits failed in {max_iter} iterations")

    a_max = collect_stats(a_state).get(STAT_MAX, 1.0) or 1.0

    def _final(state, scale_max, name, do_l1):
        def _strip(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
            x = t["f0"].to_numpy(zero_copy_only=False) / scale_max
            return pa.table({"v": t["v"], name: pa.array(x)})

        ds = state.map_batches(_strip, batch_format="pyarrow")
        if do_l1:
            total = ds.sum(name) or 1.0

            def _l1(t: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "v": t["v"],
                        name: pa.array(
                            t[name].to_numpy(zero_copy_only=False) / total
                        ),
                    }
                )

            ds = ds.map_batches(_l1, batch_format="pyarrow")
        return ds

    return (
        _final(h_state, h_max, "hub", normalized),
        _final(a_state, a_max, "authority", normalized),
    )


