"""Generic BSP fixpoint harness: one Ray Data job per iteration.

Each iteration of every iterative kernel (PageRank, connected components,
label propagation, HITS, Katz, eigenvector, BFS, Bellman-Ford) is the SAME
physical pipeline — the reference's ``x = ... (xprev * S) @ A`` SpMV loop
(``algorithms/link_analysis/pagerank_alg.py:83-101``) re-expressed Ray-Data
first:

    state_t  (materialized Dataset, one logical block per vertex part)
      │ map_batches(SpMV stage)          # gather from CSR shard (zero-copy
      │                                  # ray.get), scatter messages,
      │                                  # PRE-COMBINE per batch (the
      │                                  # combiner that caps shuffle volume
      │                                  # and absorbs hub-destination skew)
      ▼ rows: passthrough state (kind 0) + messages (kind 1, keyed dst part)
    groupby("part")                      # the ONE all-to-all shuffle per
      │                                  # iteration, keyed by the same
      │                                  # partition fn used everywhere
      ▼ map_groups(combine stage)        # semiring additive monoid + apply;
      │                                  # emits state_{t+1} rows + per-part
      ▼                                  # stats sentinel rows (v < 0)
    state_{t+1}.materialize()            # pinned for the next iteration;
                                         # optionally checkpointed to Parquet

The driver loop reads only the tiny stats rows (L1 delta, dangling mass,
changed-count, norms) to decide convergence — never the full vertex table.

Checkpoint layout (north-rule resumability):
    {ckpt_dir}/iter_{t:05d}/*.parquet     per-partition state
    {ckpt_dir}/manifest_{t:05d}.json      stats + lineage, written AFTER the
                                          parquet completes (atomic rename)
Resume = load the highest complete manifest + its parquet.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .._util import STATE_SCHEMA, named


class ConvergenceFailure(RuntimeError):
    """Reference parity: raised after max_iter without convergence
    (``algorithms/link_analysis/pagerank_alg.py:101``)."""


def _stats_filter(t: pa.Table) -> pa.Table:
    return t.filter(pc.less(t["v"], 0))


def collect_stats(state: ray.data.Dataset) -> dict[int, float]:
    """Sum the per-part stats sentinel rows into global scalars."""
    rows = state.map_batches(_stats_filter, batch_format="pyarrow").take_all()
    agg: dict[int, float] = defaultdict(float)
    for r in rows:
        agg[int(r["v"])] += float(r["f0"])
    return dict(agg)


def run_iteration(
    state: ray.data.Dataset,
    spmv_stage,
    combine_stage,
    *,
    batch_size=None,
):
    """One BSP superstep; returns (materialized new state, stats dict)."""
    out = (
        state.map_batches(spmv_stage, batch_format="pyarrow", batch_size=batch_size)
        .groupby("part")
        .map_groups(named(combine_stage), batch_format="pyarrow")
    )
    new_state = out.materialize()
    return new_state, collect_stats(new_state)


def _chain_stats_filter(t: pa.Table) -> pa.Table:
    return t.filter(pc.equal(t["kind"], 3))


def collect_chain_stats(state: ray.data.Dataset) -> dict[int, dict[int, float]]:
    """kind-3 rows → {superstep: {stat_id: global sum}}."""
    rows = state.map_batches(_chain_stats_filter, batch_format="pyarrow").take_all()
    out: dict[int, dict[int, float]] = {}
    for r in rows:
        step = int(r["i0"])
        out.setdefault(step, {})
        sid = int(r["v"])
        out[step][sid] = out[step].get(sid, 0.0) + float(r["f0"])
    return out


def run_chain(state: ray.data.Dataset, make_spmv, make_combine, k: int):
    """k chained supersteps in ONE Ray Data job (one materialize, one stats
    read). make_spmv(i)/make_combine(i) build the stage for superstep i;
    the first SpMV must drop stale kind-3 rows from the previous chunk.

    Global scalars cross supersteps as kind-2 broadcast partials inside the
    shuffle (no driver barrier); per-superstep stats accumulate as kind-3
    passthrough rows read once at chunk end."""
    ds = state
    for i in range(k):
        ds = (
            ds.map_batches(make_spmv(i), batch_format="pyarrow")
            .groupby("part")
            .map_groups(named(make_combine(i)), batch_format="pyarrow")
        )
    new_state = ds.materialize()
    return new_state, collect_chain_stats(new_state)


def checkpoint_state(state: ray.data.Dataset, ckpt_dir: str, it: int, stats: dict, extra: dict | None = None):
    import shutil

    os.makedirs(ckpt_dir, exist_ok=True)
    if os.path.exists(os.path.join(ckpt_dir, f"manifest_{it:05d}.json")):
        return  # already checkpointed (idempotent re-run / converged-on-periodic)
    sdir = os.path.join(ckpt_dir, f"iter_{it:05d}")
    # atomic: write to a scratch dir, then swap — a crashed writer never
    # leaves a half-written iteration behind a manifest
    tmpdir = sdir + ".writing"
    if os.path.exists(tmpdir):
        shutil.rmtree(tmpdir)
    state.write_parquet(tmpdir)
    if os.path.exists(sdir):
        shutil.rmtree(sdir)
    os.replace(tmpdir, sdir)
    import time as _time

    manifest = {
        "iter": it,
        "stats": {str(k): v for k, v in stats.items()},
        "rows": state.count(),
        "parts": sorted(os.listdir(sdir)),
        "written_at": _time.time(),
        **(extra or {}),
    }
    tmp = os.path.join(ckpt_dir, f".manifest_{it:05d}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(ckpt_dir, f"manifest_{it:05d}.json"))


def latest_checkpoint(ckpt_dir: str):
    """Return (iter, state Dataset, stats) of the newest complete checkpoint,
    or None."""
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return None
    its = sorted(
        int(f[len("manifest_") : -len(".json")])
        for f in os.listdir(ckpt_dir)
        if f.startswith("manifest_") and f.endswith(".json")
    )
    if not its:
        return None
    # newest ROW-format checkpoint: dense-mesh checkpoints (format=dense,
    # per-part (v, value) parquet — bsp_actors.latest_dense_checkpoint)
    # share the directory but not the row STATE_SCHEMA
    manifest = None
    for it in reversed(its):
        with open(os.path.join(ckpt_dir, f"manifest_{it:05d}.json")) as f:
            m = json.load(f)
        if m.get("format") != "dense":
            manifest = m
            break
    if manifest is None:
        return None
    state = ray.data.read_parquet(os.path.join(ckpt_dir, f"iter_{it:05d}"))
    # normalize column order/types to STATE_SCHEMA; drop stale kind-3 stats
    state = state.map_batches(
        lambda t: t.select(STATE_SCHEMA.names)
        .cast(STATE_SCHEMA)
        .filter(pc.not_equal(t["kind"], 3)),
        batch_format="pyarrow",
    ).materialize()
    stats = {int(k): float(v) for k, v in manifest["stats"].items()}
    return it, state, stats


def extract_vertex_values(
    state: ray.data.Dataset, value_col: str, use_int: bool = False
) -> ray.data.Dataset:
    """Final state → (v, <value_col>) vertex table Dataset."""

    def _strip(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.equal(t["kind"], 0), pc.greater_equal(t["v"], 0)))
        col = t["i0"] if use_int else t["f0"]
        return pa.table({"v": t["v"], value_col: col})

    return state.map_batches(_strip, batch_format="pyarrow")
