"""Raw-actor BSP executor — the low-latency exchange for iterative kernels.

The Dataset formulation (stages/fixpoint.py) pays a sort-based shuffle +
operator scheduling per superstep (~0.5-1 s fixed cost), which swamps the
numeric work at small-to-medium graph sizes and flattens scaling. This
executor runs the SAME stage callables (the SpMV map_batches fn and the
groupby combine fn — byte-for-byte the same classes) on P persistent
actors, replacing the sort shuffle with a direct partition-to-partition
object-store exchange:

    superstep:  every worker k runs spmv(state_k) → splits the output table
                by its `part` column → P plasma objects;  worker j then runs
                combine(concat of piece[i→j] for all i) → state'_j  and
                returns the tiny kind-3 stats rows to the driver.

Semantics are identical by construction (same stage code, same rows, same
per-part grouping); tests assert exact equality against the Dataset path.
The Dataset path remains the default; this executor is the measured fast
path for the convergence loop (north-rule throughput/scaling criterion).
The dense mesh checkpoints too: ``DensePool.checkpoint`` has each worker
write its owned parts as per-iteration parquet (``format: "dense"``
manifests alongside the row-format ones), and resume feeds the saved
iterate back through ``init_state`` via ``dense_part_refs``.

State lives in the actors; `gather_state()` hands back a Dataset (one
block per part, zero-copy from plasma) for extraction or checkpointing.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _split_by_part(t: pa.Table, P: int) -> list[pa.Table]:
    if t.num_rows == 0:
        return [t] * P
    parts = t["part"].to_numpy(zero_copy_only=False)
    order = np.argsort(parts, kind="stable")
    sorted_t = t.take(pa.array(order))
    sp = np.searchsorted(parts[order], np.arange(P + 1))
    return [sorted_t.slice(sp[k], sp[k + 1] - sp[k]) for k in range(P)]


@ray.remote
class _PartWorker:
    def __init__(self, part: int, num_parts: int):
        self.part = part
        self.P = num_parts
        self.state: pa.Table | None = None

    def set_state(self, *blocks: pa.Table):
        import pyarrow.compute as pc

        mine = [b.filter(pc.equal(b["part"], self.part)) for b in blocks if b.num_rows]
        self.state = (
            pa.concat_tables([m for m in mine if m.num_rows])
            if any(m.num_rows for m in mine)
            else None
        )
        return True

    def set_stages(self, spmv_stage, combine_stage):
        # stages are constant across supersteps — register once instead of
        # re-pickling them with every RPC
        self._spmv = spmv_stage
        self._combine = combine_stage
        return True

    def set_peers(self, peers):
        """Actor handles of the whole mesh (index = part), for the fused
        peer-to-peer exchange."""
        self.peers = peers
        self._inbox: dict[int, dict] = {}
        self._events: dict[int, object] = {}
        return True

    def _event(self, rnd: int):
        import asyncio

        ev = self._events.get(rnd)
        if ev is None:
            ev = self._events[rnd] = asyncio.Event()
        return ev

    def _deposit_local(self, rnd: int, src: int, piece, stats: dict):
        box = self._inbox.setdefault(rnd, {})
        box[src] = (piece, stats)
        if len(box) == self.P:
            self._event(rnd).set()

    async def deposit(self, rnd: int, src: int, piece, stats: dict):
        self._deposit_local(rnd, src, piece, stats)

    def spmv_registered(self):
        return self.spmv(self._spmv)

    def combine_registered(self, *pieces: pa.Table):
        return self.combine(self._combine, *pieces)

    def spmv_whole(self):
        """Dense-exchange variant: ONE output table (not split); receivers
        filter their part. O(P) objects per superstep instead of O(P²) —
        wins when messages are small (latency-bound regime); the split mesh
        wins when messages are large (bandwidth-bound regime).

        The table is returned BOXED as [ray.put(table)] so it stays in
        plasma no matter the inline threshold: an inline whole-table return
        would bounce through the driver and get duplicated into all P
        combine task specs (measured 8x superstep slowdown)."""
        if self.state is None or self.state.num_rows == 0:
            return None
        return [ray.put(self._spmv(self.state))]

    def combine_whole(self, *boxes):
        import pyarrow.compute as pc

        tables = ray.get([b[0] for b in boxes if b is not None])
        mine = [
            t.filter(pc.equal(t["part"], self.part))
            for t in tables
            if t is not None and t.num_rows
        ]
        return self.combine(self._combine, *mine)

    def spmv(self, stage):
        if self.state is None or self.state.num_rows == 0:
            empty = pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "kind": pa.array([], pa.int8()),
                    "v": pa.array([], pa.int64()),
                    "f0": pa.array([], pa.float64()),
                    "i0": pa.array([], pa.int64()),
                }
            )
            return _split_by_part(empty, self.P)
        out = stage(self.state)
        return _split_by_part(out, self.P)

    def combine(self, stage, *pieces: pa.Table):
        import pyarrow.compute as pc

        live = [p for p in pieces if p is not None and p.num_rows]
        if not live:
            self.state = None
            return pa.table({"v": pa.array([], pa.int64()), "f0": pa.array([], pa.float64()), "i0": pa.array([], pa.int64())})
        g = pa.concat_tables(live).combine_chunks()
        new_state = stage(g)
        self.state = new_state
        stats = new_state.filter(pc.equal(new_state["kind"], 3))
        return stats.select(["v", "f0", "i0"])

    def get_state(self) -> pa.Table:
        return self.state if self.state is not None else pa.table({})

    async def run_chunk(self, k: int, stop_fn=None, start_step: int = 0, round_base: int = 0):
        """Run up to k supersteps entirely inside the peer-to-peer actor mesh.

        Per superstep: spmv locally → split the output by destination part →
        fire-and-forget deposit() to every peer (small pieces ride inline in
        the RPC, no plasma round-trip; big pieces spill to plasma
        automatically) → await all P deposits for the round (async event;
        deposits carry each sender's previous-combine stats, so the round's
        inbox IS the stats all-reduce) → if stop_fn(prev global stats)
        fires, break with the pre-combine state (exactly the driver loop's
        stop point) → else concat my pieces and combine.

        Returns (stats_history {step: {sid: val}}, steps_completed,
        stopped_early). Driver cost: ONE rpc per chunk instead of two per
        superstep; exchange cost O(data), not O(P·data)."""
        hist: dict[int, dict[int, float]] = {}
        prev_local: dict[int, float] = {}
        stopped = False
        done = 0
        for i in range(k):
            rnd = round_base + i
            if self.state is not None and self.state.num_rows:
                pieces = _split_by_part(self._spmv(self.state), self.P)
            else:
                pieces = [None] * self.P
            for j, peer in enumerate(self.peers):
                pc_j = pieces[j] if pieces[j] is not None and pieces[j].num_rows else None
                if j == self.part:
                    self._deposit_local(rnd, self.part, pc_j, prev_local)
                else:
                    peer.deposit.remote(rnd, self.part, pc_j, prev_local)
            await self._event(rnd).wait()
            box = self._inbox.pop(rnd)
            self._events.pop(rnd, None)
            gstats_prev: dict[int, float] = {}
            for _, st in box.values():
                for sid, val in st.items():
                    gstats_prev[sid] = gstats_prev.get(sid, 0.0) + val
            if i > 0:
                hist[start_step + i - 1] = gstats_prev
                if stop_fn is not None and stop_fn(gstats_prev):
                    stopped = True
                    break
            mine = [p for p, _ in box.values() if p is not None and p.num_rows]
            stats_t = self.combine(self._combine, *mine)
            prev_local = {}
            for sv, fv in zip(stats_t["v"].to_pylist(), stats_t["f0"].to_pylist()):
                prev_local[int(sv)] = prev_local.get(int(sv), 0.0) + float(fv)
            done = i + 1
        if not stopped and done:
            # flush: one extra stats-only round to globalize the last stats
            rnd = round_base + k
            for j, peer in enumerate(self.peers):
                if j == self.part:
                    self._deposit_local(rnd, self.part, None, prev_local)
                else:
                    peer.deposit.remote(rnd, self.part, None, prev_local)
            await self._event(rnd).wait()
            box = self._inbox.pop(rnd)
            self._events.pop(rnd, None)
            gstats_last: dict[int, float] = {}
            for _, st in box.values():
                for sid, val in st.items():
                    gstats_last[sid] = gstats_last.get(sid, 0.0) + val
            hist[start_step + done - 1] = gstats_last
        return hist, done, stopped


def fused_min_edges() -> int:
    """Edge-count threshold for the actor-mesh paths. Below it, the
    driver-orchestrated exchange wins (latency regime: a handful of driver
    RPCs beat peer-mesh setup); above it, the fused mesh wins — and since
    the DensePool actor count now auto-sizes to the edge count
    (``dense_actors_for``), the mesh's A² peer exchange no longer swamps
    mid-size graphs, so the crossover sits far lower than the old 4M.
    Override via GRAFT_FUSED_MIN_EDGES."""
    import os

    return int(os.environ.get("GRAFT_FUSED_MIN_EDGES", "100000"))


_DENSE_EDGES_PER_ACTOR = 100_000


def dense_actors_for(m: int, heavy: bool = False) -> int | None:
    """Auto-size the dense mesh to the graph: per-superstep cost is
    (compute m/A) + (exchange ~A² small RPCs), so small graphs want few
    actors — measured at 402k edges: A=32 2.7 s vs A=4 0.37 s for 20
    supersteps. ~100k edges per actor up to the CPU budget; returns None
    (let DensePool decide) when GRAFT_DENSE_ACTORS explicitly pins A.

    ``heavy``: per-superstep compute dominates the exchange (LPA's label
    bincounts) — use the full CPU budget. Light programs (PageRank's one
    gather+bincount, CC's min-reduceat) are exchange/latency-bound at full
    width: a mesh of every core contends with the raylet, serialization
    and deposit deserialization for the same cores — measured at 15.25M
    edges / 8 CPUs: PageRank×20 A=8 2.08 s vs A=4 1.54 s, CC A=8 3.98 s
    vs A=4 3.42 s, while LPA×5 prefers A=8 (11.3 s vs 13.2). Light caps
    at cpus//2 (floor 2, so 2-core legs keep both workers)."""
    import os

    if os.environ.get("GRAFT_DENSE_ACTORS"):
        return None
    cpus = int(ray.cluster_resources().get("CPU", 1))
    budget = cpus if heavy else max(2, cpus // 2)
    a = max(1, -(-m // _DENSE_EDGES_PER_ACTOR))
    # quantize to the power-of-two floor: nearby graph sizes (directed m
    # vs symmetrized 2m) then share a cached mesh instead of each keeping
    # a private actor pool alive, and the measured optimum at small m
    # sits at the lower A anyway
    a = 1 << (a.bit_length() - 1)
    return max(2, min(budget, a))


class StatBelow:
    """Picklable stop predicate for run_fused: stats[sid] < thresh."""

    def __init__(self, sid: int, thresh: float):
        self.sid, self.thresh = sid, thresh

    def __call__(self, stats: dict) -> bool:
        return stats.get(self.sid, float("inf")) < self.thresh


class BSPPool:
    """P persistent workers; reuses fixpoint stage callables verbatim."""

    def __init__(
        self,
        num_parts: int,
        init_state: ray.data.Dataset,
        exchange: str = "dense",
        _workers: list | None = None,
    ):
        self.P = num_parts
        self.exchange = exchange  # "dense" (O(P) objects) | "split" (O(P²))
        self._shared = _workers is not None
        self.workers = _workers or [
            _PartWorker.remote(k, num_parts) for k in range(num_parts)
        ]
        blocks = init_state.to_arrow_refs()
        ray.get([w.set_state.remote(*blocks) for w in self.workers])
        self._registered = False

    # -- shared-pool cache: actor startup is ~2-4 s per pool; iterative
    # kernels called back-to-back (bench: pagerank, CC, LPA) reuse one mesh.
    _shared_workers: dict[int, list] = {}
    _round_bases: dict[str, int] = {}
    _peers_wired: set = set()

    @classmethod
    def shared(cls, num_parts: int, init_state: ray.data.Dataset, exchange: str = "dense"):
        ws = cls._shared_workers.get(num_parts)
        fresh = ws is None
        if fresh:
            ws = [_PartWorker.remote(k, num_parts) for k in range(num_parts)]
            cls._shared_workers[num_parts] = ws
        try:
            return cls(num_parts, init_state, exchange, _workers=ws)
        except ray.exceptions.RayActorError:
            # stale mesh from a previous ray session — rebuild
            cls._peers_wired.discard(cls._mesh_key(ws))
            cls._round_bases.pop(cls._mesh_key(ws), None)
            ws = [_PartWorker.remote(k, num_parts) for k in range(num_parts)]
            cls._shared_workers[num_parts] = ws
            return cls(num_parts, init_state, exchange, _workers=ws)

    @staticmethod
    def _mesh_key(workers) -> str:
        return workers[0]._actor_id.hex()

    @classmethod
    def shutdown_shared(cls):
        for ws in cls._shared_workers.values():
            for w in ws:
                ray.kill(w)
        cls._shared_workers.clear()
        cls._round_bases.clear()
        cls._peers_wired.clear()

    def register(self, spmv_stage, combine_stage):
        ray.get(
            [w.set_stages.remote(spmv_stage, combine_stage) for w in self.workers]
        )
        self._registered = True

    def superstep(self, spmv_stage=None, combine_stage=None) -> dict[int, dict[int, float]]:
        """Run one superstep; returns {superstep_tag: {stat_id: sum}} from
        the combine's kind-3 rows. With stages pre-registered via
        register(), omit the arguments (no per-RPC stage pickling)."""
        P = self.workers
        if self._registered and spmv_stage is None and self.exchange == "dense":
            outs = [w.spmv_whole.remote() for w in P]
            stats_refs = [w.combine_whole.remote(*outs) for w in P]
            return self._collect(stats_refs)
        if self._registered and spmv_stage is None:
            outs = [w.spmv_registered.options(num_returns=self.P).remote() for w in P]
        else:
            outs = [
                w.spmv.options(num_returns=self.P).remote(spmv_stage) for w in P
            ]
        if self.P == 1:
            outs = [[o] for o in outs]
        if self._registered and combine_stage is None:
            stats_refs = [
                P[j].combine_registered.remote(*[outs[i][j] for i in range(self.P)])
                for j in range(self.P)
            ]
        else:
            stats_refs = [
                P[j].combine.remote(combine_stage, *[outs[i][j] for i in range(self.P)])
                for j in range(self.P)
            ]
        return self._collect(stats_refs)

    def _collect(self, stats_refs) -> dict[int, dict[int, float]]:
        stats: dict[int, dict[int, float]] = {}
        for t in ray.get(stats_refs):
            for sid, val, step in zip(
                t["v"].to_pylist(), t["f0"].to_pylist(), t["i0"].to_pylist()
            ):
                d = stats.setdefault(int(step), {})
                d[int(sid)] = d.get(int(sid), 0.0) + float(val)
        return stats

    def run_fused(self, k: int, stop_fn=None, start_step: int = 0):
        """k supersteps fully inside the actor mesh (see _PartWorker.run_chunk).
        Requires register(). Returns (stats_history, steps_done, stopped)."""
        assert self._registered, "call register() first"
        key = self._mesh_key(self.workers)
        if key not in BSPPool._peers_wired:
            ray.get([w.set_peers.remote(self.workers) for w in self.workers])
            BSPPool._peers_wired.add(key)
        base = BSPPool._round_bases.get(key, 0)
        BSPPool._round_bases[key] = base + k + 1  # +1: stats-flush round
        res = ray.get(
            [
                w.run_chunk.remote(k, stop_fn, start_step, base)
                for w in self.workers
            ]
        )
        # all workers see identical global stats/stop decisions; take worker 0's
        hist, done, stopped = res[0]
        return hist, done, stopped

    def gather_state(self) -> ray.data.Dataset:
        refs = [w.get_state.remote() for w in self.workers]
        return ray.data.from_arrow_refs(refs)

    def shutdown(self):
        if self._shared:
            return  # shared mesh outlives the algorithm call
        for w in self.workers:
            ray.kill(w)
        self.workers = []

# ---------------------------------------------------------------------------
# Dense-accumulator fused mesh (multi-part workers)
# ---------------------------------------------------------------------------
# For kernels whose additive monoid accumulates into dense per-part arrays
# (plus_*: PageRank), the exchange ships dense float64 slabs over each
# part's universe (n/P entries) instead of (v, f0) rows. The mesh is sized
# to the CPU budget — A = num_cpus actors, each OWNING P/A of the fixed P
# partitions (part p lives on actor p % A) — exactly how a fixed partition
# count maps onto a varying cluster size. Contributions from an actor's
# own parts to the same destination part are PRE-SUMMED locally before the
# exchange (hierarchical combine), so total volume per superstep is
# A·(n/P)·8·P/A… i.e. n·8 per destination actor = A·n·8 overall — it
# SHRINKS with smaller clusters instead of staying at P·n·8.
#
# The kernel `prog` contract (picklable):
#   init_state(part) -> x0 ndarray                (universe-aligned)
#   make_pieces(part, x, gscalars) -> (list[P ndarray|None], scalars dict)
#   combine(part, pieces, gscalars, x_prev) -> (x_new, stats dict)
#   extract(part, x) -> pa.Table                  (final vertex table)
# Scalars ride with every deposit (an all-reduce through the mesh); global
# stats of superstep t become visible at t+1 (one-round-late stop, exactly
# the driver loop's stop point), with a final stats-flush round.


@ray.remote
class _DenseWorker:
    def __init__(self, aid: int, num_actors: int, num_parts: int):
        self.a = aid
        self.A = num_actors
        self.P = num_parts
        self.parts = list(range(aid, num_parts, num_actors))
        self.x: dict[int, np.ndarray] = {}
        self._inbox: dict[int, dict] = {}
        self._events: dict[int, object] = {}
        # per-process structural-layout cache: dense progs key their
        # per-part edge layouts by (prog kind, csr shard ref, params), so
        # a second prog instance over the same graph (e.g. the bench's
        # convergence + throughput PageRank calls) skips the argsort/
        # repeat rebuild. Survives set_prog AND set_shape (layouts are
        # per part, independent of mesh width). FIFO-capped.
        self._layout_store: dict = {}

    @staticmethod
    def _layout_nbytes(v) -> int:
        """Approximate footprint of one cached layout (nested arrays)."""
        if isinstance(v, np.ndarray):
            return v.nbytes
        if isinstance(v, dict):
            return sum(_DenseWorker._layout_nbytes(x) for x in v.values())
        if isinstance(v, (list, tuple)):
            return sum(_DenseWorker._layout_nbytes(x) for x in v)
        return 64

    def set_prog(self, prog):
        self.prog = prog
        prog._store = self._layout_store
        # FIFO-evict by BYTES, not entry count: one gate-scale per-part
        # layout is tens-to-hundreds of MB, and zero-copy views pin the
        # backing plasma objects — worker processes are cached for the
        # whole session, so an entry-count cap would let RSS grow multi-GB
        budget = int(os.environ.get("GRAFT_LAYOUT_STORE_MB", "1024")) << 20
        while (
            len(self._layout_store) > 1
            and sum(map(self._layout_nbytes, self._layout_store.values()))
            > budget
        ):
            self._layout_store.pop(next(iter(self._layout_store)))
        self.x = {}
        return True

    def set_peers(self, peers):
        self.peers = peers
        return True

    def set_shape(self, aid: int, num_actors: int):
        """Re-role this worker process inside a different-width mesh: the
        process cache is per P (actor spawn + imports cost seconds), so a
        pool of any width A reuses the first A spawned processes. Clears
        per-run state; stale in-flight deposits land on old round ids
        (round bases are monotone per P) and are never consumed."""
        self.a = aid
        self.A = num_actors
        self.parts = list(range(aid, self.P, num_actors))
        self.x = {}
        self._inbox = {}
        self._events = {}
        return True

    def configure(self, aid: int, num_actors: int, peers, prog):
        """One-RPC pool lease: set_shape + set_peers + set_prog fused.
        The old three sequential ray.get waves cost ~0.3-0.9 s per pool
        lease (×4 kernel stages per bench leg) in pure RPC latency."""
        self.set_shape(aid, num_actors)
        self.set_peers(peers)
        self.set_prog(prog)
        return True

    def _event(self, rnd: int):
        import asyncio

        ev = self._events.get(rnd)
        if ev is None:
            ev = self._events[rnd] = asyncio.Event()
        return ev

    def _dep(self, rnd: int, src: int, slabs, payload: dict):
        box = self._inbox.setdefault(rnd, {})
        box[src] = (slabs, payload)
        if len(box) == self.A:
            self._event(rnd).set()

    async def deposit(self, rnd: int, src: int, slabs, payload: dict):
        self._dep(rnd, src, slabs, payload)

    async def run_chunk(self, k: int, stop_fn=None, start_step: int = 0, round_base: int = 0):
        import time as _time

        timing = bool(os.environ.get("GRAFT_DENSE_TIMING"))
        tacc = {"compute": 0.0, "send": 0.0, "wait": 0.0, "combine": 0.0}
        prog = self.prog
        # How two slabs headed for the same destination part merge locally
        # (pre-aggregation across this worker's owned parts). Additive for
        # PageRank-style programs; a min-program (CC) MUST override via a
        # `merge_pieces` attribute or I64MAX sentinels overflow on +=.
        merge = getattr(prog, "merge_pieces", None)
        if not self.x:
            self.x = {p: prog.init_state(p) for p in self.parts}
        hist: dict[int, dict[int, float]] = {}
        prev_stats: dict[int, float] = {}
        stopped = False
        done = 0
        gscalars: dict[int, float] = {}
        for i in range(k):
            rnd = round_base + i
            t0 = _time.perf_counter() if timing else 0.0
            # per owned part: dense pieces for every destination part,
            # pre-summed across owned parts per destination
            dest: dict[int, np.ndarray] = {}
            scal: dict[int, float] = {}
            for p in self.parts:
                pieces, sc = prog.make_pieces(p, self.x[p], gscalars)
                for sid, v in sc.items():
                    scal[sid] = scal.get(sid, 0.0) + v
                for j, arr in enumerate(pieces):
                    if arr is None:
                        continue
                    cur = dest.get(j)
                    if cur is None:
                        dest[j] = arr
                    elif merge is not None:
                        dest[j] = merge(cur, arr)
                    else:
                        cur += arr
            if timing:
                t1 = _time.perf_counter()
                tacc["compute"] += t1 - t0
            payload = {("sc", sid): v for sid, v in scal.items()}
            payload.update({("st", sid): v for sid, v in prev_stats.items()})
            for a2, peer in enumerate(self.peers):
                slabs = {j: dest[j] for j in range(a2, self.P, self.A) if j in dest}
                if a2 == self.a:
                    self._dep(rnd, self.a, slabs, payload)
                else:
                    peer.deposit.remote(rnd, self.a, slabs, payload)
            if timing:
                t2 = _time.perf_counter()
                tacc["send"] += t2 - t1
            await self._event(rnd).wait()
            if timing:
                t3 = _time.perf_counter()
                tacc["wait"] += t3 - t2
            box = self._inbox.pop(rnd)
            self._events.pop(rnd, None)
            gall: dict = {}
            for _, st in box.values():
                for key, val in st.items():
                    gall[key] = gall.get(key, 0.0) + val
            gscalars = {key[1]: v for key, v in gall.items() if key[0] == "sc"}
            gstats_prev = {key[1]: v for key, v in gall.items() if key[0] == "st"}
            if i > 0:
                hist[start_step + i - 1] = gstats_prev
                if stop_fn is not None and stop_fn(gstats_prev):
                    stopped = True
                    break
            prev_stats = {}
            if timing:
                t3 = _time.perf_counter()
            for p in self.parts:
                incoming = [sl[p] for sl, _ in box.values() if p in sl]
                self.x[p], st_p = prog.combine(p, incoming, gscalars, self.x[p])
                for sid, v in st_p.items():
                    prev_stats[sid] = prev_stats.get(sid, 0.0) + v
            if timing:
                tacc["combine"] += _time.perf_counter() - t3
            done = i + 1
        if not stopped and done:
            rnd = round_base + k
            payload = {("st", sid): v for sid, v in prev_stats.items()}
            for a2, peer in enumerate(self.peers):
                if a2 == self.a:
                    self._dep(rnd, self.a, None, payload)
                else:
                    peer.deposit.remote(rnd, self.a, None, payload)
            await self._event(rnd).wait()
            box = self._inbox.pop(rnd)
            self._events.pop(rnd, None)
            gstats_last: dict[int, float] = {}
            for _, st in box.values():
                for key, val in st.items():
                    if key[0] == "st":
                        gstats_last[key[1]] = gstats_last.get(key[1], 0.0) + val
            hist[start_step + done - 1] = gstats_last
        if timing:
            acc = getattr(self, "_tacc", None)
            if acc is None:
                acc = self._tacc = {kk: 0.0 for kk in tacc}
            for kk, v in tacc.items():
                acc[kk] += v
        return hist, done, stopped

    def get_timing(self):
        return getattr(self, "_tacc", {})

    def extract(self) -> pa.Table:
        tabs = [self.prog.extract(p, self.x[p]) for p in self.parts if self.x[p] is not None]
        live = [t for t in tabs if t.num_rows]
        if not live:
            return pa.table({})
        return pa.concat_tables(live)

    def save_parts(self, d: str) -> bool:
        """Checkpoint: one parquet file per owned part (v + value column in
        universe order — ``prog.extract``'s layout), tmp + atomic rename."""
        import pyarrow.parquet as pq

        if not self.x:
            self.x = {p: self.prog.init_state(p) for p in self.parts}
        for p in self.parts:
            x = self.x.get(p)
            if x is None:
                continue
            t = self.prog.extract(p, x)
            tmp = os.path.join(d, f".part_{p:05d}.tmp")
            pq.write_table(t, tmp)
            os.replace(tmp, os.path.join(d, f"part_{p:05d}.parquet"))
        return True


class DensePool:
    """Driver for the dense fused mesh. A = num_actors defaults to the Ray
    CPU budget (GRAFT_DENSE_ACTORS overrides); P stays the fixed partition
    count. Worker PROCESSES are cached per P and re-shaped per pool width
    (set_shape), so actor startup is paid once even when light (cpus//2)
    and heavy (full-width) meshes alternate."""

    _meshes: dict[tuple, list] = {}
    _bases: dict[tuple, int] = {}

    def __init__(self, num_parts: int, prog, num_actors: int | None = None):
        import os

        if num_actors is None:
            env = os.environ.get("GRAFT_DENSE_ACTORS")
            if env:
                num_actors = int(env)
            else:
                num_actors = int(ray.cluster_resources().get("CPU", num_parts))
        self.P = num_parts
        self.A = max(1, min(num_parts, num_actors))
        self.workers = self._lease(num_parts, self.A, prog)
        self._key = num_parts

    @classmethod
    def prewarm(cls, num_parts: int | None, width: int | None = None):
        """Fire-and-forget spawn of the per-P worker processes (up to the
        CPU budget) so process startup + imports overlap whatever the
        driver does next (ingest paths call this). No RPC is awaited."""
        if num_parts is None:
            from ..state.graph import DEFAULT_NUM_PARTS

            num_parts = DEFAULT_NUM_PARTS
        P = num_parts
        if width is None:
            width = int(ray.cluster_resources().get("CPU", 2))
        width = max(1, min(P, width))
        procs = cls._meshes.get(P, [])
        if len(procs) < width:
            cls._meshes[P] = procs + [
                _DenseWorker.remote(a, width, P)
                for a in range(len(procs), width)
            ]

    @classmethod
    def _lease(cls, P: int, A: int, prog) -> list:
        """First A worker processes of the per-P cache, re-shaped for this
        pool's width. Processes are spawned once per P (actor startup +
        imports cost seconds) and shared by every width A ≤ len(cache):
        a light PageRank mesh at cpus//2 and a full-width LPA mesh reuse
        the same processes back-to-back with only a set_shape RPC."""
        procs = cls._meshes.get(P, [])
        if len(procs) < A:
            # bounded cache: evict other partition counts past the cap
            while len(cls._meshes) >= 4:
                old = next(iter(k for k in cls._meshes if k != P), None)
                if old is None:
                    break
                for w in cls._meshes.pop(old):
                    ray.kill(w)
                cls._bases.pop(old, None)
            procs = procs + [
                _DenseWorker.remote(a, A, P) for a in range(len(procs), A)
            ]
            cls._meshes[P] = procs
        ws = procs[:A]
        try:
            ray.get([w.configure.remote(a, A, ws, prog) for a, w in enumerate(ws)])
        except ray.exceptions.RayActorError:
            # a cached process died (e.g. killed between tests): respawn
            for w in cls._meshes.pop(P, []):
                try:
                    ray.kill(w)
                except Exception:
                    pass
            cls._bases.pop(P, None)
            ws = [_DenseWorker.remote(a, A, P) for a in range(A)]
            cls._meshes[P] = ws
            ray.get([w.configure.remote(a, A, ws, prog) for a, w in enumerate(ws)])
        return ws

    def run_fused(self, k: int, stop_fn=None, start_step: int = 0):
        base = DensePool._bases.get(self._key, 0)
        DensePool._bases[self._key] = base + k + 1
        res = ray.get(
            [
                w.run_chunk.remote(k, stop_fn, start_step, base)
                for w in self.workers
            ]
        )
        return res[0]

    def extract(self) -> ray.data.Dataset:
        refs = [w.extract.remote() for w in self.workers]
        return ray.data.from_arrow_refs(refs)

    def checkpoint(self, ckpt_dir: str, it: int, stats: dict, extra: dict | None = None):
        """Per-iteration per-partition checkpoint from the dense mesh: the
        workers write their own parts (no driver hop), the manifest lands
        last (its presence marks the iteration complete). Same directory /
        manifest naming as ``fixpoint.checkpoint_state`` with
        ``format: "dense"`` marking the per-part (v, value) layout."""
        import shutil
        import time as _time

        os.makedirs(ckpt_dir, exist_ok=True)
        if os.path.exists(os.path.join(ckpt_dir, f"manifest_{it:05d}.json")):
            return  # idempotent re-run
        sdir = os.path.join(ckpt_dir, f"iter_{it:05d}")
        tmpdir = sdir + ".writing"
        if os.path.exists(tmpdir):
            shutil.rmtree(tmpdir)
        os.makedirs(tmpdir)
        ray.get([w.save_parts.remote(tmpdir) for w in self.workers])
        if os.path.exists(sdir):
            shutil.rmtree(sdir)
        os.replace(tmpdir, sdir)
        manifest = {
            "iter": it,
            "format": "dense",
            "stats": {str(k): v for k, v in stats.items()},
            "parts": sorted(os.listdir(sdir)),
            "written_at": _time.time(),
            **(extra or {}),
        }
        tmp = os.path.join(ckpt_dir, f".manifest_{it:05d}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(ckpt_dir, f"manifest_{it:05d}.json"))

    @classmethod
    def shutdown_all(cls):
        for ws in cls._meshes.values():
            for w in ws:
                ray.kill(w)
        cls._meshes.clear()
        cls._bases.clear()


@ray.remote
def _read_part_state(path: str) -> np.ndarray:
    """Load one part's checkpointed value column (column 1; column 0 is v)."""
    import pyarrow.parquet as pq

    return pq.read_table(path).column(1).to_numpy(zero_copy_only=False)


def latest_dense_checkpoint(ckpt_dir: str):
    """Newest complete DENSE-format checkpoint in ``ckpt_dir``:
    (iter, state_dir, stats) — or None if the newest manifest is missing
    or row-format (the caller then falls back to the Dataset-path resume)."""
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return None
    its = sorted(
        int(f[len("manifest_") : -len(".json")])
        for f in os.listdir(ckpt_dir)
        if f.startswith("manifest_") and f.endswith(".json")
    )
    if not its:
        return None
    it = its[-1]
    with open(os.path.join(ckpt_dir, f"manifest_{it:05d}.json")) as f:
        manifest = json.load(f)
    if manifest.get("format") != "dense":
        return None
    stats = {int(k): float(v) for k, v in manifest["stats"].items()}
    return it, os.path.join(ckpt_dir, f"iter_{it:05d}"), stats


def dense_part_refs(state_dir: str) -> dict[int, "ray.ObjectRef"]:
    """Per-part value-array refs from a dense checkpoint directory — each
    mesh worker resolves exactly its owned parts (no read amplification)."""
    refs = {}
    for f in sorted(os.listdir(state_dir)):
        if f.startswith("part_") and f.endswith(".parquet"):
            k = int(f[len("part_") : -len(".parquet")])
            refs[k] = _read_part_state.remote(os.path.join(state_dir, f))
    return refs
