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
The Dataset path remains the default — it is the resumable/checkpointed
formulation — and this executor is the measured fast path for the
convergence loop (north-rule throughput/scaling criterion).

State lives in the actors; `gather_state()` hands back a Dataset (one
block per part, zero-copy from plasma) for extraction or checkpointing.
"""

from __future__ import annotations

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

    def spmv_registered(self):
        return self.spmv(self._spmv)

    def combine_registered(self, *pieces: pa.Table):
        return self.combine(self._combine, *pieces)

    def spmv_whole(self):
        """Dense-exchange variant: ONE output table (not split); receivers
        filter their part. O(P) objects per superstep instead of O(P²) —
        wins when messages are small (latency-bound regime); the split mesh
        wins when messages are large (bandwidth-bound regime)."""
        if self.state is None or self.state.num_rows == 0:
            return None
        return self._spmv(self.state)

    def combine_whole(self, *tables):
        import pyarrow.compute as pc

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


class BSPPool:
    """P persistent workers; reuses fixpoint stage callables verbatim."""

    def __init__(self, num_parts: int, init_state: ray.data.Dataset, exchange: str = "dense"):
        self.P = num_parts
        self.exchange = exchange  # "dense" (O(P) objects) | "split" (O(P²))
        self.workers = [
            _PartWorker.remote(k, num_parts) for k in range(num_parts)
        ]
        blocks = init_state.to_arrow_refs()
        ray.get([w.set_state.remote(*blocks) for w in self.workers])
        self._registered = False

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

    def gather_state(self) -> ray.data.Dataset:
        refs = [w.get_state.remote() for w in self.workers]
        return ray.data.from_arrow_refs(refs)

    def shutdown(self):
        for w in self.workers:
            ray.kill(w)
        self.workers = []
