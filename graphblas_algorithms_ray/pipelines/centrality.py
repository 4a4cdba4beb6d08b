"""Degree centrality family (reference ``algorithms/centrality/degree_alg.py:6-32``).

degree_centrality(v) = degree(v) / (N-1), with
  * out: row_degrees+  (``:26-32``)
  * in : column_degrees+ (``:18-24``)
  * total: in + out (DiGraph ``total_degrees+``, self-loops counted in both)
All computed from the per-part aux degree arrays (no shuffle — degrees were
materialized by the graph build)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import universe


class _DegCentEmit:
    def __init__(self, out_aux, in_aux, n, num_parts, mode):
        self.out_aux, self.in_aux = out_aux, in_aux
        self.n, self.P, self.mode = n, num_parts, mode

    def __call__(self, t: pa.Table) -> pa.Table:
        vs, cs = [], []
        # divide (not multiply by reciprocal): bit-identical to the SQL
        # oracle's  deg / (N-1)
        div = float(self.n - 1) if self.n > 1 else 1.0
        for k in t["id"].to_numpy(zero_copy_only=False):
            k = int(k)
            uni = universe(k, self.n, self.P)
            if uni.size == 0:
                continue
            deg = np.zeros(uni.size, dtype=np.float64)
            if self.mode in ("out", "total"):
                deg += ray.get(self.out_aux[k])["out_cnt"]
            if self.mode in ("in", "total"):
                deg += ray.get(self.in_aux[k])["out_cnt"]
            vs.append(uni)
            cs.append(deg / div)
        return pa.table(
            {
                "v": pa.array(np.concatenate(vs) if vs else np.empty(0, np.int64)),
                "centrality": pa.array(
                    np.concatenate(cs) if cs else np.empty(0, np.float64)
                ),
            }
        )


def degree_centrality(G, mode: str = "total") -> ray.data.Dataset:
    """Dataset (v, centrality). mode ∈ {out, in, total}."""
    G._ensure_built()
    out_aux = G.aux_refs
    in_aux = None
    if mode in ("in", "total"):
        in_aux = (G.reverse() if G.directed else G).aux_refs
    P = G.num_parts
    return ray.data.range(P, override_num_blocks=P).map_batches(
        _DegCentEmit(out_aux, in_aux, G.n, P, mode), batch_format="pyarrow"
    )
