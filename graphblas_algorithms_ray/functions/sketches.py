"""Mergeable sketches — approximate aggregates whose per-batch partial
states combine associatively, the shape that turns an unbounded-cardinality
question into O(registers) of shuffle traffic at any data size.

HyperLogLog here; the per-batch partial is a 2^p register array, the merge
is elementwise max, so the combine tree can be arbitrarily deep (batch →
block → node → cluster) without touching the raw values again.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _hll_registers(values: np.ndarray, p: int) -> np.ndarray:
    """Register array for one batch of uint64 hashes."""
    m = 1 << p
    idx = (values >> np.uint64(64 - p)).astype(np.int64)
    # rank = leading-zero count of the remaining bits + 1, computed via
    # bit_length: rank = (64 - p) - floor(log2(rest)) for rest > 0
    rest = (values << np.uint64(p)) >> np.uint64(p)
    rank = np.empty(values.size, dtype=np.int8)
    nz = rest > 0
    # floor(log2) via float conversion is exact for < 2^53; 64-p <= 52 bits
    # requires p >= 12 — enforced by the caller
    rank[nz] = (64 - p) - np.floor(np.log2(rest[nz].astype(np.float64))).astype(
        np.int8
    )
    rank[~nz] = (64 - p) + 1
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))  # linear counting, small range
    return float(est)


class _HLLPartial:
    """Per-batch combiner: one row carrying the register array."""

    def __init__(self, col: str, p: int):
        self.col, self.p = col, p

    def __call__(self, t: pa.Table) -> pa.Table:
        import polars as pl

        col = t[self.col]
        if col.null_count:
            # COUNT(DISTINCT) semantics: nulls are not a value
            col = col.filter(pa.compute.is_valid(col))
        s = pl.from_arrow(col)
        h = s.hash(seed=42).to_numpy().astype(np.uint64)
        regs = _hll_registers(h, self.p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})


def approx_distinct(
    ds: ray.data.Dataset, col: str, p: int = 14
) -> float:
    """HyperLogLog distinct-count of ``ds[col]`` (~0.8% error at p=14).
    Nulls are ignored (COUNT(DISTINCT) semantics).

    One pass, no shuffle of the values: each batch collapses to a 2^p-byte
    register row, the driver folds the per-batch rows with elementwise max
    (rows = number of batches, never number of values)."""
    if not 12 <= p <= 18:
        raise ValueError("p must be in [12, 18]")
    partial = ds.select_columns([col]).map_batches(
        _HLLPartial(col, p), batch_format="pyarrow"
    )
    m = 1 << p
    regs = np.zeros(m, dtype=np.int8)
    for row in partial.iter_rows():
        regs = np.maximum(regs, np.frombuffer(row["regs"], dtype=np.int8))
    return _hll_estimate(regs)
