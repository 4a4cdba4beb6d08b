"""SpMV gather-scatter building blocks shared by all iterative kernels.

The reference's semiring SpMV ``w @ A`` (``plus_times`` / ``plus_first`` /
``min_plus`` / ``any_pair`` — ``algorithms/link_analysis/pagerank_alg.py:96``,
``algorithms/_bfs.py:39``, ``algorithms/shortest_paths/weighted.py:71``)
becomes: gather per-source values from the state batch, expand each source's
CSR adjacency slice with one vectorized multi-range index (no Python loop
over rows), apply the multiplicative op per edge, then PRE-COMBINE per batch
with the additive monoid (sum / min / count-by-label) so the downstream
``groupby(part)`` shuffle moves one row per (batch, distinct dst) instead of
one row per edge — this is the combiner that absorbs hub-destination skew.

Unweighted/iso graphs skip the per-edge multiply entirely (the reference's
iso-value ``plus_first`` fast path, ``pagerank_alg.py:53-60``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .._util import concat_ranges


class CsrCache:
    """Zero-copy fetch + per-process cache of CSR shard dicts."""

    def __init__(self, refs):
        self.refs = refs
        self._cache: dict[int, dict] = {}

    def get(self, k: int) -> dict:
        if k not in self._cache:
            self._cache[k] = ray.get(self.refs[k])
        return self._cache[k]


def batch_numpy(t: pa.Table, cols=("part", "kind", "v", "f0", "i0")):
    return {c: t[c].to_numpy(zero_copy_only=False) for c in cols if c in t.column_names}


def iter_parts(b: dict):
    """Yield (part, row-index array) per distinct part in the batch.

    A batch normally holds rows of exactly one part (blocks are built
    per-part), but map_groups output blocks can merge small groups, so we
    stay correct for mixed batches."""
    parts = b["part"]
    if parts.size == 0:
        return
    uparts = np.unique(parts)
    if uparts.size == 1:
        yield int(uparts[0]), slice(None)
        return
    for p in uparts:
        yield int(p), np.nonzero(parts == p)[0]


def match_sources(csr: dict, v: np.ndarray):
    """Rows of `v` that exist as CSR sources → (row_sel, csr_pos)."""
    srcs = csr["srcs"]
    if srcs.size == 0 or v.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    pos = np.searchsorted(srcs, v)
    ok = (pos < srcs.size) & (srcs[np.minimum(pos, srcs.size - 1)] == v)
    return np.nonzero(ok)[0], pos[ok]


def expand_adjacency(csr: dict, pos: np.ndarray, seed_vals: np.ndarray, use_weight: bool):
    """Per-edge (dst, value) for the CSR rows at `pos`; value = seed * w."""
    indptr = csr["indptr"]
    starts = indptr[pos]
    lens = indptr[pos + 1] - starts
    idx = concat_ranges(starts, lens)
    dsts = csr["dst"][idx]
    vals = np.repeat(seed_vals, lens)
    if use_weight and csr.get("weight") is not None:
        vals = vals * csr["weight"][idx]
    return dsts, vals


def precombine_sum(dsts: np.ndarray, vals: np.ndarray):
    ud, inv = np.unique(dsts, return_inverse=True)
    acc = np.zeros(ud.size, dtype=np.float64)
    np.add.at(acc, inv, vals)
    return ud, acc


def precombine_min(dsts: np.ndarray, vals: np.ndarray):
    ud, inv = np.unique(dsts, return_inverse=True)
    acc = np.full(ud.size, np.inf, dtype=np.float64)
    np.minimum.at(acc, inv, vals)
    return ud, acc


def precombine_min_int(dsts: np.ndarray, vals: np.ndarray):
    ud, inv = np.unique(dsts, return_inverse=True)
    acc = np.full(ud.size, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(acc, inv, vals)
    return ud, acc


def precombine_label_count(dsts: np.ndarray, labels: np.ndarray):
    """(dst, label) → count; messages for the LPA mode-aggregate."""
    key = np.stack([dsts, labels], axis=1)
    ukey, counts = np.unique(key, axis=0, return_counts=True)
    return ukey[:, 0], ukey[:, 1], counts.astype(np.float64)
