"""Shared helpers: partitioning, vectorized multi-range expansion, schemas.

Partitioning contract (used EVERYWHERE — edges, vertex state, shuffles):
    part(v) = v % P
for dense vertex ids 0..n-1 assigned by the vertex dictionary (sorted-url
enumeration, see sources/extract.py). Dictionary-assigned dense ids are
decorrelated from link structure, so the modulo partition is balanced; if ids
were adversarial, swap ``part_of`` for a multiplicative hash — every consumer
goes through this function.

The local index of vertex v inside its part is ``v // P`` (O(1) arithmetic,
no searchsorted), and the universe of part k is ``range(k, n, P)`` — this is
what makes per-part dense arrays cheap to align at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_NUM_PARTS = 8

# Sentinel vertex ids for per-part stats rows carried inside state tables
# (kernels emit them from the combine stage; the driver sums them; SpMV
# stages must skip v < 0).
STAT_DELTA = -1  # L1 delta vs previous iterate
STAT_DANGLING = -2  # mass on dangling vertices of the NEW iterate
STAT_SUM = -3  # sum of the new iterate (for normalization)
STAT_CHANGED = -4  # number of vertices whose value changed (integer kernels)
STAT_MAX = -5  # max of the new iterate (Linf normalization, HITS)
STAT_SUMSQ = -6  # sum of squares (L2 normalization, eigenvector/Katz)


def named(fn):
    """Give a callable-class instance a __name__ (Ray's map_groups wants one)."""
    if not hasattr(fn, "__name__"):
        try:
            fn.__name__ = type(fn).__name__
        except AttributeError:
            pass
    return fn


def part_of(v: np.ndarray, num_parts: int) -> np.ndarray:
    """Partition id for each vertex id (vectorized)."""
    return (v % num_parts).astype(np.int32)


def universe(part: int, n: int, num_parts: int) -> np.ndarray:
    """All vertex ids belonging to ``part`` — range(part, n, P)."""
    return np.arange(part, n, num_parts, dtype=np.int64)


def universe_size(part: int, n: int, num_parts: int) -> int:
    if n <= part:
        return 0
    return (n - part - 1) // num_parts + 1


def local_index(v: np.ndarray, num_parts: int) -> np.ndarray:
    """Index of v inside its part's dense universe array."""
    return v // num_parts


def concat_ranges(starts: np.ndarray, lens: np.ndarray, dtype=np.int64) -> np.ndarray:
    """Vectorized concatenation of ranges [starts[i], starts[i]+lens[i]).

    The classic cumsum trick — used to expand CSR adjacency slices for a
    set of source rows without a Python loop. ``dtype`` sets the OUTPUT
    element width (int32 halves memory traffic when values fit). The
    final cumsum ACCUMULATES in ``dtype`` — that is safe here, and only
    here, because every intermediate prefix sum of the delta encoding
    equals an output element (each < 2^31 by caller contract). Do NOT
    reuse this with int32 for general cumulative counts, where
    intermediates can exceed every output.
    """
    lens = lens.astype(np.int64, copy=False)
    nz = lens > 0
    if not nz.all():
        starts, lens = starts[nz], lens[nz]
    if starts.size == 0:
        return np.empty(0, dtype=dtype)
    ends = np.cumsum(lens)
    # deltas and running positions fit the output dtype by contract
    # (callers pass int32 only when every offset < 2^31)
    out = np.ones(ends[-1], dtype=dtype)
    out[0] = starts[0]
    if starts.size > 1:
        out[ends[:-1]] = starts[1:] - starts[:-1] - lens[:-1] + 1
    return np.cumsum(out, dtype=dtype)


# Unified iteration-state schema shared by all fixpoint kernels.
#   kind 0 = vertex state row (v, f0 float slot, i0 int slot);
#            v < 0 → per-part stats row (see STAT_* above; payload in f0)
#   kind 1 = message/contribution row (v = destination, f0/i0 payload)
#   kind 2 = broadcast scalar partial (v = STAT_* id, f0 = partial value):
#            emitted by a combine to EVERY part, consumed by the NEXT
#            superstep's combine — this is how a chained pipeline all-reduces
#            a global scalar (e.g. PageRank dangling mass) through the
#            shuffle without a driver barrier
#   kind 3 = per-superstep stats record (v = STAT_* id, i0 = superstep,
#            f0 = per-part partial): passed through all later supersteps so
#            the driver reads one stats set per superstep at chunk end
K_STATE, K_MSG, K_SCALAR, K_DELTA = 0, 1, 2, 3
STATE_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("kind", pa.int8()),
        ("v", pa.int64()),
        ("f0", pa.float64()),
        ("i0", pa.int64()),
    ]
)


def state_table(part, kind, v, f0=None, i0=None) -> pa.Table:
    m = len(v)
    if f0 is None:
        f0 = np.zeros(m, dtype=np.float64)
    if i0 is None:
        i0 = np.zeros(m, dtype=np.int64)
    part = np.broadcast_to(np.asarray(part, dtype=np.int32), (m,))
    kind = np.broadcast_to(np.asarray(kind, dtype=np.int8), (m,))
    return pa.table(
        {
            "part": pa.array(part, pa.int32()),
            "kind": pa.array(kind, pa.int8()),
            "v": pa.array(np.asarray(v, dtype=np.int64), pa.int64()),
            "f0": pa.array(np.asarray(f0, dtype=np.float64), pa.float64()),
            "i0": pa.array(np.asarray(i0, dtype=np.int64), pa.int64()),
        }
    )


def empty_state_table() -> pa.Table:
    return STATE_SCHEMA.empty_table()


def stats_rows(part: int, stats: dict[int, float]) -> pa.Table:
    """Stats rows (v = STAT_* sentinel, payload in f0)."""
    ks = np.fromiter(stats.keys(), dtype=np.int64, count=len(stats))
    vs = np.fromiter((float(x) for x in stats.values()), dtype=np.float64, count=len(stats))
    return state_table(part, 0, ks, f0=vs)


def sparse_vec_ref(d, normalize: bool = True, scale: float | None = None):
    """Small user dict (personalization/nstart/dangling/beta) → broadcast as
    SPARSE (idx, vals) arrays in the object store. O(|dict|) everywhere —
    never an O(n) dense driver array (at 1e12 vertices a 10-entry dict must
    not densify). Slice per part with ``sparse_part_slice``."""
    import ray as _ray

    if d is None:
        return None
    idx = np.fromiter((int(k) for k in d.keys()), dtype=np.int64, count=len(d))
    vals = np.fromiter((float(v) for v in d.values()), dtype=np.float64, count=len(d))
    order = np.argsort(idx)
    idx, vals = idx[order], vals[order]
    if normalize:
        s = vals.sum()
        if s == 0:
            raise ZeroDivisionError("zero-sum vector")
        vals = vals / s
    if scale is not None:
        vals = vals * scale
    return _ray.put((idx, vals))


def sparse_part_slice(sp, k: int, num_parts: int, usize: int, default: float = 0.0):
    """Dense slice of a sparse broadcast vector for part k's universe."""
    idx, vals = sp
    out = np.full(usize, default, dtype=np.float64)
    sel = (idx % num_parts) == k
    out[idx[sel] // num_parts] = vals[sel]
    return out


_SIZE_UNITS = {
    "": 1, "b": 1,
    "kb": 10**3, "mb": 10**6, "gb": 10**9, "tb": 10**12,
    "kib": 2**10, "mib": 2**20, "gib": 2**30, "tib": 2**40,
    "k": 10**3, "m": 10**6, "g": 10**9, "t": 10**12,
}


def parse_chunksize(value) -> int:
    """'256 MiB' / '1.5 GB' / 64_000_000 → bytes. The reference's nxapi
    chunksize ergonomics (``nxapi/_utils.py:36-87``): quadratic kernels
    split their work into chunks of a human-readable byte budget."""
    if isinstance(value, (int, np.integer)):
        return int(value)
    s = str(value).strip().lower().replace(" ", "")
    i = 0
    while i < len(s) and (s[i].isdigit() or s[i] in ".+-e" ):
        i += 1
    num, unit = s[:i], s[i:]
    if unit not in _SIZE_UNITS:
        raise ValueError(f"unrecognized size unit {unit!r} in {value!r}")
    return int(float(num) * _SIZE_UNITS[unit])


def chunk_rows(bytes_per_row: int, default: str = "64 MiB", env: str = "GRAFT_CHUNKSIZE") -> int:
    """Rows per chunk for the quadratic kernels: the configured byte budget
    (GRAFT_CHUNKSIZE, '256 MiB'-style) divided by the row width."""
    import os

    budget = parse_chunksize(os.environ.get(env, default))
    return max(1024, budget // max(1, bytes_per_row))


def sweep_graph_workdirs(max_age_hours: float = 6.0) -> int:
    """Remove per-Graph build directories under /tmp/gar/graphs older than
    the age cutoff (each Graph build leaves one; a heavy pytest+scaling
    session accumulates tens of GB). Age-gated so a concurrently-running
    process's fresh builds are never touched. Returns directories removed."""
    import os
    import shutil
    import tempfile
    import time

    root = os.path.join(tempfile.gettempdir(), "gar", "graphs")
    if not os.path.isdir(root):
        return 0
    cutoff = time.time() - max_age_hours * 3600
    removed = 0
    for name in os.listdir(root):
        path = os.path.join(root, name)
        try:
            if os.path.getmtime(path) < cutoff:
                shutil.rmtree(path, ignore_errors=True)
                removed += 1
        except OSError:
            continue
    return removed


# ---------------------------------------------------------------------------
# shared word-tokenize + rolling-gram-hash kernel (dedup, decontamination,
# repetition stats all roll n-grams off one per-batch token-hash pass)
# ---------------------------------------------------------------------------

# 64-bit FNV prime — the rolling-polynomial base for every shingle/gram
# hash in the engine (one constant: retuning it must retune ALL consumers
# together or their gram spaces silently diverge)
GRAM_PRIME = np.uint64(1099511628211)


def token_hashes(t, text_col: str = "text"):
    """One tokenize+hash pass over a pyarrow table column: (token_hash
    uint64 flat array, per-doc token counts L, per-doc start offsets).
    Tokenization matches the word_topk / DuckDB oracle convention
    exactly: split on \\s+, drop empty tokens, NO lowercasing."""
    import polars as pl
    import pyarrow as pa
    import pyarrow.compute as pc

    t = t.combine_chunks()
    nd = t.num_rows
    empty = (np.empty(0, np.uint64), np.zeros(nd, np.int64), np.zeros(nd, np.int64))
    if nd == 0:
        return empty
    toks = pc.split_pattern_regex(t[text_col], r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, dtype=np.int64)
    values = toks.values
    doc_idx = np.repeat(np.arange(nd, dtype=np.int64), offs[1:] - offs[:-1])
    nonempty = pc.greater(pc.utf8_length(values), 0).to_numpy(zero_copy_only=False)
    if nonempty.size and not nonempty.all():
        values = values.filter(pa.array(nonempty))
        doc_idx = doc_idx[nonempty]
    L = np.bincount(doc_idx, minlength=nd).astype(np.int64)
    if not len(values):
        return empty
    th = pl.from_arrow(values).hash(seed=7).to_numpy().astype(np.uint64)
    starts = np.concatenate([[0], np.cumsum(L)[:-1]])
    return th, L, starts


def roll_grams(th, L, starts, n: int):
    """(gram_hash uint64, doc_index int64) for every word n-gram, rolled
    over the flat token-hash array from one token_hashes pass. Docs with
    < n tokens contribute zero grams (no padding — the SQL oracles have
    none either). Grams are equal iff their token sequences are equal
    (tokens contain no whitespace, so ' '-joining is injective); the
    rolling 64-bit polynomial preserves that equality up to negligible
    collision odds."""
    sel = L >= n
    if not th.size or not sel.any():
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    ngrams = L[sel] - n + 1
    base = concat_ranges(starts[sel], ngrams)
    acc = np.zeros(base.size, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            acc = acc * GRAM_PRIME + th[base + j]
    return acc, np.repeat(np.nonzero(sel)[0], ngrams)
