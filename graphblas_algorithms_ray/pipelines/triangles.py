"""Triangle counting family — distributed wedge join with the L-ordering trick.

Reference semantics (``algorithms/cluster.py:44-80``): per-node triangle
counts on the undirected graph with self-edges EXCLUDED; total count via the
masked lower-triangle SpGEMM ``plus_pair(L @ U.T).new(mask=L.S)`` ("SandiaDot",
``cluster.py:67-71``); ``transitivity = 6*total/Σd(d-1)``; ``clustering_v =
2*tri_v/(d_v(d_v-1))`` (``cluster.py:94-126``).

Ray-Data formulation (SURVEY.md §2.4): the ordering trick becomes the
*forward-adjacency* graph ``adj+(u) = {v > u : {u,v} ∈ E}`` (= the strict
upper triangle U-). Every triangle u<a<b is generated exactly once as a
wedge (a, b) ∈ adj+(u) × adj+(u), then confirmed by a hash-partitioned
membership probe of the closing edge (a, b) against the same forward CSR
shards:

  wedge gen   : streamed generator over CSR shards (bounded output chunks —
                the explicit source-range chunking the reference applies to
                its quadratic ops, nxapi/cluster.py:95-121)
  probe       : groupby(part)·map_groups against shard (a*n+b) key arrays —
                sorted, so membership is one searchsorted (no Python loop)
  corner count: pre-aggregated per batch, groupby(part) combine

Scale/skew: wedge volume is Σ C(d+,2) where d+ is the *forward* degree; the
u<a<b orientation caps hub fan-out exactly like the reference's L-mask, and
the generator yields fixed-size chunks so no task materializes a hub's full
wedge set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import named, universe, universe_size
from ..stages import spmv

from .._util import chunk_rows
_CHUNK_PAIRS = chunk_rows(28, default='56 MiB')


def _degree_rank(g):
    """rank[v] = position of v in the (degree, id) total order, and the
    inverse permutation perm[rank] = v.

    Degree-ordered orientation bounds every vertex's FORWARD degree by
    O(sqrt(m)) (arboricity bound) — without it a min-id hub with k
    in-links generates C(k,2) wedges (the quadratic blow-up the reference
    avoids with its L-mask + heuristics). This driver-side argsort is the
    SMALL-graph tier; graphs with n >= GRAFT_RANK_DIST_MIN_N use the
    sharded rank (``_degree_rank_dist``) with no O(n) driver arrays."""
    degs = np.zeros(g.n, dtype=np.int64)
    for k in range(g.num_parts):
        aux = ray.get(g.aux_refs[k])
        d = aux["out_cnt"] - aux["out_self"]
        degs[k :: g.num_parts] = d
    perm = np.lexsort((np.arange(g.n), degs))  # rank -> original id
    rank = np.empty(g.n, dtype=np.int64)
    rank[perm] = np.arange(g.n)  # original id -> rank
    return rank, perm


def _rank_dist_min_n() -> int:
    import os

    return int(os.environ.get("GRAFT_RANK_DIST_MIN_N", str(1 << 25)))


@ray.remote
def _deg_hist_task(aux):
    d = aux["out_cnt"] - aux["out_self"]
    return np.unique(d, return_counts=True)


@ray.remote
def _rank_shard_task(aux, u_degs, base_k):
    """Ranks of part k's vertices: base of (degree class, part) + position
    within the part's class (stable by local index = by id within part)."""
    d = aux["out_cnt"] - aux["out_self"]
    order = np.argsort(d, kind="stable")
    dsort = d[order]
    newrun = np.r_[True, dsort[1:] != dsort[:-1]] if d.size else np.empty(0, bool)
    starts = np.flatnonzero(newrun)
    runid = np.cumsum(newrun) - 1 if d.size else newrun.astype(np.int64)
    within = np.arange(d.size) - (starts[runid] if d.size else 0)
    rb = base_k[np.searchsorted(u_degs, dsort)]
    ranks = np.empty(d.size, np.int64)
    ranks[order] = rb + within
    return ranks


@ray.remote
def _perm_frag_task(rank_k, k, P):
    """Split part k's (rank, id) pairs into P fragments by rank % P."""
    v = k + np.arange(rank_k.size, dtype=np.int64) * P
    j = rank_k % P
    return tuple((rank_k[j == b] // P, v[j == b]) for b in range(P))


@ray.remote
def _perm_gather_task(usize_j, *frags):
    out = np.empty(usize_j, np.int64)
    for slots, ids in frags:
        out[slots] = ids
    return out


def _degree_rank_dist(g):
    """Sharded degree rank: per-part rank arrays (id space, strided v % P)
    and per-part perm arrays (rank space, strided rank % P), built from
    per-part degree histograms only — no O(n) array ever touches the
    driver (driver state is O(#distinct degrees), ~O(sqrt m) on web
    graphs).

    Tie-break within a degree class is part-major (part, then id) rather
    than the broadcast tier's global-id order; any deterministic total
    order consistent with degree yields identical triangle/truss results
    (the orientation only needs *a* strict order with the arboricity
    bound)."""
    P = g.num_parts
    hists = ray.get([_deg_hist_task.remote(r) for r in g.aux_refs])
    all_degs = np.unique(np.concatenate([u for u, _ in hists]))
    class_tot = np.zeros(all_degs.size, dtype=np.int64)
    for u, c in hists:
        class_tot[np.searchsorted(all_degs, u)] += c
    cum_base = np.concatenate(([0], np.cumsum(class_tot)[:-1]))
    running = cum_base.copy()
    rank_refs = []
    for k, (u, c) in enumerate(hists):
        idx = np.searchsorted(all_degs, u)
        base_k = running[idx].copy()
        running[idx] += c
        rank_refs.append(_rank_shard_task.remote(g.aux_refs[k], u, base_k))
    frag_refs = [
        _perm_frag_task.options(num_returns=P).remote(rank_refs[k], k, P)
        for k in range(P)
    ]
    if P == 1:
        frag_refs = [[f] for f in frag_refs]
    perm_refs = [
        _perm_gather_task.remote(
            universe_size(j, g.n, P), *[frag_refs[k][j] for k in range(P)]
        )
        for j in range(P)
    ]
    return rank_refs, perm_refs


class _AddPartCol:
    def __init__(self, col, P):
        self.col, self.P = col, P

    def __call__(self, t: pa.Table) -> pa.Table:
        v = t[self.col].to_numpy(zero_copy_only=False)
        return t.append_column("__bp", pa.array((v % self.P).astype(np.int32)))


class _MapColShard:
    """map_groups callable for one __bp group: col value -> shard[value // P].

    Each group task fetches exactly ONE shard (O(n/P) bytes); the cache
    holds a single shard so an actor reused across groups never exceeds
    one-shard memory."""

    def __init__(self, shard_refs, P, col):
        self.refs, self.P, self.col = shard_refs, P, col
        self._k, self._arr = None, None

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows:
            v = t[self.col].to_numpy(zero_copy_only=False)
            k = int(v[0] % self.P)
            if self._k != k:
                self._k, self._arr = k, ray.get(self.refs[k])
            idx = t.schema.get_field_index(self.col)
            t = t.set_column(idx, self.col, pa.array(self._arr[v // self.P]))
        return t.drop_columns(["__bp"])


def _map_col_via_shards(ds, col, shard_refs, P):
    """Replace ds[col] with shard lookup via a hash-partition shuffle on
    col % P (the sharded tier's substitute for broadcast gather)."""
    tagged = ds.map_batches(_AddPartCol(col, P), batch_format="pyarrow")
    return tagged.groupby("__bp").map_groups(
        named(_MapColShard(shard_refs, P, col)), batch_format="pyarrow"
    )


class _RankMap:
    """Tiered id↔rank mapping for the degree-ordered orientation.

    kind="bcast": rank/perm as two whole-array plasma objects (zero-copy
    gather per batch — one pass, no shuffle). kind="shard": P per-part
    refs each; every mapping is a groupby(v % P) shuffle where each group
    task reads only its own O(n/P) shard. Broadcast at 1e9 vertices would
    mean 8 GB per array per node plus a driver-side lexsort, hence the
    tier switch at GRAFT_RANK_DIST_MIN_N (default 2^25)."""

    def __init__(self, kind, P, rank_ref=None, perm_ref=None, rank_refs=None, perm_refs=None):
        self.kind, self.P = kind, P
        self.rank_ref, self.perm_ref = rank_ref, perm_ref
        self.rank_refs, self.perm_refs = rank_refs, perm_refs

    @classmethod
    def build(cls, g):
        if g.n >= _rank_dist_min_n():
            rank_refs, perm_refs = _degree_rank_dist(g)
            return cls("shard", g.num_parts, rank_refs=rank_refs, perm_refs=perm_refs)
        rank, perm = _degree_rank(g)
        return cls("bcast", g.num_parts, rank_ref=ray.put(rank), perm_ref=ray.put(perm))

    def canon_edges(self, edges, weighted):
        """(src, dst[, weight]) -> forward rank-space arcs rank(u) < rank(v)
        (drops self loops)."""
        if self.kind == "bcast":
            rank_ref = self.rank_ref

            class _Canon:
                def __init__(self):
                    self._rank = None

                def __call__(self, t: pa.Table) -> pa.Table:
                    if self._rank is None:
                        self._rank = ray.get(rank_ref)
                    s = self._rank[t["src"].to_numpy(zero_copy_only=False)]
                    d = self._rank[t["dst"].to_numpy(zero_copy_only=False)]
                    m = s < d  # drops self loops, keeps low-rank→high-rank
                    cols = {"src": pa.array(s[m]), "dst": pa.array(d[m])}
                    if "weight" in t.column_names:
                        cols["weight"] = pa.array(
                            t["weight"].to_numpy(zero_copy_only=False)[m]
                        )
                    return pa.table(cols)

            return edges.map_batches(_Canon(), batch_format="pyarrow")
        mapped = _map_col_via_shards(edges, "src", self.rank_refs, self.P)
        mapped = _map_col_via_shards(mapped, "dst", self.rank_refs, self.P)

        def _fwd(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            m = s < d
            cols = {"src": pa.array(s[m]), "dst": pa.array(d[m])}
            if "weight" in t.column_names:
                cols["weight"] = pa.array(t["weight"].to_numpy(zero_copy_only=False)[m])
            return pa.table(cols)

        return mapped.map_batches(named(_fwd), batch_format="pyarrow")

    def back_cols(self, ds, cols):
        """Map rank-space id columns back to original ids (other columns
        pass through unchanged)."""
        if self.kind == "bcast":
            perm_ref = self.perm_ref
            want = list(cols)

            class _Back:
                def __init__(self):
                    self._perm = None

                def __call__(self, t: pa.Table) -> pa.Table:
                    if self._perm is None:
                        self._perm = ray.get(perm_ref)
                    for c in want:
                        idx = t.schema.get_field_index(c)
                        t = t.set_column(
                            idx,
                            c,
                            pa.array(self._perm[t[c].to_numpy(zero_copy_only=False)]),
                        )
                    return t

            return ds.map_batches(_Back(), batch_format="pyarrow")
        for c in cols:
            ds = _map_col_via_shards(ds, c, self.perm_refs, self.P)
        return ds


def _forward_graph(G):
    """Degree-ordered forward orientation: edges (rank(u) → rank(v)) with
    rank(u) < rank(v), in RANK space (dense 0..n-1). Returns
    (undirected graph, forward Graph, _RankMap)."""
    from ..state.graph import Graph

    g = G.to_undirected() if G.directed else G
    g._ensure_built()

    key = "triangle_forward"
    # _derive_lock: Graph.prefetch_derived builds this on a background
    # thread — first builder wins, the other waits and reuses
    with g._derive_lock:
        if key not in g._cache:
            rm = _RankMap.build(g)
            fg = Graph(
                rm.canon_edges(g.edges_ds(), g.weighted),
                n=g.n,
                directed=True,
                weighted=g.weighted,
                num_parts=g.num_parts,
                dup="min",  # both symmetric copies carry the same weight
                name=g.name + "_fwd",
                checkpoint_edges=False,  # derivable from the base graph
            )
            fg._ensure_built()
            g._cache[key] = (fg, rm)
        fg, rm = g._cache[key]
    return g, fg, rm


class _WedgeGen:
    """Yield wedge chunks (part(a), a, b, corner u) from forward CSR shards.

    Vectorized two-level range expansion (no Python loop over rows): each
    row with forward degree d emits heads h = 0..d-2, each head pairs with
    partners h+1..d-1 — two ``concat_ranges`` + two ``np.repeat`` per
    chunk. Chunks are ROW RANGES carrying ~_CHUNK_PAIRS wedges each; a
    single hub row may overshoot, but its pair count is bounded by the
    arboricity ordering."""

    def __init__(self, csr_refs, num_parts, n, with_weights: bool = False, max_w: float = 1.0):
        self.csr_refs = csr_refs
        self.P = num_parts
        self.n = n
        self.with_weights = with_weights
        self.max_w = max_w

    def _wedge_chunks(self, csr, lo: int = 0, hi: int | None = None):
        """Yield (a, b, u, wp) numpy chunks for LOCAL row range [lo, hi);
        wp is None unless weighted (then wp = ŵ_ua · ŵ_ub with
        ŵ = w / max_w)."""
        from .._util import concat_ranges

        srcs, indptr, dst = csr["srcs"], csr["indptr"], csr["dst"]
        w = csr.get("weight") if self.with_weights else None
        deg = np.diff(indptr)
        if hi is None:
            hi = deg.size
        rows = lo + np.nonzero(deg[lo:hi] >= 2)[0]
        if rows.size == 0:
            return
        # wedge-local arrays in int32 when ids fit: the expansion streams
        # ~8 W-sized arrays per chunk and the probe stage is DRAM-bound at
        # full concurrency — halving the element width is a direct
        # bandwidth win (ints are indices/vertex ids < n; n ≥ 2^31 falls
        # back to int64). NOTE numpy 1.x value-based casting: int32 arrays
        # must be explicitly widened before any *n+b key packing.
        it = np.int32 if (self.n < 2**31 and int(indptr[-1]) < 2**31) else np.int64
        if it is np.int32:
            srcs = srcs.astype(it)
            dst = dst.astype(it)
            indptr = indptr.astype(it)
        dr = deg[rows]
        cum = np.cumsum(dr * (dr - 1) // 2)  # pair counts, cumulative
        start = 0
        while start < rows.size:
            base = int(cum[start - 1]) if start else 0
            stop = int(np.searchsorted(cum, base + _CHUNK_PAIRS, side="left")) + 1
            stop = min(max(stop, start + 1), rows.size)
            r = rows[start:stop].astype(it)
            dc = deg[r].astype(it)
            heads_len = dc - 1
            head_row = np.repeat(r, heads_len)
            head_local = concat_ranges(np.zeros(r.size, it), heads_len, dtype=it)
            lens2 = np.repeat(dc, heads_len) - 1 - head_local
            pair_row = np.repeat(head_row, lens2)
            a_local = np.repeat(head_local, lens2)
            b_local = concat_ranges(head_local + 1, lens2, dtype=it)
            off = indptr[pair_row]
            a = dst[off + a_local]
            b = dst[off + b_local]
            u = srcs[pair_row]
            wp = None
            if w is not None:
                wp = (w[off + a_local] / self.max_w) * (w[off + b_local] / self.max_w)
            yield a, b, u, wp
            start = stop

    def __call__(self, t: pa.Table):
        # legacy shuffle-path emitter (GRAFT_TRI_EXCHANGE=shuffle): wedge
        # rows keyed by part(a) for the groupby→probe exchange
        yielded = False
        for k in t["id"].to_numpy(zero_copy_only=False):
            csr = ray.get(self.csr_refs[int(k)])
            for a, b, u, wp in self._wedge_chunks(csr):
                cols = {
                    "part": pa.array((a % self.P).astype(np.int32)),
                    "a": pa.array(a.astype(np.int64, copy=False)),
                    "b": pa.array(b.astype(np.int64, copy=False)),
                    "u": pa.array(u.astype(np.int64, copy=False)),
                }
                if wp is not None:
                    cols["wp"] = pa.array(wp)
                yield pa.table(cols)
                yielded = True
        if not yielded:
            cols = {
                "part": pa.array([], pa.int32()),
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "u": pa.array([], pa.int64()),
            }
            if self.with_weights:
                cols["wp"] = pa.array([], pa.float64())
            yield pa.table(cols)


@ray.remote
def _build_shard_keys(csr, n):
    """Sorted (src*n + dst) probe keys for one forward shard (CSR order is
    already (src, dst)-sorted). Built once per graph; lives in plasma."""
    cnt = np.diff(csr["indptr"])
    return np.repeat(csr["srcs"], cnt) * np.int64(n) + csr["dst"]


def _probe_key_refs(fg):
    key = "probe_keys"
    with fg._derive_lock:  # prefetch_derived thread may race the kernel
        if key not in fg._cache:
            fg._cache[key] = [_build_shard_keys.remote(r, fg.n) for r in fg.csr_refs]
        return fg._cache[key]


# Bloom pre-screen for the closing-edge probe: wedge hit rate is tiny
# (observed ~0.03% on web-shaped graphs), so a 2-hash Bloom filter over the
# forward edge keys rejects ~99% of wedges with two byte-gathers instead of
# a binary search — measured 2.8× on the probe kernel at 15M edges. The
# filter is exact-by-construction: positives (incl. false positives) are
# verified by the original per-part searchsorted.
_BLOOM_C1 = np.uint64(0x9E3779B97F4A7C15)
_BLOOM_C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_logb(n_keys: int) -> int:
    return min(30, max(20, int(np.ceil(np.log2(max(n_keys, 1) * 16.0)))))


@ray.remote
def _build_bloom_part(logb: int, *key_groups):
    """Packed partial bitmap over a GROUP of shards' keys. The serial
    whole-graph scatter was a ~3 s fixed cost gating every probe task at
    the scaling gate; ~num_cpus group partials run on all cores (each
    pays the bitmap zero + packbits pass once, not once per shard) and
    the OR reduction below touches only packed bytes (bitmap/8 per
    group)."""
    sh = np.uint64(64 - logb)
    bb = np.zeros(1 << logb, dtype=bool)
    for keys in key_groups:
        if keys.size:
            ku = keys.astype(np.uint64)
            bb[(ku * _BLOOM_C1) >> sh] = True
            bb[(ku * _BLOOM_C2) >> sh] = True
    return np.packbits(bb)


@ray.remote
def _or_blooms(logb: int, *packed):
    """OR-reduce per-shard packed bitmaps → the shared probe filter.
    Sized at ~16 bits/key (fp ≈ 1%), clamped to [2^20, 2^30] bits
    (128 KiB–128 MiB); one plasma object shared zero-copy by every probe
    task. PACKED on purpose: at 15M keys the bitmap is 32 MiB ≈
    LLC-sized, so probe gathers mostly hit cache — an unpacked bool
    bitmap (8×) measured 2× slower cold despite skipping the packbits
    pass. The filter is exact-by-construction: positives (incl. false
    positives) are verified by the per-part searchsorted."""
    acc = packed[0].copy()
    for p in packed[1:]:
        np.bitwise_or(acc, p, out=acc)
    return acc, logb


def _bloom_ref(fg):
    key = "probe_bloom"
    with fg._derive_lock:  # prefetch_derived thread may race the kernel
        if key not in fg._cache:
            logb = _bloom_logb(max(fg.m, 1))
            refs = _probe_key_refs(fg)
            n_tasks = max(1, min(len(refs), int(ray.cluster_resources().get("CPU", 8))))
            groups = [refs[i::n_tasks] for i in range(n_tasks)]
            parts = [_build_bloom_part.remote(logb, *grp) for grp in groups if grp]
            fg._cache[key] = _or_blooms.remote(logb, *parts)
        return fg._cache[key]


@ray.remote
def _shard_pair_bounds(csr, n_chunks: int):
    """LOCAL row boundaries splitting this forward shard's wedge volume
    (Σ d(d−1)/2 over rows) into ≈equal pieces. Cheap: one pass over
    indptr, no edge data touched."""
    deg = np.diff(csr["indptr"])
    c = (deg.astype(np.int64) * (deg - 1) // 2).clip(min=0)
    total = int(c.sum())
    # a chunk below ~2M wedge pairs is dominated by task overhead — small
    # shards stay whole (the gate's regime has >>2M pairs per shard)
    n_chunks = min(n_chunks, -(-total // (1 << 21)))
    if total == 0 or n_chunks <= 1:
        return np.array([0, deg.size], np.int64)
    cum = np.cumsum(c)
    targets = np.linspace(0, total, n_chunks + 1)[1:-1]
    cuts = np.searchsorted(cum, targets, side="left") + 1
    return np.unique(np.concatenate([[0], cuts, [deg.size]])).astype(np.int64)


def _probe_chunks(fg) -> "ray.data.Dataset":
    """Chunk descriptors (id, lo, hi): each forward shard's wedge volume
    split into equal-volume SOURCE ROW RANGES — the wedge join's
    source-range chunking (the reference chunks its M×M the same way,
    ``nxapi/cluster.py:82-121``). Decouples probe-task count from
    num_parts: with P shards and C cores the probe otherwise runs P
    long tasks whose tail is the densest shard; splitting to ~8 chunks
    per core caps per-task wedge volume, so a straggler costs one chunk,
    not a shard. Probe key arrays are plasma-shared either way — extra
    chunks add only a zero-copy view fetch per task."""
    P = fg.num_parts
    cpus = int(ray.cluster_resources().get("CPU", P))
    per_shard = max(1, -(-max(P, 8 * cpus) // P))  # ceil
    key = ("probe_chunks", per_shard)
    if key not in fg._cache:
        bounds = ray.get(
            [_shard_pair_bounds.remote(r, per_shard) for r in fg.csr_refs]
        )
        items = [
            {"id": k, "lo": int(b[i]), "hi": int(b[i + 1])}
            for k, b in enumerate(bounds)
            for i in range(len(b) - 1)
        ]
        fg._cache[key] = items
    items = fg._cache[key]
    return ray.data.from_items(items, override_num_blocks=len(items))


def _tri_exchange() -> str:
    """'probe' (default): confirm closing edges INSIDE the wedge-generator
    task against plasma-shared shard key arrays — wedge volume (O(Σ d+²)
    rows, typically 10-30× the edge count) never enters a shuffle; only
    pre-aggregated counts leave the task. Per-NODE memory: 8·m bytes of
    keys (zero-copy plasma views; each cluster node fetches a shard at
    most once). 'shuffle': the groupby(part)-exchange formulation — use
    when 8·m per node does not fit (≳10^10 edges on 128 GiB nodes)."""
    import os

    return os.environ.get("GRAFT_TRI_EXCHANGE", "probe")


class _WedgeProbe(_WedgeGen):
    """Fused wedge-gen + closing-edge probe (no wedge shuffle); see
    ``_tri_exchange``. Subclasses format the confirmed triangles."""

    def __init__(
        self, csr_refs, key_refs, num_parts, n, with_weights=False, max_w=1.0,
        bloom_ref=None,
    ):
        super().__init__(csr_refs, num_parts, n, with_weights, max_w)
        self.key_refs = key_refs
        self.bloom_ref = bloom_ref
        self._bloom = None
        self._keys: dict[int, np.ndarray] = {}

    def _kp(self, j: int) -> np.ndarray:
        if j not in self._keys:
            self._keys[j] = ray.get(self.key_refs[j])
        return self._keys[j]

    def _probe(self, a, b):
        """(ok, pos): confirmed mask and per-hit position in part(a)'s
        sorted key array (pos is only valid where ok)."""
        # explicit widening: a/b may be int32 (wedge-local arrays), and
        # numpy 1.x value-based casting would keep a*scalar in int32
        want = a.astype(np.int64, copy=False) * np.int64(self.n) + b
        cand = None
        if self.bloom_ref is not None:
            if self._bloom is None:
                self._bloom = ray.get(self.bloom_ref)
            bitmap, logb = self._bloom
            sh = np.uint64(64 - logb)
            wu = want.astype(np.uint64)
            h = (wu * _BLOOM_C1) >> sh
            cand = (bitmap[h >> np.uint64(3)]
                    & (np.uint8(128) >> (h & np.uint64(7)).astype(np.uint8))) != 0
            # second hash only for first-hash survivors (~5%): the bitmap
            # gather is a random DRAM access per wedge — the dominant probe
            # cost — so short-circuiting halves the stage's memory traffic
            idx1 = np.flatnonzero(cand)
            if idx1.size == 0:
                return cand, np.zeros(a.size, dtype=np.int64)
            h = (wu[idx1] * _BLOOM_C2) >> sh
            cand[idx1] = (bitmap[h >> np.uint64(3)]
                          & (np.uint8(128) >> (h & np.uint64(7)).astype(np.uint8))) != 0
            if not cand.any():
                return cand, np.zeros(a.size, dtype=np.int64)
        idx = np.flatnonzero(cand) if cand is not None else None
        av = a[idx] if idx is not None else a
        parts = (av % self.P).astype(np.int64)
        order = np.argsort(parts, kind="stable")
        bounds = np.searchsorted(parts[order], np.arange(self.P + 1))
        ok = np.zeros(a.size, dtype=bool)
        pos = np.zeros(a.size, dtype=np.int64)
        for j in range(self.P):
            s0, s1 = int(bounds[j]), int(bounds[j + 1])
            if s1 == s0:
                continue
            keys = self._kp(j)
            if keys.size == 0:
                continue
            sel = order[s0:s1]
            if idx is not None:
                sel = idx[sel]
            p = np.minimum(np.searchsorted(keys, want[sel]), keys.size - 1)
            hit = keys[p] == want[sel]
            ok[sel] = hit
            pos[sel] = p
        return ok, pos

    def __call__(self, t: pa.Table):
        yielded = False
        ids = t["id"].to_numpy(zero_copy_only=False)
        # source-range chunk descriptors (id, lo, hi) from _probe_chunks;
        # plain range(P) input (no lo/hi columns) means whole shards
        los = t["lo"].to_numpy(zero_copy_only=False) if "lo" in t.column_names else None
        his = t["hi"].to_numpy(zero_copy_only=False) if "lo" in t.column_names else None
        for i, k in enumerate(ids):
            csr = ray.get(self.csr_refs[int(k)])
            lo = int(los[i]) if los is not None else 0
            hi = int(his[i]) if his is not None else None
            for a, b, u, wp in self._wedge_chunks(csr, lo, hi):
                out = self._emit_confirmed(a, b, u, wp)
                if out is not None:
                    yield out
                    yielded = True
        if not yielded:
            yield self._empty()


class _WedgeProbeCorners(_WedgeProbe):
    """Per-corner triangle counts (part, v, c), pre-aggregated per chunk."""

    def _empty(self):
        return pa.table(
            {"part": pa.array([], pa.int32()), "v": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
        )

    def _emit_confirmed(self, a, b, u, wp):
        ok, _ = self._probe(a, b)
        if not ok.any():
            return None
        # hits are rare — widen back to int64 at emit (downstream schema)
        corners = np.concatenate([u[ok], a[ok], b[ok]]).astype(np.int64)
        uv, cnts = np.unique(corners, return_counts=True)
        return pa.table(
            {
                "part": pa.array((uv % self.P).astype(np.int32)),
                "v": pa.array(uv),
                "c": pa.array(cnts.astype(np.int64)),
            }
        )


class _WedgeProbeCornersW(_WedgeProbe):
    """Weighted corners: per-corner Σ cbrt(ŵ_ua·ŵ_ub·ŵ_ab) (part, v, c)."""

    def __init__(self, csr_refs, key_refs, num_parts, n, max_w, bloom_ref=None):
        super().__init__(
            csr_refs, key_refs, num_parts, n,
            with_weights=True, max_w=max_w, bloom_ref=bloom_ref,
        )
        self._w: dict[int, np.ndarray] = {}

    def _shard_w(self, j: int) -> np.ndarray:
        if j not in self._w:
            self._w[j] = ray.get(self.csr_refs[j])["weight"] / self.max_w
        return self._w[j]

    def _empty(self):
        return pa.table(
            {"part": pa.array([], pa.int32()), "v": pa.array([], pa.int64()), "c": pa.array([], pa.float64())}
        )

    def _emit_confirmed(self, a, b, u, wp):
        ok, pos = self._probe(a, b)
        if not ok.any():
            return None
        ao = a[ok].astype(np.int64)
        bo = b[ok].astype(np.int64)
        uo = u[ok].astype(np.int64)
        w_ab = np.empty(ao.size, dtype=np.float64)
        parts = (ao % self.P).astype(np.int64)
        for j in np.unique(parts):
            sel = parts == j
            w_ab[sel] = self._shard_w(int(j))[pos[ok][sel]]
        contrib = np.cbrt(wp[ok] * w_ab)
        corners = np.concatenate([uo, ao, bo])
        vals = np.concatenate([contrib, contrib, contrib])
        uv, inv = np.unique(corners, return_inverse=True)
        acc = np.zeros(uv.size, dtype=np.float64)
        np.add.at(acc, inv, vals)
        return pa.table(
            {
                "part": pa.array((uv % self.P).astype(np.int32)),
                "v": pa.array(uv),
                "c": pa.array(acc),
            }
        )


class _WedgeProbeEdges(_WedgeProbe):
    """Per-edge triangle supports (part, u, w, c): the three canonical
    edges of each confirmed triangle, pre-aggregated per chunk."""

    def _empty(self):
        return pa.table(
            {
                "part": pa.array([], pa.int32()),
                "u": pa.array([], pa.int64()),
                "w": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )

    def _emit_confirmed(self, a, b, u, wp):
        ok, _ = self._probe(a, b)
        if not ok.any():
            return None
        ua, ub, uu = a[ok].astype(np.int64), b[ok].astype(np.int64), u[ok].astype(np.int64)
        # three edges per triangle, already canonical (u<a<b in rank space)
        eu = np.concatenate([uu, uu, ua])
        ew = np.concatenate([ua, ub, ub])
        key = eu * np.int64(self.n) + ew
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "part": pa.array(((uk // self.n) % self.P).astype(np.int32)),
                "u": pa.array(uk // self.n),
                "w": pa.array(uk % self.n),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )


class _ProbeAndCount:
    """Confirm closing edges (a,b) in shard part(a); emit per-corner counts."""

    def __init__(self, csr_refs, n, num_parts):
        self.csr_refs = csr_refs
        self.n, self.P = n, num_parts
        self._keys: dict[int, np.ndarray] = {}

    def _shard_keys(self, k: int) -> np.ndarray:
        if k not in self._keys:
            csr = ray.get(self.csr_refs[k])
            cnt = np.diff(csr["indptr"])
            # rows sorted by src, dst sorted within row → globally sorted keys
            self._keys[k] = np.repeat(csr["srcs"], cnt) * np.int64(self.n) + csr["dst"]
        return self._keys[k]

    def __call__(self, g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"part": pa.array([], pa.int32()), "v": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        k = int(g["part"][0].as_py())
        keys = self._shard_keys(k)
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        u = g["u"].to_numpy(zero_copy_only=False)
        want = a * np.int64(self.n) + b
        if keys.size:
            pos = np.minimum(np.searchsorted(keys, want), keys.size - 1)
            ok = keys[pos] == want
        else:
            ok = np.zeros(want.size, dtype=bool)
        corners = np.concatenate([u[ok], a[ok], b[ok]])
        uv, cnts = np.unique(corners, return_counts=True)
        return pa.table(
            {
                "part": pa.array((uv % self.P).astype(np.int32)),
                "v": pa.array(uv),
                "c": pa.array(cnts.astype(np.int64)),
            }
        )


@ray.remote
def _shard_max_weight(csr) -> float:
    w = csr.get("weight")
    return float(np.max(w)) if w is not None and np.size(w) else 0.0


class _ProbeWeighted(_ProbeAndCount):
    """Confirm (a,b); emit per-corner cbrt(ŵ_ua·ŵ_ub·ŵ_ab) sums — the
    reference's cbrt plus_times triangle kernel (``cluster.py:24-53``)."""

    def __init__(self, csr_refs, n, num_parts, max_w):
        super().__init__(csr_refs, n, num_parts)
        self.max_w = max_w
        self._w: dict[int, np.ndarray] = {}

    def _shard_w(self, k: int) -> np.ndarray:
        if k not in self._w:
            self._w[k] = ray.get(self.csr_refs[k])["weight"] / self.max_w
        return self._w[k]

    def __call__(self, g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"part": pa.array([], pa.int32()), "v": pa.array([], pa.int64()), "c": pa.array([], pa.float64())}
        )
        if g.num_rows == 0:
            return empty
        k = int(g["part"][0].as_py())
        keys = self._shard_keys(k)
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        u = g["u"].to_numpy(zero_copy_only=False)
        wp = g["wp"].to_numpy(zero_copy_only=False)
        want = a * np.int64(self.n) + b
        if keys.size:
            pos = np.minimum(np.searchsorted(keys, want), keys.size - 1)
            ok = keys[pos] == want
        else:
            return empty
        contrib = np.cbrt(wp[ok] * self._shard_w(k)[pos[ok]])
        corners = np.concatenate([u[ok], a[ok], b[ok]])
        vals = np.concatenate([contrib, contrib, contrib])
        uv, inv = np.unique(corners, return_inverse=True)
        acc = np.zeros(uv.size, dtype=np.float64)
        np.add.at(acc, inv, vals)
        return pa.table(
            {
                "part": pa.array((uv % self.P).astype(np.int32)),
                "v": pa.array(uv),
                "c": pa.array(acc),
            }
        )


class _SumPerVertex:
    def __init__(self, n, num_parts, col):
        self.n, self.P, self.col = n, num_parts, col

    def __call__(self, g: pa.Table) -> pa.Table:
        k = int(g["part"][0].as_py())
        usize = universe_size(k, self.n, self.P)
        c = g["c"].to_numpy(zero_copy_only=False)
        acc = np.zeros(usize, dtype=c.dtype if c.dtype == np.float64 else np.int64)
        v = g["v"].to_numpy(zero_copy_only=False)
        np.add.at(acc, v // self.P, c)
        return pa.table(
            {"v": pa.array(universe(k, self.n, self.P)), self.col: pa.array(acc)}
        )


class _FillMissingParts:
    """Emit zero rows for parts that received no triangle corners."""

    def __init__(self, n, num_parts, col, dtype=np.int64):
        self.n, self.P, self.col = n, num_parts, col
        self.dtype = dtype

    def __call__(self, t: pa.Table) -> pa.Table:
        out_v, out_c = [], []
        for k in t["id"].to_numpy(zero_copy_only=False):
            uni = universe(int(k), self.n, self.P)
            out_v.append(uni)
            out_c.append(np.zeros(uni.size, self.dtype))
        return pa.table(
            {
                "v": pa.array(np.concatenate(out_v) if out_v else np.empty(0, np.int64)),
                self.col: pa.array(
                    np.concatenate(out_c) if out_c else np.empty(0, self.dtype)
                ),
            }
        )


def _fill_and_back(per_part, fg, P, col, rm, dtype=np.int64):
    """Union in zero rows for parts with no corners; map rank ids back."""
    have = set()
    for r in per_part.map_batches(
        lambda t: pa.table({"p": pa.array(np.unique(t["v"].to_numpy(zero_copy_only=False) % P).astype(np.int32))}),
        batch_format="pyarrow",
    ).take_all():
        have.add(int(r["p"]))
    missing = [k for k in range(P) if k not in have and universe_size(k, fg.n, P)]
    if missing:
        fill = ray.data.from_items([{"id": k} for k in missing]).map_batches(
            _FillMissingParts(fg.n, P, col, dtype), batch_format="pyarrow"
        )
        per_part = per_part.union(fill)
    return rm.back_cols(per_part.select_columns(["v", col]), ["v"])


def weighted_triangle_sums(G) -> ray.data.Dataset:
    """(v, tw): per-node Σ over incident triangles of
    cbrt(ŵ_uv·ŵ_uw·ŵ_vw), ŵ = w / max(w) — the reference's cbrt
    ``plus_times`` weighted-triangle kernel (``cluster.py:24-53``)."""
    g, fg, rm = _forward_graph(G)
    if not fg.weighted:
        raise ValueError("weighted_triangle_sums requires a weighted graph")
    P = fg.num_parts
    max_w = max(ray.get([_shard_max_weight.remote(r) for r in fg.csr_refs]) + [0.0])
    if max_w <= 0:
        max_w = 1.0
    if _tri_exchange() == "shuffle":
        wedges = ray.data.range(P, override_num_blocks=P).map_batches(
            _WedgeGen(fg.csr_refs, P, fg.n, with_weights=True, max_w=max_w),
            batch_format="pyarrow",
        )
        counts = wedges.groupby("part").map_groups(
            named(_ProbeWeighted(fg.csr_refs, fg.n, P, max_w)), batch_format="pyarrow"
        )
    else:
        counts = _probe_chunks(fg).map_batches(
            _WedgeProbeCornersW(
                fg.csr_refs, _probe_key_refs(fg), P, fg.n, max_w,
                bloom_ref=_bloom_ref(fg),
            ),
            batch_format="pyarrow",
        )
    per_part = (
        counts.groupby("part")
        .map_groups(named(_SumPerVertex(fg.n, P, "tw")), batch_format="pyarrow")
        .materialize()
    )
    return _fill_and_back(per_part, fg, P, "tw", rm, dtype=np.float64)


def _corner_counts(G) -> tuple:
    """(graph, fwd graph, rank map, corner-count Dataset in RANK space,
    pre-aggregated per probe)."""
    g, fg, rm = _forward_graph(G)
    P = fg.num_parts
    if _tri_exchange() == "shuffle":
        wedges = ray.data.range(P, override_num_blocks=P).map_batches(
            _WedgeGen(fg.csr_refs, P, fg.n), batch_format="pyarrow"
        )
        counts = wedges.groupby("part").map_groups(
            named(_ProbeAndCount(fg.csr_refs, fg.n, P)), batch_format="pyarrow"
        )
    else:
        counts = _probe_chunks(fg).map_batches(
            _WedgeProbeCorners(
                fg.csr_refs, _probe_key_refs(fg), P, fg.n, bloom_ref=_bloom_ref(fg)
            ),
            batch_format="pyarrow",
        )
    return g, fg, rm, counts


def triangles(G) -> ray.data.Dataset:
    """Per-node triangle counts over the full universe (0 for others).

    Reference ``algorithms/cluster.py:44-64`` (unweighted path)."""
    g, fg, rm, counts = _corner_counts(G)
    P = fg.num_parts
    per_part = (
        counts.groupby("part")
        .map_groups(named(_SumPerVertex(fg.n, P, "triangles")), batch_format="pyarrow")
        .materialize()
    )
    return _fill_and_back(per_part, fg, P, "triangles", rm)


def triangles_dict(G) -> dict:
    df = triangles(G).to_pandas()
    if len(df) == 0:  # empty graph: all-empty blocks may drop columns
        return {}
    return dict(zip(df["v"].astype(int), df["triangles"].astype(int)))


def total_triangles(G) -> int:
    """Global triangle count (``cluster.py:67-71`` SandiaDot equivalent)."""
    _, _, _, counts = _corner_counts(G)
    s = counts.sum("c")
    return int((s or 0) // 3)


def _degree_sq_sum(g) -> float:
    """Σ d(d-1) over degrees excluding self-edges (degrees-)."""
    import pyarrow.compute as pc

    deg = g.degrees_ds("out", include_self=False)
    return float(
        deg.map_batches(
            lambda t: pa.table(
                {"x": pc.multiply(t["degree"], pc.subtract(t["degree"], 1))}
            ),
            batch_format="pyarrow",
        ).sum("x")
        or 0
    )


def transitivity(G) -> float:
    """6·total_triangles / Σ d(d-1)  (``cluster.py:74-80``)."""
    g = G.to_undirected() if G.directed else G
    denom = _degree_sq_sum(g)
    if denom == 0:
        return 0.0
    return 6.0 * total_triangles(g) / denom


def clustering(G, weight: str | None = None) -> ray.data.Dataset:
    """Per-node clustering coefficient 2·tri/(d(d-1)), 0 where d<2
    (``cluster.py:94-108``). Dataset (v, clustering).

    ``weight="weight"``: the reference's weighted variant
    (``cluster.py:24-53,118-126``) — tri is replaced by the cbrt
    plus_times triangle-weight sum (nx parity incl. max-weight
    normalization)."""
    g = G.to_undirected() if G.directed else G
    if weight is not None:
        tri = weighted_triangle_sums(g).map_batches(
            lambda t: pa.table({"v": t["v"], "triangles": t["tw"]}),
            batch_format="pyarrow",
        )
    else:
        tri = triangles(g)
    aux_refs, n, P = g.aux_refs, g.n, g.num_parts

    class _Div:
        def __call__(self, t: pa.Table) -> pa.Table:
            v = t["v"].to_numpy(zero_copy_only=False)
            tr = t["triangles"].to_numpy(zero_copy_only=False)
            out = np.zeros(v.size, dtype=np.float64)
            for k in np.unique((v % P).astype(np.int64)):
                sel = (v % P) == k
                aux = ray.get(aux_refs[int(k)])
                d = (aux["out_cnt"] - aux["out_self"])[v[sel] // P]
                denom = d * (d - 1)
                o = np.zeros(sel.sum(), dtype=np.float64)
                nz = denom > 0
                o[nz] = 2.0 * tr[sel][nz] / denom[nz]
                out[sel] = o
            return pa.table({"v": t["v"], "clustering": pa.array(out)})

    return tri.map_batches(_Div(), batch_format="pyarrow")


def average_clustering(G, count_zeros: bool = True, weight: str | None = None) -> float:
    """``cluster.py:176-193`` — Dataset aggregates, no driver pull of the
    per-node table."""
    import pyarrow.compute as pc

    ds = clustering(G, weight=weight)
    if count_zeros:
        m = ds.mean("clustering")
        return float(m) if m is not None else 0.0
    # reference divides by c.nvals = nodes with NONZERO clustering
    # (nodes in >=1 triangle), not nodes with degree >= 2
    agg = ds.map_batches(
        lambda t: pa.table(
            {
                "s": pa.array(
                    [float(pc.sum(t["clustering"]).as_py() or 0.0)], pa.float64()
                ),
                "c": pa.array(
                    [
                        float(
                            pc.sum(
                                pc.cast(pc.greater(t["clustering"], 0.0), pa.int64())
                            ).as_py()
                            or 0
                        )
                    ],
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    s, c = agg.sum("s") or 0.0, agg.sum("c") or 0.0
    return float(s / c) if c else 0.0


# ---------------------------------------------------------------------------
# single-node fast paths (reference cluster.py:24-41, 129-147, 262-283):
# one CSR-row fetch for N(v) + membership probes of the C(d,2) closing
# pairs against the edge shards — O(d² / P) work instead of the full
# all-nodes triangle join.
# ---------------------------------------------------------------------------


def _node_neighbors(g, v: int):
    """(neighbors, weights|None) of v from its CSR row (self-edges dropped)."""
    csr = ray.get(g.csr_refs[v % g.num_parts])
    srcs, indptr = csr["srcs"], csr["indptr"]
    pos = int(np.searchsorted(srcs, v))
    if pos >= srcs.size or srcs[pos] != v:
        return np.empty(0, np.int64), None
    lo, hi = int(indptr[pos]), int(indptr[pos + 1])
    nb = csr["dst"][lo:hi]
    w = csr["weight"][lo:hi] if csr.get("weight") is not None else None
    keep = nb != v
    return nb[keep], (w[keep] if w is not None else None)


@ray.remote
def _probe_pairs(csr, n, a, b):
    """(hit mask, edge weights of hits or None) for pairs routed to this shard."""
    cnt = np.diff(csr["indptr"])
    keys = np.repeat(csr["srcs"], cnt) * np.int64(n) + csr["dst"]
    want = a * np.int64(n) + b
    if keys.size == 0:
        return np.zeros(want.size, dtype=bool), None
    pos = np.minimum(np.searchsorted(keys, want), keys.size - 1)
    ok = keys[pos] == want
    w = csr.get("weight")
    return ok, (w[pos[ok]] if w is not None else None)


def _single_node_pair_hits(g, node: int):
    """All pairs (a,b), a<b ∈ N(node), probed against the edge shards.
    Returns (nbrs, nbr_weights, ii, jj, hit_mask, hit_weights_aligned)."""
    nb, nw = _node_neighbors(g, int(node))
    if nb.size < 2:
        return nb, nw, *(np.empty(0, np.int64),) * 2, np.empty(0, bool), None
    order = np.argsort(nb)
    nb = nb[order]
    if nw is not None:
        nw = nw[order]
    ii, jj = np.triu_indices(nb.size, k=1)
    a, b = nb[ii], nb[jj]
    parts = (a % g.num_parts).astype(np.int64)
    hit = np.zeros(a.size, dtype=bool)
    hw = np.zeros(a.size, dtype=np.float64) if nw is not None else None
    refs, sels = [], []
    for k in np.unique(parts):
        sel = np.nonzero(parts == k)[0]
        refs.append(_probe_pairs.remote(g.csr_refs[int(k)], g.n, a[sel], b[sel]))
        sels.append(sel)
    for sel, (ok, w_ab) in zip(sels, ray.get(refs)):
        hit[sel] = ok
        if hw is not None and w_ab is not None:
            hw[sel[ok]] = w_ab
    return nb, nw, ii, jj, hit, hw


def single_triangle(G, node, *, weighted: bool = False):
    """Triangle count (or cbrt-weighted sum) through ONE node
    (``cluster.py:24-41``) without the all-nodes join."""
    g = G.to_undirected() if G.directed else G
    g._ensure_built()
    nb, nw, ii, jj, hit, hw = _single_node_pair_hits(g, node)
    if not weighted:
        return int(hit.sum())
    max_w = max(ray.get([_shard_max_weight.remote(r) for r in g.csr_refs]) + [0.0]) or 1.0
    if nw is None:
        raise ValueError("weighted single_triangle requires a weighted graph")
    prod = (nw[ii[hit]] / max_w) * (nw[jj[hit]] / max_w) * (hw[hit] / max_w)
    return float(np.cbrt(prod).sum())


def single_clustering(G, node, *, weighted: bool = False) -> float:
    """Clustering coefficient of ONE node (``cluster.py:129-147``)."""
    g = G.to_undirected() if G.directed else G
    g._ensure_built()
    tri = single_triangle(g, node, weighted=weighted)
    aux = ray.get(g.aux_refs[int(node) % g.num_parts])
    li = int(node) // g.num_parts
    d = int((aux["out_cnt"] - aux["out_self"])[li])
    if d < 2:
        return 0.0
    return 2.0 * tri / (d * (d - 1))


def single_generalized_degree(G, node) -> dict:
    """{triangle_count: n_edges} for the edges incident to ONE node
    (``cluster.py:262-283``): edge (v,a)'s support = # probed pairs at a."""
    g = G.to_undirected() if G.directed else G
    g._ensure_built()
    nb, nw, ii, jj, hit, hw = _single_node_pair_hits(g, node)
    support = np.zeros(nb.size, dtype=np.int64)
    if nb.size >= 2 and hit.any():
        np.add.at(support, ii[hit], 1)
        np.add.at(support, jj[hit], 1)
    vals, cnts = np.unique(support, return_counts=True)
    return {int(s): int(c) for s, c in zip(vals, cnts)}
