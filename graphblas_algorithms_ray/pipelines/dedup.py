"""Near-duplicate detection over the documents table — the training-data
dedup stack (SURVEY.md extension ops):

  * MinHash + LSH banding: word-shingle → 64-permutation MinHash → band
    buckets → groupby shuffle → candidate pairs → exact-Jaccard verify →
    connected components over the match graph (reusing the engine's CC
    kernel) → per-doc group ids.
  * SimHash: 64-bit sign-of-weighted-sum fingerprints; near-dups = small
    Hamming distance, bucketed by 16-bit chunks (any chunk equal →
    candidate; pigeonhole covers distance ≤ 3 across 4 chunks).

Everything per-batch vectorized; the only shuffles are the band-bucket
groupby (rows = docs × bands, shingle sets riding along so verification
happens INSIDE the buckets) and the pair-dedup groupby. Buckets emit
verified STAR edges (member vs bucket-min hub) — O(bucket) rows, never
C(s,2) — and the verified-pair Dataset feeds the engine's CC kernel
directly. No driver-side materialization anywhere in the path.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import GRAM_PRIME, named

_TOKEN = re.compile(r"\S+")
_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 11):
    rng = np.random.RandomState(seed)
    # odd multipliers → x ↦ a·x + b is a bijection mod 2^64 (multiply-shift
    # family); the uint64 wraparound IS the modulus, no explicit % needed
    # (a 64-bit modulo per (shingle × perm) was the hot op of this stage)
    a = (rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    return a, b


class _MinHash:
    """Batch-vectorized MinHash: Arrow tokenize (lower + whitespace split)
    → ONE polars xxhash pass over the flat token array → rolling k-gram
    hash (k gathers over the flat token-hash array) → per-doc sorted-unique
    shingle hashes → affine permutations min-reduced per doc segment with
    np.minimum.reduceat. No Python loop over documents or tokens (the
    ``_SimHash`` pattern). Docs with < k tokens pad with "$" to exactly one
    shingle (the round-1 semantics)."""

    _pad = None

    def __init__(self, num_perm: int, k: int):
        self.a, self.b = _perm_params(num_perm)
        self.num_perm = num_perm
        self.k = k

    @classmethod
    def _pad_hash(cls) -> np.uint64:
        if cls._pad is None:
            import polars as pl

            cls._pad = np.uint64(pl.Series(["$"]).hash(seed=7)[0])
        return cls._pad

    def _empty(self) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.int64()), self.num_perm
                ),
                "shingles": pa.array([], pa.list_(pa.int64())),
            }
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        import polars as pl
        import pyarrow.compute as pc

        t = t.combine_chunks()
        nd = t.num_rows
        if nd == 0:
            return self._empty()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.utf8_split_whitespace(pc.utf8_lower(t["text"]))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = np.asarray(toks.offsets, dtype=np.int64)
        values = toks.values
        row_lens = offs[1:] - offs[:-1]
        doc_idx = np.repeat(np.arange(nd, dtype=np.int64), row_lens)
        nonempty = pc.greater(pc.utf8_length(values), 0).to_numpy(zero_copy_only=False)
        if nonempty.size and not nonempty.all():
            values = values.filter(pa.array(nonempty))
            doc_idx = doc_idx[nonempty]
        L = np.bincount(doc_idx, minlength=nd).astype(np.int64)
        th = (
            pl.from_arrow(values).hash(seed=7).to_numpy().astype(np.uint64)
            if len(values)
            else np.empty(0, np.uint64)
        )
        starts = np.concatenate([[0], np.cumsum(L)[:-1]])
        k = self.k
        sh_parts, sd_parts = [], []
        with np.errstate(over="ignore"):
            sel = L >= k
            if sel.any():
                # shared rolling-gram kernel (same prime as every other
                # shingle consumer — see _util.GRAM_PRIME)
                from .._util import roll_grams

                sh_sel, sd_sel = roll_grams(th, L, starts, k)
                sh_parts.append(sh_sel)
                sd_parts.append(sd_sel)
            ssel = L < k
            if ssel.any():
                sdocs = np.nonzero(ssel)[0]
                Ls, st = L[sdocs], starts[sdocs]
                pad = self._pad_hash()
                acc = np.zeros(sdocs.size, dtype=np.uint64)
                for j in range(k):
                    valid = j < Ls
                    safe = np.where(valid, st + j, 0)
                    term = th[safe] if th.size else np.zeros(sdocs.size, np.uint64)
                    acc = acc * GRAM_PRIME + np.where(valid, term, pad)
                sh_parts.append(acc)
                sd_parts.append(sdocs)
            sh = np.concatenate(sh_parts)
            sd = np.concatenate(sd_parts)
            # per-doc sorted unique shingle hashes
            order = np.lexsort((sh, sd))
            sh, sd = sh[order], sd[order]
            keep = np.ones(sh.size, dtype=bool)
            keep[1:] = (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])
            sh, sd = sh[keep], sd[keep]
            seg_starts = np.nonzero(np.r_[True, sd[1:] != sd[:-1]])[0]
            # signatures: min over shingles of the bijective uint64 scramble
            # a_i·x + b_i (wraps mod 2^64; a_i odd). One contiguous 1-D
            # pass per permutation — 10× faster than the 2-D axis-reduceat
            # formulation (strided reduceat is pathological)
            sig = np.empty((self.num_perm, nd), dtype=np.uint64)
            for i in range(self.num_perm):
                v = sh * self.a[i] + self.b[i]
                sig[i] = np.minimum.reduceat(v, seg_starts)
            sig = sig.T.astype(np.int64)
        sh_counts = np.bincount(sd, minlength=nd)
        sh_offsets = np.concatenate([[0], np.cumsum(sh_counts)]).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig.ravel()), self.num_perm
                ),
                "shingles": pa.ListArray.from_arrays(
                    pa.array(sh_offsets), pa.array(sh.astype(np.int64))
                ),
            }
        )


class _BandRows:
    """doc → one row per band: (band, bh, doc_id). Shingles do NOT ride
    with the band rows (round 2 shipped every doc's shingle list in all 16
    band rows — 16× write amplification through the one big shuffle);
    exact verification happens downstream via a doc-keyed shingle join
    over the candidate pairs only."""

    def __init__(self, bands: int, rows: int):
        self.bands, self.rows = bands, rows

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = ids.size
        if n == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int32()),
                    "bh": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        sig = np.asarray(t["sig"].combine_chunks().flatten()).reshape(n, -1).astype(np.uint64)
        parts = []
        with np.errstate(over="ignore"):
            for b in range(self.bands):
                chunk = sig[:, b * self.rows : (b + 1) * self.rows]
                h = np.zeros(n, dtype=np.uint64)
                for j in range(chunk.shape[1]):
                    h = h * np.uint64(1099511628211) + chunk[:, j]
                parts.append(
                    pa.table(
                        {
                            "band": pa.array(np.full(n, b, np.int32)),
                            "bh": pa.array(h.astype(np.int64)),
                            "doc_id": pa.array(ids),
                        }
                    )
                )
        return pa.concat_tables(parts)


_COARSE_GROUPS = 256


class _CoarseKey:
    """Append ``__g = mix(cols) % NB``: a groupby on __g forms ~NB groups,
    each containing COMPLETE fine-grained buckets.

    Grouping directly on the fine key (e.g. (band, bh) — millions of
    mostly-singleton LSH buckets) makes Ray Data call the group function
    once per bucket: Python-per-group is the whole cost. The coarse key
    keeps the shuffle but lets one vectorized call process thousands of
    buckets (segments of a lexsort).

    CONTRACT: the content hash must be computed identically on every
    worker WITHIN one run — the standard Ray deployment (one runtime
    environment cluster-wide) guarantees this; a cluster mixing polars
    versions across nodes would route the same key to different coarse
    groups and silently split its bucket. Cross-RUN stability is NOT
    required (nothing derived from __g is persisted)."""

    def __init__(self, cols, nb: int = _COARSE_GROUPS):
        self.cols, self.nb = cols, nb

    def __call__(self, t: pa.Table) -> pa.Table:
        acc = np.zeros(t.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c in self.cols:
                col = t[c]
                if pa.types.is_integer(col.type):
                    v = (
                        col.to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                        .view(np.uint64)
                    )
                else:
                    # string/float/etc keys: deterministic content hash
                    # (polars xxhash, zero-copy from Arrow) — int64-casting
                    # them would crash (strings) or MERGE distinct keys
                    # (floats truncate: 1.2 and 1.7 → 1) (ADVICE r4)
                    import polars as pl

                    v = (
                        pl.from_arrow(pa.table({"k": col})["k"])
                        .hash(seed=17)
                        .to_numpy()
                        .astype(np.uint64)
                    )
                acc = (acc ^ v) * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "__g", pa.array((acc % np.uint64(self.nb)).astype(np.int32))
        )


class _GroupedStarCandidates:
    """Coarse group (many complete LSH buckets) → UNVERIFIED star
    candidate pairs (min-doc hub per (band, bh) bucket), fully vectorized
    over the group's lexsort segments.

    Emitting all C(s,2) pairs per bucket is quadratic in bucket size — one
    boilerplate-heavy bucket (1000 identical docs) explodes. The star
    (every member against the bucket's min doc) is O(s) rows and is
    sufficient for the connected-components grouping; members similar to
    each other but not to the hub are still paired in the bands where the
    hub does not collide (LSH's usual probabilistic recall). Verification
    is the exact-Jaccard join stage downstream."""

    def __call__(self, g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        band = g["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bh = g["bh"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        if doc.size == 0:
            return empty
        order = np.lexsort((doc, bh, band))
        b_, h_, d_ = band[order], bh[order], doc[order]
        newseg = np.ones(d_.size, dtype=bool)
        newseg[1:] = (b_[1:] != b_[:-1]) | (h_[1:] != h_[:-1])
        seg = np.cumsum(newseg) - 1
        hubs = d_[newseg]  # min doc per bucket (doc is the last sort key)
        memb = ~newseg
        a = hubs[seg[memb]]
        b2 = d_[memb]
        keep = a != b2  # a doc listed twice in one bucket is not a pair
        a, b2 = a[keep], b2[keep]
        if a.size == 0:
            return empty
        # in-group (a, b) dedup (same pair from several bands in this group)
        o2 = np.lexsort((b2, a))
        a, b2 = a[o2], b2[o2]
        k = np.ones(a.size, dtype=bool)
        k[1:] = (a[1:] != a[:-1]) | (b2[1:] != b2[:-1])
        return pa.table({"a": pa.array(a[k]), "b": pa.array(b2[k])})


class _GroupedUniquePairs:
    """Keep one row per distinct (a, b) within a coarse group (groups are
    complete by construction of the __g key); drops __g."""

    def __call__(self, g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        k = np.ones(a.size, dtype=bool)
        if a.size:
            asrt, bsrt = a[order], b[order]
            k[1:] = (asrt[1:] != asrt[:-1]) | (bsrt[1:] != bsrt[:-1])
        out = g.take(pa.array(np.sort(order[k])))
        return out.drop_columns(["__g"])


class _ExactJaccard:
    """Exact Jaccard over joined shingle-list pairs (sh_a, sh_b), fully
    vectorized: flatten both list columns with pair ids, sort by
    (pair, value) — per-doc lists are unique, so equal neighbors count the
    intersection — then one bincount per batch."""

    def __init__(self, threshold: float):
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        t = t.combine_chunks()
        if t.num_rows == 0:
            return empty
        import pyarrow.compute as pc

        sa = t["sh_a"].combine_chunks()
        sb = t["sh_b"].combine_chunks()
        va, vb = np.asarray(sa.flatten()), np.asarray(sb.flatten())
        # lengths via compute kernel (offsets of a sliced ListArray don't
        # start at 0; flatten() is already window-adjusted)
        la = pc.list_value_length(sa).to_numpy(zero_copy_only=False).astype(np.int64)
        lb = pc.list_value_length(sb).to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.num_rows
        pid = np.concatenate(
            [np.repeat(np.arange(n), la), np.repeat(np.arange(n), lb)]
        )
        val = np.concatenate([va, vb])
        order = np.lexsort((val, pid))
        pid_s, val_s = pid[order], val[order]
        dup = np.zeros(pid_s.size, dtype=bool)
        if pid_s.size > 1:
            dup[1:] = (pid_s[1:] == pid_s[:-1]) & (val_s[1:] == val_s[:-1])
        inter = (
            np.bincount(pid_s[dup], minlength=n)
            if pid_s.size
            else np.zeros(n, np.int64)
        )
        denom = la + lb - inter
        j = np.where(denom > 0, inter / np.maximum(denom, 1), 0.0)
        keepm = j >= self.threshold
        if not keepm.any():
            return empty
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(a[keepm], pa.int64()),
                "b": pa.array(b[keepm], pa.int64()),
                "jaccard": pa.array(j[keepm], pa.float64()),
            }
        )


def minhash_near_duplicates(
    docs: ray.data.Dataset,
    *,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
):
    """→ (pairs Dataset (a, b, jaccard), groups Dataset (doc_id, group)).

    groups assigns every doc in a near-dup cluster the min doc_id of the
    cluster (connected components over the verified match graph — the
    engine's own CC kernel on a doc-id graph)."""
    from ..stages.hashjoin import lookup_join

    rows = num_perm // bands
    # materialized: consumed by BOTH the band-bucket path and the
    # verification join (lineage would otherwise recompute the minhashes)
    sigs = docs.select_columns(["doc_id", "text"]).map_batches(
        _MinHash(num_perm, shingle_k), batch_format="pyarrow", batch_size=1024
    ).materialize()

    # band-bucket groupby over (band, bh, doc_id) rows only (no payload
    # amplification) → unverified star candidates → (a, b) dedup across
    # bands → shingle lists joined in per endpoint (each doc's shingles
    # cross the wire at most twice, not once per band) → exact-Jaccard
    # verification. No driver-side state.
    cands = (
        sigs.select_columns(["doc_id", "sig"])
        .map_batches(_BandRows(bands, rows), batch_format="pyarrow")
        .map_batches(_CoarseKey(["band", "bh"]), batch_format="pyarrow")
        .groupby("__g")
        .map_groups(named(_GroupedStarCandidates()), batch_format="pyarrow")
        .map_batches(_CoarseKey(["a", "b"]), batch_format="pyarrow")
        .groupby("__g")
        .map_groups(named(_GroupedUniquePairs()), batch_format="pyarrow")
    )
    shing = sigs.select_columns(["doc_id", "shingles"])
    ab = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    with_a = lookup_join(
        cands, "a", shing, "doc_id", "shingles", "sh_a", fact_schema=ab
    )
    with_b = lookup_join(
        with_a,
        "b",
        shing,
        "doc_id",
        "shingles",
        "sh_b",
        fact_schema=ab.append(pa.field("sh_a", pa.list_(pa.int64()))),
    )
    pairs = with_b.map_batches(
        _ExactJaccard(threshold), batch_format="pyarrow"
    ).materialize()

    # near-dup clusters: CC over the verified-pair graph in doc-id space —
    # the pairs Dataset feeds Graph() directly (stays distributed)
    from ..state.graph import Graph
    from .components import connected_components

    n_docs = int(docs.max("doc_id") or 0) + 1
    if pairs.count():
        edges = pairs.map_batches(
            lambda t: pa.table({"src": t["a"], "dst": t["b"]}),
            batch_format="pyarrow",
        )
        g = Graph(edges, n=n_docs, directed=False, num_parts=4)
        groups = connected_components(g).map_batches(
            lambda t: pa.table({"doc_id": t["v"], "group": t["component"]}),
            batch_format="pyarrow",
        )
    else:
        groups = docs.select_columns(["doc_id"]).map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"], "group": t["doc_id"]}),
            batch_format="pyarrow",
        )
    return pairs, groups


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class _SimHash:
    """Fully vectorized SimHash: Arrow whitespace tokenization, one polars
    xxhash pass over the flat token array (deterministic across processes),
    then 64 per-bit sign accumulations via np.bincount — no Python loop
    over documents or tokens."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import polars as pl
        import pyarrow.compute as pc

        t = t.combine_chunks()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.utf8_split_whitespace(pc.utf8_lower(t["text"]))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = np.asarray(toks.offsets)
        values = toks.values
        row_lens = (offs[1:] - offs[:-1]).astype(np.int64)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), row_lens)
        nonempty = pc.greater(pc.utf8_length(values), 0).to_numpy(zero_copy_only=False)
        if nonempty.size and not nonempty.all():
            values = values.filter(pa.array(nonempty))
            doc_idx = doc_idx[nonempty]
        if len(values) == 0:
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "simhash": pa.array(np.zeros(len(ids), np.int64)),
                }
            )
        h = pl.from_arrow(values).hash(seed=42).to_numpy().astype(np.uint64)
        acc_pos = np.zeros((64, t.num_rows), dtype=np.int64)
        tok_counts = np.bincount(doc_idx, minlength=t.num_rows)
        for b in range(64):
            bit_b = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            acc_pos[b] = np.bincount(doc_idx, weights=bit_b, minlength=t.num_rows)
        # sign sum = 2*ones - count; bit set where positive
        fp = np.zeros(t.num_rows, dtype=np.uint64)
        for b in range(64):
            pos = (2 * acc_pos[b] - tok_counts) > 0
            fp |= pos.astype(np.uint64) << np.uint64(b)
        return pa.table(
            {"doc_id": pa.array(ids), "simhash": pa.array(fp.astype(np.int64))}
        )


def simhash_fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, simhash): 64-bit SimHash per document."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _SimHash, batch_format="pyarrow", concurrency=(1, 8), batch_size=2048
    )


def simhash_near_duplicates(
    docs: ray.data.Dataset, max_hamming: int = 3
) -> ray.data.Dataset:
    """(a, b, hamming): pairs within Hamming distance ≤ max_hamming.
    Bucketing: 4 × 16-bit chunks; distance ≤ 3 ⇒ at least one chunk equal
    (pigeonhole), so scanning chunk-equal buckets finds all such pairs."""
    fps = simhash_fingerprints(docs).materialize()

    def _chunks(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        fp = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_c, out_v, out_d, out_f = [], [], [], []
        for c in range(4):
            out_c.append(np.full(ids.size, c, np.int32))
            out_v.append(((fp >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64))
            out_d.append(ids)
            out_f.append(fp.astype(np.int64))
        return pa.table(
            {
                "chunk": pa.array(np.concatenate(out_c)),
                "cv": pa.array(np.concatenate(out_v)),
                "doc_id": pa.array(np.concatenate(out_d)),
                "fp": pa.array(np.concatenate(out_f)),
            }
        )

    pairs = (
        fps.map_batches(_chunks, batch_format="pyarrow")
        .map_batches(_CoarseKey(["chunk", "cv"]), batch_format="pyarrow")
        .groupby("__g")
        .map_groups(named(_GroupedHamPairs(max_hamming)), batch_format="pyarrow")
    )
    # dedup pairs found in multiple chunks
    return (
        pairs.map_batches(_CoarseKey(["a", "b"]), batch_format="pyarrow")
        .groupby("__g")
        .map_groups(named(_GroupedUniquePairs()), batch_format="pyarrow")
    )


class _GroupedHamPairs:
    """Coarse group (many complete 16-bit-chunk buckets) → Hamming pairs.

    Identical fingerprints collapse to a star around the min doc (exact
    dups are the hot case — O(group), never C(s,2)); cross products run
    only over DISTINCT fingerprints, capped at `cap` lowest doc-ids per
    bucket (deterministic; a 16-bit chunk shared by thousands of distinct
    docs is a degenerate bucket whose pairs the other 3 chunks still
    cover probabilistically). Star edges are vectorized across ALL
    buckets in the group; the per-bucket Python loop runs only over
    buckets with ≥ 2 distinct fingerprints."""

    def __init__(self, maxh, cap=512):
        self.maxh, self.cap = maxh, cap

    def __call__(self, g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        chunk = g["chunk"].to_numpy(zero_copy_only=False).astype(np.int64)
        cv = g["cv"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        fp = g["fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if doc.size == 0:
            return empty
        order = np.lexsort((doc, fp.astype(np.int64), cv, chunk))
        c_, v_, d_, f_ = chunk[order], cv[order], doc[order], fp[order]
        nb = np.ones(d_.size, dtype=bool)  # bucket starts
        nb[1:] = (c_[1:] != c_[:-1]) | (v_[1:] != v_[:-1])
        bid = np.cumsum(nb) - 1
        # drop duplicate (bucket, doc) rows (defensive; adjacent after sort
        # only within the same fp run)
        dup = np.zeros(d_.size, dtype=bool)
        dup[1:] = (~nb[1:]) & (d_[1:] == d_[:-1]) & (f_[1:] == f_[:-1])
        if dup.any():
            keepm = ~dup
            c_, v_, d_, f_, bid = c_[keepm], v_[keepm], d_[keepm], f_[keepm], bid[keepm]
            nb = np.ones(d_.size, dtype=bool)
            nb[1:] = bid[1:] != bid[:-1]
        # fingerprint-group starts (within bucket)
        nf = nb.copy()
        nf[1:] |= f_[1:] != f_[:-1]
        fgid = np.cumsum(nf) - 1
        hubs = d_[nf]  # min doc per fp-group (doc ascending within group)
        out = []
        memb = ~nf
        if memb.any():
            out.append(
                pa.table(
                    {
                        "a": pa.array(hubs[fgid[memb]], pa.int64()),
                        "b": pa.array(d_[memb], pa.int64()),
                        "hamming": pa.array(np.zeros(int(memb.sum()), np.int64)),
                    }
                )
            )
        # cross pairs: one representative (min doc) per distinct fp,
        # bucket-local triu over buckets with >= 2 distinct fps
        rep_bid = bid[nf]
        rep_fp = f_[nf]
        counts = np.bincount(rep_bid, minlength=int(bid[-1]) + 1 if bid.size else 0)
        multi = np.nonzero(counts >= 2)[0]
        rep_starts = np.concatenate([[0], np.cumsum(counts)])
        for bkt in multi:
            s0, s1 = int(rep_starts[bkt]), int(rep_starts[bkt + 1])
            rep_ids, rfp = hubs[s0:s1], rep_fp[s0:s1]
            if rep_ids.size > self.cap:
                sel = np.argsort(rep_ids, kind="stable")[: self.cap]
                rep_ids, rfp = rep_ids[sel], rfp[sel]
            ii, jj = np.triu_indices(rep_ids.size, k=1)
            x = rfp[ii] ^ rfp[jj]
            ham = np.zeros(x.size, dtype=np.int64)
            for _ in range(64):
                ham += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            keep = (ham <= self.maxh) & (ham > 0)
            if keep.any():
                a, b = rep_ids[ii][keep], rep_ids[jj][keep]
                lo, hi2 = np.minimum(a, b), np.maximum(a, b)
                out.append(
                    pa.table(
                        {
                            "a": pa.array(lo, pa.int64()),
                            "b": pa.array(hi2, pa.int64()),
                            "hamming": pa.array(ham[keep]),
                        }
                    )
                )
        if not out:
            return empty
        return pa.concat_tables(out)


class _FirstRow:
    def __call__(self, g: pa.Table) -> pa.Table:
        return g.slice(0, 1)


def ngram_jaccard_pairs(
    docs: ray.data.Dataset, threshold: float = 0.5, shingle_k: int = 3
):
    """Exact n-gram Jaccard similarity pairs via the MinHash-LSH candidate
    generator with a lower banding threshold (recall-oriented), then exact
    verification — the scalable form of all-pairs Jaccard."""
    pairs, _ = minhash_near_duplicates(
        docs, threshold=threshold, num_perm=64, bands=32, shingle_k=shingle_k
    )
    return pairs


# ---------------------------------------------------------------------------
# benchmark decontamination: word-n-gram overlap against a broadcast test set
# ---------------------------------------------------------------------------

def _word_gram_hashes(t: pa.Table, n: int):
    """(gram_hash uint64, doc_index int64) for every word n-gram of every
    row of ``t`` (column ``text``) — one tokenize+hash pass + one roll
    (shared kernel in _util: token_hashes / roll_grams)."""
    from .._util import roll_grams, token_hashes

    th, L, starts = token_hashes(t)
    return roll_grams(th, L, starts, n)


class _BenchGrams:
    """Per-batch DISTINCT gram hashes of the (small) benchmark side."""

    def __init__(self, n: int):
        self.n = n

    def __call__(self, t: pa.Table) -> pa.Table:
        gh, _ = _word_gram_hashes(t, self.n)
        return pa.table({"h": np.unique(gh).view(np.int64)})


class _NgramHits:
    """Corpus-side streaming pass: per doc, count DISTINCT grams present
    in the broadcast benchmark set (searchsorted membership — the bench
    array rides in plasma once per node, zero-copy into every task)."""

    def __init__(self, bench_ref, n: int):
        self.bench_ref = bench_ref
        self.n = n
        self._b = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._b is None:
            self._b = ray.get(self.bench_ref)  # sorted uint64
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        gh, gd = _word_gram_hashes(t, self.n)
        hits = np.zeros(len(ids), dtype=np.int64)
        if gh.size and self._b.size:
            pos = np.searchsorted(self._b, gh)
            pos[pos == self._b.size] = 0
            m = self._b[pos] == gh
            if m.any():
                # distinct (doc, gram) pairs among the hits
                hd, hg = gd[m], gh[m]
                order = np.lexsort((hg, hd))
                hd, hg = hd[order], hg[order]
                keep = np.ones(hd.size, dtype=bool)
                keep[1:] = (hd[1:] != hd[:-1]) | (hg[1:] != hg[:-1])
                hits += np.bincount(hd[keep], minlength=len(ids))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_hits": pa.array(hits),
                "contaminated": pa.array(hits > 0),
            }
        )


def ngram_decontaminate(
    docs: ray.data.Dataset,
    bench: ray.data.Dataset,
    n: int = 8,
    *,
    max_bench_grams: int = 100_000_000,
) -> ray.data.Dataset:
    """(doc_id, n_hits, contaminated): flag training documents sharing any
    word ``n``-gram with a benchmark/test set — the standard eval-set
    decontamination pass of an LLM training-data pipeline.

    Scale shape: the benchmark side is SMALL by nature (eval sets are
    KB-MB even when the corpus is 100 TB) — its distinct gram hashes are
    unified on the driver (guarded by ``max_bench_grams``) and broadcast
    ONCE via ray.put; the corpus side is a single streaming map_batches
    pass doing vectorized shingle-hash + searchsorted membership. No
    shuffle at any point; corpus bytes are read exactly once."""
    parts = bench.select_columns(["text"]).map_batches(
        _BenchGrams(n), batch_format="pyarrow"
    )
    arrs = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in ray.get(parts.to_arrow_refs())  # one batched fetch wave
    ]
    # zero-row input blocks can pass through map_batches untransformed
    # (original schema, no "h" column) — they carry no grams either way
    arrs = [a for a in arrs if a.num_rows and "h" in a.column_names]
    hs = (
        np.unique(np.concatenate([a["h"].to_numpy(zero_copy_only=False) for a in arrs]))
        if arrs
        else np.empty(0, np.int64)
    )
    if hs.size > max_bench_grams:
        raise ValueError(
            f"benchmark side has {hs.size} distinct {n}-grams — exceeds the "
            f"broadcast budget max_bench_grams={max_bench_grams}; shrink the "
            "benchmark set or raise the budget"
        )
    # bit-reinterpret back to uint64 and sort in THAT order (searchsorted
    # in _NgramHits compares as uint64 — int64 sort order would be wrong)
    bench_ref = ray.put(np.sort(hs.view(np.uint64)))
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _NgramHits(bench_ref, n), batch_format="pyarrow"
    )
