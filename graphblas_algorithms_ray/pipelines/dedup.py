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

from .._util import named

_TOKEN = re.compile(r"\S+")
_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    toks = _TOKEN.findall(text.lower())
    if len(toks) < k:
        toks = toks + ["$"] * (k - len(toks))
    sh = [" ".join(toks[i : i + k]) for i in range(max(1, len(toks) - k + 1))]
    import zlib

    return np.unique(
        np.array([zlib.crc32(s.encode()) for s in sh], dtype=np.uint64)
    )


def _perm_params(num_perm: int, seed: int = 11):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    return a, b


class _MinHash:
    def __init__(self, num_perm: int, k: int):
        self.a, self.b = _perm_params(num_perm)
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sigs, shingles = [], []
        with np.errstate(over="ignore"):
            for tx in t["text"].to_pylist():
                sh = _shingle_hashes(tx, self.k)
                # sig_i = min over shingles of (a_i*x + b_i) mod mersenne
                vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
                sigs.append(vals.min(axis=0).astype(np.int64))
                shingles.append(sh.astype(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "sig": pa.array([s.tolist() for s in sigs]),
                "shingles": pa.array([s.tolist() for s in shingles]),
            }
        )


class _BandRows:
    """doc → one row per band: (band, bh, doc_id, shingles). Shingle sets
    ride WITH the band rows, so exact verification happens inside the
    band-bucket groups — no driver-side shingle map, no second join.
    Volume = bands × Σ|shingles|, linear and fully distributed."""

    def __init__(self, bands: int, rows: int):
        self.bands, self.rows = bands, rows

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sig = np.array(t["sig"].to_pylist(), dtype=np.uint64)
        shingles = t["shingles"]
        parts = []
        with np.errstate(over="ignore"):
            for b in range(self.bands):
                chunk = sig[:, b * self.rows : (b + 1) * self.rows]
                h = np.zeros(len(ids), dtype=np.uint64)
                for j in range(chunk.shape[1]):
                    h = h * np.uint64(1099511628211) + chunk[:, j]
                parts.append(
                    pa.table(
                        {
                            "band": pa.array(np.full(len(ids), b, np.int32)),
                            "bh": pa.array(h.astype(np.int64)),
                            "doc_id": pa.array(ids),
                            "shingles": shingles,
                        }
                    )
                )
        return pa.concat_tables(parts)


class _BucketStarVerify:
    """One LSH bucket → exact-Jaccard-verified STAR edges (min-doc hub).

    Emitting all C(s,2) pairs per bucket is quadratic in bucket size — one
    boilerplate-heavy bucket (1000 identical docs) explodes. The star
    (every member verified against the bucket's min doc) is O(s) rows and
    is sufficient for the connected-components grouping; members similar
    to each other but not to the hub are still paired in the bands where
    the hub does not collide (LSH's usual probabilistic recall)."""

    def __init__(self, threshold):
        self.threshold = threshold

    def __call__(self, g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        uniq, first_idx = np.unique(ids, return_index=True)
        if uniq.size < 2:
            return empty
        shingles = g["shingles"]
        hub_pos = int(first_idx[0])  # uniq is sorted → index of min doc_id
        hub = np.asarray(shingles[hub_pos].as_py(), dtype=np.int64)
        out_a, out_b, out_j = [], [], []
        for u, ix in zip(uniq[1:], first_idx[1:]):
            sb = np.asarray(shingles[int(ix)].as_py(), dtype=np.int64)
            inter = np.intersect1d(hub, sb, assume_unique=True).size
            denom = hub.size + sb.size - inter
            j = inter / denom if denom else 0.0
            if j >= self.threshold:
                out_a.append(int(uniq[0]))
                out_b.append(int(u))
                out_j.append(j)
        if not out_a:
            return empty
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
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
    rows = num_perm // bands
    sigs = docs.select_columns(["doc_id", "text"]).map_batches(
        _MinHash(num_perm, shingle_k), batch_format="pyarrow", batch_size=1024
    )

    # band-bucket groupby (the one shuffle) → verified star edges inside
    # each bucket → (a, b) dedup across bands. No driver-side state.
    pairs = (
        sigs.map_batches(_BandRows(bands, rows), batch_format="pyarrow")
        .groupby(["band", "bh"])
        .map_groups(named(_BucketStarVerify(threshold)), batch_format="pyarrow")
        .groupby(["a", "b"])
        .map_groups(named(_FirstRow()), batch_format="pyarrow")
        .materialize()
    )

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

    class _HamPairs:
        """Identical fingerprints collapse to a star around the min doc
        (exact dups are the hot case — O(group), never C(s,2)); the cross
        products run only over DISTINCT fingerprints, capped at `cap`
        lowest doc-ids per bucket (deterministic; a 16-bit chunk shared by
        thousands of distinct docs is a degenerate bucket whose pairs the
        other 3 chunks still cover probabilistically)."""

        def __init__(self, maxh, cap=512):
            self.maxh, self.cap = maxh, cap

        def __call__(self, g: pa.Table) -> pa.Table:
            ids = g["doc_id"].to_numpy(zero_copy_only=False)
            fp = g["fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
            ids, ix = np.unique(ids, return_index=True)
            fp = fp[ix]
            empty = pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "hamming": pa.array([], pa.int64())}
            )
            if ids.size < 2:
                return empty
            out = []
            # star edges within identical-fingerprint groups (hamming 0)
            order = np.argsort(fp, kind="stable")
            fps_s, ids_s = fp[order], ids[order]
            grp_start = np.ones(fps_s.size, dtype=bool)
            grp_start[1:] = fps_s[1:] != fps_s[:-1]
            gid = np.cumsum(grp_start) - 1
            # min doc id per group = first in (fp, id) lexsort
            order2 = np.lexsort((ids_s, gid))
            ids2, gid2 = ids_s[order2], gid[order2]
            first = np.ones(ids2.size, dtype=bool)
            first[1:] = gid2[1:] != gid2[:-1]
            hubs = ids2[first]
            star_mask = ~first
            if star_mask.any():
                out.append(
                    pa.table(
                        {
                            "a": pa.array(hubs[gid2[star_mask]], pa.int64()),
                            "b": pa.array(ids2[star_mask], pa.int64()),
                            "hamming": pa.array(np.zeros(int(star_mask.sum()), np.int64)),
                        }
                    )
                )
            # cross pairs over distinct fingerprints (capped, lowest ids)
            rep_ids, rep_fp = hubs, fps_s[order2][first]
            if rep_ids.size > self.cap:
                sel = np.argsort(rep_ids, kind="stable")[: self.cap]
                rep_ids, rep_fp = rep_ids[sel], rep_fp[sel]
            if rep_ids.size >= 2:
                ii, jj = np.triu_indices(rep_ids.size, k=1)
                x = rep_fp[ii] ^ rep_fp[jj]
                ham = np.zeros(x.size, dtype=np.int64)
                for _ in range(64):
                    ham += (x & np.uint64(1)).astype(np.int64)
                    x >>= np.uint64(1)
                keep = (ham <= self.maxh) & (ham > 0)
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

    pairs = (
        fps.map_batches(_chunks, batch_format="pyarrow")
        .groupby(["chunk", "cv"])
        .map_groups(named(_HamPairs(max_hamming)), batch_format="pyarrow")
    )
    # dedup pairs found in multiple chunks
    return pairs.groupby(["a", "b"]).map_groups(
        named(_FirstRow()), batch_format="pyarrow"
    )


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
