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
groupby (rows = docs × bands) and the candidate-pair dedup groupby. The
exact-Jaccard verify broadcasts the shingle sets when they fit (ray.put
once); at 1e12-doc scale swap for a bucketed hash join on doc_id
(stages.hashjoin) — the pipeline shape is unchanged.
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
    def __init__(self, bands: int, rows: int):
        self.bands, self.rows = bands, rows

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sig = np.array(t["sig"].to_pylist(), dtype=np.uint64)
        out_b, out_h, out_d = [], [], []
        with np.errstate(over="ignore"):
            for b in range(self.bands):
                chunk = sig[:, b * self.rows : (b + 1) * self.rows]
                h = np.zeros(len(ids), dtype=np.uint64)
                for j in range(chunk.shape[1]):
                    h = h * np.uint64(1099511628211) + chunk[:, j]
                out_b.append(np.full(len(ids), b, np.int32))
                out_h.append(h.astype(np.int64))
                out_d.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_b)),
                "bh": pa.array(np.concatenate(out_h)),
                "doc_id": pa.array(np.concatenate(out_d)),
            }
        )


class _BucketPairs:
    def __call__(self, g: pa.Table) -> pa.Table:
        ids = np.unique(g["doc_id"].to_numpy(zero_copy_only=False))
        if ids.size < 2:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        ii, jj = np.triu_indices(ids.size, k=1)
        return pa.table({"a": pa.array(ids[ii]), "b": pa.array(ids[jj])})


class _VerifyJaccard:
    def __init__(self, shingle_ref, threshold):
        self.shingle_ref = shingle_ref
        self.threshold = threshold
        self._sh = None

    def __call__(self, g: pa.Table) -> pa.Table:
        # group = one (a,b) candidate pair possibly seen in several bands
        if self._sh is None:
            self._sh = ray.get(self.shingle_ref)
        a = int(g["a"][0].as_py())
        b = int(g["b"][0].as_py())
        sa, sb = self._sh.get(a), self._sh.get(b)
        if sa is None or sb is None:
            j = 0.0
        else:
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            j = inter / (sa.size + sb.size - inter) if (sa.size + sb.size - inter) else 0.0
        if j >= self.threshold:
            return pa.table(
                {
                    "a": pa.array([a], pa.int64()),
                    "b": pa.array([b], pa.int64()),
                    "jaccard": pa.array([j], pa.float64()),
                }
            )
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
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
    ).materialize()

    # broadcast shingle sets for exact verification (scale note in module doc)
    shingle_map = {}
    for ref in sigs.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        for did, sh in zip(t["doc_id"].to_pylist(), t["shingles"].to_pylist()):
            shingle_map[int(did)] = np.asarray(sh, dtype=np.int64)
    shingle_ref = ray.put(shingle_map)

    cand = (
        sigs.map_batches(_BandRows(bands, rows), batch_format="pyarrow")
        .groupby(["band", "bh"])
        .map_groups(named(_BucketPairs()), batch_format="pyarrow")
    )
    pairs = (
        cand.groupby(["a", "b"])
        .map_groups(named(_VerifyJaccard(shingle_ref, threshold)), batch_format="pyarrow")
        .materialize()
    )

    # near-dup clusters: CC over the pair graph in doc-id space
    from ..state.graph import Graph
    from .components import connected_components

    n_docs = int(docs.max("doc_id") or 0) + 1
    edge_tbls = [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
    if edge_tbls:
        et = pa.concat_tables(edge_tbls)
        g = Graph(
            pa.table({"src": et["a"], "dst": et["b"]}),
            n=n_docs,
            directed=False,
            num_parts=4,
        )
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
    def __call__(self, t: pa.Table) -> pa.Table:
        import zlib

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out = np.zeros(len(ids), dtype=np.uint64)
        for i, tx in enumerate(t["text"].to_pylist()):
            toks = _TOKEN.findall(tx.lower())
            if not toks:
                continue
            hs = np.array([zlib.crc32(w.encode()) for w in toks], dtype=np.uint64)
            # widen to 64 bits deterministically
            with np.errstate(over="ignore"):
                hs = hs * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            acc = (2 * bits - 1).sum(axis=0)
            fp = np.uint64(0)
            for b in range(64):
                if acc[b] > 0:
                    fp |= np.uint64(1) << np.uint64(b)
            out[i] = fp
        return pa.table({"doc_id": pa.array(ids), "simhash": pa.array(out.astype(np.int64))})


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
        def __init__(self, maxh):
            self.maxh = maxh

        def __call__(self, g: pa.Table) -> pa.Table:
            ids = g["doc_id"].to_numpy(zero_copy_only=False)
            fp = g["fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
            ids, ix = np.unique(ids, return_index=True)
            fp = fp[ix]
            if ids.size < 2:
                return pa.table(
                    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "hamming": pa.array([], pa.int64())}
                )
            ii, jj = np.triu_indices(ids.size, k=1)
            x = fp[ii] ^ fp[jj]
            ham = np.zeros(x.size, dtype=np.int64)
            for _ in range(64):
                ham += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            keep = ham <= self.maxh
            return pa.table(
                {
                    "a": pa.array(ids[ii][keep]),
                    "b": pa.array(ids[jj][keep]),
                    "hamming": pa.array(ham[keep]),
                }
            )

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
