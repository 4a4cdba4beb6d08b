"""Single-process reference implementations of the hash-defined queries
(minhash_groups, simhash, ann_topk_lsh) for the DuckDB oracle side.

These outputs are deterministic functions of fixed seeds, so they have no
natural SQL formulation; the oracle instead reads a parquet table computed
here — plain per-document Python/numpy loops over the same published spec
(word shingles → 64-perm MinHash → 16-band LSH → star candidates →
exact-Jaccard verify → union-find; token-hash sign sums for SimHash;
hyperplane-signature multi-probe for LSH ANN). The code shape is
deliberately the naive one (loops, dicts, union-find) so it shares no
structure with the distributed pipelines it checks; only the spec
constants (seeds, prime, pad token) are common, as they define the output.

Written to /tmp/gar/expected/<sfname>/<query>.parquet by the queries()
callables; ORACLE_SQL reads the sf0.01 path (the driver's correctness
scale), mirroring the corpus-trio ground-truth pattern (api.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_PRIME = np.uint64(1099511628211)

# The reference implementations are naive single-process loops; they exist
# for the correctness harness (driver runs at sf0.01). Above this many rows
# the writers no-op so a production-scale queries() call never serializes
# on a driver-side Python loop (code review r4).
_MAX_ORACLE_ROWS = 20_000


def _too_big(path: str, limit: int = _MAX_ORACLE_ROWS) -> bool:
    return pq.ParquetFile(path).metadata.num_rows > limit


def expected_dir(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join("/tmp/gar/expected", name)
    os.makedirs(path, exist_ok=True)
    return path


def _tokens(text: str) -> list[str]:
    return [w for w in text.lower().split() if w]


def _doc_rows(sf_dir: str):
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return list(
        zip(t["doc_id"].to_numpy(zero_copy_only=False), t["text"].to_pylist())
    )


def write_simhash_expected(sf_dir: str) -> str | None:
    import polars as pl

    if _too_big(os.path.join(sf_dir, "documents.parquet")):
        return None
    rows = _doc_rows(sf_dir)
    out_id, out_fp = [], []
    for doc_id, text in rows:
        toks = _tokens(text)
        fp = np.uint64(0)
        if toks:
            h = pl.Series(toks).hash(seed=42).to_numpy().astype(np.uint64)
            for b in range(64):
                ones = int(((h >> np.uint64(b)) & np.uint64(1)).sum())
                if 2 * ones - len(toks) > 0:
                    fp |= np.uint64(1) << np.uint64(b)
        out_id.append(int(doc_id))
        out_fp.append(int(fp.astype(np.int64)))
    path = os.path.join(expected_dir(sf_dir), "simhash.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "simhash": pa.array(out_fp, pa.int64()),
            }
        ),
        path,
    )
    return path


def _doc_shingles(text: str, k: int) -> np.ndarray:
    """Sorted-unique rolling k-gram hashes of the lowered token stream
    (docs with < k tokens pad with '$' to exactly one shingle)."""
    import polars as pl

    toks = _tokens(text)
    th = (
        pl.Series(toks).hash(seed=7).to_numpy().astype(np.uint64)
        if toks
        else np.empty(0, np.uint64)
    )
    pad = np.uint64(pl.Series(["$"]).hash(seed=7)[0])
    out = []
    with np.errstate(over="ignore"):
        if len(th) >= k:
            for i in range(len(th) - k + 1):
                acc = np.uint64(0)
                for j in range(k):
                    acc = acc * _PRIME + th[i + j]
                out.append(acc)
        else:
            acc = np.uint64(0)
            for j in range(k):
                acc = acc * _PRIME + (th[j] if j < len(th) else pad)
            out.append(acc)
    return np.unique(np.array(out, dtype=np.uint64))


def write_minhash_groups_expected(
    sf_dir: str,
    *,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> str | None:
    if _too_big(os.path.join(sf_dir, "documents.parquet")):
        return None
    rows = _doc_rows(sf_dir)
    rng = np.random.RandomState(11)  # _perm_params(seed=11) spec
    a = (rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    r = num_perm // bands

    shingles: dict[int, np.ndarray] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    with np.errstate(over="ignore"):
        for doc_id, text in rows:
            doc_id = int(doc_id)
            sh = _doc_shingles(text, shingle_k)
            shingles[doc_id] = sh
            sig = np.array(
                [int((sh * a[i] + b[i]).min()) for i in range(num_perm)],
                dtype=np.uint64,
            )
            for band in range(bands):
                h = np.uint64(0)
                for j in range(r):
                    h = h * _PRIME + sig[band * r + j]
                buckets.setdefault((band, int(h.astype(np.int64))), []).append(doc_id)

    # star candidates per bucket (hub = min doc), exact-Jaccard verified
    cands = set()
    for members in buckets.values():
        if len(members) > 1:
            hub = min(members)
            for m in members:
                if m != hub:
                    cands.add((hub, m))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    verified = 0
    for hub, m in sorted(cands):
        sa, sb = shingles[hub], shingles[m]
        inter = np.intersect1d(sa, sb).size
        denom = sa.size + sb.size - inter
        if denom > 0 and inter / denom >= threshold:
            ra, rb = find(hub), find(m)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
            verified += 1

    n_docs = max(int(d) for d, _ in rows) + 1
    out_doc = list(range(n_docs))
    out_grp = [find(d) for d in out_doc]
    path = os.path.join(expected_dir(sf_dir), "minhash_groups.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "group": pa.array(out_grp, pa.int64()),
            }
        ),
        path,
    )
    return path


def write_ann_topk_ivf_expected(
    sf_dir: str,
    query_ids: list[int],
    k: int = 5,
    *,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    seed: int = 7,
    round_to: int = 6,
) -> str | None:
    """Naive single-process IVF ANN: Lloyd spherical k-means with the same
    spec constants as pipelines/ann.py (seed, 2^24 fixed-point accumulation
    quantum, random-unit-vector init); fixed-point integer sums make the
    fitted centroids bit-identical to the distributed fit regardless of
    the engine's block order."""
    if _too_big(os.path.join(sf_dir, "embeddings.parquet"), 100_000):
        return None
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()])
    dim = m.shape[1]
    scale = float(np.int64(1) << 24)

    def norm_rows(x):
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return x / n

    rng = np.random.RandomState(seed)
    cents = norm_rows(rng.normal(size=(n_clusters, dim)))
    q = np.round(m * scale).astype(np.int64)
    mn = norm_rows(m)
    for _ in range(iters):
        cn = norm_rows(cents)
        assign = [int(np.argmax(cn @ mn[j])) for j in range(len(ids))]
        sums = [np.zeros(dim, dtype=np.int64) for _ in range(n_clusters)]
        cnt = [0] * n_clusters
        for j, c in enumerate(assign):
            sums[c] = sums[c] + q[j]
            cnt[c] += 1
        new = cents.copy()
        for c in range(n_clusters):
            if cnt[c] > 0:
                new[c] = sums[c] / (scale * cnt[c])
        cents = new

    cn = norm_rows(cents)
    assign = {int(i): int(np.argmax(cn @ mn[j])) for j, i in enumerate(ids)}
    qids = sorted(int(x) for x in query_ids)
    idx_of = {int(i): j for j, i in enumerate(ids)}
    npb = min(nprobe, n_clusters)
    probe: set[int] = set()
    for qid in qids:
        sims = cn @ mn[idx_of[qid]]
        probe.update(int(c) for c in np.argsort(-sims, kind="stable")[:npb])
    scanned = [int(i) for i in ids if assign[int(i)] in probe]
    out_q, out_n, out_s = [], [], []
    for qid in qids:
        qv = mn[idx_of[qid]]
        scores = [(float(qv @ mn[idx_of[i]]), i) for i in scanned if i != qid]
        scores.sort(key=lambda t2: (-t2[0], t2[1]))
        for s, i in scores[:k]:
            out_q.append(qid)
            out_n.append(i)
            out_s.append(float(np.round(s, round_to)))
    path = os.path.join(expected_dir(sf_dir), "ann_topk_ivf.parquet")
    pq.write_table(
        pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "nid": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        ),
        path,
    )
    return path


def write_ann_topk_lsh_expected(
    sf_dir: str,
    query_ids: list[int],
    k: int = 5,
    *,
    bits: int = 6,
    hamming_probes: int = 2,
    round_to: int = 6,
) -> str | None:
    if _too_big(os.path.join(sf_dir, "embeddings.parquet"), 100_000):
        return None
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()])
    dim = m.shape[1]
    planes = np.random.RandomState(7).normal(size=(bits, dim))  # _hyperplanes spec

    def sig_of(v: np.ndarray) -> int:
        bitsv = (v @ planes.T) > 0
        s = 0
        for i in range(bits):
            if bitsv[i]:
                s |= 1 << i
        return s

    sigs = {int(i): sig_of(m[j]) for j, i in enumerate(ids)}
    qids = sorted(int(q) for q in query_ids)
    cand = {sigs[q] for q in qids}
    if hamming_probes >= 1:
        for s in list(cand):
            for bb in range(bits):
                cand.add(s ^ (1 << bb))
    if hamming_probes >= 2:
        for q in qids:
            s = sigs[q]
            for b1 in range(bits):
                for b2 in range(b1 + 1, bits):
                    cand.add(s ^ (1 << b1) ^ (1 << b2))

    norm = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    idx_of = {int(i): j for j, i in enumerate(ids)}
    out_q, out_n, out_s = [], [], []
    scanned = [int(i) for i in ids if sigs[int(i)] in cand]
    for q in qids:
        qv = norm[idx_of[q]]
        scores = [(float(qv @ norm[idx_of[i]]), i) for i in scanned if i != q]
        scores.sort(key=lambda t2: (-t2[0], t2[1]))
        for s, i in scores[:k]:
            out_q.append(q)
            out_n.append(i)
            out_s.append(float(np.round(s, round_to)))
    path = os.path.join(expected_dir(sf_dir), "ann_topk_lsh.parquet")
    pq.write_table(
        pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "nid": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        ),
        path,
    )
    return path


def write_ngram_jaccard_expected(
    sf_dir: str,
    *,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 32,
    shingle_k: int = 3,
) -> str | None:
    """Verified n-gram Jaccard pairs — the ngram_jaccard_pairs spec
    (MinHash-LSH candidates at a recall-oriented banding, exact-Jaccard
    verified), naive single-process form."""
    if _too_big(os.path.join(sf_dir, "documents.parquet")):
        return None
    rows = _doc_rows(sf_dir)
    rng = np.random.RandomState(11)
    a = (rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
    r = num_perm // bands
    shingles: dict[int, np.ndarray] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    with np.errstate(over="ignore"):
        for doc_id, text in rows:
            doc_id = int(doc_id)
            sh = _doc_shingles(text, shingle_k)
            shingles[doc_id] = sh
            sig = np.array(
                [int((sh * a[i] + b[i]).min()) for i in range(num_perm)],
                dtype=np.uint64,
            )
            for band in range(bands):
                h = np.uint64(0)
                for j in range(r):
                    h = h * _PRIME + sig[band * r + j]
                buckets.setdefault((band, int(h.astype(np.int64))), []).append(doc_id)
    cands = set()
    for members in buckets.values():
        if len(members) > 1:
            hub = min(members)
            for m2 in members:
                if m2 != hub:
                    cands.add((hub, m2))
    out_a, out_b, out_j = [], [], []
    for hub, m2 in sorted(cands):
        sa, sb = shingles[hub], shingles[m2]
        inter = np.intersect1d(sa, sb).size
        denom = sa.size + sb.size - inter
        j = inter / max(denom, 1) if denom > 0 else 0.0
        if j >= threshold:
            out_a.append(hub)
            out_b.append(m2)
            out_j.append(float(j))
    path = os.path.join(expected_dir(sf_dir), "ngram_jaccard.parquet")
    pq.write_table(
        pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        ),
        path,
    )
    return path
