"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k: the query matrix is broadcast once (ray.put), each
batch computes a numpy matmul against it and emits only its per-batch top-k
candidates (the combiner), then one tiny groupby(qid) picks the global top-k
— shuffle volume is O(num_batches · q · k), never O(N·q).

LSH-bucketed variant: random-hyperplane signatures route vectors into
buckets; only the query buckets are scanned (the IVF-style scale path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import named


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


class _BatchTopK:
    def __init__(self, q_ref, k):
        self.q_ref, self.k = q_ref, k
        self._q = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._q is None:
            qids, qm = ray.get(self.q_ref)
            qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
            self._q = (qids, qn)
        qids, qn = self._q
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        m = _to_matrix(t["embedding"])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ qn.T  # (batch, q)
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(qids):
            s = sims[:, j]
            mask = ids != qid
            cand = np.nonzero(mask)[0]
            if cand.size == 0:
                continue
            k = min(self.k, cand.size)
            # lexsort, not argpartition: exact score ties at the per-batch
            # k boundary resolve by nid ascending, so the surviving
            # candidate set is partition-invariant and matches the
            # single-process oracles' (-score, nid) ordering
            top = cand[np.lexsort((ids[cand], -s[cand]))[:k]]
            out_q.append(np.full(k, qid, np.int64))
            out_n.append(ids[top])
            out_s.append(s[top])
        if not out_q:
            return pa.table(
                {"qid": pa.array([], pa.int64()), "nid": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "nid": pa.array(np.concatenate(out_n)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )


class _FinalTopK:
    def __init__(self, k, round_to):
        self.k, self.round_to = k, round_to

    def __call__(self, g: pa.Table) -> pa.Table:
        qid = g["qid"].to_numpy(zero_copy_only=False)
        nid = g["nid"].to_numpy(zero_copy_only=False)
        s = g["score"].to_numpy(zero_copy_only=False)
        # deterministic: score desc, then nid asc
        order = np.lexsort((nid, -s))[: self.k]
        out_s = s[order]
        if self.round_to is not None:
            out_s = np.round(out_s, self.round_to)
        return pa.table(
            {
                "qid": pa.array(qid[order]),
                "nid": pa.array(nid[order]),
                "score": pa.array(out_s),
            }
        )


def ann_topk(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    k: int = 5,
    *,
    round_to: int | None = 6,
) -> ray.data.Dataset:
    """(qid, nid, score): exact cosine top-k per query id (self excluded)."""
    qids, qm = _take_queries(embeddings, query_ids)
    q_ref = ray.put((qids, qm))
    partial = embeddings.map_batches(
        _BatchTopK(q_ref, k), batch_format="pyarrow", batch_size=8192
    )
    return partial.groupby("qid").map_groups(
        named(_FinalTopK(k, round_to)), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# LSH-bucketed scale path
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim))


class _Signature:
    def __init__(self, planes_ref):
        self.planes_ref = planes_ref
        self._p = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._p is None:
            self._p = ray.get(self.planes_ref)
        m = _to_matrix(t["embedding"])
        bits = (m @ self._p.T) > 0
        sig = np.zeros(m.shape[0], dtype=np.int64)
        for i in range(bits.shape[1]):
            sig |= bits[:, i].astype(np.int64) << i
        return pa.table({"vec_id": t["vec_id"], "bucket": pa.array(sig)})


def lsh_buckets(embeddings: ray.data.Dataset, bits: int = 8, dim: int = 64) -> ray.data.Dataset:
    """(vec_id, bucket): random-hyperplane LSH signatures — candidates for
    ANN restricted to matching buckets (scan fraction ≈ 2^-bits)."""
    planes_ref = ray.put(_hyperplanes(dim, bits))
    return embeddings.map_batches(_Signature(planes_ref), batch_format="pyarrow")


class _BucketFilter:
    """Keep only rows whose LSH signature is in the candidate bucket set
    (signatures recomputed per batch against the broadcast hyperplanes —
    cheaper than shipping a bucket column through a join)."""

    def __init__(self, planes_ref, buckets_ref):
        self.planes_ref, self.buckets_ref = planes_ref, buckets_ref
        self._p = None
        self._b = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._p is None:
            self._p = ray.get(self.planes_ref)
            self._b = ray.get(self.buckets_ref)
        m = _to_matrix(t["embedding"])
        bits = (m @ self._p.T) > 0
        sig = np.zeros(m.shape[0], dtype=np.int64)
        for i in range(bits.shape[1]):
            sig |= bits[:, i].astype(np.int64) << i
        if self._b.size == 0:
            return t.slice(0, 0)
        pos = np.minimum(np.searchsorted(self._b, sig), self._b.size - 1)
        return t.filter(pa.array(self._b[pos] == sig))


def ann_topk_lsh(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    k: int = 5,
    *,
    bits: int = 8,
    hamming_probes: int = 1,
    round_to: int | None = 6,
) -> ray.data.Dataset:
    """Approximate cosine top-k: only vectors whose random-hyperplane LSH
    bucket is within `hamming_probes` bit flips of a query's bucket are
    scanned (multi-probe IVF-style; scan fraction ≈ (1+bits)/2^bits at one
    probe). Same output contract as ann_topk, approximate recall."""
    qids, qm = _take_queries(embeddings, query_ids)
    dim = qm.shape[1]
    planes = _hyperplanes(dim, bits)
    qbits = (qm @ planes.T) > 0
    qsig = np.zeros(qm.shape[0], dtype=np.int64)
    for i in range(bits):
        qsig |= qbits[:, i].astype(np.int64) << i
    cand: set[int] = set(int(s) for s in qsig)
    if hamming_probes >= 1:
        for s in list(cand):
            for b in range(bits):
                cand.add(s ^ (1 << b))
    if hamming_probes >= 2:
        for s in [int(x) for x in qsig]:
            for b1 in range(bits):
                for b2 in range(b1 + 1, bits):
                    cand.add(s ^ (1 << b1) ^ (1 << b2))
    planes_ref = ray.put(planes)
    buckets_ref = ray.put(np.array(sorted(cand), dtype=np.int64))
    q_ref = ray.put((qids, qm))
    partial = embeddings.map_batches(
        _BucketFilter(planes_ref, buckets_ref), batch_format="pyarrow"
    ).map_batches(_BatchTopK(q_ref, k), batch_format="pyarrow", batch_size=8192)
    return partial.groupby("qid").map_groups(
        named(_FinalTopK(k, round_to)), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------


class _NearDupPairs:
    """Emit (id_a, id_b, sim) for batch rows vs the broadcast matrix where
    rounded cosine >= threshold and batch_id < other_id (each unordered pair
    produced exactly once, self-pairs excluded). Rounding happens BEFORE the
    threshold compare so engine and SQL oracle agree on boundary pairs."""

    def __init__(self, ref, threshold, round_to, id_col):
        self.ref, self.t, self.r, self.id_col = ref, threshold, round_to, id_col
        self._all = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._all is None:
            self._all = ray.get(self.ref)
        all_ids, all_n = self._all
        bids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bm = _to_matrix(t["embedding"])
        bn = np.linalg.norm(bm, axis=1, keepdims=True)
        bn[bn == 0] = 1.0
        sims = (bm / bn) @ all_n.T  # (batch, N)
        if self.r is not None:
            sims = np.round(sims, self.r)
        mask = (sims >= self.t) & (bids[:, None] < all_ids[None, :])
        bi, aj = np.nonzero(mask)
        return pa.table(
            {
                "id_a": pa.array(bids[bi]),
                "id_b": pa.array(all_ids[aj]),
                "sim": pa.array(sims[bi, aj]),
            }
        )


def embedding_neardup(
    embeddings: ray.data.Dataset,
    threshold: float = 0.4,
    *,
    id_col: str = "vec_id",
    round_to: int | None = 6,
    max_exact_rows: int = 200_000,
) -> ray.data.Dataset:
    """(id_a, id_b, sim): all unordered pairs with cosine >= threshold.

    Under ``max_exact_rows`` this is the exact brute-force baseline: the
    normalized matrix is broadcast once (ray.put, zero-copy into every map
    task); each batch does one numpy matmul against it and emits only the
    matches, so shuffle volume is O(matches) while compute is O(N^2/P)
    spread across the pool. Above it the call auto-routes to
    embedding_neardup_lsh (ADVICE r3: the default a user reaches for first
    must not materialize the whole table on the driver) — every emitted
    pair is still exact-verified in-bucket, but recall is the banded-LSH
    probability rather than 1.0. Set max_exact_rows=0 to always take the
    LSH path, or a huge value to force exact."""
    n_rows = embeddings.count()
    if n_rows > max_exact_rows:
        dim = len(embeddings.take(1)[0]["embedding"])
        routed = embeddings.select_columns([id_col, "embedding"])
        if id_col != "vec_id":
            routed = routed.map_batches(
                lambda t: t.rename_columns(["vec_id", "embedding"]),
                batch_format="pyarrow",
            )
        return embedding_neardup_lsh(
            routed, threshold, dim=dim, round_to=round_to
        )
    rows = embeddings.select_columns([id_col, "embedding"]).take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    m = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    ref = ray.put((ids, m / norms))
    return embeddings.map_batches(
        _NearDupPairs(ref, threshold, round_to, id_col),
        batch_format="pyarrow",
        batch_size=4096,
    )


class _BandSig:
    """(bucket, vec_id, embedding) rows, one per band: bucket packs the
    band index above the band's r-bit hyperplane signature."""

    def __init__(self, planes_ref, bands, bits):
        self.planes_ref, self.bands, self.bits = planes_ref, bands, bits
        self._p = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._p is None:
            self._p = ray.get(self.planes_ref)  # (bands*bits, dim)
        m = _to_matrix(t["embedding"])
        allbits = (m @ self._p.T) > 0  # (n, bands*bits)
        outs = []
        for b in range(self.bands):
            sig = np.zeros(m.shape[0], dtype=np.int64)
            for i in range(self.bits):
                sig |= allbits[:, b * self.bits + i].astype(np.int64) << i
            outs.append(
                pa.table(
                    {
                        "bucket": pa.array((np.int64(b) << self.bits) | sig),
                        "vec_id": t["vec_id"],
                        "embedding": t["embedding"],
                    }
                )
            )
        return pa.concat_tables(outs)


class _BucketPairs:
    """All verified pairs within one LSH bucket, memory- and compute-safe
    for degenerate buckets (ADVICE r3: boilerplate corpora cluster
    near-identical vectors into ONE bucket — an uncapped n x n cosine
    matrix OOMs the worker):

    - representatives capped at ``cap`` (lowest ids, deterministic); the
      truncation is counted on the class and logged once per oversized
      bucket — never rely on uniform bucket fill.
    - the similarity matrix is computed in row blocks of ``block``
      (memory O(block x n), never O(n^2))."""

    truncated_buckets = 0  # per-actor counter, observable in tests

    def __init__(self, threshold, round_to, cap: int = 4096, block: int = 1024):
        self.t, self.r, self.cap, self.block = threshold, round_to, cap, block

    def __call__(self, g: pa.Table) -> pa.Table:
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.size > self.cap:
            import logging

            type(self).truncated_buckets += 1
            logging.getLogger(__name__).warning(
                "LSH bucket of %d vectors truncated to %d representatives",
                ids.size,
                self.cap,
            )
            keep = np.sort(np.argsort(ids)[: self.cap])
            g = g.take(pa.array(keep))
            ids = ids[keep]
        m = _to_matrix(g["embedding"])
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        mn = m / n
        out_a, out_b, out_s = [], [], []
        for s0 in range(0, ids.size, self.block):
            s1 = min(s0 + self.block, ids.size)
            sims = mn[s0:s1] @ mn.T  # (block, n)
            if self.r is not None:
                sims = np.round(sims, self.r)
            mask = (sims >= self.t) & (ids[s0:s1, None] < ids[None, :])
            ai, bj = np.nonzero(mask)
            out_a.append(ids[s0 + ai])
            out_b.append(ids[bj])
            out_s.append(sims[ai, bj])
        cat = (
            lambda parts, typ: pa.array(np.concatenate(parts))
            if parts
            else pa.array([], typ)
        )
        return pa.table(
            {
                "id_a": cat(out_a, pa.int64()),
                "id_b": cat(out_b, pa.int64()),
                "sim": cat(out_s, pa.float64()),
            }
        )


class _FirstPair:
    def __call__(self, g: pa.Table) -> pa.Table:
        return g.slice(0, 1)


def embedding_neardup_lsh(
    embeddings: ray.data.Dataset,
    threshold: float = 0.4,
    *,
    bands: int = 8,
    bits: int = 6,
    dim: int = 64,
    round_to: int | None = 6,
    seed: int = 7,
) -> ray.data.Dataset:
    """Approximate near-dup pairs, the 100-TB path: vectors sharing any
    band's r-bit random-hyperplane signature land in one bucket (groupby
    shuffle keyed on (band, signature)); exact cosine runs only inside
    buckets, and a final (id_a, id_b) groupby dedupes pairs found by
    several bands. Precision is exact (every emitted pair is verified);
    recall = 1 - (1 - p^bits)^bands with p = 1 - theta/pi. Shuffle volume
    is bands x the embedding data — the linear-amplification tradeoff that
    replaces O(N^2) compute."""
    planes_ref = ray.put(_hyperplanes(dim, bands * bits, seed))
    banded = embeddings.map_batches(
        _BandSig(planes_ref, bands, bits), batch_format="pyarrow"
    )
    pairs = banded.groupby("bucket").map_groups(
        named(_BucketPairs(threshold, round_to)), batch_format="pyarrow"
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        named(_FirstPair()), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# IVF (k-means inverted lists) scale path
# ---------------------------------------------------------------------------

_IVF_SCALE = float(np.int64(1) << 24)  # fixed-point accumulation quantum


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _init_centroids(n_clusters: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic, data-independent init: random unit vectors. No data
    pass, no sampling shuffle — Lloyd iterations pull them onto the data."""
    rng = np.random.RandomState(seed)
    return _normalize_rows(rng.normal(size=(n_clusters, dim)))


class _KmeansPartial:
    """Per-batch: assign rows to the max-cosine broadcast centroid and emit
    FIXED-POINT int64 partial sums + counts per cluster. Integer partials
    make the reduction exactly order-independent, so the fitted centroids
    are bit-identical run to run (and to the single-process oracle in
    oracle_truth.py) no matter how Ray splits or orders the blocks.
    int64 headroom: |x| <= 2^6 quantized at 2^24 holds ~2^33 rows per
    cluster per batch-partial and the combine sums per-batch partials, so
    overflow needs > ~1.4e13 rows in ONE cluster."""

    def __init__(self, cents_ref):
        self.cents_ref = cents_ref
        self._c = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._c is None:
            self._c = ray.get(self.cents_ref)  # normalized (k, dim)
        m = _to_matrix(t["embedding"])
        assign = np.argmax(_normalize_rows(m) @ self._c.T, axis=1)
        q = np.round(m * _IVF_SCALE).astype(np.int64)
        k = self._c.shape[0]
        sums = np.zeros((k, m.shape[1]), dtype=np.int64)
        np.add.at(sums, assign, q)
        cnt = np.bincount(assign, minlength=k).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "cluster": pa.array(nz.astype(np.int64)),
                "qsum": pa.array(list(sums[nz])),
                "n": pa.array(cnt[nz]),
            }
        )


class _KmeansCombine:
    """Exact int64 reduction of one cluster's partials → a single row."""

    def __call__(self, g: pa.Table) -> pa.Table:
        qs = np.stack(
            [np.asarray(x, dtype=np.int64) for x in g["qsum"].to_pylist()]
        )
        return pa.table(
            {
                "cluster": g["cluster"].slice(0, 1),
                "qsum": pa.array([qs.sum(axis=0)]),
                "n": pa.array(
                    [int(g["n"].to_numpy(zero_copy_only=False).sum())], pa.int64()
                ),
            }
        )


def kmeans_fit(
    embeddings: ray.data.Dataset,
    n_clusters: int = 16,
    *,
    iters: int = 5,
    seed: int = 7,
    dim: int | None = None,
) -> np.ndarray:
    """Distributed spherical-k-means (Lloyd) fit; returns (k, dim) float64
    centroids (unnormalized means).

    Each iteration is one streaming map_batches pass emitting per-batch
    per-cluster fixed-point partials (k x dim ints per batch, independent
    of batch rows), a groupby('cluster') combine of those partials, and a
    k-row take — the data never moves, only O(k * dim * num_batches)
    integers shuffle per iteration. Empty clusters keep their previous
    centroid (deterministic).

    Known limitation: the fixed-point sums make the REDUCTION exactly
    order-independent, but cluster ASSIGNMENT is an argmax over float
    dot products — a row whose two best centroids tie within a few ulps
    can assign differently under a different BLAS build (dgemm vs dgemv
    accumulation order). Within one build the fit is bit-reproducible
    (asserted in tests); cross-build reproducibility holds unless such
    a near-tie exists in the data."""
    if dim is None:
        dim = len(embeddings.take(1)[0]["embedding"])
    cents = _init_centroids(n_clusters, dim, seed)
    for _ in range(iters):
        ref = ray.put(_normalize_rows(cents))
        combined = (
            embeddings.map_batches(_KmeansPartial(ref), batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(named(_KmeansCombine()), batch_format="pyarrow")
            .take_all()
        )
        new = cents.copy()
        for row in combined:
            c = int(row["cluster"])
            n = int(row["n"])
            if n > 0:
                new[c] = np.asarray(row["qsum"], dtype=np.int64) / (
                    _IVF_SCALE * n
                )
        cents = new
    return cents


class _IVFFilter:
    """Keep rows whose nearest-centroid inverted list is probed (assignment
    recomputed per batch against the broadcast centroids — cheaper than
    shipping an assignment column through a join)."""

    def __init__(self, cents_ref, lists_ref):
        self.cents_ref, self.lists_ref = cents_ref, lists_ref
        self._c = None
        self._l = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._c is None:
            self._c = ray.get(self.cents_ref)
            self._l = ray.get(self.lists_ref)
        m = _to_matrix(t["embedding"])
        assign = np.argmax(_normalize_rows(m) @ self._c.T, axis=1)
        return t.filter(pa.array(np.isin(assign, self._l)))


def _take_queries(embeddings: ray.data.Dataset, query_ids) -> tuple[np.ndarray, np.ndarray]:
    wanted = np.array(sorted(int(i) for i in query_ids), dtype=np.int64)

    def _pick(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, wanted)))

    q = embeddings.map_batches(_pick, batch_format="pyarrow").take_all()
    qids = np.array([r["vec_id"] for r in q], dtype=np.int64)
    qm = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in q])
    order = np.argsort(qids)
    return qids[order], qm[order]


def ann_topk_ivf(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    k: int = 5,
    *,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    seed: int = 7,
    round_to: int | None = 6,
) -> ray.data.Dataset:
    """Approximate cosine top-k via IVF: a k-means fit partitions vectors
    into inverted lists; each query scans only its `nprobe` nearest lists
    (scan fraction ≈ nprobe/n_clusters on balanced data). Same output
    contract as ann_topk; recall < 1 when a true neighbor's list is not
    probed. nprobe >= n_clusters degenerates to exact brute force."""
    cents = kmeans_fit(
        embeddings, n_clusters, iters=iters, seed=seed
    )
    cn = _normalize_rows(cents)
    qids, qm = _take_queries(embeddings, query_ids)
    qsims = _normalize_rows(qm) @ cn.T  # (q, k_clusters)
    npb = min(nprobe, n_clusters)
    # stable sort: exact ties at the nprobe boundary resolve by cluster
    # index, matching the single-process oracle's selection
    probe = np.unique(
        np.argsort(-qsims, axis=1, kind="stable")[:, :npb].ravel()
    ).astype(np.int64)
    cents_ref = ray.put(cn)
    lists_ref = ray.put(probe)
    q_ref = ray.put((qids, qm))
    partial = embeddings.map_batches(
        _IVFFilter(cents_ref, lists_ref), batch_format="pyarrow"
    ).map_batches(_BatchTopK(q_ref, k), batch_format="pyarrow", batch_size=8192)
    return partial.groupby("qid").map_groups(
        named(_FinalTopK(k, round_to)), batch_format="pyarrow"
    )


class _AssignList:
    """Append the nearest-centroid inverted-list id as a column."""

    def __init__(self, cents_ref):
        self.cents_ref = cents_ref
        self._c = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._c is None:
            self._c = ray.get(self.cents_ref)
        m = _to_matrix(t["embedding"])
        assign = np.argmax(_normalize_rows(m) @ self._c.T, axis=1)
        return t.append_column("list", pa.array(assign.astype(np.int64)))


def ivf_index_write(
    embeddings: ray.data.Dataset,
    index_dir: str,
    *,
    n_clusters: int = 64,
    iters: int = 5,
    seed: int = 7,
) -> np.ndarray:
    """Build an on-disk IVF index: fit k-means, then write the vectors as
    Parquet PARTITIONED BY inverted list (one directory per list). This is
    the 100-TB search layout — a probe then prunes at the READ and touches
    only nprobe/n_clusters of the bytes, instead of streaming the whole
    table through a filter (the in-situ ann_topk_ivf path saves matmul but
    still reads every block; at scan-bound shapes that saves nothing).
    Returns the fitted centroids; they are also persisted to
    <index_dir>/centroids.parquet so searches can open the index cold."""
    import os

    cents = kmeans_fit(embeddings, n_clusters, iters=iters, seed=seed)
    cents_ref = ray.put(_normalize_rows(cents))
    # sort by list before the partitioned write: ONE range shuffle
    # co-locates each inverted list into a handful of contiguous files
    # (without it every (block x list) pair writes its own tiny file and
    # a probe pays thousands of file opens). This shuffle IS the index
    # build cost — paid once, amortized over every search.
    embeddings.map_batches(
        _AssignList(cents_ref), batch_format="pyarrow"
    ).sort("list").write_parquet(index_dir, partition_cols=["list"])
    pq_path = os.path.join(index_dir, "centroids.parquet")
    import pyarrow.parquet as pqt

    pqt.write_table(
        pa.table(
            {
                "cluster": pa.array(np.arange(cents.shape[0], dtype=np.int64)),
                "centroid": pa.array(list(cents)),
            }
        ),
        pq_path,
    )
    return cents


def ann_topk_ivf_indexed(
    index_dir: str,
    qids: np.ndarray,
    qm: np.ndarray,
    k: int = 5,
    *,
    nprobe: int = 8,
    round_to: int | None = 6,
    stats_out: dict | None = None,
) -> ray.data.Dataset:
    """Search an ivf_index_write index: read ONLY the nprobe nearest
    inverted-list partitions per query (union across queries) — IO is
    pruned at the read, the unprobed partitions never leave storage.
    Query vectors are passed directly (qids, qm) — at 100 TB the query
    side is tiny and never requires scanning the index. Output contract
    matches ann_topk (self-matches excluded via qid != nid).

    Read pruning is a SERVING-regime win: the probe union grows with
    q * nprobe, so a large batched query set saturates every list and
    degenerates to a full scan (use the in-situ ann_topk_ivf there —
    it prunes compute instead). If `stats_out` is given, it is filled
    with probed/total file counts and bytes so callers can report the
    measured read fraction."""
    import os

    import pyarrow.parquet as pqt

    ct = pqt.read_table(os.path.join(index_dir, "centroids.parquet"))
    order = np.argsort(ct["cluster"].to_numpy(zero_copy_only=False))
    cents = np.stack(
        [np.asarray(c, dtype=np.float64) for c in ct["centroid"].to_pylist()]
    )[order]
    cn = _normalize_rows(cents)
    qids = np.asarray(qids, dtype=np.int64)
    qm = np.asarray(qm, dtype=np.float64)
    qsims = _normalize_rows(qm) @ cn.T
    npb = min(nprobe, cn.shape[0])
    probe = np.unique(
        np.argsort(-qsims, axis=1, kind="stable")[:, :npb].ravel()
    )
    probe_set = {int(c) for c in probe}
    paths = []
    if stats_out is not None:
        stats_out.update(
            {"files_probed": 0, "files_total": 0, "bytes_probed": 0, "bytes_total": 0}
        )
    for entry in sorted(os.listdir(index_dir)):
        d = os.path.join(index_dir, entry)
        if not (entry.startswith("list=") and os.path.isdir(d)):
            continue
        files = [
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
        probed = int(entry.split("=", 1)[1]) in probe_set
        if probed:
            paths.extend(files)
        if stats_out is not None:
            nbytes = sum(os.path.getsize(f) for f in files)
            stats_out["files_total"] += len(files)
            stats_out["bytes_total"] += nbytes
            if probed:
                stats_out["files_probed"] += len(files)
                stats_out["bytes_probed"] += nbytes
    if not paths:
        return ray.data.from_arrow(
            pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "nid": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        )
    ds = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    q_ref = ray.put((qids, qm))
    partial = ds.map_batches(
        _BatchTopK(q_ref, k), batch_format="pyarrow", batch_size=8192
    )
    return partial.groupby("qid").map_groups(
        named(_FinalTopK(k, round_to)), batch_format="pyarrow"
    )


def embedding_centroids(embeddings: ray.data.Dataset, label_col: str = "label") -> ray.data.Dataset:
    """(label, centroid list<double>, n): mean embedding per label —
    per-batch partial sums, one tiny combine."""

    def _partial(t: pa.Table) -> pa.Table:
        m = _to_matrix(t["embedding"])
        labels = t[label_col].to_numpy(zero_copy_only=False)
        ul, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((ul.size, m.shape[1]))
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv)
        return pa.table(
            {
                "label": pa.array(ul.astype(np.int64)),
                "vsum": pa.array(list(sums)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    partial = embeddings.map_batches(_partial, batch_format="pyarrow")

    class _Combine:
        def __call__(self, g: pa.Table) -> pa.Table:
            lab = int(g["label"][0].as_py())
            vs = _to_matrix(g["vsum"])
            n = g["n"].to_numpy(zero_copy_only=False).sum()
            centroid = vs.sum(axis=0) / n
            return pa.table(
                {
                    "label": pa.array([lab], pa.int64()),
                    "centroid": pa.array([np.round(centroid, 6).tolist()]),
                    "n": pa.array([int(n)], pa.int64()),
                }
            )

    return partial.groupby("label").map_groups(named(_Combine()), batch_format="pyarrow")
