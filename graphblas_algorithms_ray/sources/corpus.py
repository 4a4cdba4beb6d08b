"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

Everything is a pure function of (seed, doc_id) via a vectorizable xorshift64
— no wall clock, no external data — so the extraction pipeline can be tested
against the generator's ground-truth edge list, and the ``text`` column
pass-through can be checked byte-identical per url (the north-rule per-row
invariant).

Link structure (exercises every PageRank corner case,
``pagerank_alg.py:62-75``):
  * out-degree ~ zipf-like, capped at 64; ~5% of docs have NO out-links
    (dangling vertices)
  * doc 0 is linked by every 10th page (hub → combine-side skew)
  * every 100th doc injects a self-link and a duplicate link (edge-dedup and
    self-edge ``+``/``-`` semantics)
  * targets(doc_id) = (doc_id * 31 + j * 17) % n_docs for j = 0..deg-1
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

SEED = 42
HOST_DIV = 50  # n_hosts = n_docs // HOST_DIV (min 1)
TS0_US = 1704067200_000_000  # 2024-01-01T00:00:00Z in microseconds


def _xorshift64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x << np.uint64(13)
    x ^= x >> np.uint64(7)
    x ^= x << np.uint64(17)
    return x


def doc_rng(doc_ids: np.ndarray, salt: int = 0) -> np.ndarray:
    """One deterministic uint64 per doc (mod-2^64 arithmetic intended)."""
    with np.errstate(over="ignore"):
        return _xorshift64(
            doc_ids.astype(np.uint64)
            + np.uint64(SEED) * np.uint64(0x9E3779B97F4A7C15)
            + np.uint64(salt) * np.uint64(0xBF58476D1CE4E5B9)
            + np.uint64(1)
        )


def url_of(doc_id: int, n_docs: int) -> str:
    n_hosts = max(1, n_docs // HOST_DIV)
    return f"https://host{doc_id % n_hosts:04d}.example/p/{doc_id:06d}"


def out_degree(doc_ids: np.ndarray, density: int = 1) -> np.ndarray:
    """Zipf-like out-degree, capped 64·density; doc_id % 20 == 7 → 0
    (dangling). ``density`` scales the link count per page (density 1 ≈ 1.9
    links/page after dedup — the sparse test profile; real web pages carry
    tens of links, so the scaling bench uses density 16-32)."""
    r = doc_rng(doc_ids, salt=1)
    u = (r >> np.uint64(11)).astype(np.float64) / float(1 << 53)  # [0,1)
    deg = np.minimum(64, np.maximum(1, (1.5 / np.maximum(u, 1e-12) ** 0.6)).astype(np.int64))
    deg = np.minimum(deg, 64) * int(density)
    deg[doc_ids % 20 == 7] = 0
    return deg


def targets_of(doc_id: int, n_docs: int, density: int = 1) -> list[int]:
    """Ground-truth out-link targets INCLUDING injected dups/self-links
    (in document order, pre-dedup)."""
    deg = int(out_degree(np.array([doc_id]), density)[0])
    t = [(doc_id * 31 + j * 17) % n_docs for j in range(deg)]
    if doc_id % 10 == 3:  # hub: every 10th page links doc 0
        t.append(0)
    if doc_id % 100 == 42 and deg > 0:  # self + duplicate injection
        t.append(doc_id)
        t.append(t[0])
    return t


def text_of(doc_id: int) -> str:
    r = int(doc_rng(np.array([doc_id]), salt=2)[0])
    k = 20 + (r % 30)
    toks, state = [], r
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        toks.append(f"w{state % 5000:04d}")
    return f"page {doc_id} " + " ".join(toks)


def html_of(doc_id: int, n_docs: int, text: str, density: int = 1) -> bytes:
    anchors = "".join(
        f'<a href="{url_of(t, n_docs)}">t</a>'
        for t in targets_of(doc_id, n_docs, density)
    )
    return (
        f"<html><head><title>d{doc_id}</title></head><body>{text}{anchors}</body></html>"
    ).encode("utf-8")


def lang_of(doc_ids: np.ndarray) -> np.ndarray:
    out = np.full(doc_ids.shape, "en", dtype=object)
    out[doc_ids % 40 == 11] = "de"
    out[doc_ids % 40 == 31] = "fr"
    return out


class _GenBatch:
    def __init__(self, n_docs: int, density: int = 1):
        self.n_docs = n_docs
        self.density = density

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = self.n_docs
        urls = [url_of(int(i), n) for i in ids]
        texts = [text_of(int(i)) for i in ids]
        htmls = [html_of(int(i), n, tx, self.density) for i, tx in zip(ids, texts)]
        ts = (TS0_US + ids * 1_000_000).astype("datetime64[us]")
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(lang_of(ids), pa.string()),
            }
        )


def corpus_dataset(n_docs: int, density: int = 1) -> ray.data.Dataset:
    """Generate the corpus as a streaming Dataset (no materialization)."""
    blocks = max(1, min(n_docs // 2000, 256))
    return ray.data.range(n_docs, override_num_blocks=blocks).map_batches(
        _GenBatch(n_docs, density), batch_format="pyarrow", batch_size=4096
    )


def corpus_parquet(n_docs: int, root: str = "/tmp/gar/corpus", density: int = 1) -> str:
    """Generate (once) and cache the corpus parquet dir for n_docs."""
    suffix = f"n{n_docs}" if density == 1 else f"n{n_docs}_d{density}"
    path = os.path.join(root, suffix)
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        os.makedirs(path, exist_ok=True)
        corpus_dataset(n_docs, density).write_parquet(path)
        with open(done, "w") as f:
            f.write("ok")
    return path


def ground_truth_edges(n_docs: int) -> set[tuple[int, int]]:
    """Deduped (src_doc, dst_doc) ground truth for extraction tests."""
    out = set()
    for d in range(n_docs):
        for t in targets_of(d, n_docs):
            out.add((d, t))
    return out


def ground_truth_parquet(n_docs: int, root: str = "/tmp/gar/truth") -> str:
    """Export the generator's ground truth (docs + raw link targets) as
    parquet for the DuckDB oracle side of the corpus queries.

    Pure generator arithmetic — independent of the extraction pipeline
    under test. docs.parquet: (doc_id, url, text); edges.parquet:
    (src, dst) doc-id pairs INCLUDING injected dups/self-links (the SQL
    dedups with DISTINCT, mirroring the engine's edge dedup)."""
    import pyarrow.parquet as pq

    path = os.path.join(root, f"n{n_docs}")
    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    ids = np.arange(n_docs, dtype=np.int64)
    docs = pa.table(
        {
            "doc_id": pa.array(ids),
            "url": pa.array([url_of(int(i), n_docs) for i in ids], pa.string()),
            "text": pa.array([text_of(int(i)) for i in ids], pa.string()),
        }
    )
    pq.write_table(docs, os.path.join(path, "docs.parquet"))
    src, dst = [], []
    for d in range(n_docs):
        for t in targets_of(d, n_docs):
            src.append(d)
            dst.append(t)
    edges = pa.table(
        {
            "src": pa.array(np.asarray(src, dtype=np.int64)),
            "dst": pa.array(np.asarray(dst, dtype=np.int64)),
        }
    )
    pq.write_table(edges, os.path.join(path, "edges.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return path


def read_corpus(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a corpus parquet dir with read-task blocks sized to the CPU
    budget instead of one-task-per-file: small-file dirs (the write side
    shards freely) otherwise pay ~25 ms of task overhead per file, which
    dominates pruned reads. Pass ``columns`` to prune at the read."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    if n_files <= cpus * 2:
        # few (possibly large) files: let the default planner split by
        # row group — overriding here would serialize big-file reads
        return ray.data.read_parquet(path, columns=columns)
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=cpus * 2
    )
