"""Query registry + DuckDB oracle SQL — the driver's correctness contract.

Every implemented operator gets BOTH a ``queries()`` callable (Ray pipeline
over the sf_dir parquet tables) and, when SQL-expressible, an
``oracle_sql()`` ANSI-SQL string producing the SAME column names and value
representations (iterative kernels are unrolled to a fixed superstep count
on both sides so the comparison is exact).

The canonical graph for SQL-checkable graph queries is derived from
lineitem: ``src = l_orderkey % 937``, ``dst = l_partkey % 937`` (DISTINCT)
over the dense vertex universe 0..936 — deterministic, dense enough to have
triangles/reciprocity/dangling vertices, and expressible identically in SQL.

Float discipline (drives hash-matching):
  * single divisions of exact integers → emitted raw (bit-identical);
  * reordered float sums (pagerank, window sums, cosine) → rounded on both
    sides (8/6 dp) with identical operand expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

M = 937  # vertex universe of the lineitem-derived graph
ALPHA = 0.85
PR_ITERS = 10
LPA_ITERS = 5

_graph_cache: dict = {}


def _lineitem_edges_ds(sf_dir: str):
    import ray.data

    def _mod(t: pa.Table) -> pa.Table:
        o = t["l_orderkey"].to_numpy(zero_copy_only=False)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array((o % M).astype(np.int64)),
                "dst": pa.array((p % M).astype(np.int64)),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(_mod, batch_format="pyarrow")


def lineitem_graph(sf_dir: str, directed: bool = True):
    """The canonical derived graph, cached per (sf_dir, directed)."""
    from .state.graph import Graph

    key = (sf_dir, directed)
    if key not in _graph_cache:
        g = Graph(
            _lineitem_edges_ds(sf_dir),
            n=M,
            directed=directed,
            num_parts=8,
            name=f"li_{'d' if directed else 'u'}_{abs(hash(sf_dir)) % 10**8}",
        )
        g._ensure_built()
        _graph_cache[key] = g
    return _graph_cache[key]


def _docs(sf_dir, columns=None):
    """documents table, PRUNED AT THE READ: Ray 2.49 does not push a
    later select_columns into ReadParquet (the plan keeps a separate
    Project operator), so every query passes exactly the columns it
    consumes — a lang/n_chars aggregate must not pay for the dominant
    `text` column leaving storage."""
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _events(sf_dir, columns=None):
    """events table, pruned at the read (same Ray 2.49 rationale): the
    window/session/attribution queries never touch `props`."""
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


_EXPECTED_DIR = "/tmp/gar/expected/sf0.01"  # driver correctness scale


def _scalar_df(**cols) -> pd.DataFrame:
    return pd.DataFrame({k: [v] for k, v in cols.items()})


# ---------------------------------------------------------------------------
# Ray-side query callables
# ---------------------------------------------------------------------------


def q_edges(sf_dir):
    return lineitem_graph(sf_dir).edges_ds()


def q_out_degree(sf_dir):
    ds = lineitem_graph(sf_dir).degrees_ds("out")
    return ds.map_batches(
        lambda t: pa.table({"v": t["v"], "out_degree": t["degree"]}),
        batch_format="pyarrow",
    )


def q_in_degree(sf_dir):
    ds = lineitem_graph(sf_dir).degrees_ds("in")
    return ds.map_batches(
        lambda t: pa.table({"v": t["v"], "in_degree": t["degree"]}),
        batch_format="pyarrow",
    )


def q_degree_centrality(sf_dir):
    from .pipelines.centrality import degree_centrality

    return degree_centrality(lineitem_graph(sf_dir), mode="total")


def q_pagerank(sf_dir):
    from .pipelines.pagerank import pagerank

    pr = pagerank(
        lineitem_graph(sf_dir),
        alpha=ALPHA,
        max_iter=PR_ITERS,
        tol=0.0,  # fixed-iteration mode: never converges early
        chain=PR_ITERS,  # all 10 supersteps in ONE Ray Data job
        raise_on_failure=False,
    )
    return pr.map_batches(
        lambda t: pa.table(
            {
                "v": t["v"],
                "pagerank": pa.array(
                    np.round(t["pagerank"].to_numpy(zero_copy_only=False), 8)
                ),
            }
        ),
        batch_format="pyarrow",
    )


def q_components(sf_dir):
    from .pipelines.components import connected_components

    return connected_components(lineitem_graph(sf_dir, directed=False))


def q_lpa(sf_dir):
    from .pipelines.label_prop import label_propagation

    return label_propagation(lineitem_graph(sf_dir, directed=False), max_iter=LPA_ITERS)


def q_triangles(sf_dir):
    from .pipelines.triangles import triangles

    return triangles(lineitem_graph(sf_dir, directed=False))


def q_total_triangles(sf_dir):
    from .pipelines.triangles import total_triangles

    return _scalar_df(total_triangles=int(total_triangles(lineitem_graph(sf_dir, directed=False))))


def q_transitivity(sf_dir):
    from .pipelines.triangles import total_triangles, _degree_sq_sum

    g = lineitem_graph(sf_dir, directed=False)
    denom = _degree_sq_sum(g)
    t = total_triangles(g)
    val = 6.0 * t / denom if denom else 0.0
    return _scalar_df(transitivity=float(val))


def q_clustering(sf_dir):
    from .pipelines.triangles import clustering

    return clustering(lineitem_graph(sf_dir, directed=False))


def q_reciprocity_per_node(sf_dir):
    from .pipelines.structure import reciprocity

    return reciprocity(lineitem_graph(sf_dir))


def q_reciprocity(sf_dir):
    from .pipelines.structure import overall_reciprocity

    return _scalar_df(reciprocity=float(overall_reciprocity(lineitem_graph(sf_dir))))


def q_isolates(sf_dir):
    from .pipelines.structure import isolates

    # materialize with an explicit schema: an all-empty Dataset loses its
    # column names through to_pandas, breaking the schema comparison
    rows = isolates(lineitem_graph(sf_dir)).take_all()
    return pd.DataFrame({"v": pd.Series([r["v"] for r in rows], dtype="int64")})


def q_s_metric(sf_dir):
    from .pipelines.structure import s_metric

    return _scalar_df(s_metric=float(s_metric(lineitem_graph(sf_dir, directed=False))))


def q_cut_metrics(sf_dir):
    from .pipelines.structure import cut_metrics

    m = cut_metrics(lineitem_graph(sf_dir), lambda v: v % 7 == 0)
    return _scalar_df(**m)


def q_community_edges(sf_dir):
    from .pipelines.structure import community_edge_counts

    m = community_edge_counts(lineitem_graph(sf_dir), lambda v: v % 5)
    return _scalar_df(**m)


def q_doc_dedup(sf_dir):
    from .pipelines.text import exact_dedup

    return exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


def q_doc_fingerprint(sf_dir):
    from .pipelines.text import doc_fingerprint

    return doc_fingerprint(_docs(sf_dir, ["doc_id", "text"]))


def q_token_stats(sf_dir):
    from .pipelines.text import token_stats

    return token_stats(_docs(sf_dir, ["doc_id", "text"]))


def q_quality(sf_dir):
    from .pipelines.text import quality_score

    return quality_score(_docs(sf_dir, ["doc_id", "text"]))


def q_lang_distribution(sf_dir):
    from .pipelines.text import lang_distribution

    return lang_distribution(_docs(sf_dir, ["lang"]))


def q_word_topk(sf_dir):
    from .pipelines.text import word_topk

    return word_topk(_docs(sf_dir, ["text"]), k=20)


def q_top_docs_per_lang(sf_dir):
    from .pipelines.text import top_docs_per_lang

    return top_docs_per_lang(_docs(sf_dir, ["doc_id", "lang", "n_chars"]), k=3)


def q_median_chars_by_lang(sf_dir):
    from .pipelines.text import median_chars_by_lang

    return median_chars_by_lang(_docs(sf_dir, ["lang", "n_chars"]))


def q_tfidf_topk(sf_dir):
    from .pipelines.text import tfidf_topk

    return tfidf_topk(_docs(sf_dir, ["doc_id", "text"]), k=3)


def q_bigram_topk(sf_dir):
    from .pipelines.text import bigram_topk

    return bigram_topk(_docs(sf_dir, ["text"]), k=20)


def q_curation(sf_dir):
    from .pipelines.text import curate

    return curate(_docs(sf_dir, ["doc_id", "text", "lang"]))


def q_length_quantiles(sf_dir):
    from .pipelines.text import length_quantiles_by_lang

    return length_quantiles_by_lang(_docs(sf_dir, ["lang", "n_chars"]))


def q_assign_splits(sf_dir):
    from .pipelines.text import assign_splits

    return assign_splits(_docs(sf_dir, ["doc_id"]))


def q_events_hourly(sf_dir):
    import ray.data
    from .pipelines.events import hourly_windows

    return hourly_windows(_events(sf_dir, ["ts", "event_type", "value"]))


def q_sessions(sf_dir):
    import ray.data
    from .pipelines.events import sessionize

    return sessionize(_events(sf_dir, ["event_id", "ts", "user_id"]))


def q_sliding_windows(sf_dir):
    import ray.data
    from .pipelines.events import sliding_windows

    return sliding_windows(_events(sf_dir, ["ts", "event_type", "value"]))


def q_purchase_attribution(sf_dir):
    import ray.data
    from .pipelines.events import purchase_attribution

    return purchase_attribution(_events(sf_dir, ["event_id", "ts", "user_id", "event_type"]))


def q_ann_topk(sf_dir):
    import ray.data
    from .pipelines.ann import ann_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return ann_topk(emb, query_ids=[0, 1, 2], k=5, round_to=6)


def q_centroids(sf_dir):
    import ray.data
    from .pipelines.ann import embedding_centroids

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_centroids(emb)


def q_embedding_neardup(sf_dir):
    import ray.data
    from .pipelines.ann import embedding_neardup

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup(emb, threshold=0.4, round_to=6)


def q_bfs_levels(sf_dir):
    from .pipelines.traversal import bfs_levels

    return bfs_levels(lineitem_graph(sf_dir), 0)


def q_bellman_ford(sf_dir):
    import ray.data
    from .state.graph import Graph
    from .pipelines.shortest_paths import bellman_ford_path_length

    def _mod(t: pa.Table) -> pa.Table:
        o = t["l_orderkey"].to_numpy(zero_copy_only=False)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "src": pa.array((o % M).astype(np.int64)),
                "dst": pa.array((p % M).astype(np.int64)),
                "weight": pa.array(q),
            }
        )

    key = (sf_dir, "weighted")
    if key not in _graph_cache:
        ds = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey", "l_quantity"],
        ).map_batches(_mod, batch_format="pyarrow")
        g = Graph(ds, n=M, directed=True, weighted=True, dup="min", num_parts=8)
        g._ensure_built()
        _graph_cache[key] = g
    return bellman_ford_path_length(_graph_cache[key], 0)


def q_edge_support(sf_dir):
    from .pipelines.core import edge_support

    return edge_support(lineitem_graph(sf_dir, directed=False))


def q_generalized_degree(sf_dir):
    from .pipelines.core import generalized_degree

    return generalized_degree(lineitem_graph(sf_dir, directed=False))


K_TRUSS_ROUNDS = 8
HITS_ITERS = 12  # fixed-iteration oracle runs (tol=0, raise_on_failure=False)
EIG_ITERS = 24   # supersteps run = EIG_ITERS + 1 (see eigenvector loop)
KATZ_ITERS = 20


def q_k_truss(sf_dir):
    from .pipelines.core import k_truss

    g = k_truss(lineitem_graph(sf_dir, directed=False), 4, max_rounds=K_TRUSS_ROUNDS)

    def _canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        m = s < d
        return pa.table({"src": pa.array(s[m]), "dst": pa.array(d[m])})

    return g.edges_ds().map_batches(_canon, batch_format="pyarrow")


def q_hits(sf_dir):
    from .pipelines.link_analysis import hits

    h, a = hits(lineitem_graph(sf_dir), max_iter=HITS_ITERS, tol=0.0, raise_on_failure=False)
    hp = h.to_pandas().sort_values("v").reset_index(drop=True)
    ap = a.to_pandas().sort_values("v").reset_index(drop=True)
    hp["authority"] = ap["authority"]
    hp["hub"] = np.round(hp["hub"], 8)
    hp["authority"] = np.round(hp["authority"], 8)
    return hp


def q_eigenvector(sf_dir):
    from .pipelines.link_analysis import eigenvector_centrality

    df = (
        eigenvector_centrality(
            lineitem_graph(sf_dir, directed=False),
            max_iter=EIG_ITERS,
            tol=0.0,
            raise_on_failure=False,
        )
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    df["centrality"] = np.round(df["centrality"], 8)
    return df


def q_katz(sf_dir):
    from .pipelines.link_analysis import katz_centrality

    df = (
        katz_centrality(
            lineitem_graph(sf_dir),
            alpha=0.005,
            max_iter=KATZ_ITERS,
            tol=0.0,
            raise_on_failure=False,
        )
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    df["centrality"] = np.round(df["centrality"], 8)
    return df


def _oracle_side_table(writer, sf_dir, *args, **kw):
    """Run a single-process oracle writer and FAIL LOUDLY when its output
    cannot back the pinned oracle SQL (ADVICE r4): the writers decline
    above _MAX_ORACLE_ROWS, and ORACLE_SQL reads the driver-scale pinned
    path — silently proceeding would compare the engine against a stale
    or absent expected table."""
    import os

    path = writer(sf_dir, *args, **kw)
    if path is None:
        raise RuntimeError(
            f"{writer.__name__} declined: {sf_dir} exceeds the "
            "single-process oracle cap (_MAX_ORACLE_ROWS); this query's "
            "hash oracle is only defined at the driver correctness scale"
        )
    if os.path.dirname(path) != _EXPECTED_DIR:
        raise RuntimeError(
            f"{writer.__name__} wrote {path}, but the pinned oracle SQL "
            f"reads {_EXPECTED_DIR} — correctness comparison would be "
            "cross-scale; run at the driver scale (sf0.01)"
        )
    return path


def q_minhash_groups(sf_dir):
    from .oracle_truth import write_minhash_groups_expected
    from .pipelines.dedup import minhash_near_duplicates

    _oracle_side_table(write_minhash_groups_expected, sf_dir, threshold=0.7)
    _, groups = minhash_near_duplicates(_docs(sf_dir, ["doc_id", "text"]), threshold=0.7)
    return groups


def q_ann_topk_lsh(sf_dir):
    import ray.data

    from .oracle_truth import write_ann_topk_lsh_expected
    from .pipelines.ann import ann_topk_lsh

    _oracle_side_table(
        write_ann_topk_lsh_expected, sf_dir, [0, 1, 2], k=5, bits=6, hamming_probes=2
    )
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return ann_topk_lsh(emb, [0, 1, 2], k=5, bits=6, hamming_probes=2)


def q_stratified_sample(sf_dir):
    """Deterministic 20-per-language sample by Knuth-hash order — the
    reproducible stratified subset an LLM pipeline pins for eval/inspection
    (pipelines/text.stratified_sample; pre-prune + tiny shuffle)."""
    from .pipelines.text import stratified_sample

    return stratified_sample(_docs(sf_dir, ["doc_id", "lang"]), n=20)


def q_source_quota_sample(sf_dir):
    """Per-domain quota capping (C4-style "at most n docs per domain"):
    stratified_sample re-keyed on the source column."""
    from .pipelines.text import stratified_sample

    return stratified_sample(
        _docs(sf_dir, ["doc_id", "source"]), n=10, group_col="source"
    )


def q_host_stats(sf_dir):
    """Per-host aggregates over the synthetic web corpus (pages with real
    urls) — oracled against the corpus generator's ground-truth table."""
    import ray.data

    from .pipelines.text import host_stats
    from .sources.corpus import corpus_parquet, ground_truth_parquet

    n_docs = _corpus_n_docs(sf_dir)
    ground_truth_parquet(n_docs)  # oracle side table
    pages = ray.data.read_parquet(corpus_parquet(n_docs), columns=["url", "text"])
    return host_stats(pages)


def q_truncate_tokens(sf_dir):
    from .pipelines.text import truncate_tokens

    return truncate_tokens(_docs(sf_dir, ["doc_id", "text"]), max_tokens=24)


def q_mix_sample(sf_dir):
    """Mixture resampling toward target weights en=.4 de=.3 fr=.3 at half
    the corpus size — deterministic per-group hash subsample, no shuffle."""
    from .pipelines.text import mix_sample

    return mix_sample(
        _docs(sf_dir, ["doc_id", "lang"]),
        {"en": 0.4, "de": 0.3, "fr": 0.3},
        frac=0.5,
    )


def q_pack_shards(sf_dir):
    """Deterministic training-export packing: docs in Knuth-hash order cut
    into ~20k-char shards via a distributed exclusive prefix sum."""
    from .pipelines.text import pack_shards

    return pack_shards(_docs(sf_dir, ["doc_id", "n_chars"]), budget=20_000)


def q_url_normalize(sf_dir):
    """URL canonicalization over the corpus urls, made non-degenerate by a
    deterministic 'mess' pass that the SQL oracle replicates before both
    sides normalize. The variants key on the ascii code of the url's LAST
    character (the urls end in a per-row serial digit — length would be
    constant across the generated corpus and exercise only one branch,
    review r5): c%3==0 appends '#ref', c%2==1 uppercases the whole url,
    c%5==0 appends a trailing '/'."""
    import pyarrow.compute as pc
    import ray.data

    from .pipelines.text import normalize_urls
    from .sources.corpus import corpus_parquet, ground_truth_parquet

    n_docs = _corpus_n_docs(sf_dir)
    ground_truth_parquet(n_docs)  # oracle side table
    pages = ray.data.read_parquet(corpus_parquet(n_docs), columns=["url"])

    def _mess(t: pa.Table) -> pa.Table:
        u = t["url"]
        c = np.array(
            [ord(s[-1]) if s else 0 for s in u.to_pylist()], dtype=np.int64
        )
        m1 = pc.binary_join_element_wise(
            u, pa.array(np.where(c % 3 == 0, "#ref", "").tolist()), ""
        )
        m2 = pc.if_else(pa.array(c % 2 == 1), pc.utf8_upper(m1), m1)
        m3 = pc.binary_join_element_wise(
            m2, pa.array(np.where(c % 5 == 0, "/", "").tolist()), ""
        )
        return pa.table({"url": u, "messy": m3})

    messy = pages.map_batches(_mess, batch_format="pyarrow")
    out = normalize_urls(messy, url_col="messy", out_col="url_norm")
    return out.select_columns(["url", "url_norm"])


def q_ann_topk_ivf(sf_dir):
    import ray.data

    from .oracle_truth import write_ann_topk_ivf_expected
    from .pipelines.ann import ann_topk_ivf

    _oracle_side_table(
        write_ann_topk_ivf_expected, sf_dir, [0, 1, 2], k=5, n_clusters=16, nprobe=4
    )
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return ann_topk_ivf(emb, [0, 1, 2], k=5, n_clusters=16, nprobe=4)


def q_ann_topk_ivf_indexed(sf_dir):
    """On-disk IVF index roundtrip: build the partitioned-by-list index
    under /tmp, search reading only the probed partitions. Same spec
    constants as q_ann_topk_ivf, so it shares that oracle table (the
    roundtrip equality is additionally pinned by pytest)."""
    import os
    import shutil
    import tempfile

    import ray.data

    from .oracle_truth import write_ann_topk_ivf_expected
    from .pipelines.ann import _take_queries, ann_topk_ivf_indexed, ivf_index_write

    _oracle_side_table(
        write_ann_topk_ivf_expected, sf_dir, [0, 1, 2], k=5, n_clusters=16, nprobe=4
    )
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    os.makedirs("/tmp/gar", exist_ok=True)
    index_dir = tempfile.mkdtemp(prefix="ivf_idx_", dir="/tmp/gar")
    ivf_index_write(emb, index_dir, n_clusters=16, iters=5)
    qids, qm = _take_queries(emb, [0, 1, 2])
    out = ann_topk_ivf_indexed(index_dir, qids, qm, k=5, nprobe=4).to_pandas()
    shutil.rmtree(index_dir, ignore_errors=True)
    return out


def q_ngram_decontaminate(sf_dir):
    """Eval-set decontamination: training docs (doc_id % 97 != 0) flagged
    by any shared word 5-gram with the benchmark split (doc_id % 97 == 0).
    Benchmark gram hashes are broadcast once; the corpus side is one
    shuffle-free streaming pass (pipelines/dedup.ngram_decontaminate)."""
    import pyarrow as pa

    from .pipelines.dedup import ngram_decontaminate

    def _split(keep_bench):
        def f(t):
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 97 == 0) if keep_bench else (ids % 97 != 0)
            return t.filter(pa.array(m))

        return f

    docs = _docs(sf_dir, ["doc_id", "text"])
    bench = docs.map_batches(_split(True), batch_format="pyarrow")
    train = docs.map_batches(_split(False), batch_format="pyarrow")
    return ngram_decontaminate(train, bench, n=5)


def q_repetition_stats(sf_dir):
    """Gopher-style repetition filters (dup-token fraction, top-bigram
    occurrence fraction) — one shuffle-free pass over (doc_id, text)."""
    from .pipelines.text import repetition_stats

    return repetition_stats(_docs(sf_dir, ["doc_id", "text"]))


def q_bpe_token_counts(sf_dir):
    from .pipelines.text import bpe_token_counts

    return bpe_token_counts(_docs(sf_dir, ["doc_id", "text"]))


def q_ngram_jaccard(sf_dir):
    from .oracle_truth import write_ngram_jaccard_expected
    from .pipelines.dedup import ngram_jaccard_pairs

    _oracle_side_table(write_ngram_jaccard_expected, sf_dir, threshold=0.5)
    return ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.5)


def q_simhash(sf_dir):
    from .oracle_truth import write_simhash_expected
    from .pipelines.dedup import simhash_fingerprints

    _oracle_side_table(write_simhash_expected, sf_dir)
    return simhash_fingerprints(_docs(sf_dir, ["doc_id", "text"]))


def q_language_id(sf_dir):
    from .pipelines.text import language_id

    return language_id(_docs(sf_dir, ["doc_id", "text"]))


def q_laplacian(sf_dir):
    from .pipelines.linalg import laplacian_matrix

    return laplacian_matrix(lineitem_graph(sf_dir))


def q_bethe_hessian(sf_dir):
    from .pipelines.linalg import bethe_hessian_matrix

    return bethe_hessian_matrix(lineitem_graph(sf_dir))


def q_square_clustering(sf_dir):
    from .pipelines.squares import square_clustering

    return square_clustering(lineitem_graph(sf_dir, directed=False))


def q_transitivity_directed(sf_dir):
    from .pipelines.cluster_directed import transitivity_directed

    return _scalar_df(
        transitivity_directed=float(transitivity_directed(lineitem_graph(sf_dir)))
    )


def q_clustering_directed(sf_dir):
    from .pipelines.cluster_directed import clustering_directed

    return clustering_directed(lineitem_graph(sf_dir))


def q_multi_bfs(sf_dir):
    from .pipelines.allpairs import multi_source_bfs

    sources = [v for v in range(M) if v % 16 == 0]
    return multi_source_bfs(lineitem_graph(sf_dir), sources)


# -- corpus-pipeline queries -------------------------------------------------
# Oracles read the GENERATOR ground truth (sources/corpus.ground_truth_parquet
# — pure xorshift64 arithmetic, independent of the extraction code under
# test), so the SQL checks the whole html→links→dictionary→kernel pipeline.

_corpus_graph_cache: dict = {}


def _corpus_n_docs(sf_dir) -> int:
    return {"0.001": 1000, "0.01": 5000, "0.1": 20000}.get(
        sf_dir.rstrip("/").split("sf")[-1], 1000
    )


def _corpus_graph(sf_dir):
    if sf_dir not in _corpus_graph_cache:
        import ray.data
        from .sources.corpus import corpus_parquet, ground_truth_parquet, read_corpus
        from .sources.extract import graph_from_corpus

        n_docs = _corpus_n_docs(sf_dir)
        ground_truth_parquet(n_docs)  # oracle side table
        corpus = read_corpus(corpus_parquet(n_docs))
        g, d = graph_from_corpus(corpus, num_parts=8)
        _corpus_graph_cache[sf_dir] = (g, d)
    return _corpus_graph_cache[sf_dir]


def q_corpus_pagerank(sf_dir):
    from .pipelines.pagerank import pagerank

    g, _ = _corpus_graph(sf_dir)
    pr = pagerank(
        g,
        alpha=ALPHA,
        max_iter=PR_ITERS,
        tol=0.0,  # fixed-iteration mode: matches the unrolled SQL exactly
        chain=PR_ITERS,
        raise_on_failure=False,
    )
    return pr.map_batches(
        lambda t: pa.table(
            {
                "v": t["v"],
                "pagerank": pa.array(
                    np.round(t["pagerank"].to_numpy(zero_copy_only=False), 8)
                ),
            }
        ),
        batch_format="pyarrow",
    )


def q_corpus_components(sf_dir):
    from .pipelines.components import connected_components

    g, _ = _corpus_graph(sf_dir)
    return connected_components(g)


def q_corpus_extract_text(sf_dir):
    import ray.data
    from .sources.corpus import corpus_parquet, ground_truth_parquet
    from .sources.extract import extract_text

    n_docs = _corpus_n_docs(sf_dir)
    ground_truth_parquet(n_docs)  # oracle side table
    return extract_text(ray.data.read_parquet(corpus_parquet(n_docs)))


QUERIES = {
    # The correctness driver records at most 50 queries per round; these
    # ten had never landed a driver-recorded row by round 4 (they pass the
    # full local oracle, tools/check_oracle.py), so they go FIRST and the
    # long-recorded suite follows (VERDICT r4 #4).
    "language_id": q_language_id,
    "laplacian": q_laplacian,
    "bethe_hessian": q_bethe_hessian,
    "square_clustering": q_square_clustering,
    "transitivity_directed": q_transitivity_directed,
    "clustering_directed": q_clustering_directed,
    "multi_source_bfs": q_multi_bfs,
    "corpus_pagerank": q_corpus_pagerank,
    "corpus_components": q_corpus_components,
    "corpus_extract_text": q_corpus_extract_text,
    # ... as do the round-5 late additions (positions 11-20), which also
    # have no driver row yet — all 20 never-recorded queries fit inside
    # the 50-row window together with 30 of the long-recorded suite
    "ngram_decontaminate": q_ngram_decontaminate,
    "repetition_stats": q_repetition_stats,
    "ann_topk_ivf": q_ann_topk_ivf,
    "ann_topk_ivf_indexed": q_ann_topk_ivf_indexed,
    "stratified_sample": q_stratified_sample,
    "source_quota_sample": q_source_quota_sample,
    "mix_sample": q_mix_sample,
    "pack_shards": q_pack_shards,
    "truncate_tokens": q_truncate_tokens,
    "host_stats": q_host_stats,
    "url_normalize": q_url_normalize,
    "edges": q_edges,
    "out_degree": q_out_degree,
    "in_degree": q_in_degree,
    "degree_centrality": q_degree_centrality,
    "pagerank10": q_pagerank,
    "connected_components": q_components,
    "label_propagation5": q_lpa,
    "triangles_per_node": q_triangles,
    "total_triangles": q_total_triangles,
    "transitivity": q_transitivity,
    "clustering_coefficient": q_clustering,
    "reciprocity_overall": q_reciprocity,
    "reciprocity_per_node": q_reciprocity_per_node,
    "isolates": q_isolates,
    "s_metric": q_s_metric,
    "cut_metrics": q_cut_metrics,
    "community_edge_counts": q_community_edges,
    "doc_exact_dedup": q_doc_dedup,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_token_stats": q_token_stats,
    "doc_quality": q_quality,
    "lang_distribution": q_lang_distribution,
    "word_topk": q_word_topk,
    "top_docs_per_lang": q_top_docs_per_lang,
    "median_chars_by_lang": q_median_chars_by_lang,
    "tfidf_top_terms": q_tfidf_topk,
    "bigram_topk": q_bigram_topk,
    "corpus_curation": q_curation,
    "length_quantiles_by_lang": q_length_quantiles,
    "train_val_split": q_assign_splits,
    "events_hourly": q_events_hourly,
    "events_sessions": q_sessions,
    "events_sliding": q_sliding_windows,
    "purchase_attribution": q_purchase_attribution,
    "ann_topk": q_ann_topk,
    "embedding_centroids": q_centroids,
    "embedding_neardup": q_embedding_neardup,
    "bfs_levels": q_bfs_levels,
    "bellman_ford": q_bellman_ford,
    "edge_support": q_edge_support,
    "generalized_degree": q_generalized_degree,
    "k_truss4": q_k_truss,
    "hits": q_hits,
    "eigenvector_centrality": q_eigenvector,
    "katz_centrality": q_katz,
    "minhash_groups": q_minhash_groups,
    "ann_topk_lsh": q_ann_topk_lsh,
    "simhash": q_simhash,
    "ngram_jaccard": q_ngram_jaccard,
    "bpe_token_counts": q_bpe_token_counts,
}


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

_G = f"""verts AS (SELECT range::BIGINT AS v FROM range({M})),
edges AS MATERIALIZED (SELECT DISTINCT (l_orderkey % {M})::BIGINT AS src, (l_partkey % {M})::BIGINT AS dst FROM lineitem),
uedges AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS w FROM edges WHERE src <> dst),
sym AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges),
odeg AS MATERIALIZED (SELECT src AS v, COUNT(*)::DOUBLE AS d FROM edges GROUP BY src),
udeg AS MATERIALIZED (SELECT verts.v, COALESCE(c.d, 0)::BIGINT AS d FROM verts LEFT JOIN (SELECT x AS v, COUNT(*) AS d FROM (SELECT u AS x FROM uedges UNION ALL SELECT w FROM uedges) GROUP BY x) c USING (v))"""

_TRI = """tri AS MATERIALIZED (SELECT e1.u AS x, e1.w AS y, e2.w AS z
  FROM uedges e1 JOIN uedges e2 ON e2.u = e1.w
  JOIN uedges e3 ON e3.u = e1.u AND e3.w = e2.w)"""


def _pagerank_sql() -> str:
    parts = [f"WITH {_G},\nr0 AS MATERIALIZED (SELECT v, 1.0/{M} AS r FROM verts)"]
    for i in range(PR_ITERS):
        parts.append(
            f""",
dm{i} AS MATERIALIZED (SELECT COALESCE(SUM(r), 0) AS m FROM r{i} WHERE v NOT IN (SELECT v FROM odeg)),
r{i + 1} AS MATERIALIZED (
  SELECT verts.v,
         (1 - {ALPHA})/{M} + {ALPHA} * (SELECT m FROM dm{i})/{M} + COALESCE(c.s, 0) AS r
  FROM verts LEFT JOIN (
    SELECT e.dst AS v, SUM({ALPHA} * rr.r / o.d) AS s
    FROM edges e JOIN r{i} rr ON rr.v = e.src JOIN odeg o ON o.v = e.src
    GROUP BY e.dst) c USING (v))"""
        )
    parts.append(f"\nSELECT v, ROUND(r, 8) AS pagerank FROM r{PR_ITERS} ORDER BY v")
    return "".join(parts)


def _bellman_ford_sql(rounds: int = 10) -> str:
    parts = [
        f"""WITH ew AS MATERIALIZED (SELECT (l_orderkey % {M})::BIGINT AS src,
  (l_partkey % {M})::BIGINT AS dst, MIN(l_quantity)::DOUBLE AS w
  FROM lineitem GROUP BY 1, 2),
d0 AS MATERIALIZED (SELECT 0::BIGINT AS v, 0.0 AS d)"""
    ]
    for i in range(rounds):
        parts.append(
            f""",
d{i + 1} AS MATERIALIZED (
  SELECT v, MIN(d) AS d FROM (
    SELECT v, d FROM d{i}
    UNION ALL
    SELECT e.dst, x.d + e.w FROM d{i} x JOIN ew e ON e.src = x.v AND e.src <> e.dst) q
  GROUP BY v)"""
        )
    parts.append(f"\nSELECT v, d AS dist FROM d{rounds} ORDER BY v")
    return "".join(parts)


def _eigenvector_sql(iters: int = EIG_ITERS + 1) -> str:
    """Unrolled power iteration, mirroring the engine superstep for
    superstep: y0 = 1/M; per step y' = y/||y|| + (y/||y||) @ A_sym; final
    L2-normalize, round 8dp."""
    parts = [f"WITH {_G},\ny0 AS MATERIALIZED (SELECT v, 1.0/{M} AS x FROM verts)"]
    for i in range(iters):
        parts.append(f""",
n{i} AS MATERIALIZED (SELECT sqrt(SUM(x*x)) AS s FROM y{i}),
y{i + 1} AS MATERIALIZED (
  SELECT verts.v,
         (SELECT x FROM y{i} WHERE y{i}.v = verts.v)/(SELECT s FROM n{i})
         + COALESCE(c.m, 0) AS x
  FROM verts LEFT JOIN (
    SELECT sym.b AS v, SUM(y.x/(SELECT s FROM n{i})) AS m
    FROM sym JOIN y{i} y ON y.v = sym.a GROUP BY sym.b) c USING (v))""")
    parts.append(f"""
SELECT v, ROUND(x / (SELECT sqrt(SUM(x*x)) FROM y{iters}), 8) AS centrality
FROM y{iters} ORDER BY v""")
    return "".join(parts)


def _katz_sql(alpha: float = 0.005, iters: int = KATZ_ITERS) -> str:
    """x0 = 0; x' = alpha*(x @ A) + 1; final L2-normalize, round 8dp."""
    parts = [f"WITH {_G},\nx0 AS MATERIALIZED (SELECT v, 0.0 AS x FROM verts)"]
    for i in range(iters):
        parts.append(f""",
x{i + 1} AS MATERIALIZED (
  SELECT verts.v, {alpha}::DOUBLE * COALESCE(c.m, 0) + 1.0 AS x
  FROM verts LEFT JOIN (
    SELECT e.dst AS v, SUM(x.x) AS m FROM edges e JOIN x{i} x ON x.v = e.src
    GROUP BY e.dst) c USING (v))""")
    parts.append(f"""
SELECT v, ROUND(x / (SELECT sqrt(SUM(x*x)) FROM x{iters}), 8) AS centrality
FROM x{iters} ORDER BY v""")
    return "".join(parts)


def _hits_sql(iters: int = HITS_ITERS) -> str:
    """h0 = 1/M; per iter a = h_prev @ A (in-edges), hraw = A @ a
    (out-edges), h = hraw/max(hraw); final hub = h/sum, authority =
    (h_K @ A)/sum — the engine's stop-point pairing; round 8dp."""
    parts = [f"WITH {_G},\nh0 AS MATERIALIZED (SELECT v, 1.0/{M} AS x FROM verts)"]
    for i in range(iters):
        parts.append(f""",
a{i + 1} AS MATERIALIZED (
  SELECT verts.v, COALESCE(c.m, 0) AS x FROM verts LEFT JOIN (
    SELECT e.dst AS v, SUM(h.x) AS m FROM edges e JOIN h{i} h ON h.v = e.src
    GROUP BY e.dst) c USING (v)),
hr{i + 1} AS MATERIALIZED (
  SELECT verts.v, COALESCE(c.m, 0) AS x FROM verts LEFT JOIN (
    SELECT e.src AS v, SUM(a.x) AS m FROM edges e JOIN a{i + 1} a ON a.v = e.dst
    GROUP BY e.src) c USING (v)),
h{i + 1} AS MATERIALIZED (
  SELECT v, x / (SELECT MAX(x) FROM hr{i + 1}) AS x FROM hr{i + 1})""")
    parts.append(f""",
af AS MATERIALIZED (
  SELECT verts.v, COALESCE(c.m, 0) AS x FROM verts LEFT JOIN (
    SELECT e.dst AS v, SUM(h.x) AS m FROM edges e JOIN h{iters} h ON h.v = e.src
    GROUP BY e.dst) c USING (v))
SELECT h.v, ROUND(h.x / (SELECT SUM(x) FROM h{iters}), 8) AS hub,
       ROUND(af.x / (SELECT SUM(x) FROM af), 8) AS authority
FROM h{iters} h JOIN af ON af.v = h.v ORDER BY h.v""")
    return "".join(parts)


def _k_truss_sql(k: int = 4, rounds: int = K_TRUSS_ROUNDS) -> str:
    # engine runs to fixpoint (capped at `rounds`); the fixpoint is stable
    # under further rounds, so R unrolled SQL rounds give the identical set
    parts = [f"WITH {_G},\ne0 AS MATERIALIZED (SELECT u, w FROM uedges)"]
    for r in range(rounds):
        parts.append(
            f""",
sup{r} AS MATERIALIZED (
  SELECT u, w, COUNT(*) AS c FROM (
    SELECT a.u, a.w FROM e{r} a JOIN e{r} b ON b.u = a.w JOIN e{r} c ON c.u = a.u AND c.w = b.w
    UNION ALL
    SELECT a.u, b.w FROM e{r} a JOIN e{r} b ON b.u = a.w JOIN e{r} c ON c.u = a.u AND c.w = b.w
    UNION ALL
    SELECT a.w, b.w FROM e{r} a JOIN e{r} b ON b.u = a.w JOIN e{r} c ON c.u = a.u AND c.w = b.w) q
  GROUP BY u, w),
e{r + 1} AS MATERIALIZED (SELECT u, w FROM sup{r} WHERE c >= {k - 2})"""
        )
    parts.append(f"\nSELECT u AS src, w AS dst FROM e{rounds} ORDER BY u, w")
    return "".join(parts)


def _lpa_sql() -> str:
    parts = [f"WITH {_G},\nl0 AS MATERIALIZED (SELECT v, v AS lab FROM verts)"]
    for i in range(LPA_ITERS):
        parts.append(
            f""",
l{i + 1} AS MATERIALIZED (
  SELECT l.v, COALESCE(w.lab, l.lab) AS lab
  FROM l{i} l LEFT JOIN (
    SELECT v, lab FROM (
      SELECT s.a AS v, x.lab AS lab,
             ROW_NUMBER() OVER (PARTITION BY s.a ORDER BY COUNT(*) DESC, x.lab ASC) AS rn
      FROM sym s JOIN l{i} x ON x.v = s.b
      GROUP BY s.a, x.lab) t WHERE rn = 1) w USING (v))"""
        )
    parts.append(f"\nSELECT v, lab::BIGINT AS label FROM l{LPA_ITERS} ORDER BY v")
    return "".join(parts)


ORACLE_SQL = {
    "edges": f"WITH {_G} SELECT src, dst FROM edges ORDER BY src, dst",
    "out_degree": f"""WITH {_G}
SELECT verts.v, COALESCE(c.d, 0)::BIGINT AS out_degree
FROM verts LEFT JOIN (SELECT src AS v, COUNT(*) AS d FROM edges GROUP BY src) c USING (v) ORDER BY v""",
    "in_degree": f"""WITH {_G}
SELECT verts.v, COALESCE(c.d, 0)::BIGINT AS in_degree
FROM verts LEFT JOIN (SELECT dst AS v, COUNT(*) AS d FROM edges GROUP BY dst) c USING (v) ORDER BY v""",
    "degree_centrality": f"""WITH {_G}
SELECT verts.v,
       (COALESCE(o.d, 0) + COALESCE(i.d, 0)) / {M - 1}.0 AS centrality
FROM verts
LEFT JOIN (SELECT src AS v, COUNT(*)::DOUBLE AS d FROM edges GROUP BY src) o USING (v)
LEFT JOIN (SELECT dst AS v, COUNT(*)::DOUBLE AS d FROM edges GROUP BY dst) i USING (v)
ORDER BY v""",
    "pagerank10": _pagerank_sql(),
    "connected_components": f"""WITH RECURSIVE {_G},
walk(v, lab) AS (
  SELECT v, v FROM verts
  UNION
  SELECT s.b, w.lab FROM walk w JOIN sym s ON s.a = w.v WHERE w.lab < s.b
)
SELECT v, MIN(lab)::BIGINT AS component FROM walk GROUP BY v ORDER BY v""",
    "label_propagation5": _lpa_sql(),
    "triangles_per_node": f"""WITH {_G}, {_TRI}
SELECT verts.v, COALESCE(c.n, 0)::BIGINT AS triangles
FROM verts LEFT JOIN (
  SELECT corner AS v, COUNT(*) AS n FROM (
    SELECT x AS corner FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) q
  GROUP BY corner) c USING (v) ORDER BY v""",
    "total_triangles": f"WITH {_G}, {_TRI} SELECT COUNT(*)::BIGINT AS total_triangles FROM tri",
    "transitivity": f"""WITH {_G}, {_TRI}
SELECT 6.0 * (SELECT COUNT(*) FROM tri) / (SELECT SUM(d * (d - 1.0)) FROM udeg) AS transitivity""",
    "clustering_coefficient": f"""WITH {_G}, {_TRI}
SELECT udeg.v,
       CASE WHEN udeg.d >= 2 THEN (2.0 * COALESCE(c.n, 0)) / (udeg.d * (udeg.d - 1.0)) ELSE 0.0 END AS clustering
FROM udeg LEFT JOIN (
  SELECT corner AS v, COUNT(*) AS n FROM (
    SELECT x AS corner FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) q
  GROUP BY corner) c USING (v) ORDER BY udeg.v""",
    "reciprocity_overall": f"""WITH {_G}
SELECT (SELECT COUNT(*) FROM edges e JOIN edges r ON e.src = r.dst AND e.dst = r.src)::DOUBLE
       / (SELECT COUNT(*) FROM edges) AS reciprocity""",
    "isolates": f"""WITH {_G}
SELECT v FROM verts
WHERE v NOT IN (SELECT src FROM edges) AND v NOT IN (SELECT dst FROM edges) ORDER BY v""",
    "s_metric": f"""WITH {_G}
SELECT SUM(du.d * dw.d)::DOUBLE AS s_metric
FROM uedges JOIN udeg du ON du.v = uedges.u JOIN udeg dw ON dw.v = uedges.w""",
    "cut_metrics": f"""WITH {_G},
cut AS (SELECT COUNT(*)::BIGINT AS c FROM edges WHERE src % 7 = 0 AND dst % 7 <> 0),
vol AS (SELECT
  SUM(CASE WHEN src % 7 = 0 THEN 1 ELSE 0 END)::BIGINT AS vs,
  SUM(CASE WHEN src % 7 <> 0 THEN 1 ELSE 0 END)::BIGINT AS vt FROM edges)
SELECT cut.c AS cut_size, vol.vs AS volume_s, vol.vt AS volume_t,
       cut.c::DOUBLE / least(vol.vs, vol.vt) AS conductance
FROM cut, vol""",
    "community_edge_counts": f"""WITH {_G}
SELECT SUM(CASE WHEN src % 5 = dst % 5 THEN 1 ELSE 0 END)::BIGINT AS intra,
       SUM(CASE WHEN src % 5 <> dst % 5 THEN 1 ELSE 0 END)::BIGINT AS inter
FROM edges""",
    "doc_exact_dedup": """SELECT md5(text) AS h, MIN(doc_id)::BIGINT AS keeper, COUNT(*)::BIGINT AS n
FROM documents GROUP BY 1 ORDER BY h""",
    "doc_fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id",
    "doc_token_stats": """SELECT doc_id,
  len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))::BIGINT AS n_tokens,
  len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t IN ('the','and','of','a','to','in','is')))::BIGINT AS n_stopwords,
  length(regexp_replace(text, '[^A-Z]', '', 'g'))::BIGINT AS n_upper,
  length(text)::BIGINT AS n_chars_py
FROM documents ORDER BY doc_id""",
    "doc_quality": """WITH s AS (
  SELECT doc_id,
    len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))::BIGINT AS n_tokens,
    len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t IN ('the','and','of','a','to','in','is')))::DOUBLE AS n_stop,
    length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE AS n_upper,
    length(text)::DOUBLE AS n_chars
  FROM documents)
SELECT doc_id, n_tokens,
  CASE WHEN n_tokens > 0 THEN n_chars / n_tokens ELSE 0.0 END AS chars_per_token,
  CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END AS stopword_ratio,
  CASE WHEN n_chars > 0 THEN n_upper / n_chars ELSE 0.0 END AS upper_ratio
FROM s ORDER BY doc_id""",
    "lang_distribution": "SELECT lang, COUNT(*)::BIGINT AS n FROM documents GROUP BY lang ORDER BY lang",
    "word_topk": """SELECT word, COUNT(*)::BIGINT AS n FROM (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS word
  FROM documents)
GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""",
    "bigram_topk": """WITH tok AS (
  SELECT doc_id, w AS word, ord FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w,
           generate_subscripts(regexp_split_to_array(text, '\\s+'), 1) AS ord
    FROM documents) t WHERE w <> ''),
seq AS (SELECT doc_id, word, lead(word) OVER (PARTITION BY doc_id ORDER BY ord) AS nxt FROM tok)
SELECT word || ' ' || nxt AS bigram, COUNT(*)::BIGINT AS n
FROM seq WHERE nxt IS NOT NULL
GROUP BY 1 ORDER BY n DESC, bigram ASC LIMIT 20""",
    "corpus_curation": """WITH keep AS (
  SELECT md5(text) AS h, MIN(doc_id) AS keeper FROM documents GROUP BY 1),
d AS (SELECT doc.* FROM documents doc JOIN keep ON doc.doc_id = keep.keeper),
s AS (SELECT doc_id, lang,
        len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))::BIGINT AS n_tokens,
        len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t IN ('the','and','of','a','to','in','is')))::DOUBLE AS n_stop
      FROM d)
SELECT doc_id, lang, n_tokens FROM s
WHERE n_tokens >= 20 AND (CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END) <= 0.3
  AND lang IN ('en', 'de', 'fr')
ORDER BY doc_id""",
    "length_quantiles_by_lang": """SELECT lang,
  ROUND(quantile_cont(n_chars, 0.25), 6) AS p25,
  ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
  ROUND(quantile_cont(n_chars, 0.75), 6) AS p75
FROM documents GROUP BY lang ORDER BY lang""",
    "bpe_token_counts": r"""SELECT doc_id,
  len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))::BIGINT AS n_bpe_tokens
FROM documents ORDER BY doc_id""",
    # eval-set decontamination: exact word-5-gram overlap vs the bench
    # split (doc_id % 97 == 0); the engine compares 64-bit gram hashes on
    # both sides (identical equality classes up to negligible collisions)
    "ngram_decontaminate": r"""WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents),
grams AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + 4), ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t) - 3, 1))) AS i) r),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
hits AS (
  SELECT grams.doc_id, COUNT(DISTINCT grams.g)::BIGINT AS n_hits
  FROM grams JOIN bench USING (g) WHERE grams.doc_id % 97 <> 0 GROUP BY 1),
train AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 97 <> 0)
SELECT train.doc_id, COALESCE(hits.n_hits, 0)::BIGINT AS n_hits,
       hits.doc_id IS NOT NULL AS contaminated
FROM train LEFT JOIN hits USING (doc_id) ORDER BY doc_id""",
    # Gopher-style repetition filters (Rae et al. 2021, occurrence-
    # fraction variant). Fractions are single IEEE divisions of exact
    # integers — bit-identical to the engine without rounding.
    "repetition_stats": r"""WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents),
flat AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS ord FROM toks),
tok_stats AS (SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
                     COUNT(DISTINCT w)::BIGINT AS n_distinct FROM flat GROUP BY 1),
big AS (SELECT doc_id, w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY ord) AS bg FROM flat),
bgc AS (SELECT doc_id, bg, COUNT(*)::BIGINT AS c FROM big WHERE bg IS NOT NULL GROUP BY 1, 2),
bg_stats AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bg FROM bgc GROUP BY 1)
SELECT d.doc_id,
       COALESCE(n_tokens, 0)::BIGINT AS n_tokens,
       CASE WHEN n_tokens > 0 THEN 1 - n_distinct::DOUBLE / n_tokens ELSE 0.0 END AS dup_token_frac,
       COALESCE(top_c::DOUBLE / n_bg, 0.0) AS top_bigram_frac
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN tok_stats USING (doc_id) LEFT JOIN bg_stats USING (doc_id)
ORDER BY doc_id""",
    "train_val_split": """SELECT doc_id,
  -- HUGEINT arithmetic: signed BIGINT would overflow for doc_id >= 2^32
  -- and silently diverge from the engine's uint64 wraparound (ADVICE r3).
  -- The double-% makes the modulo POSITIVE (DuckDB % keeps the dividend's
  -- sign), matching the engine's uint64 math for negative ids (review r5)
  CASE WHEN ((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 + 4294967296) % 4294967296 < CAST(0.1 * 4294967296 AS BIGINT) THEN 'val'
       WHEN ((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 + 4294967296) % 4294967296 < CAST(0.2 * 4294967296 AS BIGINT) THEN 'test'
       ELSE 'train' END AS split
FROM documents ORDER BY doc_id""",
    "top_docs_per_lang": """SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS r
  FROM documents) WHERE r <= 3 ORDER BY lang, doc_id""",
    "median_chars_by_lang": """SELECT lang, median(n_chars)::DOUBLE AS median_chars
FROM documents GROUP BY lang ORDER BY lang""",
    "tfidf_top_terms": """WITH tok AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS word
  FROM documents),
tf AS (SELECT doc_id, word, COUNT(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT word, COUNT(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1),
nn AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
s AS (SELECT tf.doc_id, tf.word, tf.tf,
             ROUND(tf.tf * ln(nn.n / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.word = df.word CROSS JOIN nn)
SELECT doc_id, word, tf, tfidf FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word ASC) AS r
  FROM s) WHERE r <= 3 ORDER BY doc_id, word""",
    "events_hourly": """SELECT event_type, date_trunc('hour', ts) AS hour,
  COUNT(*)::BIGINT AS n, ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_sessions": """WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events),
s AS (SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      FROM o)
SELECT user_id, session_id::BIGINT AS session_id, COUNT(*)::BIGINT AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    "events_sliding": """SELECT event_type, make_timestamp(ws_us) AS window_start,
  COUNT(*)::BIGINT AS n, ROUND(SUM(value), 6) AS sum_value
FROM (SELECT event_type, value,
        ((epoch_us(ts)::BIGINT // 900000000) - o.o) * 900000000 AS ws_us
      FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) o(o))
GROUP BY 1, 2 ORDER BY 1, 2""",
    "purchase_attribution": """WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, ts, MAX(event_id) AS click_event_id, ts AS click_ts
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT p.user_id, p.event_id, p.ts, c.click_event_id, c.click_ts,
       date_diff('microsecond', c.click_ts, p.ts)::BIGINT AS lag_us
FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.user_id, p.event_id""",
    "square_clustering": f"""WITH {_G},
nbr AS MATERIALIZED (SELECT a, b FROM sym WHERE a <> b),
wedges AS MATERIALIZED (
  SELECT n1.b AS u, n1.a AS v, n2.b AS w
  FROM nbr n1 JOIN nbr n2 ON n1.a = n2.a AND n1.b < n2.b),
cn AS MATERIALIZED (SELECT u, w, COUNT(*) AS c FROM wedges GROUP BY u, w),
contrib AS MATERIALIZED (
  SELECT wg.v,
         (cn.c - 1)::DOUBLE AS q,
         du.d::DOUBLE AS ku, dw.d::DOUBLE AS kw,
         CASE WHEN e.u IS NOT NULL THEN 1.0 ELSE 0.0 END AS adj
  FROM wedges wg
  JOIN cn ON cn.u = wg.u AND cn.w = wg.w
  JOIN udeg du ON du.v = wg.u
  JOIN udeg dw ON dw.v = wg.w
  LEFT JOIN uedges e ON e.u = least(wg.u, wg.w) AND e.w = greatest(wg.u, wg.w)),
agg AS (
  SELECT v, SUM(q) AS num,
         SUM((ku - (q + 1 + adj)) + (kw - (q + 1 + adj)) + q) AS den
  FROM contrib GROUP BY v)
SELECT verts.v,
       CASE WHEN COALESCE(agg.den, 0) > 0 THEN agg.num / agg.den ELSE 0.0 END AS square_clustering
FROM verts LEFT JOIN agg ON agg.v = verts.v ORDER BY verts.v""",
    "transitivity_directed": f"""WITH {_G},
num AS (SELECT COUNT(*)::DOUBLE AS x
  FROM edges e JOIN edges a1 ON a1.src = e.src JOIN edges a2 ON a2.src = e.dst AND a2.dst = a1.dst),
od AS (SELECT src AS v, COUNT(*)::DOUBLE AS d FROM edges WHERE src <> dst GROUP BY src)
SELECT (SELECT x FROM num) / (SELECT SUM(d * (d - 1)) FROM od) AS transitivity_directed""",
    "multi_source_bfs": f"""WITH RECURSIVE {_G},
walk(source, v, level) AS (
  SELECT v, v, 0::BIGINT FROM verts WHERE v % 16 = 0
  UNION
  SELECT w.source, e.dst, w.level + 1 FROM walk w JOIN edges e ON e.src = w.v
  WHERE w.level < 60
)
SELECT source, v, MIN(level)::BIGINT AS level FROM walk GROUP BY source, v ORDER BY source, v""",
    "bfs_levels": f"""WITH RECURSIVE {_G},
walk(v, level) AS (
  SELECT 0::BIGINT, 0::BIGINT
  UNION
  SELECT e.dst, w.level + 1 FROM walk w JOIN edges e ON e.src = w.v
  WHERE w.level < 60
)
SELECT v, MIN(level)::BIGINT AS level FROM walk GROUP BY v ORDER BY v""",
    "bellman_ford": _bellman_ford_sql(),
    "k_truss4": _k_truss_sql(),
    "eigenvector_centrality": _eigenvector_sql(),
    "katz_centrality": _katz_sql(),
    "hits": _hits_sql(),
    "language_id": """WITH t AS (SELECT doc_id, ' ' || lower(text) || ' ' AS s FROM documents),
c AS (SELECT doc_id, (length(s)-length(replace(s,' the ','')))/5 + (length(s)-length(replace(s,' and ','')))/5 + (length(s)-length(replace(s,' of ','')))/4 + (length(s)-length(replace(s,' is ','')))/4 AS c_en, (length(s)-length(replace(s,' der ','')))/5 + (length(s)-length(replace(s,' und ','')))/5 + (length(s)-length(replace(s,' die ','')))/5 + (length(s)-length(replace(s,' ist ','')))/5 AS c_de, (length(s)-length(replace(s,' le ','')))/4 + (length(s)-length(replace(s,' la ','')))/4 + (length(s)-length(replace(s,' et ','')))/4 + (length(s)-length(replace(s,' est ','')))/5 AS c_fr FROM t)
SELECT doc_id,
       CASE WHEN c_en >= c_de AND c_en >= c_fr AND c_en > 0 THEN 'en'
            WHEN c_de >= c_fr AND c_de > 0 THEN 'de'
            WHEN c_fr > 0 THEN 'fr'
            ELSE 'unk' END AS lang_pred
FROM c ORDER BY doc_id""",
    "embedding_neardup": """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
ORDER BY id_a, id_b""",
    "embedding_centroids": """WITH ex AS (
  SELECT label, unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings),
per_dim AS (
  SELECT label, i, ROUND(SUM(x) / COUNT(*), 6) AS c
  FROM ex GROUP BY label, i),
cnt AS (SELECT label, COUNT(*)::BIGINT AS n FROM embeddings GROUP BY label)
SELECT per_dim.label::BIGINT AS label,
       list(c ORDER BY i) AS centroid,
       MIN(cnt.n) AS n
FROM per_dim JOIN cnt USING (label)
GROUP BY per_dim.label ORDER BY per_dim.label""",
    "reciprocity_per_node": f"""WITH {_G},
rec AS (SELECT e1.src AS v, COUNT(*)::DOUBLE AS r FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst AND e2.dst = e1.src GROUP BY e1.src),
tot AS (SELECT verts.v, COALESCE(o.d, 0) + COALESCE(i.d, 0) AS d FROM verts
  LEFT JOIN (SELECT src AS v, COUNT(*)::DOUBLE AS d FROM edges GROUP BY src) o USING (v)
  LEFT JOIN (SELECT dst AS v, COUNT(*)::DOUBLE AS d FROM edges GROUP BY dst) i USING (v))
SELECT tot.v, 2.0 * COALESCE(rec.r, 0) / tot.d AS reciprocity
FROM tot LEFT JOIN rec USING (v) WHERE tot.d > 0 ORDER BY tot.v""",
    "clustering_directed": f"""WITH {_G},
bm AS MATERIALIZED (SELECT a, b, COUNT(*)::DOUBLE AS c FROM (
    SELECT src AS a, dst AS b FROM edges WHERE src <> dst
    UNION ALL SELECT dst AS a, src AS b FROM edges WHERE src <> dst) GROUP BY a, b),
tt AS MATERIALIZED (
  SELECT b1.a AS v, SUM(b1.c * b2.c * b3.c) AS t
  FROM bm b1 JOIN bm b2 ON b2.a = b1.a AND b2.b > b1.b
  JOIN bm b3 ON b3.a = b1.b AND b3.b = b2.b
  GROUP BY b1.a),
dtot AS MATERIALIZED (SELECT verts.v, COALESCE(o.d, 0) + COALESCE(i.d, 0) AS d
  FROM verts
  LEFT JOIN (SELECT src AS v, COUNT(*)::DOUBLE AS d FROM edges WHERE src <> dst GROUP BY src) o USING (v)
  LEFT JOIN (SELECT dst AS v, COUNT(*)::DOUBLE AS d FROM edges WHERE src <> dst GROUP BY dst) i USING (v)),
drec AS MATERIALIZED (SELECT a AS v, COUNT(*)::DOUBLE AS d FROM bm WHERE c = 2 GROUP BY a)
SELECT verts.v,
       CASE WHEN (dtot.d * (dtot.d - 1) - 2 * COALESCE(drec.d, 0)) > 0
            THEN COALESCE(tt.t, 0) / (dtot.d * (dtot.d - 1) - 2 * COALESCE(drec.d, 0))
            ELSE 0.0 END AS clustering
FROM verts JOIN dtot USING (v)
LEFT JOIN tt ON tt.v = verts.v LEFT JOIN drec ON drec.v = verts.v
ORDER BY verts.v""",
    "edge_support": f"""WITH {_G}, {_TRI},
epairs AS (SELECT x AS u, y AS w FROM tri UNION ALL SELECT x, z FROM tri UNION ALL SELECT y, z FROM tri)
SELECT u, w, COUNT(*)::BIGINT AS support FROM epairs GROUP BY u, w ORDER BY u, w""",
    "generalized_degree": f"""WITH {_G}, {_TRI},
epairs AS (SELECT x AS u, y AS w FROM tri UNION ALL SELECT x, z FROM tri UNION ALL SELECT y, z FROM tri),
sup AS MATERIALIZED (SELECT u, w, COUNT(*)::BIGINT AS s FROM epairs GROUP BY u, w),
es AS MATERIALIZED (SELECT ue.u, ue.w, COALESCE(sup.s, 0)::BIGINT AS s
  FROM uedges ue LEFT JOIN sup ON sup.u = ue.u AND sup.w = ue.w),
inc AS (SELECT u AS v, s FROM es UNION ALL SELECT w AS v, s FROM es)
SELECT v, s AS tri_count, COUNT(*)::BIGINT AS n_edges FROM inc GROUP BY v, s ORDER BY v, tri_count""",
    "laplacian": f"""WITH {_G}
SELECT verts.v AS row, verts.v AS col, COALESCE(o.d, 0)::DOUBLE AS value
FROM verts LEFT JOIN (SELECT src AS v, COUNT(*)::DOUBLE AS d FROM edges GROUP BY src) o USING (v)
UNION ALL
SELECT src AS row, dst AS col, -1.0 AS value FROM edges""",
    "bethe_hessian": f"""WITH {_G},
od AS MATERIALIZED (SELECT verts.v, COALESCE(o.d, 0)::DOUBLE AS d
  FROM verts LEFT JOIN (SELECT src AS v, COUNT(*)::DOUBLE AS d FROM edges GROUP BY src) o USING (v)),
rr AS MATERIALIZED (SELECT SUM(d*d) / GREATEST(SUM(d), 1.0) - 1.0 AS r FROM od)
SELECT v AS row, v AS col, (SELECT r*r - 1.0 FROM rr) AS value FROM od
UNION ALL
SELECT v AS row, v AS col, d AS value FROM od
UNION ALL
SELECT src AS row, dst AS col, -(SELECT r FROM rr) AS value FROM edges""",
    "ann_topk": """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id IN (0, 1, 2))
SELECT qid, nid, ROUND(sim, 6) AS score FROM (
  SELECT q.qid, e.vec_id AS nid,
         list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]) AS sim,
         ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY sim DESC, e.vec_id ASC) AS rn
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid) t
WHERE rn <= 5 ORDER BY qid, score DESC, nid""",
}


# -- corpus oracles: SQL over the GENERATOR ground-truth parquet -------------
# (written by sources/corpus.ground_truth_parquet when the corpus queries
# run; pure xorshift64 arithmetic independent of the extraction pipeline, so
# these check html→links→dictionary→kernel end-to-end. The driver's
# correctness pass runs at sf0.01 → n_docs=5000.)

_CORPUS_N = 5000
_CORPUS_TRUTH = f"/tmp/gar/truth/n{_CORPUS_N}"
_CORPUS_G = f"""cdict AS MATERIALIZED (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY url) - 1 AS v FROM read_parquet('{_CORPUS_TRUTH}/docs.parquet')),
cverts AS MATERIALIZED (SELECT v FROM cdict),
cedges AS MATERIALIZED (SELECT DISTINCT s.v AS src, d.v AS dst
  FROM read_parquet('{_CORPUS_TRUTH}/edges.parquet') e
  JOIN cdict s ON s.doc_id = e.src JOIN cdict d ON d.doc_id = e.dst),
codeg AS MATERIALIZED (SELECT src AS v, COUNT(*)::DOUBLE AS d FROM cedges GROUP BY src)"""


def _corpus_pagerank_sql() -> str:
    N = _CORPUS_N
    parts = [f"WITH {_CORPUS_G},\nr0 AS MATERIALIZED (SELECT v, 1.0/{N} AS r FROM cverts)"]
    for i in range(PR_ITERS):
        parts.append(
            f""",
dm{i} AS MATERIALIZED (SELECT COALESCE(SUM(r), 0) AS m FROM r{i} WHERE v NOT IN (SELECT v FROM codeg)),
r{i + 1} AS MATERIALIZED (
  SELECT cverts.v,
         (1 - {ALPHA})/{N} + {ALPHA} * (SELECT m FROM dm{i})/{N} + COALESCE(c.s, 0) AS r
  FROM cverts LEFT JOIN (
    SELECT e.dst AS v, SUM({ALPHA} * rr.r / o.d) AS s
    FROM cedges e JOIN r{i} rr ON rr.v = e.src JOIN codeg o ON o.v = e.src
    GROUP BY e.dst) c USING (v))"""
        )
    parts.append(f"\nSELECT v, ROUND(r, 8) AS pagerank FROM r{PR_ITERS} ORDER BY v")
    return "".join(parts)


ORACLE_SQL["corpus_pagerank"] = _corpus_pagerank_sql()
ORACLE_SQL["corpus_components"] = f"""WITH RECURSIVE {_CORPUS_G},
csym AS MATERIALIZED (SELECT src AS a, dst AS b FROM cedges UNION SELECT dst, src FROM cedges),
walk(v, lab) AS (
  SELECT v, v FROM cverts
  UNION
  SELECT s.b, w.lab FROM walk w JOIN csym s ON s.a = w.v WHERE w.lab < s.b
)
SELECT v, MIN(lab)::BIGINT AS component FROM walk GROUP BY v ORDER BY v"""
ORACLE_SQL["host_stats"] = f"""SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
  COUNT(*)::BIGINT AS n_docs, SUM(length(text))::BIGINT AS n_chars
FROM read_parquet('{_CORPUS_TRUTH}/docs.parquet') GROUP BY 1 ORDER BY 1"""
ORACLE_SQL["url_normalize"] = rf"""WITH base AS (
  SELECT url, ascii(right(url, 1)) AS c FROM read_parquet('{_CORPUS_TRUTH}/docs.parquet')),
m1 AS (SELECT url, CASE WHEN c % 3 = 0 THEN url || '#ref' ELSE url END AS u, c FROM base),
m2 AS (SELECT url, CASE WHEN c % 2 = 1 THEN upper(u) ELSE u END AS u, c FROM m1),
m3 AS (SELECT url, CASE WHEN c % 5 = 0 THEN u || '/' ELSE u END AS u FROM m2),
s1 AS (SELECT url, regexp_replace(u, '#.*$', '') AS u FROM m3),
s2 AS (SELECT url, CASE WHEN regexp_matches(u, '^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*')
  THEN lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*)', 1))
       || regexp_replace(u, '^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*', '')
  ELSE u END AS u FROM s1)
SELECT url, CASE WHEN strpos(u, '?') > 0 THEN u
  ELSE regexp_replace(u, '/$', '') END AS url_norm
FROM s2 ORDER BY url"""
ORACLE_SQL["corpus_extract_text"] = (
    f"SELECT url, text FROM read_parquet('{_CORPUS_TRUTH}/docs.parquet') ORDER BY url"
)

# -- hash-defined query oracles: parquet written by oracle_truth.py ----------
# (single-process reference implementations of the same published specs —
# naive loops + union-find, no shared code with the distributed pipelines.
# The queries() callables write these before running; paths are pinned to
# the driver's correctness scale, like the corpus-trio ground truth above.)
_EXPECTED = _EXPECTED_DIR
ORACLE_SQL["minhash_groups"] = (
    f"SELECT doc_id, \"group\" FROM read_parquet('{_EXPECTED}/minhash_groups.parquet') ORDER BY doc_id"
)
ORACLE_SQL["simhash"] = (
    f"SELECT doc_id, simhash FROM read_parquet('{_EXPECTED}/simhash.parquet') ORDER BY doc_id"
)
ORACLE_SQL["ngram_jaccard"] = (
    f"SELECT a, b, jaccard FROM read_parquet('{_EXPECTED}/ngram_jaccard.parquet') ORDER BY a, b"
)
ORACLE_SQL["ann_topk_lsh"] = (
    f"SELECT qid, nid, score FROM read_parquet('{_EXPECTED}/ann_topk_lsh.parquet') ORDER BY qid, score DESC, nid"
)
ORACLE_SQL["truncate_tokens"] = """SELECT doc_id,
  COALESCE(array_to_string(list_slice(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''), 1, 24), ' '), '') AS text,
  LEAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')), 24)::BIGINT AS n_tokens
FROM documents ORDER BY doc_id"""
ORACLE_SQL["mix_sample"] = """WITH cnt AS (
  SELECT lang, COUNT(*)::DOUBLE AS n FROM documents GROUP BY lang),
tot AS (SELECT SUM(n) AS total_n FROM cnt),
w(lang, w) AS (VALUES ('en', 0.4), ('de', 0.3), ('fr', 0.3)),
cut AS (SELECT cnt.lang, FLOOR(4294967296 * LEAST(1.0, 0.5 * total_n * w / n)) AS cut
        FROM cnt CROSS JOIN tot JOIN w ON w.lang = cnt.lang)
SELECT d.doc_id, d.lang FROM documents d JOIN cut ON cut.lang = d.lang
WHERE ((CAST(d.doc_id AS HUGEINT) * 2654435761) % 4294967296 + 4294967296) % 4294967296 < cut
ORDER BY d.doc_id"""
ORACLE_SQL["pack_shards"] = """SELECT doc_id,
  COALESCE(SUM(n_chars) OVER (
    ORDER BY ((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 + 4294967296) % 4294967296, doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 20000 AS shard
FROM documents ORDER BY doc_id"""
ORACLE_SQL["source_quota_sample"] = """SELECT source, doc_id, sample_rank FROM (
  SELECT source, doc_id, row_number() OVER (
    PARTITION BY source
    ORDER BY ((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 + 4294967296) % 4294967296, doc_id
  ) AS sample_rank FROM documents) WHERE sample_rank <= 10
ORDER BY source, sample_rank"""
ORACLE_SQL["stratified_sample"] = """SELECT lang, doc_id, sample_rank FROM (
  SELECT lang, doc_id, row_number() OVER (
    PARTITION BY lang
    -- HUGEINT: same uint64-wraparound-safe hash as train_val_split
    ORDER BY ((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 + 4294967296) % 4294967296, doc_id
  ) AS sample_rank FROM documents) WHERE sample_rank <= 20
ORDER BY lang, sample_rank"""
ORACLE_SQL["ann_topk_ivf"] = (
    f"SELECT qid, nid, score FROM read_parquet('{_EXPECTED}/ann_topk_ivf.parquet') ORDER BY qid, score DESC, nid"
)
ORACLE_SQL["ann_topk_ivf_indexed"] = ORACLE_SQL["ann_topk_ivf"]
