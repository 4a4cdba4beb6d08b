"""Corpus generation + link extraction + vertex dictionary + graph build.

Checks the north-rule invariants: byte-identical text pass-through per url,
deterministic edge list matching the generator's ground truth, deterministic
sorted-url dense-id dictionary."""

import numpy as np
import pyarrow as pa
import ray.data

from graphblas_algorithms_ray.sources import corpus as C
from graphblas_algorithms_ray.sources.extract import (
    build_vertex_dictionary,
    extract_links,
    extract_text,
    graph_from_corpus,
    map_edges_to_ids,
)
from graphblas_algorithms_ray.stages.hashjoin import lookup_join
from graphblas_algorithms_ray.pipelines.pagerank import pagerank_dict

N = 300


def _corpus():
    return ray.data.read_parquet(C.corpus_parquet(N))


def test_text_byte_identical():
    got = {r["url"]: r["text"] for r in extract_text(_corpus()).take_all()}
    assert len(got) == N
    for d in range(0, N, 37):
        url = C.url_of(d, N)
        assert got[url].encode() == C.text_of(d).encode()


def test_extracted_edges_match_ground_truth():
    links = extract_links(_corpus()).take_all()
    got = {(r["src_url"], r["dst_url"]) for r in links}
    exp = {
        (C.url_of(s, N), C.url_of(t, N)) for s, t in C.ground_truth_edges(N)
    }
    assert got == exp


def test_dictionary_is_sorted_dense_rank():
    urls = sorted(C.url_of(d, N) for d in range(N))
    ds = ray.data.from_arrow(pa.table({"url": urls + urls[:50]}))  # dups too
    d = {r["url"]: r["vid"] for r in build_vertex_dictionary(ds).take_all()}
    assert d == {u: i for i, u in enumerate(urls)}


def test_hash_join_matches_broadcast():
    corpus = _corpus()
    links = extract_links(corpus).materialize()
    dictionary = build_vertex_dictionary(corpus.select_columns(["url"])).materialize()
    bc = map_edges_to_ids(links, dictionary).take_all()
    hj = (
        lookup_join(
            lookup_join(links, "src_url", dictionary, "url", "vid", "src"),
            "dst_url",
            dictionary,
            "url",
            "vid",
            "dst",
        )
        .select_columns(["src", "dst"])
        .take_all()
    )
    assert {(r["src"], r["dst"]) for r in bc} == {(r["src"], r["dst"]) for r in hj}


def test_graph_from_corpus_pagerank():
    g, dictionary = graph_from_corpus(_corpus(), num_parts=4)
    assert g.n == N  # all targets in-corpus
    # ground-truth graph in vid space must produce identical pagerank
    urls = sorted(C.url_of(d, N) for d in range(N))
    url2vid = {u: i for i, u in enumerate(urls)}
    edges = [
        (url2vid[C.url_of(s, N)], url2vid[C.url_of(t, N)])
        for s, t in C.ground_truth_edges(N)
    ]
    from graphblas_algorithms_ray import Graph

    g2 = Graph(edges, n=N, directed=True, num_parts=4)
    pr1 = pagerank_dict(g)
    pr2 = pagerank_dict(g2)
    np.testing.assert_allclose(
        [pr1[v] for v in range(N)], [pr2[v] for v in range(N)], atol=1e-12
    )
    # hub: doc 0 should be the top-ranked vertex
    assert max(pr1, key=pr1.get) == url2vid[C.url_of(0, N)]


def test_lookup_join_buckets_scale_with_cluster():
    # ADVICE r3: the default reduce-side parallelism must scale with the
    # cluster, not cap at a constant 64
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from graphblas_algorithms_ray.stages.hashjoin import _TagFact

    fact = ray.data.from_arrow(
        pa.table({"k": pa.array(np.arange(10_000) % 997), "x": pa.array(np.arange(10_000))})
    )
    dim = ray.data.from_arrow(
        pa.table({"k": pa.array(np.arange(997)), "v": pa.array(np.arange(997) * 2)})
    )
    out = lookup_join(fact, "k", dim, "k", "v", "v")
    df = out.to_pandas()
    assert len(df) == 10_000 and (df["v"] == (df["k"] * 2)).all()
    # the derived default exceeds 64 whenever the cluster has >16 CPUs,
    # and the tagging stage honors an explicit bucket count
    ncpu = int(ray.cluster_resources().get("CPU", 0))
    expected = max(64, 4 * ncpu)
    tf = _TagFact("k", "v", pa.int64(), expected)
    tagged = tf(pa.table({"k": pa.array(np.arange(4096))}))
    assert tagged["__bucket"].to_numpy().max() == expected - 1
    # at 32 cluster CPUs the derived default is 128; simulate that here
    tf_big = _TagFact("k", "v", pa.int64(), max(64, 4 * 32))
    tagged_big = tf_big(pa.table({"k": pa.array(np.arange(4096))}))
    assert tagged_big["__bucket"].to_numpy().max() > 64
