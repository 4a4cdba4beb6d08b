"""Property-based sweeps (FIXTURES.md §3.4): random graphs × {directed,
self-edges, dangling sinks, isolated vertices, duplicate edges} — the
cache-semantics corners of the reference's +/- self-edge handling."""

import networkx as nx
import numpy as np
from hypothesis import given, settings, strategies as st
from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.components import components_dict
from graphblas_algorithms_ray.pipelines.pagerank import pagerank_dict
from graphblas_algorithms_ray.pipelines.triangles import total_triangles


def _make_edges(seed: int, n: int, directed: bool):
    rng = np.random.RandomState(seed)
    m = rng.randint(1, max(2, n * 2))
    edges = [(int(rng.randint(n)), int(rng.randint(n))) for _ in range(m)]
    if seed % 2:
        edges += edges[: max(1, m // 4)]  # duplicate edges
    if seed % 3 == 0:
        edges.append((seed % n, seed % n))  # self loop
    return edges


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(0, 10**6), directed=st.booleans())
def test_pagerank_matches_networkx(seed, directed):
    n = 25
    edges = _make_edges(seed, n, directed)
    G = nx.DiGraph() if directed else nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(edges)
    g = Graph(edges, n=n, directed=directed, num_parts=3)
    ours = pagerank_dict(g)
    theirs = _pagerank_python(G)
    for v in range(n):
        assert abs(ours[v] - theirs[v]) < 1e-6


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(0, 10**6))
def test_cc_matches_networkx(seed):
    n = 30
    edges = _make_edges(seed, n, False)
    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(edges)
    g = Graph(edges, n=n, directed=False, num_parts=3)
    exp = {}
    for comp in nx.connected_components(G):
        mn = min(comp)
        for v in comp:
            exp[v] = mn
    assert components_dict(g) == exp


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(0, 10**6))
def test_triangles_self_edge_invariance(seed):
    # adding self loops must not change triangle counts (offdiag semantics)
    n = 20
    edges = [e for e in _make_edges(seed, n, False) if e[0] != e[1]]
    g1 = Graph(edges, n=n, directed=False, num_parts=3)
    g2 = Graph(edges + [(v, v) for v in range(0, n, 3)], n=n, directed=False, num_parts=3)
    assert total_triangles(g1) == total_triangles(g2)


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(0, 10**6), n=st.integers(2, 4))
def test_ngram_decontaminate_matches_python_sets(seed, n):
    import ray.data

    from graphblas_algorithms_ray.pipelines.dedup import ngram_decontaminate

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(8)]  # tiny vocab -> real collisions of grams

    def doc(i):
        return {"doc_id": i, "text": " ".join(rng.choice(vocab, rng.randint(0, 15)))}

    bench_rows = [doc(100 + i) for i in range(3)]
    train_rows = [doc(i) for i in range(12)]

    def grams(text):
        t = text.split()
        return {tuple(t[i : i + n]) for i in range(len(t) - n + 1)}

    bench_grams = set().union(*(grams(r["text"]) for r in bench_rows))
    expected = {
        r["doc_id"]: len(grams(r["text"]) & bench_grams) for r in train_rows
    }
    res = (
        ngram_decontaminate(
            ray.data.from_items(train_rows), ray.data.from_items(bench_rows), n=n
        )
        .to_pandas()
        .set_index("doc_id")
    )
    for did, nh in expected.items():
        assert res.loc[did, "n_hits"] == nh
        assert bool(res.loc[did, "contaminated"]) == (nh > 0)


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(0, 10**6))
def test_repetition_stats_matches_python(seed):
    from collections import Counter

    import ray.data

    from graphblas_algorithms_ray.pipelines.text import repetition_stats

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(6)]
    rows = [
        {"doc_id": i, "text": " ".join(rng.choice(vocab, rng.randint(0, 12)))}
        for i in range(15)
    ]
    res = repetition_stats(ray.data.from_items(rows)).to_pandas().set_index("doc_id")
    for r in rows:
        t = r["text"].split()
        exp_dup = 1 - len(set(t)) / len(t) if t else 0.0
        bg = Counter(zip(t, t[1:]))
        exp_top = max(bg.values()) / sum(bg.values()) if bg else 0.0
        got = res.loc[r["doc_id"]]
        assert got["n_tokens"] == len(t)
        assert got["dup_token_frac"] == exp_dup
        assert got["top_bigram_frac"] == exp_top


@settings(max_examples=10, deadline=None)
@given(
    ids=st.lists(
        st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=50, unique=True
    )
)
def test_knuth32_matches_duckdb_hugeint(ids):
    # the engine's split/sample hash must equal the HUGEINT SQL the oracles
    # use, including uint64 wraparound above 2^32 (ADVICE r3 class of bug)
    # and NEGATIVE ids (review r5: url-hash doc ids are negative half the
    # time; DuckDB % keeps sign, hence the double-% positive modulo)
    import duckdb

    from graphblas_algorithms_ray.pipelines.text import _knuth32

    got = _knuth32(np.array(ids, dtype=np.int64).view(np.uint64)).astype(
        np.int64
    )
    want = duckdb.sql(
        "SELECT ((CAST(i AS HUGEINT) * 2654435761) % 4294967296"
        " + 4294967296) % 4294967296 AS h "
        "FROM (SELECT unnest(?::BIGINT[]) AS i)",
        params=[ids],
    ).fetchnumpy()["h"]
    assert list(got) == [int(x) for x in want]


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    n=st.integers(1, 8),
    n_rows=st.integers(0, 60),
)
def test_strat_sample_partial_matches_bruteforce(seed, n, n_rows):
    # the per-batch combiner (also the final per-group stage) must pick
    # exactly the n smallest (hash, id) per group with 1-based dense ranks
    import pyarrow as pa

    from graphblas_algorithms_ray.pipelines.text import (
        _knuth32,
        _StratSamplePartial,
    )

    rng = np.random.RandomState(seed)
    ids = rng.choice(10**6, size=n_rows, replace=False).astype(np.int64)
    groups = rng.choice(["a", "b", "c"], size=n_rows)
    t = pa.table({"lang": pa.array(groups), "doc_id": pa.array(ids)})
    out = _StratSamplePartial(n, "lang", emit_rank=True)(t)
    got = {
        (r["lang"], r["doc_id"]): r["sample_rank"] for r in out.to_pylist()
    }
    h = _knuth32(ids)
    want = {}
    for gname in set(groups.tolist()):
        members = sorted(
            (int(h[j]), int(ids[j])) for j in range(n_rows) if groups[j] == gname
        )
        for rank, (_, did) in enumerate(members[:n], start=1):
            want[(gname, did)] = rank
    assert got == want
