"""Near-dup dedup (MinHash-LSH, SimHash), exact dedup, set operators."""

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.dedup import (
    minhash_near_duplicates,
    simhash_fingerprints,
    simhash_near_duplicates,
)
from graphblas_algorithms_ray.pipelines.text import dedup_keep_first, exact_dedup
from graphblas_algorithms_ray.pipelines import operators as ops


def _docs_with_dups():
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest where tall trees grow thick"
    )
    rows = []
    for i in range(20):
        rows.append({"doc_id": i, "text": f"document {i} " + " ".join(f"w{i}x{j}" for j in range(30))})
    # near-dup cluster: 20,21,22 share base with tiny edits
    rows.append({"doc_id": 20, "text": base})
    rows.append({"doc_id": 21, "text": base + " extra"})
    rows.append({"doc_id": 22, "text": base.replace("quick", "swift")})
    # exact dups: 23 == 24
    rows.append({"doc_id": 23, "text": "identical content here"})
    rows.append({"doc_id": 24, "text": "identical content here"})
    return ray.data.from_items(rows)


def test_minhash_lsh_finds_near_dups():
    docs = _docs_with_dups()
    pairs, groups = minhash_near_duplicates(docs, threshold=0.5)
    found = {(r["a"], r["b"]) for r in pairs.take_all()}
    assert (20, 21) in found and (20, 22) in found
    # unrelated docs are not paired
    assert all(a >= 20 for a, b in found)
    gmap = {r["doc_id"]: r["group"] for r in groups.take_all()}
    assert gmap[20] == gmap[21] == gmap[22] == 20
    assert gmap[5] == 5


def test_exact_dedup_keeps_min_doc():
    docs = _docs_with_dups()
    kept = dedup_keep_first(docs)
    ids = {r["doc_id"] for r in kept.select_columns(["doc_id"]).take_all()}
    assert 23 in ids and 24 not in ids
    groups = {r["h"]: (r["keeper"], r["n"]) for r in exact_dedup(docs).take_all()}
    assert (23, 2) in groups.values()


def test_simhash_near_dups():
    docs = _docs_with_dups()
    fps = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).take_all()}
    assert fps[23] == fps[24]  # identical text → identical fingerprint
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_duplicates(docs, max_hamming=3).take_all()}
    assert pairs.get((23, 24)) == 0


def test_set_operators():
    G1 = nx.gnp_random_graph(30, 0.2, seed=1, directed=True)
    G2 = nx.gnp_random_graph(30, 0.2, seed=2, directed=True)
    g1 = Graph.from_networkx(G1, num_parts=3)
    g2 = Graph.from_networkx(G2, num_parts=3)

    e1, e2 = set(G1.edges()), set(G2.edges())

    def edges_of(g):
        return {(r["src"], r["dst"]) for r in g.edges_ds().take_all()}

    assert edges_of(ops.intersection(g1, g2)) == (e1 & e2)
    assert edges_of(ops.difference(g1, g2)) == (e1 - e2)
    assert edges_of(ops.symmetric_difference(g1, g2)) == (e1 ^ e2)
    assert edges_of(ops.compose(g1, g2)) == (e1 | e2)

    du = ops.disjoint_union(g1, g2)
    assert du.n == 60
    assert edges_of(du) == e1 | {(u + 30, v + 30) for u, v in e2}

    comp = ops.complement(g1)
    assert edges_of(comp) == {
        (u, v) for u in range(30) for v in range(30) if u != v and (u, v) not in e1
    }


def test_linalg_builders():
    import pandas as pd
    from graphblas_algorithms_ray.pipelines.linalg import (
        laplacian_matrix,
        normalized_laplacian_matrix,
    )

    G = nx.path_graph(4)
    g = Graph.from_networkx(G, num_parts=2)
    L = laplacian_matrix(g).to_pandas()
    dense = np.zeros((4, 4))
    for _, r in L.iterrows():
        dense[int(r["row"]), int(r["col"])] += r["value"]
    exp = np.array(
        [[1, -1, 0, 0], [-1, 2, -1, 0], [0, -1, 2, -1], [0, 0, -1, 1]], dtype=float
    )
    np.testing.assert_allclose(dense, exp)

    NL = normalized_laplacian_matrix(g).to_pandas()
    dense = np.zeros((4, 4))
    for _, r in NL.iterrows():
        dense[int(r["row"]), int(r["col"])] += r["value"]
    d = np.array([1, 2, 2, 1], dtype=float)
    a = np.abs(exp) * (exp < 0)
    exp_nl = np.eye(4) - np.diag(1 / np.sqrt(d)) @ a @ np.diag(1 / np.sqrt(d))
    np.testing.assert_allclose(dense, exp_nl, atol=1e-12)


def test_bethe_hessian_matrix():
    # H = (r²−1)I + D − rA (reference linalg/bethehessianmatrix.py:6-25)
    from graphblas_algorithms_ray.pipelines.linalg import bethe_hessian_matrix

    G = nx.gnp_random_graph(12, 0.3, seed=9)
    g = Graph.from_networkx(G, num_parts=3)
    A = nx.to_numpy_array(G)
    d = A.sum(axis=1)
    r_def = float((d * d).sum() / d.sum() - 1.0)
    for r_arg, r_val in ((None, r_def), (1.5, 1.5)):
        H = bethe_hessian_matrix(g, r=r_arg).to_pandas()
        dense = np.zeros((12, 12))
        for _, row in H.iterrows():
            dense[int(row["row"]), int(row["col"])] += row["value"]
        exp = (r_val**2 - 1.0) * np.eye(12) + np.diag(d) - r_val * A
        np.testing.assert_allclose(dense, exp, atol=1e-12)


def test_modularity_matrix_factored():
    # B = A − k kᵀ / m, m = Σk (reference linalg/modularitymatrix.py:8-16)
    from graphblas_algorithms_ray.pipelines.linalg import modularity_matrix

    G = nx.gnp_random_graph(12, 0.3, seed=10)
    g = Graph.from_networkx(G, num_parts=3)
    A_ds, k_ds, m = modularity_matrix(g)
    A = np.zeros((12, 12))
    for _, row in A_ds.to_pandas().iterrows():
        A[int(row["row"]), int(row["col"])] += row["value"]
    kdf = k_ds.to_pandas().sort_values("v")
    k = kdf["degree"].values.astype(float)
    B = A - np.outer(k, k) / m
    A_nx = nx.to_numpy_array(G)
    k_nx = A_nx.sum(axis=1)
    exp = A_nx - np.outer(k_nx, k_nx) / k_nx.sum()
    np.testing.assert_allclose(B, exp, atol=1e-12)


def test_minhash_hot_bucket_linear():
    # VERDICT r1: a degenerate bucket (hundreds of identical docs) must
    # produce O(bucket) pair rows (star edges), not C(s,2)
    docs = ray.data.from_items(
        [{"doc_id": i, "text": "same boilerplate text " * 15} for i in range(300)]
    )
    pairs, groups = minhash_near_duplicates(docs, threshold=0.5)
    prs = pairs.take_all()
    assert len(prs) == 299  # star around doc 0
    assert all(r["a"] == 0 for r in prs)
    gmap = {r["doc_id"]: r["group"] for r in groups.take_all()}
    assert all(g == 0 for g in gmap.values())


def test_simhash_hot_bucket_star():
    # identical fingerprints collapse to a star (hamming 0), O(group) rows
    docs = ray.data.from_items(
        [{"doc_id": i, "text": "exactly the same words here"} for i in range(100)]
    )
    pairs = simhash_near_duplicates(docs, max_hamming=3).take_all()
    assert len(pairs) == 99
    assert all(r["a"] == 0 and r["hamming"] == 0 for r in pairs)


def test_ngram_decontaminate_exact_and_edges():
    from graphblas_algorithms_ray.pipelines.dedup import ngram_decontaminate

    bench_rows = [
        {"doc_id": 100, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 101, "text": "one two three"},  # < n tokens: no grams
    ]
    train_rows = [
        # contains bench 5-gram "beta gamma delta epsilon zeta" twice ->
        # distinct count is still 1
        {"doc_id": 0, "text": "x beta gamma delta epsilon zeta y "
                              "beta gamma delta epsilon zeta"},
        # two DISTINCT bench grams (sliding windows of the bench doc)
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 2, "text": "totally unrelated words nothing shared here at all"},
        {"doc_id": 3, "text": "one two three"},  # short on both sides: clean
        {"doc_id": 4, "text": ""},  # empty text
    ]
    res = (
        ngram_decontaminate(
            ray.data.from_items(train_rows),
            ray.data.from_items(bench_rows),
            n=5,
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert res.loc[0, "n_hits"] == 1 and bool(res.loc[0, "contaminated"])
    assert res.loc[1, "n_hits"] == 2 and bool(res.loc[1, "contaminated"])
    assert res.loc[2, "n_hits"] == 0 and not bool(res.loc[2, "contaminated"])
    assert res.loc[3, "n_hits"] == 0
    assert res.loc[4, "n_hits"] == 0

    # empty benchmark side -> every training doc is clean
    res2 = (
        ngram_decontaminate(
            ray.data.from_items(train_rows),
            ray.data.from_items([{"doc_id": 9, "text": "ab"}]),
            n=5,
        )
        .to_pandas()
    )
    assert (res2["n_hits"] == 0).all()


def test_ngram_decontaminate_matches_duckdb_sf0001():
    import duckdb

    from graphblas_algorithms_ray.api import ORACLE_SQL, QUERIES

    res = (
        QUERIES["ngram_decontaminate"]("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    exp = con.execute(ORACLE_SQL["ngram_decontaminate"]).df()
    assert res.astype(exp.dtypes.to_dict()).equals(exp)
    assert exp["contaminated"].sum() > 0  # the planted near-dups hit
