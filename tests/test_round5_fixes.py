"""Round-5 ADVICE fixes: non-integer session keys, the pre_symmetrized
constructor contract, and the oracle-side-table guard."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data


def test_sessionize_string_user_ids():
    # ADVICE r4: _CoarseKey/_GroupedSessions int64-cast crashed string ids
    from graphblas_algorithms_ray.pipelines.events import sessionize

    base = 1_700_000_000_000_000  # us
    rows = {
        "user_id": ["alice", "alice", "bob", "bob", "bob"],
        "event_id": [1, 2, 3, 4, 5],
        "ts": pa.array(
            [base, base + 60_000_000, base, base + 31 * 60_000_000,
             base + 32 * 60_000_000],
            pa.timestamp("us"),
        ),
    }
    out = sessionize(ray.data.from_arrow(pa.table(rows)), gap_minutes=30).to_pandas()
    got = {
        (r["user_id"], int(r["session_id"])): int(r["n_events"])
        for _, r in out.iterrows()
    }
    assert got == {("alice", 0): 2, ("bob", 0): 1, ("bob", 1): 2}


def test_sessionize_float_ids_do_not_merge():
    # float ids 1.2 and 1.7 must stay distinct users (int64 cast truncated)
    from graphblas_algorithms_ray.pipelines.events import sessionize

    base = 1_700_000_000_000_000
    rows = {
        "user_id": [1.2, 1.7],
        "event_id": [1, 2],
        "ts": pa.array([base, base + 1_000_000], pa.timestamp("us")),
    }
    out = sessionize(ray.data.from_arrow(pa.table(rows)), gap_minutes=30).to_pandas()
    assert len(out) == 2
    assert sorted(out["user_id"]) == [1.2, 1.7]
    assert (out["n_events"] == 1).all()


def test_coarse_key_string_column():
    from graphblas_algorithms_ray.pipelines.dedup import _CoarseKey

    t = pa.table({"k": ["x", "y", "x"], "v": [1, 2, 3]})
    out = _CoarseKey(["k"])(t)
    g = out["__g"].to_numpy(zero_copy_only=False)
    assert g[0] == g[2]  # same key -> same coarse group, deterministic


def test_pre_symmetrized_contract():
    from graphblas_algorithms_ray.state.graph import Graph

    t = pa.table({"src": pa.array([0], pa.int64()), "dst": pa.array([1], pa.int64())})
    ref = ray.put(t)
    g = Graph([ref], n=2, directed=False)
    with pytest.raises(ValueError, match="pre_symmetrized"):
        g._ensure_built()
    # directed=True Graph on the symmetrized path still works end-to-end
    und = Graph([(0, 1)], n=2, directed=False)
    und._ensure_built()
    assert und.m == 2  # both directions present


def test_oracle_side_table_guard(tmp_path):
    # writers decline above _MAX_ORACLE_ROWS -> the query callable must
    # raise a clear 'oracle unavailable' instead of comparing cross-scale
    from graphblas_algorithms_ray.api import _oracle_side_table

    def _declining_writer(sf_dir):
        return None

    _declining_writer.__name__ = "write_fake_expected"
    with pytest.raises(RuntimeError, match="declined"):
        _oracle_side_table(_declining_writer, str(tmp_path))

    def _cross_scale_writer(sf_dir):
        return "/tmp/gar/expected/sf9.99/fake.parquet"

    with pytest.raises(RuntimeError, match="cross-scale"):
        _oracle_side_table(_cross_scale_writer, str(tmp_path))


def test_graph_pickles_without_derive_lock():
    """Graphs ride into map_batches closures (clustering_directed's wedge
    probes); the driver-local _derive_lock (threading.RLock) must not ride
    along or cloudpickle rejects the whole UDF."""
    import pickle

    from graphblas_algorithms_ray.state.graph import Graph

    edges = ray.data.from_arrow(
        pa.table({"src": [0, 1, 2], "dst": [1, 2, 0]})
    )
    g = Graph(edges, n=3, directed=True, num_parts=2)
    g._ensure_built()
    g2 = pickle.loads(pickle.dumps(g))
    assert g2.n == 3 and g2._derive_lock is not None
    # and the end-to-end path that originally failed: a directed
    # clustering over a graph captured in a map_batches closure
    from graphblas_algorithms_ray.pipelines.cluster_directed import (
        clustering_directed,
    )

    out = clustering_directed(g).to_pandas()
    assert len(out) == 3


def test_queries_order_never_driver_verified_first():
    # VERDICT r4 #4: the correctness driver records at most ~50 queries per
    # round; the ten that had never landed a driver row must stay FIRST in
    # QUERIES so they fall inside the driver's window. Pin the prefix so a
    # future reordering doesn't silently undo the rotation.
    from graphblas_algorithms_ray.api import QUERIES

    first21 = list(QUERIES)[:21]
    assert first21 == [
        "language_id",
        "laplacian",
        "bethe_hessian",
        "square_clustering",
        "transitivity_directed",
        "clustering_directed",
        "multi_source_bfs",
        "corpus_pagerank",
        "corpus_components",
        "corpus_extract_text",
        # round-5 late additions — also no driver row yet
        "ngram_decontaminate",
        "repetition_stats",
        "ann_topk_ivf",
        "ann_topk_ivf_indexed",
        "stratified_sample",
        "source_quota_sample",
        "mix_sample",
        "pack_shards",
        "truncate_tokens",
        "host_stats",
        "url_normalize",
    ]
    # and the long-recorded core suite still follows inside the window
    assert list(QUERIES)[21:25] == ["edges", "out_degree", "in_degree",
                                    "degree_centrality"]
