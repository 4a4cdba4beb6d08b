"""Kill-resume fixture (FIXTURES.md §5): interrupt PageRank mid-run, resume
from the per-iteration checkpoint, assert the final vector is identical to
the uninterrupted run."""

import shutil

import networkx as nx
import numpy as np

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.pagerank import pagerank_dict
from graphblas_algorithms_ray.stages.fixpoint import ConvergenceFailure, latest_checkpoint


def test_resume_mid_run(tmp_path):
    G = nx.gnp_random_graph(80, 0.06, seed=13, directed=True)
    g = Graph.from_networkx(G, num_parts=3)
    full = pagerank_dict(g)

    ck = str(tmp_path / "ck")
    # simulate a kill after a few iterations: run with max_iter=4 (raises),
    # checkpointing every iteration
    try:
        pagerank_dict(g, max_iter=4, checkpoint_dir=ck, checkpoint_every=1)
    except ConvergenceFailure:
        pass
    it, _, _ = latest_checkpoint(ck)
    assert it <= 3

    resumed = pagerank_dict(g, checkpoint_dir=ck, resume=True)
    assert set(resumed) == set(full)
    np.testing.assert_allclose(
        [resumed[v] for v in sorted(resumed)],
        [full[v] for v in sorted(full)],
        atol=1e-9,
        rtol=0,
    )

    # resuming again from the converged checkpoint returns identical scores
    again = pagerank_dict(g, checkpoint_dir=ck, resume=True)
    np.testing.assert_allclose(
        [again[v] for v in sorted(again)],
        [resumed[v] for v in sorted(resumed)],
        atol=0,
        rtol=0,
    )
    shutil.rmtree(ck)


def test_graph_load_from_checkpoint():
    """Graph-level resume: reconstruct from the build checkpoint without
    re-shuffling; pagerank identical."""
    from graphblas_algorithms_ray import Graph

    G = nx.gnp_random_graph(60, 0.06, seed=31, directed=True)
    g = Graph.from_networkx(G, num_parts=3)
    pr1 = pagerank_dict(g)
    g2 = Graph.load(g.workdir)
    assert (g2.n, g2.m, g2.directed) == (g.n, g.m, g.directed)
    pr2 = pagerank_dict(g2)
    np.testing.assert_allclose(
        [pr1[v] for v in sorted(pr1)], [pr2[v] for v in sorted(pr2)], atol=1e-12
    )


def test_dense_mesh_checkpoint_resume(tmp_path):
    """North-rule checkpointing on the throughput path: the dense mesh
    writes per-iteration per-partition parquet (workers write their own
    parts), and resume continues the iterate to the EXACT uninterrupted
    result."""
    import os

    from graphblas_algorithms_ray.pipelines.components import components_dict
    from graphblas_algorithms_ray.stages.bsp_actors import latest_dense_checkpoint

    G = nx.gnp_random_graph(150, 0.05, seed=91, directed=True)
    g = Graph.from_networkx(G, num_parts=4)
    full = pagerank_dict(g, executor="actors_dense")

    ck = str(tmp_path / "dense_pr")
    # simulated kill: 5 iterations, checkpoint every 2
    pagerank_dict(
        g,
        max_iter=5,
        checkpoint_every=2,
        checkpoint_dir=ck,
        executor="actors_dense",
        raise_on_failure=False,
    )
    dck = latest_dense_checkpoint(ck)
    assert dck is not None and dck[0] == 4  # iterations 0..4 completed
    assert any(f.startswith("part_") for f in os.listdir(dck[1]))
    # row-format reader must NOT pick these up
    assert latest_checkpoint(ck) is None

    resumed = pagerank_dict(g, checkpoint_dir=ck, resume=True, executor="actors_dense")
    # same supersteps from the saved iterate; deposit arrival order varies
    # run-to-run, so float sums reassociate (same bound as executor parity)
    assert set(resumed) == set(full)
    np.testing.assert_allclose(
        [resumed[v] for v in sorted(resumed)],
        [full[v] for v in sorted(full)],
        atol=1e-12,
        rtol=0,
    )

    # resuming a converged checkpoint returns the values straight from disk
    again = pagerank_dict(g, checkpoint_dir=ck, resume=True, executor="actors_dense")
    assert again == resumed

    # connected components on the dense mesh: same protocol, exact labels
    G2 = nx.gnp_random_graph(200, 0.012, seed=92)
    g2 = Graph(list(G2.edges()), n=200, directed=False, num_parts=4)
    cfull = components_dict(g2, executor="actors_dense")
    ck2 = str(tmp_path / "dense_cc")
    components_dict(
        g2, max_iter=2, checkpoint_every=1, checkpoint_dir=ck2, executor="actors_dense"
    )
    assert latest_dense_checkpoint(ck2) is not None
    cres = components_dict(g2, checkpoint_dir=ck2, resume=True, executor="actors_dense")
    assert cres == cfull


def test_cross_format_resume_fallback(tmp_path):
    """A dense-executor resume over a ROW-format checkpoint falls back to
    the Dataset path (and vice versa a Dataset resume ignores dense
    manifests) — both still produce the correct result."""
    G = nx.gnp_random_graph(80, 0.06, seed=93, directed=True)
    g = Graph.from_networkx(G, num_parts=3)
    full = pagerank_dict(g)

    # row-format checkpoint written by the Dataset path
    ck = str(tmp_path / "row")
    try:
        pagerank_dict(g, max_iter=4, checkpoint_dir=ck, checkpoint_every=1)
    except ConvergenceFailure:
        pass
    resumed = pagerank_dict(g, checkpoint_dir=ck, resume=True, executor="actors_dense")
    np.testing.assert_allclose(
        [resumed[v] for v in sorted(resumed)],
        [full[v] for v in sorted(full)],
        atol=1e-9,
        rtol=0,
    )

    # dense checkpoint + Dataset-executor resume: starts fresh, still right
    ck2 = str(tmp_path / "dense")
    pagerank_dict(
        g,
        max_iter=5,
        checkpoint_every=2,
        checkpoint_dir=ck2,
        executor="actors_dense",
        raise_on_failure=False,
    )
    fresh = pagerank_dict(g, checkpoint_dir=str(tmp_path / "none"), resume=True)
    np.testing.assert_allclose(
        [fresh[v] for v in sorted(fresh)],
        [full[v] for v in sorted(full)],
        atol=1e-12,
        rtol=0,
    )
