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
