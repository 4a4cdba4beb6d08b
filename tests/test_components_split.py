"""Split-orientation CC (directed shards, both orientations, no symmetrize).

The fast path runs min-label propagation directly over the directed CSR
shards — forward (owner of s sends x[s] to d) plus backward (owner of d
sends x[d] to s) — which is exact for weakly-connected components because
min is an idempotent commutative monoid: duplicate/reciprocal arcs that
``to_undirected`` would dedup are no-ops. Hub-bearing inputs must fall
back to the symmetrized ``_CCDenseProg`` path (reference semantics:
``algorithms/components/weakly_connected.py:5-8``)."""

import os
import shutil
import tempfile

import networkx as nx

from graphblas_algorithms_ray import Graph
from graphblas_algorithms_ray.pipelines.components import connected_components


def _want(G_nx):
    out = {}
    for comp in nx.weakly_connected_components(G_nx):
        lab = min(comp)
        for v in comp:
            out[v] = lab
    return out


def _got(ds):
    df = ds.to_pandas()
    return dict(zip(df["v"].astype(int), df["component"].astype(int)))


def test_split_cc_random_directed():
    for seed, n, p in ((1, 300, 0.004), (2, 500, 0.002), (3, 80, 0.05)):
        G = nx.gnp_random_graph(n, p, seed=seed, directed=True)
        g = Graph.from_networkx(G, num_parts=7)
        # actors_dense forces the dense regime; hub-free → split path
        got = _got(connected_components(g, executor="actors_dense"))
        assert got == _want(G), f"seed={seed}"


def test_split_cc_hub_fallbacks_exact():
    # out-hub (star source) trips hub_split; in-hub (star sink, out-degree
    # 1 everywhere) trips the per-shard pigeonhole screen — both must fall
    # back to the symmetrized path and stay exact
    os.environ["GRAFT_HUB_DEGREE"] = "50"
    try:
        for reverse in (False, True):
            G = nx.DiGraph()
            for i in range(1, 200):
                G.add_edge(*((i, 0) if reverse else (0, i)))
            G.add_edge(200, 201)
            g = Graph.from_networkx(G, num_parts=5)
            got = _got(connected_components(g, executor="actors_dense"))
            assert got == _want(G), f"reverse={reverse}"
    finally:
        del os.environ["GRAFT_HUB_DEGREE"]


def test_split_cc_checkpoint_resume():
    G = nx.gnp_random_graph(400, 0.004, seed=9, directed=True)
    g = Graph.from_networkx(G, num_parts=6)
    d = tempfile.mkdtemp(prefix="ccsplit_ck_")
    try:
        full = _got(connected_components(g, executor="actors_dense"))
        connected_components(
            g, executor="actors_dense", max_iter=2, checkpoint_dir=d, checkpoint_every=1
        )
        resumed = _got(
            connected_components(g, executor="actors_dense", checkpoint_dir=d, resume=True)
        )
        assert resumed == full == _want(G)
    finally:
        shutil.rmtree(d, ignore_errors=True)
