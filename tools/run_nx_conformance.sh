#!/bin/bash
# Borrowed NetworkX conformance suite for the graphblas_ray backend
# (the engine analog of the reference's run_nx_tests.sh). cwd must be the
# repo root so the plugin and package import inside Ray workers.
#
# networkx.linalg.tests is deliberately NOT listed: every module there does
# pytest.importorskip("scipy") at import time and this container has no
# scipy, so the whole package would collect as 100% SKIPPED — zero signal.
# Linalg dispatch conformance is instead pinned by
# tests/test_interface_round5.py, which checks the dense fallbacks against
# NetworkX's published formulas (numpy assembly) for adjacency/laplacian/
# normalized-laplacian/bethe-hessian/modularity/directed-modularity.
set -e
cd "$(dirname "$0")/.."
NETWORKX_TEST_BACKEND=graphblas_ray NETWORKX_FALLBACK_TO_NX=1 \
python -m pytest -p tools.nx_conformance_plugin -q --pyargs \
    networkx.algorithms.tests.test_cluster \
    networkx.algorithms.tests.test_boundary \
    networkx.algorithms.tests.test_cuts \
    networkx.algorithms.tests.test_reciprocity \
    networkx.algorithms.tests.test_isolate \
    networkx.algorithms.tests.test_regular \
    networkx.algorithms.tests.test_tournament \
    networkx.algorithms.tests.test_dag \
    networkx.algorithms.tests.test_efficiency \
    networkx.algorithms.tests.test_dominating \
    networkx.algorithms.tests.test_smetric \
    networkx.algorithms.tests.test_triads \
    networkx.algorithms.tests.test_simple_paths \
    networkx.algorithms.tests.test_lowest_common_ancestors \
    networkx.algorithms.components.tests.test_connected \
    networkx.algorithms.components.tests.test_weakly_connected \
    networkx.algorithms.link_analysis.tests \
    networkx.algorithms.shortest_paths.tests.test_unweighted \
    networkx.algorithms.shortest_paths.tests.test_weighted \
    networkx.algorithms.shortest_paths.tests.test_dense \
    networkx.algorithms.traversal.tests.test_bfs \
    networkx.generators.tests.test_ego \
    networkx.algorithms.operators.tests.test_binary \
    networkx.algorithms.operators.tests.test_unary \
    networkx.algorithms.tests.test_core \
    networkx.algorithms.centrality.tests.test_katz_centrality \
    networkx.algorithms.centrality.tests.test_eigenvector_centrality \
    networkx.algorithms.centrality.tests.test_degree_centrality \
    networkx.algorithms.community.tests.test_quality \
    networkx.algorithms.shortest_paths.tests.test_generic \
    networkx.algorithms.tests.test_structuralholes \
    "$@"
