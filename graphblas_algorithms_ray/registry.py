"""Algorithm registry — the engine's analog of the reference's NetworkX
dispatch surface (``interface.py:9-171`` Dispatcher attribute-per-algorithm,
``_nx_graphblas/__init__.py`` capability dict; SURVEY.md §2.10).

``ALGORITHMS`` maps the NetworkX-style name to a callable taking the
engine ``Graph`` (plus the reference's kwargs), so a pytest-oracle harness
can dispatch the same call either to NetworkX or to this engine:

    from graphblas_algorithms_ray.registry import ALGORITHMS
    ALGORITHMS["pagerank"](g, alpha=0.9)
"""

from __future__ import annotations

from .pipelines.allpairs import (
    all_pairs_shortest_path_length,
    bidirectional_shortest_path_length,
    multi_source_bfs,
)
from .pipelines.centrality import degree_centrality
from .pipelines.cluster_directed import (
    average_clustering_directed,
    clustering_directed,
    transitivity_directed,
)
from .pipelines.components import (
    is_weakly_connected,
    connected_components,
    is_connected,
    node_connected_component,
)
from .pipelines.core import edge_support, generalized_degree, k_truss
from .pipelines.cuts import (
    boundary_expansion,
    conductance,
    cut_size,
    edge_boundary,
    edge_expansion,
    mixing_expansion,
    node_boundary,
    node_boundary_ds,
    node_expansion,
    normalized_cut_size,
    volume,
)
from .pipelines.dedup import (
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_duplicates,
)
from .pipelines.label_prop import label_propagation
from .pipelines.linalg import (
    adjacency_matrix,
    bethe_hessian_matrix,
    directed_modularity_matrix,
    laplacian_matrix,
    modularity_matrix,
    normalized_laplacian_matrix,
)
from .pipelines.link_analysis import (
    eigenvector_centrality,
    hits,
    katz_centrality,
)
from .pipelines.misc import (
    efficiency,
    ego_graph,
    fast_could_be_isomorphic,
    faster_could_be_isomorphic,
    is_dominating_set,
    is_isolate,
    is_k_regular,
    is_simple_path,
    is_tournament,
    is_triad,
    lowest_common_ancestor,
    mutual_weight,
    score_sequence,
    tournament_matrix,
)
from .pipelines.operators import (
    complement,
    compose,
    difference,
    disjoint_union,
    full_join,
    intersection,
    reverse,
    symmetric_difference,
    union,
)
from .pipelines.pagerank import pagerank
from .pipelines.shortest_paths import (
    bellman_ford_path,
    bellman_ford_path_length,
    bellman_ford_path_lengths,
    negative_edge_cycle,
)
from .pipelines.small_fallbacks import (
    floyd_warshall,
    floyd_warshall_predecessor_and_distance,
    google_matrix,
)
from .pipelines.squares import square_clustering
from .pipelines.structure import (
    community_edge_counts,
    is_regular,
    isolates,
    number_of_isolates,
    overall_reciprocity,
    s_metric,
)
from .pipelines.text import (
    dedup_keep_first,
    doc_fingerprint,
    exact_dedup,
    lang_distribution,
    language_id,
    quality_score,
    token_stats,
)
from .pipelines.traversal import (
    ancestors,
    bfs_layers,
    bfs_levels,
    bfs_parents,
    descendants,
    descendants_at_distance,
    has_path,
    single_source_shortest_path_length,
    single_target_shortest_path_length,
)
from .pipelines.triangles import (
    average_clustering,
    clustering,
    total_triangles,
    transitivity,
    triangles,
)
from .pipelines.ann import ann_topk, embedding_centroids, lsh_buckets


def _late(mod: str, name: str):
    """Lazy registry entry (import at call time)."""
    import importlib

    def _f(*a, **kw):
        m = importlib.import_module(f"graphblas_algorithms_ray.{mod}")
        return getattr(m, name)(*a, **kw)

    _f.__name__ = name
    return _f
from .pipelines.events import hourly_windows, sessionize

ALGORITHMS = {
    # link analysis
    "pagerank": pagerank,
    "google_matrix": google_matrix,
    "hits": hits,
    # components / traversal
    "connected_components": connected_components,
    "is_connected": is_connected,
    "is_weakly_connected": is_weakly_connected,
    "node_connected_component": node_connected_component,
    "bfs_layers": bfs_layers,
    "bfs_levels": bfs_levels,
    "bfs_parents": bfs_parents,
    "descendants": descendants,
    "ancestors": ancestors,
    "descendants_at_distance": descendants_at_distance,
    "has_path": has_path,
    "single_source_shortest_path_length": single_source_shortest_path_length,
    "single_target_shortest_path_length": single_target_shortest_path_length,
    "all_pairs_shortest_path_length": all_pairs_shortest_path_length,
    "bidirectional_shortest_path_length": bidirectional_shortest_path_length,
    "multi_source_bfs": multi_source_bfs,
    "lowest_common_ancestor": lowest_common_ancestor,
    # clustering / triangles
    "triangles": triangles,
    "single_triangle": _late("pipelines.triangles", "single_triangle"),
    "single_clustering": _late("pipelines.triangles", "single_clustering"),
    "single_generalized_degree": _late("pipelines.triangles", "single_generalized_degree"),
    "weighted_triangle_sums": _late("pipelines.triangles", "weighted_triangle_sums"),
    "total_triangles": total_triangles,
    "transitivity": transitivity,
    "transitivity_directed": transitivity_directed,
    "clustering": clustering,
    "clustering_directed": clustering_directed,
    "average_clustering": average_clustering,
    "average_clustering_directed": average_clustering_directed,
    "square_clustering": square_clustering,
    "generalized_degree": generalized_degree,
    "k_truss": k_truss,
    "edge_support": edge_support,
    "label_propagation": label_propagation,
    # centrality
    "degree_centrality": degree_centrality,
    "eigenvector_centrality": eigenvector_centrality,
    "katz_centrality": katz_centrality,
    # shortest paths
    "single_source_bellman_ford_path_length": bellman_ford_path_length,
    "bellman_ford_path_lengths": bellman_ford_path_lengths,
    "bellman_ford_path": bellman_ford_path,
    "negative_edge_cycle": negative_edge_cycle,
    "floyd_warshall": floyd_warshall,
    "floyd_warshall_predecessor_and_distance": floyd_warshall_predecessor_and_distance,
    # boundary / cuts
    "edge_boundary": edge_boundary,
    "node_boundary": node_boundary,
    "node_boundary_ds": node_boundary_ds,
    "cut_size": cut_size,
    "volume": volume,
    "normalized_cut_size": normalized_cut_size,
    "conductance": conductance,
    "edge_expansion": edge_expansion,
    "mixing_expansion": mixing_expansion,
    "node_expansion": node_expansion,
    "boundary_expansion": boundary_expansion,
    "community_edge_counts": community_edge_counts,
    # operators
    "union": union,
    "disjoint_union": disjoint_union,
    "intersection": intersection,
    "difference": difference,
    "symmetric_difference": symmetric_difference,
    "compose": compose,
    "complement": complement,
    "full_join": full_join,
    "reverse": reverse,
    # structure predicates / measures
    "overall_reciprocity": overall_reciprocity,
    "is_regular": is_regular,
    "is_k_regular": is_k_regular,
    "isolates": isolates,
    "number_of_isolates": number_of_isolates,
    "is_isolate": is_isolate,
    "is_dominating_set": is_dominating_set,
    "is_simple_path": is_simple_path,
    "is_tournament": is_tournament,
    "score_sequence": score_sequence,
    "tournament_matrix": tournament_matrix,
    "is_triad": is_triad,
    "s_metric": s_metric,
    "mutual_weight": mutual_weight,
    "efficiency": efficiency,
    "fast_could_be_isomorphic": fast_could_be_isomorphic,
    "faster_could_be_isomorphic": faster_could_be_isomorphic,
    "ego_graph": ego_graph,
    # linalg
    "adjacency_matrix": adjacency_matrix,
    "laplacian_matrix": laplacian_matrix,
    "normalized_laplacian_matrix": normalized_laplacian_matrix,
    "bethe_hessian_matrix": bethe_hessian_matrix,
    "modularity_matrix": modularity_matrix,
    "directed_modularity_matrix": directed_modularity_matrix,
    # training-data pipeline ops
    "exact_dedup": exact_dedup,
    "dedup_keep_first": dedup_keep_first,
    "minhash_near_duplicates": minhash_near_duplicates,
    "simhash_fingerprints": simhash_fingerprints,
    "simhash_near_duplicates": simhash_near_duplicates,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "ann_topk": ann_topk,
    "lsh_buckets": lsh_buckets,
    "embedding_centroids": embedding_centroids,
    "language_id": language_id,
    "quality_score": quality_score,
    "token_stats": token_stats,
    "doc_fingerprint": doc_fingerprint,
    "lang_distribution": lang_distribution,
    "hourly_windows": hourly_windows,
    "sessionize": sessionize,
    # per-node reciprocity + NodeSet algebra + nx-dispatch surface (r2)
    "reciprocity": _late("pipelines.structure", "reciprocity"),
    "set_isequal": _late("pipelines.nodeset", "set_isequal"),
    "set_isdisjoint": _late("pipelines.nodeset", "set_isdisjoint"),
    "set_issubset": _late("pipelines.nodeset", "set_issubset"),
    "set_intersection_size": _late("pipelines.nodeset", "set_intersection_size"),
    "set_union_size": _late("pipelines.nodeset", "set_union_size"),
    "map_isequal": _late("pipelines.nodeset", "map_isequal"),
    "bellman_ford_path_lengths": _late("pipelines.shortest_paths", "bellman_ford_path_lengths"),
    "ann_topk_lsh": _late("pipelines.ann", "ann_topk_lsh"),
    "ann_topk_ivf": _late("pipelines.ann", "ann_topk_ivf"),
    "ann_topk_ivf_indexed": _late("pipelines.ann", "ann_topk_ivf_indexed"),
    "ivf_index_write": _late("pipelines.ann", "ivf_index_write"),
    "kmeans_fit": _late("pipelines.ann", "kmeans_fit"),
    "language_id": _late("pipelines.text", "language_id"),
    "stratified_sample": _late("pipelines.text", "stratified_sample"),
    "host_stats": _late("pipelines.text", "host_stats"),
    "pack_shards": _late("pipelines.text", "pack_shards"),
    "mix_sample": _late("pipelines.text", "mix_sample"),
    "truncate_tokens": _late("pipelines.text", "truncate_tokens"),
    "normalize_urls": _late("pipelines.text", "normalize_urls"),
}
