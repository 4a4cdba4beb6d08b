"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself BEFORE importing this module;
nothing here (or in the library) calls ray.init()/ray.shutdown().

``entry()``   — flagship pipeline on /root/testdata/sf0.001: synthesize the
                Common-Crawl-style corpus, extract links, build the graph,
                run PageRank, join scores back to urls.
``queries()`` — one callable per implemented operator (SURVEY.md §2);
                each takes sf_dir and returns Dataset/DataFrame/Table.
``oracle_sql()`` — matching DuckDB SQL per SQL-expressible query, same
                column names and value representations.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Corpus → link extraction → Graph → PageRank → top-1000 url scores."""
    import ray.data

    from graphblas_algorithms_ray.sources.corpus import corpus_parquet, read_corpus
    from graphblas_algorithms_ray.sources.extract import graph_from_corpus
    from graphblas_algorithms_ray.pipelines.pagerank import pagerank

    from graphblas_algorithms_ray.stages.hashjoin import lookup_join

    corpus = read_corpus(corpus_parquet(1000))
    g, dictionary = graph_from_corpus(corpus, num_parts=8)
    pr = pagerank(g)
    # join scores back to urls fully distributed (bucketed hash join —
    # both sides have one row per vertex; neither touches the driver),
    # then a distributed top-k; only the final 1000 rows materialize.
    joined = lookup_join(pr, "v", dictionary, "vid", "url", "url")
    top = joined.select_columns(["url", "pagerank"]).sort(
        "pagerank", descending=True
    ).limit(1000)
    return top.to_pandas().reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from graphblas_algorithms_ray.api import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from graphblas_algorithms_ray.api import ORACLE_SQL

    return dict(ORACLE_SQL)
