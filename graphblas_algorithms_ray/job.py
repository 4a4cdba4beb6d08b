"""Cluster job entrypoint — the north rule's ``ray job submit`` surface.

On a real fixed-size multi-node cluster::

    ray job submit --working-dir . -- \\
        python -m graphblas_algorithms_ray.job \\
            --corpus s3://bucket/pages/ --out /mnt/results \\
            --kernels pagerank,components,label_propagation,triangles \\
            --num-parts 256 --checkpoint-dir /mnt/ckpt --checkpoint-every 5

and locally (the sandbox proxy) the same module runs under
``RAY_ADDRESS=local``. The module owns the Ray session (the library never
calls ``ray.init``): it connects to whatever cluster the job server
provides via ``address="auto"``.

Contract pieces the entrypoint wires together:

- input: a Parquet corpus of Common-Crawl-style pages
  ``(url, warc_ts, html, text, lang)`` — or, with ``--docs``, the
  deterministic synthetic corpus used by tests/benchmarks;
- ``--num-parts`` is the FIXED partition count that stays constant across
  cluster sizes (the N -> 4N scaling contract varies parallelism only);
- per-iteration, per-partition checkpointing via ``--checkpoint-dir`` /
  ``--checkpoint-every`` / ``--resume`` (iteration-level lineage);
- job-level resume: each kernel's output directory gets a ``_DONE``
  marker once its parquet has fully landed — re-submitting the same job
  skips finished kernels and re-runs only the interrupted one;
- one JSON metrics line on stdout: per-kernel wall seconds plus the
  north-rule throughput figures (PageRank iterations/sec and edges/sec).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Any

GRAPH_KERNELS = ("pagerank", "components", "label_propagation", "triangles")
# curation = the LLM-data tier over the SAME corpus: exact dedup +
# token/stopword quality gates + language allowlist, written as curated
# parquet with the same _DONE resume contract. Opt-in (not in the default
# kernel list — the north rule's default surface is the graph kernels).
KERNELS = GRAPH_KERNELS + ("curation",)


def _parse(argv: list[str] | None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="python -m graphblas_algorithms_ray.job",
        description="Link-graph analytics over a web-page Parquet corpus",
    )
    p.add_argument("--corpus", help="Parquet file/dir of pages "
                   "(url, warc_ts, html, text, lang); omit to synthesize")
    p.add_argument("--docs", type=int, default=10_000,
                   help="synthetic corpus size when --corpus is omitted")
    p.add_argument("--density", type=int, default=1,
                   help="synthetic links-per-page multiplier")
    p.add_argument("--num-parts", type=int, default=32,
                   help="fixed graph partition count (constant across "
                   "cluster sizes; vary parallelism only)")
    p.add_argument("--kernels", default=",".join(GRAPH_KERNELS),
                   help="comma list from: " + ",".join(KERNELS))
    p.add_argument("--min-tokens", type=int, default=20,
                   help="curation: minimum token count gate")
    p.add_argument("--langs", default="en,de,fr",
                   help="curation: language allowlist (comma list)")
    p.add_argument("--pagerank-iters", type=int, default=0,
                   help="fixed supersteps; 0 = converge to --tol")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--lpa-iters", type=int, default=5)
    p.add_argument("--executor", default="actors",
                   choices=("actors", "dataset", "tasks"))
    p.add_argument("--checkpoint-dir",
                   help="per-iteration per-partition checkpoints")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="resume iterative kernels from --checkpoint-dir")
    p.add_argument("--out", help="directory for per-kernel result parquet; "
                   "finished kernels (marked _DONE) are skipped on re-run")
    p.add_argument("--no-url-join", action="store_true",
                   help="emit vertex ids instead of joining urls back")
    return p.parse_args(argv)


def _hash_url_ids(t):
    """(doc_id, url, text, lang): stateless 64-bit url hash as the doc id —
    no dictionary build, no shuffle (collision odds ~(N^2)/2^65, a handful
    at 10^10 docs, each costing one spurious dedup). The hash is the first
    8 bytes of md5 — a stdlib function stable across library versions, so
    persisted doc_ids keep matching after environment upgrades (review r5:
    polars' xxhash carries no cross-version stability guarantee, which is
    fine for in-run grouping but not for ids written to output parquet).
    Module-level so Ray pickles it by reference even when this module runs
    as __main__."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    urls = t["url"].to_pylist()
    buf = b"".join(hashlib.md5(u.encode("utf-8")).digest()[:8] for u in urls)
    h = (
        np.frombuffer(buf, dtype=">i8").astype(np.int64)
        if urls
        else np.empty(0, np.int64)
    )
    return pa.table(
        {
            "doc_id": pa.array(h),
            "url": t["url"],
            "text": t["text"],
            "lang": t["lang"],
        }
    )


def _write(ds, out: str, kernel: str) -> bool:
    """Write one kernel's result parquet; True if skipped (already done).

    Crash-safe: the write lands in a fresh temp dir that is atomically
    renamed over ``dest`` only after it completes, THEN the _DONE marker
    is written. A job killed mid-write leaves only a ``.tmp-*`` dir (swept
    on the next run), never a partially-written ``dest``; a job killed
    between the rename and the marker recomputes into a fresh temp dir and
    replaces ``dest`` wholesale — re-submission can never append a second
    copy of the rows to a surviving directory."""
    import shutil
    import uuid

    dest = os.path.join(out, kernel)
    marker = os.path.join(dest, "_DONE")
    if os.path.exists(marker):
        return True
    os.makedirs(out, exist_ok=True)
    # sweep temp dirs orphaned by an earlier crash of THIS kernel
    for stale in (
        d for d in os.listdir(out) if d.startswith(f".tmp-{kernel}-")
    ):
        shutil.rmtree(os.path.join(out, stale), ignore_errors=True)
    tmp = os.path.join(out, f".tmp-{kernel}-{uuid.uuid4().hex[:8]}")
    ds.write_parquet(tmp)
    if os.path.isdir(dest):  # unmarked leftover from a crash mid-marker
        shutil.rmtree(dest)
    os.rename(tmp, dest)
    with open(marker, "w") as f:
        f.write("ok\n")
    return False


def main(argv: list[str] | None = None) -> dict[str, Any]:
    args = _parse(argv)
    kernels = [k.strip() for k in args.kernels.split(",") if k.strip()]
    unknown = set(kernels) - set(KERNELS)
    if unknown:
        raise SystemExit(f"unknown kernels: {sorted(unknown)}")

    import ray

    if not ray.is_initialized():
        # the job server (or RAY_ADDRESS=local in the sandbox) decides the
        # cluster; the entrypoint owns this session, the library never does.
        # With no cluster and no RAY_ADDRESS, fall back to a local instance
        # instead of surfacing ConnectionError from address="auto".
        addr = os.environ.get("RAY_ADDRESS", "auto")
        try:
            ray.init(address=addr, include_dashboard=False)
        except ConnectionError:
            if addr != "auto":
                raise
            ray.init(address="local", include_dashboard=False)
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .sources.corpus import corpus_parquet, read_corpus
    from .sources.extract import graph_from_corpus
    from .stages.hashjoin import lookup_join

    corpus_path = args.corpus or corpus_parquet(args.docs,
                                                density=args.density)
    timings: dict[str, float] = {}
    graph_kernels = [k for k in kernels if k in GRAPH_KERNELS]
    g = dictionary = None
    if graph_kernels:
        t0 = time.time()
        g, dictionary = graph_from_corpus(read_corpus(corpus_path),
                                          num_parts=args.num_parts)
        if len(graph_kernels) > 1:
            g.prefetch_derived(triangles="triangles" in graph_kernels)
        timings["extract_and_build"] = time.time() - t0

    def _urls(ds, key: str):
        if args.no_url_join or not args.out:
            return ds
        return lookup_join(ds, key, dictionary, "vid", "url", "url")

    ck = dict(checkpoint_dir=args.checkpoint_dir,
              checkpoint_every=args.checkpoint_every, resume=args.resume)
    metrics: dict[str, Any] = {"metric": "link_graph_job",
                               "num_parts": args.num_parts,
                               "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
                               "skipped": []}
    if g is not None:
        metrics["edges"] = g.m
        metrics["vertices"] = g.n

    def _done(kernel: str) -> bool:
        return bool(args.out) and os.path.exists(
            os.path.join(args.out, kernel, "_DONE")
        )

    for kernel in kernels:
        t0 = time.time()
        if kernel != "triangles" and _done(kernel):
            # job-level resume: a finished kernel (data landed, then the
            # marker) is skipped BEFORE any compute — a re-submitted job
            # pays only for the interrupted kernels
            metrics["skipped"].append(kernel)
            timings[kernel] = 0.0
            continue
        if kernel == "pagerank":
            from .pipelines.pagerank import pagerank

            iters = args.pagerank_iters
            res = pagerank(g, tol=(0.0 if iters else args.tol),
                           max_iter=(iters or 200),
                           raise_on_failure=not iters,
                           executor=args.executor, **ck)
            if args.out:
                if _write(_urls(res, "v"), args.out, kernel):
                    metrics["skipped"].append(kernel)
            else:
                res.count()
            dt = time.time() - t0
            if iters:
                # north-rule throughput: supersteps/sec and edge-traversals/
                # sec — only meaningful on the fixed-superstep path (the
                # converge path's iteration count isn't knowable here)
                metrics["pagerank_iters_per_sec"] = round(iters / dt, 3)
                metrics["pagerank_edges_per_sec"] = round(g.m * iters / dt, 1)
        elif kernel == "components":
            from .pipelines.components import connected_components

            res = connected_components(g, executor=args.executor, **ck)
            if args.out:
                if _write(_urls(res, "v"), args.out, kernel):
                    metrics["skipped"].append(kernel)
            else:
                res.count()
        elif kernel == "label_propagation":
            from .pipelines.label_prop import label_propagation

            res = label_propagation(g, max_iter=args.lpa_iters,
                                    executor=args.executor)
            if args.out:
                if _write(_urls(res, "v"), args.out, kernel):
                    metrics["skipped"].append(kernel)
            else:
                res.count()
        elif kernel == "triangles":
            from .pipelines.triangles import total_triangles

            metrics["triangles"] = int(total_triangles(g))
        elif kernel == "curation":
            from .pipelines.text import curate

            pages = read_corpus(
                corpus_path, columns=["url", "text", "lang"]
            ).map_batches(_hash_url_ids, batch_format="pyarrow")
            curated = curate(
                pages,
                min_tokens=args.min_tokens,
                langs=tuple(
                    s.strip() for s in args.langs.split(",") if s.strip()
                ),
            )
            # mirror the graph kernels' _urls guard: the count-only path
            # (no --out) must not pay a full join + second corpus pass
            if args.out and not args.no_url_join:
                from .stages.hashjoin import lookup_join

                dim = pages.select_columns(["doc_id", "url"])
                curated = lookup_join(
                    curated, "doc_id", dim, "doc_id", "url", "url"
                )
            if args.out:
                if _write(curated, args.out, kernel):
                    metrics["skipped"].append(kernel)
            else:
                metrics["curated_docs"] = curated.count()
        timings[kernel] = time.time() - t0

    metrics["queries"] = {k: round(v, 3) for k, v in timings.items()}
    metrics["value"] = round(sum(timings.values()), 3)
    metrics["unit"] = "sec"
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
