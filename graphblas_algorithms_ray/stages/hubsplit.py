"""Explicit hub/skew handling: split hub vertices' out-edges across parts.

The north rule requires hash-partitioning by source vertex *with explicit
skew handling (splitting hub vertices across actors)*. With the plain
``src % P`` layout a power-law hub's entire adjacency row lands in one
partition: that part's superstep does O(deg(hub)) work while its peers
idle. This module implements a PowerLyra-style hybrid cut confined to the
dense mesh (``stages/bsp_actors.DensePool``):

* **low-degree vertices** stay edge-cut exactly as before (row lives with
  its source part);
* **hub rows** (out-degree ≥ threshold) are extracted once from the CSR
  shards and re-grouped **by destination part** — a hub's neighbors hash
  ~uniformly over ``dst % P``, so its D edges split into P chunks of ~D/P
  with no placement heuristic at all.

Superstep protocol (no ``_DenseWorker`` changes needed):

* the hub's OWNER part emits the hub's current state value in the scalars
  dict returned by ``make_pieces`` (key ``HUB_STAT_BASE + global_idx``) —
  scalars are all-reduced with the round's deposits, so every part's
  ``combine`` of the SAME superstep sees them (no one-round staleness,
  no chunk-boundary carry);
* each part's ``combine`` applies the foreign hub edges destined to its
  own universe (a bincount / minimum.at / vote-count over the per-part
  foreign arrays built here), while ``make_pieces`` skips hub rows in the
  owner's CSR (``hub_edge_keep``) so nothing is double-counted.

Scalar values are float64: PageRank values natively; CC/LPA labels are
int64 < 2^53 so the float round-trip is exact.

Reference semantics are untouched — this is pure physical re-partitioning
(the reference holds the whole matrix in shared memory and has no notion
of placement; SURVEY.md §"Skew / hubs").
"""

from __future__ import annotations

import os

import numpy as np
import ray

# Scalar-key namespace for hub values piggybacked on the mesh's "sc"
# all-reduce. Must stay clear of the small-int stat ids (STAT_DELTA etc.).
HUB_STAT_BASE = 1 << 32


def hub_threshold(m: int, num_parts: int) -> int:
    """Default split threshold: a row whose degree is ≥ 1/4 of the average
    per-part edge share can starve the mesh — split it. ``GRAFT_HUB_DEGREE``
    overrides (0 disables)."""
    env = os.environ.get("GRAFT_HUB_DEGREE")
    if env is not None:
        return int(env)
    return max(4096, m // (4 * max(1, num_parts)))


@ray.remote(num_returns=2)
def _shard_hubs(csr, threshold: int):
    """Pass 1 (per shard): hub row metadata + the hub edges themselves."""
    rows = np.nonzero(csr["row_cnt"] >= threshold)[0]
    meta = {
        "vids": csr["srcs"][rows],
        "wsum": csr["row_wsum"][rows],
        "cnt": csr["row_cnt"][rows],
    }
    if rows.size == 0:
        return meta, None
    indptr = csr["indptr"]
    segs = [np.arange(indptr[r], indptr[r + 1]) for r in rows]
    idx = np.concatenate(segs)
    hrow = np.repeat(np.arange(rows.size, dtype=np.int64), csr["row_cnt"][rows])
    edges = {
        "hrow": hrow,  # index into this shard's meta arrays
        "dst": csr["dst"][idx],
        "weight": csr["weight"][idx] if csr.get("weight") is not None else None,
    }
    return meta, edges


@ray.remote
def _bucket_hub_edges(edges, gidx_base, num_parts: int):
    """Pass 2 (per shard): re-key hub edges by GLOBAL hub index and bucket
    them by destination part. Returns a list of P fragments."""
    if edges is None:
        return [None] * num_parts
    fsrc = gidx_base[edges["hrow"]]
    dst = edges["dst"]
    dpart = (dst % num_parts).astype(np.int64)
    order = np.argsort(dpart, kind="stable")
    bounds = np.searchsorted(dpart[order], np.arange(num_parts + 1))
    fsrc_s, dlocal_s = fsrc[order], (dst // num_parts)[order]
    w_s = edges["weight"][order] if edges["weight"] is not None else None
    out = []
    for j in range(num_parts):
        s0, s1 = int(bounds[j]), int(bounds[j + 1])
        if s1 > s0:
            out.append(
                {
                    "fsrc": fsrc_s[s0:s1],
                    "dlocal": dlocal_s[s0:s1],
                    "weight": w_s[s0:s1] if w_s is not None else None,
                }
            )
        else:
            out.append(None)
    return out


@ray.remote
def _concat_frags(*frags):
    live = [f for f in frags if f is not None]
    if not live:
        return None
    return {
        "fsrc": np.concatenate([f["fsrc"] for f in live]),
        "dlocal": np.concatenate([f["dlocal"] for f in live]),
        "weight": np.concatenate([f["weight"] for f in live])
        if live[0]["weight"] is not None
        else None,
    }


def hub_split(g, threshold: int | None = None):
    """Compute (and cache on ``g._cache``) the hub split for a built Graph.

    Returns None when no row crosses the threshold (the common case — the
    kernels then run exactly the pre-split code path), else a dict:
      vids/wsum/cnt : registry arrays over the H hubs (sorted by vid)
      fe_refs       : per destination part, a ref to its foreign-edge
                      arrays {fsrc (global hub idx), dlocal, weight}
      own           : {part: (gidx[], local[])} — hubs each part must emit
      threshold     : the degree cutoff used
    """
    g._ensure_built()
    if threshold is None:
        threshold = hub_threshold(g.m, g.num_parts)
    if threshold <= 0:
        return None
    key = ("hubsplit", threshold)
    if key in g._cache:
        return g._cache[key]
    P = g.num_parts
    pairs = [_shard_hubs.remote(g.csr_refs[k], threshold) for k in range(P)]
    metas = ray.get([p[0] for p in pairs])
    edge_refs = [p[1] for p in pairs]
    vids = np.concatenate([m["vids"] for m in metas])
    if vids.size == 0:
        g._cache[key] = None
        return None
    wsum = np.concatenate([m["wsum"] for m in metas])
    cnt = np.concatenate([m["cnt"] for m in metas])
    order = np.argsort(vids)
    vids, wsum, cnt = vids[order], wsum[order], cnt[order]
    # global index per shard-local hub position (shards have disjoint vids)
    rank_of = np.empty(vids.size, dtype=np.int64)
    rank_of[order] = np.arange(vids.size)
    bases, at = [], 0
    for m in metas:
        bases.append(rank_of[at : at + m["vids"].size])
        at += m["vids"].size
    frag_lists = [
        _bucket_hub_edges.remote(edge_refs[k], bases[k], P) for k in range(P)
    ]
    frag_lists = ray.get(frag_lists)  # lists of P fragment values per shard
    fe_refs = [
        _concat_frags.remote(*[frag_lists[k][j] for k in range(P)])
        for j in range(P)
    ]
    own = {}
    parts = (vids % P).astype(np.int64)
    for p in np.unique(parts):
        sel = np.nonzero(parts == p)[0]
        own[int(p)] = (sel.astype(np.int64), (vids[sel] // P).astype(np.int64))
    split = {
        "vids": vids,
        "wsum": wsum,
        "cnt": cnt,
        "fe_refs": fe_refs,
        "own": own,
        "threshold": int(threshold),
    }
    g._cache[key] = split
    return split


def hub_edge_keep(csr, hub_vids: np.ndarray) -> np.ndarray | None:
    """Per-edge keep mask excluding hub rows from a shard's CSR (None when
    the shard holds no hub rows — the caller skips the filter)."""
    hot = np.isin(csr["srcs"], hub_vids)
    if not hot.any():
        return None
    return ~np.repeat(hot, csr["row_cnt"])


def hub_values(gscalars: dict, fsrc: np.ndarray, registry_size: int,
               default: np.ndarray | float) -> np.ndarray:
    """Resolve the current per-hub values from the round's all-reduced
    scalars (missing keys fall back to ``default`` — only possible before
    the first owner emission, i.e. never within a normal run)."""
    out = np.empty(registry_size, dtype=np.float64)
    if np.isscalar(default):
        out[:] = default
    else:
        out[:] = default
    for i in range(registry_size):
        v = gscalars.get(HUB_STAT_BASE + i)
        if v is not None:
            out[i] = v
    return out[fsrc] if fsrc is not None else out
