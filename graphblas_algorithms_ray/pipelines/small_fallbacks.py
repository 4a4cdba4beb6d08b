"""Documented small-graph fallbacks (SURVEY.md §7 non-goals at web scale):
``google_matrix`` (dense N×N, reference ``pagerank_alg.py:104-162``) and
``floyd_warshall`` (serial pivots, ``shortest_paths/dense.py:9-111``).

Both refuse to run beyond a hard size guard; the dense work happens in Ray
tasks (per row-block for the google matrix, one task for FW), never on the
driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_DENSE_LIMIT = 4000


def google_matrix(
    G, alpha: float = 0.85, personalization: dict | None = None, dangling: dict | None = None
) -> np.ndarray:
    """Dense PageRank transition matrix (row-stochastic, dangling rows
    filled, teleport blended). Returns a numpy array (small graphs only)."""
    G._ensure_built()
    n = G.n
    if n > _DENSE_LIMIT:
        raise NotImplementedError(f"google_matrix is dense N^2; n={n} > {_DENSE_LIMIT}")
    if n == 0:
        return np.zeros((0, 0))  # nx parity: empty graph → (0, 0) matrix
    p = np.full(n, 1.0 / n)
    if personalization is not None:
        p = np.zeros(n)
        for k, v in personalization.items():
            p[int(k)] = float(v)
        if p.sum() == 0:
            # nx parity: an all-zero personalization vector raises (nx
            # divides 1/sum in pure python; numpy would silently emit nan)
            raise ZeroDivisionError("float division by zero")
        p = p / p.sum()
    dw = p
    if dangling is not None:
        dw = np.zeros(n)
        for k, v in dangling.items():
            dw[int(k)] = float(v)
        if dw.sum() == 0:
            raise ZeroDivisionError("float division by zero")
        dw = dw / dw.sum()

    @ray.remote
    def _densify(edge_tables, n, alpha, p, dw):
        A = np.zeros((n, n))
        for t in edge_tables:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            w = (
                t["weight"].to_numpy(zero_copy_only=False)
                if "weight" in t.column_names
                else np.ones(s.size)
            )
            A[s, d] += w
        rs = A.sum(axis=1)
        dangling_rows = rs == 0
        A[dangling_rows] = dw
        rs = A.sum(axis=1)
        A = A / rs[:, None]
        return alpha * A + (1 - alpha) * p

    refs = G.edges_ds().to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows]
    return ray.get(_densify.remote(tables, n, alpha, p, dw))


def floyd_warshall(G) -> ray.data.Dataset:
    """All-pairs shortest path distances via FW in one Ray task; Dataset
    (src, dst, dist) of FINITE distances. Small graphs only."""
    return _floyd_warshall_impl(G, compute_predecessors=False)[1]


def floyd_warshall_predecessor_and_distance(G):
    """(pred Dataset, dist Dataset): FW with predecessor tracking
    (reference ``shortest_paths/dense.py:82-111``'s
    ``compute_predecessors=True`` variant). pred rows are the finite
    OFF-diagonal pairs ``(src, dst, pred)``; dist matches
    ``floyd_warshall``. Ties keep the earlier predecessor (strict-<
    update, the reference's ``binary.lt`` mask). Small graphs only."""
    return _floyd_warshall_impl(G, compute_predecessors=True)


def _floyd_warshall_impl(G, *, compute_predecessors: bool):
    G._ensure_built()
    n = G.n
    if n > _DENSE_LIMIT // 2:
        raise NotImplementedError(f"floyd_warshall is O(N^3); n={n} too large")

    @ray.remote(num_returns=2)
    def _fw(edge_tables, n, weighted, with_pred):
        D = np.full((n, n), np.inf)
        np.fill_diagonal(D, 0.0)
        P = np.full((n, n), -1, dtype=np.int64)
        for t in edge_tables:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            w = (
                t["weight"].to_numpy(zero_copy_only=False)
                if weighted and "weight" in t.column_names
                else np.ones(s.size)
            )
            np.minimum.at(D, (s, d), w)
            P[s, d] = s  # direct edge: predecessor of d is s regardless
        for kpivot in range(n):
            alt = D[:, kpivot : kpivot + 1] + D[kpivot : kpivot + 1, :]
            if with_pred:
                improve = alt < D
                D[improve] = alt[improve]
                P[improve] = np.broadcast_to(P[kpivot : kpivot + 1, :], (n, n))[
                    improve
                ]
            else:
                np.minimum(D, alt, out=D)
        s, d = np.nonzero(np.isfinite(D))
        dist = pa.table(
            {
                "src": pa.array(s.astype(np.int64)),
                "dst": pa.array(d.astype(np.int64)),
                "dist": pa.array(D[s, d]),
            }
        )
        off = (P[s, d] >= 0) & (s != d)
        pred = pa.table(
            {
                "src": pa.array(s[off].astype(np.int64)),
                "dst": pa.array(d[off].astype(np.int64)),
                "pred": pa.array(P[s, d][off]),
            }
        )
        return pred, dist

    refs = G.edges_ds().to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows]
    pred_ref, dist_ref = _fw.remote(tables, n, G.weighted, compute_predecessors)
    pred_ds = ray.data.from_arrow_refs([pred_ref]) if compute_predecessors else None
    return pred_ds, ray.data.from_arrow_refs([dist_ref])
