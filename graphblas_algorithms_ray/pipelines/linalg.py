"""Linear-algebra matrix builders (reference ``linalg/``) as (row, col,
value) coordinate Datasets — the sparse matrices stay distributed edge
tables; the dense rank-1 term of the modularity matrix stays FACTORED
(returned as components) exactly as SURVEY.md §2.9 prescribes.

All per-endpoint degree lookups go through the per-part aux arrays
(zero-copy ray.get, shard-local by the shared v % P partitioning).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import universe


def _coo(r, c, v):
    return pa.table(
        {
            "row": pa.array(np.asarray(r, dtype=np.int64)),
            "col": pa.array(np.asarray(c, dtype=np.int64)),
            "value": pa.array(np.asarray(v, dtype=np.float64)),
        }
    )


def adjacency_matrix(G) -> ray.data.Dataset:
    """A as (row, col, value) (``linalg/graphmatrix.py:6-19``)."""
    G._ensure_built()

    def _f(t: pa.Table) -> pa.Table:
        w = (
            t["weight"].to_numpy(zero_copy_only=False)
            if "weight" in t.column_names
            else np.ones(t.num_rows)
        )
        return _coo(
            t["src"].to_numpy(zero_copy_only=False),
            t["dst"].to_numpy(zero_copy_only=False),
            w,
        )

    return G.edges_ds().map_batches(_f, batch_format="pyarrow")


def _degree_diag(G, transform=None) -> ray.data.Dataset:
    aux_refs, n, P = G.aux_refs, G.n, G.num_parts

    class _Emit:
        def __call__(self, t: pa.Table) -> pa.Table:
            rs, vs = [], []
            for k in t["id"].to_numpy(zero_copy_only=False):
                k = int(k)
                uni = universe(k, n, P)
                if uni.size == 0:
                    continue
                d = ray.get(aux_refs[k])["out_wsum"].astype(np.float64)
                if transform is not None:
                    d = transform(d)
                rs.append(uni)
                vs.append(d)
            r = np.concatenate(rs) if rs else np.empty(0, np.int64)
            v = np.concatenate(vs) if vs else np.empty(0, np.float64)
            return _coo(r, r, v)

    return ray.data.range(P, override_num_blocks=P).map_batches(
        _Emit(), batch_format="pyarrow"
    )


def laplacian_matrix(G) -> ray.data.Dataset:
    """L = D - A (``linalg/laplacianmatrix.py:27-30``); (row,col,value)."""
    G._ensure_built()
    neg = adjacency_matrix(G).map_batches(
        lambda t: _coo(
            t["row"].to_numpy(zero_copy_only=False),
            t["col"].to_numpy(zero_copy_only=False),
            -t["value"].to_numpy(zero_copy_only=False),
        ),
        batch_format="pyarrow",
    )
    return _degree_diag(G).union(neg)


def normalized_laplacian_matrix(G) -> ray.data.Dataset:
    """I - D^-1/2 A D^-1/2 (``linalg/laplacianmatrix.py:33-54``)."""
    G._ensure_built()
    aux_refs, n, P = G.aux_refs, G.n, G.num_parts

    class _Scale:
        def __init__(self):
            self._inv = {}

        def invs(self, k):
            if k not in self._inv:
                d = ray.get(aux_refs[k])["out_wsum"]
                with np.errstate(divide="ignore"):
                    iv = 1.0 / np.sqrt(d)
                iv[~np.isfinite(iv)] = 0.0
                self._inv[k] = iv
            return self._inv[k]

        def __call__(self, t: pa.Table) -> pa.Table:
            r = t["src"].to_numpy(zero_copy_only=False)
            c = t["dst"].to_numpy(zero_copy_only=False)
            w = (
                t["weight"].to_numpy(zero_copy_only=False)
                if "weight" in t.column_names
                else np.ones(t.num_rows)
            )
            s = np.empty(r.size)
            for k in np.unique(r % P):
                sel = (r % P) == k
                s[sel] = self.invs(int(k))[r[sel] // P]
            s2 = np.empty(c.size)
            for k in np.unique(c % P):
                sel = (c % P) == k
                s2[sel] = self.invs(int(k))[c[sel] // P]
            return _coo(r, c, -w * s * s2)

    off = G.edges_ds().map_batches(_Scale(), batch_format="pyarrow")
    eye = _degree_diag(G, transform=lambda d: (d > 0).astype(np.float64))
    return eye.union(off)


def bethe_hessian_matrix(G, r: float | None = None) -> ray.data.Dataset:
    """(r²-1)I + D - rA (``linalg/bethehessianmatrix.py:6-25``); default
    regularizer r = sum(d²)/sum(d) - 1 as in the reference."""
    G._ensure_built()
    if r is None:
        # reference: r = (Σd²)/(Σd) − 1 over degrees+ — Dataset aggregate,
        # no driver pull of the degree table
        agg = G.degrees_ds("out").map_batches(
            lambda t: pa.table(
                {
                    "k": pa.array(
                        [float(t["degree"].to_numpy(zero_copy_only=False).sum())]
                    ),
                    "k2": pa.array(
                        [
                            float(
                                (
                                    t["degree"].to_numpy(zero_copy_only=False).astype(np.float64)
                                    ** 2
                                ).sum()
                            )
                        ]
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()  # two aggregates below; avoid lineage re-execution
        k = float(agg.sum("k") or 0.0)
        k2 = float(agg.sum("k2") or 0.0)
        r = k2 / max(k, 1.0) - 1.0
    ident = _degree_diag(G, transform=lambda d: np.full(d.size, r * r - 1.0))
    diag = _degree_diag(G)
    offd = adjacency_matrix(G).map_batches(
        lambda t: _coo(
            t["row"].to_numpy(zero_copy_only=False),
            t["col"].to_numpy(zero_copy_only=False),
            -r * t["value"].to_numpy(zero_copy_only=False),
        ),
        batch_format="pyarrow",
    )
    return ident.union(diag).union(offd)


def modularity_matrix(G):
    """B = A - k kᵀ / m with m = Σk (reference
    ``linalg/modularitymatrix.py:8-16``: ``m = k.reduce()``), kept
    FACTORED: returns (adjacency Dataset, degree Dataset, m) — the dense
    rank-1 term is never materialized (web-scale non-goal to densify).
    For the engine's symmetrized undirected storage Σ out-degree equals
    the stored arc count ``G.m``."""
    G._ensure_built()
    return adjacency_matrix(G), G.degrees_ds("out"), G.m


def directed_modularity_matrix(G):
    """B = A - k_out k_inᵀ / m (reference
    ``linalg/modularitymatrix.py:19-37``), factored like
    ``modularity_matrix``: returns (adjacency Dataset, out-degree Dataset,
    in-degree Dataset, m) with m = Σ k_out = stored arc count — the dense
    rank-1 term k_out·k_inᵀ is never materialized."""
    if not G.directed:
        raise ValueError("directed_modularity_matrix is for directed graphs")
    G._ensure_built()
    return adjacency_matrix(G), G.degrees_ds("out"), G.degrees_ds("in"), G.m
