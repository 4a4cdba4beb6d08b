"""Square (C4) clustering — reference ``algorithms/cluster.py:227-282``
(papers arXiv:2007.11111 / 0710.0117 cited there); semantics = nx.square_clustering:

    C4(v) = Σ_{u<w ∈ N(v)} q_v(u,w) / Σ_{u<w ∈ N(v)} [ (k_u - degm) +
            (k_w - degm) + q_v(u,w) ],   q_v(u,w) = |N(u) ∩ N(w)| - 1,
            degm = q+1 (+1 more if u~w)

Physical plan (two shuffles):
  1. wedge generation per MIDDLE vertex x: all neighbor pairs (a<b, corner
     x), yielded in bounded chunks (this is the quadratic op the reference
     chunks by "256 MiB" source ranges, nxapi/cluster.py:82-121 — hub
     middles are the scale hazard; chunking bounds memory, not work)
  2. groupby(part(a)): every wedge on pair (a,b) lands together → the group
     count IS |N(a) ∩ N(b)|; per-wedge numerator/denominator computed in
     place (degree lookups from aux shards, a~b membership from the CSR
     probe) and pre-summed per corner
  3. groupby(part(corner)) → final per-vertex sums → divide
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import named, universe, universe_size
from ..stages.spmv import concat_ranges
from .structure import _EdgeProbe

from .._util import chunk_rows

# square-wedge rows ≈ 28 bytes; budget via GRAFT_CHUNKSIZE ('256 MiB' style)
_CHUNK = chunk_rows(28, default="56 MiB")


class _MidWedgeGen:
    """All pairs (a<b) of each middle vertex's neighbor list, corner=middle."""

    def __init__(self, csr_refs, num_parts):
        self.csr_refs, self.P = csr_refs, num_parts

    def __call__(self, t: pa.Table):
        yielded = False
        for k in t["id"].to_numpy(zero_copy_only=False):
            csr = ray.get(self.csr_refs[int(k)])
            srcs, indptr, dst = csr["srcs"], csr["indptr"], csr["dst"]
            bufs_a, bufs_b, bufs_x, size = [], [], [], 0
            for i in range(srcs.size):
                lo, hi = indptr[i], indptr[i + 1]
                nb = dst[lo:hi]
                nb = nb[nb != srcs[i]]  # exclude self loop
                d = nb.size
                if d < 2:
                    continue
                ii, jj = np.triu_indices(d, k=1)
                bufs_a.append(nb[ii])
                bufs_b.append(nb[jj])
                bufs_x.append(np.full(ii.size, srcs[i], np.int64))
                size += ii.size
                if size >= _CHUNK:
                    yield self._emit(bufs_a, bufs_b, bufs_x)
                    bufs_a, bufs_b, bufs_x, size = [], [], [], 0
                    yielded = True
            if size:
                yield self._emit(bufs_a, bufs_b, bufs_x)
                yielded = True
        if not yielded:
            yield pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "x": pa.array([], pa.int64()),
                }
            )

    def _emit(self, A, B, X):
        a = np.concatenate(A)
        return pa.table(
            {
                "part": pa.array((a % self.P).astype(np.int32)),
                "a": pa.array(a),
                "b": pa.array(np.concatenate(B)),
                "x": pa.array(np.concatenate(X)),
            }
        )


class _SquareJoin:
    """Group = all wedges whose pair (a,b) hashes to this part. The count
    of rows per distinct (a,b) is |N(a)∩N(b)|; emit per-corner partials."""

    def __init__(self, csr_refs, aux_refs, n, num_parts):
        self.probe = _EdgeProbe(csr_refs, n)
        self.aux_refs = aux_refs
        self.n, self.P = n, num_parts
        self._deg = {}

    def deg(self, k):
        if k not in self._deg:
            a = ray.get(self.aux_refs[k])
            self._deg[k] = a["out_cnt"] - a["out_self"]
        return self._deg[k]

    def _lookup_deg(self, v):
        out = np.empty(v.size, dtype=np.int64)
        for k in np.unique(v % self.P):
            sel = (v % self.P) == k
            out[sel] = self.deg(int(k))[v[sel] // self.P]
        return out

    def __call__(self, g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"part": pa.array([], pa.int32()), "v": pa.array([], pa.int64()), "num": pa.array([], pa.float64()), "den": pa.array([], pa.float64())}
            )
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        x = g["x"].to_numpy(zero_copy_only=False)
        key = a * np.int64(self.n) + b
        uk, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        cn = cnt[inv]  # |N(a) ∩ N(b)| per wedge row
        q = (cn - 1).astype(np.float64)
        ua, ub = uk // self.n, uk % self.n
        kpart = int(g["part"][0].as_py())
        adj = self.probe.member(kpart, ua, ub)[inv]
        degm = q + 1.0 + adj.astype(np.float64)
        ka = self._lookup_deg(a).astype(np.float64)
        kb = self._lookup_deg(b).astype(np.float64)
        den = (ka - degm) + (kb - degm) + q
        # pre-sum per corner
        ux, xinv = np.unique(x, return_inverse=True)
        snum = np.zeros(ux.size)
        sden = np.zeros(ux.size)
        np.add.at(snum, xinv, q)
        np.add.at(sden, xinv, den)
        return pa.table(
            {
                "part": pa.array((ux % self.P).astype(np.int32)),
                "v": pa.array(ux),
                "num": pa.array(snum),
                "den": pa.array(sden),
            }
        )


class _SquareFinal:
    def __init__(self, n, num_parts):
        self.n, self.P = n, num_parts

    def __call__(self, g: pa.Table) -> pa.Table:
        k = int(g["part"][0].as_py())
        usize = universe_size(k, self.n, self.P)
        num = np.zeros(usize)
        den = np.zeros(usize)
        v = g["v"].to_numpy(zero_copy_only=False)
        np.add.at(num, v // self.P, g["num"].to_numpy(zero_copy_only=False))
        np.add.at(den, v // self.P, g["den"].to_numpy(zero_copy_only=False))
        out = np.zeros(usize)
        nz = den > 0
        out[nz] = num[nz] / den[nz]
        return pa.table(
            {
                "v": pa.array(universe(k, self.n, self.P)),
                "square_clustering": pa.array(out),
            }
        )


def square_clustering(G) -> ray.data.Dataset:
    """(v, square_clustering) over the full universe (0 where undefined)."""
    g = G.to_undirected() if G.directed else G
    g._ensure_built()
    P = g.num_parts
    wedges = ray.data.range(P, override_num_blocks=P).map_batches(
        _MidWedgeGen(g.csr_refs, P), batch_format="pyarrow"
    )
    partials = (
        wedges.groupby("part")
        .map_groups(
            named(_SquareJoin(g.csr_refs, g.aux_refs, g.n, P)), batch_format="pyarrow"
        )
        .groupby("part")
        .map_groups(named(_SquareFinal(g.n, P)), batch_format="pyarrow")
        .materialize()
    )
    # fill parts that received no wedges
    seen = set()
    for r in partials.map_batches(
        lambda t: pa.table(
            {"p": pa.array(np.unique(t["v"].to_numpy(zero_copy_only=False) % P).astype(np.int32))}
        ),
        batch_format="pyarrow",
    ).take_all():
        seen.add(int(r["p"]))
    missing = [k for k in range(P) if k not in seen and universe_size(k, g.n, P)]
    if missing:

        def _fill(t: pa.Table) -> pa.Table:
            vs = []
            for k in t["id"].to_numpy(zero_copy_only=False):
                vs.append(universe(int(k), g.n, P))
            v = np.concatenate(vs) if vs else np.empty(0, np.int64)
            return pa.table(
                {"v": pa.array(v), "square_clustering": pa.array(np.zeros(v.size))}
            )

        partials = partials.union(
            ray.data.from_items([{"id": k} for k in missing]).map_batches(
                _fill, batch_format="pyarrow"
            )
        )
    return partials
