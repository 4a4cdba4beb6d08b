"""Structure measures: reciprocity, isolates, s-metric, boundary/cuts,
community edge counts, regularity, degree tables.

Each is a thin composition of the engine's physical primitives (SURVEY.md
§2.7/§2.8): vectorized edge-table map_batches (with per-batch pre-combine)
plus at most one groupby shuffle; set membership against the CSR shards is
a zero-copy probe (same pattern as the triangle closing-edge check).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import named, universe


class _EdgeProbe:
    """Probe (a,b) pairs for membership in the graph's edge set; pairs must
    be routed to part(a). Emits the surviving pairs."""

    def __init__(self, csr_refs, n):
        self.csr_refs, self.n = csr_refs, n
        self._keys = {}

    def keys_for(self, k: int) -> np.ndarray:
        if k not in self._keys:
            csr = ray.get(self.csr_refs[k])
            cnt = np.diff(csr["indptr"])
            self._keys[k] = np.repeat(csr["srcs"], cnt) * np.int64(self.n) + csr["dst"]
        return self._keys[k]

    def member(self, k: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        keys = self.keys_for(k)
        want = a * np.int64(self.n) + b
        if keys.size == 0:
            return np.zeros(a.size, dtype=bool)
        pos = np.minimum(np.searchsorted(keys, want), keys.size - 1)
        return keys[pos] == want


def reciprocated_edge_count(G) -> int:
    """|E ∩ Eᵀ| — directed edges whose reverse also exists (self-loops are
    their own reverse). Reference ``recip_degrees`` self-join semantics
    (``classes/digraph.py:119-235``)."""
    G._ensure_built()
    P, n = G.num_parts, G.n
    probe = _EdgeProbe(G.csr_refs, n)

    def _route(t: pa.Table) -> pa.Table:
        # reverse pair (dst, src) lives in shard dst % P
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((d % P).astype(np.int32)),
                "a": t["dst"],
                "b": t["src"],
            }
        )

    class _Count:
        def __call__(self, g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return pa.table({"c": pa.array([], pa.int64())})
            k = int(g["part"][0].as_py())
            a = g["a"].to_numpy(zero_copy_only=False)
            b = g["b"].to_numpy(zero_copy_only=False)
            ok = probe.member(k, a, b)
            return pa.table({"c": pa.array([int(ok.sum())], pa.int64())})

    out = (
        G.edges_ds()
        .map_batches(_route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(named(_Count()), batch_format="pyarrow")
        .sum("c")
    )
    return int(out or 0)


def overall_reciprocity(G) -> float:
    """reciprocated / total directed edges (``algorithms/reciprocity.py:16-22``)."""
    G._ensure_built()
    if G.m == 0:
        raise ValueError("reciprocity of an empty graph")
    return reciprocated_edge_count(G) / G.m


def reciprocity(G, nodes=None) -> ray.data.Dataset:
    """Per-node reciprocity 2·recip_degrees⁺ / total_degrees⁺ (reference
    ``algorithms/reciprocity.py:8-14``): for each vertex, the fraction of
    its incident arcs whose reverse also exists (self-loops reciprocate
    themselves). Vertices with zero total degree are absent (the
    reference's truediv-union mask). Dataset (v, reciprocity)."""
    G._ensure_built()
    P, n = G.num_parts, G.n
    probe = _EdgeProbe(G.csr_refs, n)
    out_aux = G.aux_refs
    in_aux = G.reverse().aux_refs if G.directed else G.aux_refs

    def _route(t: pa.Table) -> pa.Table:
        # probe the reverse pair (dst, src) in shard dst % P; remember src
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((d % P).astype(np.int32)),
                "a": t["dst"],
                "b": t["src"],
            }
        )

    class _RecipPartial:
        """Per probe bucket: reciprocated-out-edge counts, routed to the
        SOURCE vertex's part for the universe-aligned combine."""

        def __call__(self, g: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "v": pa.array([], pa.int64()),
                    "r": pa.array([], pa.int64()),
                }
            )
            if g.num_rows == 0:
                return empty
            k = int(g["part"][0].as_py())
            a = g["a"].to_numpy(zero_copy_only=False)
            b = g["b"].to_numpy(zero_copy_only=False)
            ok = probe.member(k, a, b)
            src = b[ok]  # b was the original src
            uv, cnt = np.unique(src, return_counts=True)
            return pa.table(
                {
                    "part": pa.array((uv % P).astype(np.int32)),
                    "v": pa.array(uv),
                    "r": pa.array(cnt.astype(np.int64)),
                }
            )

    class _EmitAll:
        """Per source part: dense recip counts over the universe; emit every
        vertex with total degree > 0 (the reference's union mask)."""

        def __call__(self, g: pa.Table) -> pa.Table:
            k = int(g["part"][0].as_py())
            from .._util import universe, universe_size

            usize = universe_size(k, n, P)
            rd = np.zeros(usize, dtype=np.int64)
            v = g["v"].to_numpy(zero_copy_only=False)
            np.add.at(rd, v // P, g["r"].to_numpy(zero_copy_only=False))
            tot = ray.get(out_aux[k])["out_cnt"] + ray.get(in_aux[k])["out_cnt"]
            sel = tot > 0
            uni = universe(k, n, P)
            return pa.table(
                {
                    "v": pa.array(uni[sel]),
                    "reciprocity": pa.array(2.0 * rd[sel] / tot[sel]),
                }
            )

    per_part = (
        G.edges_ds()
        .map_batches(_route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(named(_RecipPartial()), batch_format="pyarrow")
        .groupby("part")
        .map_groups(named(_EmitAll()), batch_format="pyarrow")
        .materialize()
    )
    # parts with no reciprocated edges never reach _EmitAll; fill them
    have = set()
    for row in per_part.map_batches(
        lambda t: pa.table(
            {"p": pa.array(np.unique(t["v"].to_numpy(zero_copy_only=False) % P).astype(np.int32))}
        ),
        batch_format="pyarrow",
    ).take_all():
        have.add(int(row["p"]))

    class _FillZero:
        def __call__(self, t: pa.Table) -> pa.Table:
            from .._util import universe

            out_v, out_r = [], []
            for k in t["id"].to_numpy(zero_copy_only=False):
                k = int(k)
                tot = ray.get(out_aux[k])["out_cnt"] + ray.get(in_aux[k])["out_cnt"]
                uni = universe(k, n, P)
                sel = tot > 0
                out_v.append(uni[sel])
                out_r.append(np.zeros(int(sel.sum())))
            return pa.table(
                {
                    "v": pa.array(
                        np.concatenate(out_v) if out_v else np.empty(0, np.int64)
                    ),
                    "reciprocity": pa.array(
                        np.concatenate(out_r) if out_r else np.empty(0, np.float64)
                    ),
                }
            )

    missing = [k for k in range(P) if k not in have]
    if missing:
        fill = ray.data.from_items([{"id": k} for k in missing]).map_batches(
            _FillZero(), batch_format="pyarrow"
        )
        per_part = per_part.union(fill)
    ds = per_part
    if nodes is not None:
        wanted = np.asarray(sorted(int(x) for x in nodes), np.int64)
        import pyarrow.compute as pc

        ds = ds.map_batches(
            lambda t: t.filter(pc.is_in(t["v"], value_set=pa.array(wanted))),
            batch_format="pyarrow",
        )
    return ds


def isolates(G) -> ray.data.Dataset:
    """Vertices with zero in+out degree (``algorithms/isolate.py:4-26``)."""
    G._ensure_built()
    out_aux = G.aux_refs
    in_aux = (G.reverse() if G.directed else G).aux_refs
    n, P = G.n, G.num_parts

    class _Emit:
        def __call__(self, t: pa.Table) -> pa.Table:
            vs = []
            for k in t["id"].to_numpy(zero_copy_only=False):
                k = int(k)
                uni = universe(k, n, P)
                if uni.size == 0:
                    continue
                deg = ray.get(out_aux[k])["out_cnt"] + ray.get(in_aux[k])["out_cnt"]
                vs.append(uni[deg == 0])
            return pa.table(
                {"v": pa.array(np.concatenate(vs) if vs else np.empty(0, np.int64))}
            )

    return ray.data.range(P, override_num_blocks=P).map_batches(
        _Emit(), batch_format="pyarrow"
    )


def number_of_isolates(G) -> int:
    return isolates(G).count()


def is_regular(G) -> bool:
    """All degrees equal; directed needs in==out too (``algorithms/regular.py:6-30``)."""
    G._ensure_built()
    df = G.degrees_ds("out").to_pandas()
    if df["degree"].nunique() != 1:
        return False
    if G.directed:
        di = G.reverse().degrees_ds("out").to_pandas()
        if di["degree"].nunique() != 1 or di["degree"].iloc[0] != df["degree"].iloc[0]:
            return False
    return True


def s_metric(G) -> float:
    """Σ deg(u)·deg(v) over undirected edges (``algorithms/smetric.py:6-14``);
    degrees exclude self-loops, edges are the strict upper triangle."""
    g = G.to_undirected() if G.directed else G
    g._ensure_built()
    aux = g.aux_refs
    P = g.num_parts

    class _Mul:
        def __init__(self):
            self._deg = {}

        def deg(self, k):
            if k not in self._deg:
                a = ray.get(aux[k])
                self._deg[k] = a["out_cnt"] - a["out_self"]
            return self._deg[k]

        def __call__(self, t: pa.Table) -> pa.Table:
            u0 = t["src"].to_numpy(zero_copy_only=False)
            w0 = t["dst"].to_numpy(zero_copy_only=False)
            keep = u0 < w0  # strict upper triangle, one orientation
            u, w = u0[keep], w0[keep]
            du = np.empty(u.size, dtype=np.float64)
            dw = np.empty(w.size, dtype=np.float64)
            for k in np.unique(u % P):
                sel = (u % P) == k
                du[sel] = self.deg(int(k))[u[sel] // P]
            for k in np.unique(w % P):
                sel = (w % P) == k
                dw[sel] = self.deg(int(k))[w[sel] // P]
            return pa.table({"x": pa.array([float((du * dw).sum())])})

    out = g.edges_ds().map_batches(_Mul(), batch_format="pyarrow").sum("x")
    return float(out or 0.0)


def cut_metrics(G, s_pred) -> dict:
    """Directed cut/volume/conductance for S = {v : s_pred(v)}.

    s_pred: vectorized numpy bool predicate over vertex ids.
    cut_size = |{(u,v) ∈ E : u∈S, v∉S}| (``algorithms/cuts.py:18-30``),
    volume_s/volume_t = Σ out-degree over S / complement (``cuts.py:33-38``),
    conductance = cut / min(vol_s, vol_t) (``cuts.py:41-54``)."""
    G._ensure_built()

    def _cut(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        c = int((s_pred(s) & ~s_pred(d)).sum())
        return pa.table({"c": pa.array([c], pa.int64())})

    cut = int(G.edges_ds().map_batches(_cut, batch_format="pyarrow").sum("c") or 0)
    deg = G.degrees_ds("out")

    def _vol(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        dg = t["degree"].to_numpy(zero_copy_only=False)
        m = s_pred(v)
        return pa.table(
            {
                "vs": pa.array([int(dg[m].sum())], pa.int64()),
                "vt": pa.array([int(dg[~m].sum())], pa.int64()),
            }
        )

    vols = deg.map_batches(_vol, batch_format="pyarrow")
    agg = vols.aggregate(
        ray.data.aggregate.Sum("vs", alias_name="vs"),
        ray.data.aggregate.Sum("vt", alias_name="vt"),
    )
    vs, vt = int(agg["vs"] or 0), int(agg["vt"] or 0)
    cond = cut / min(vs, vt) if min(vs, vt) > 0 else 0.0
    return {"cut_size": cut, "volume_s": vs, "volume_t": vt, "conductance": cond}


def community_edge_counts(G, comm_fn) -> dict:
    """intra/inter community edge counts for community map comm_fn(v)
    (vectorized). Reference ``algorithms/community/quality.py:6-23`` — one
    pass over the edge table, no per-block loop."""
    G._ensure_built()

    def _cnt(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        intra = int((comm_fn(s) == comm_fn(d)).sum())
        return pa.table(
            {
                "intra": pa.array([intra], pa.int64()),
                "inter": pa.array([t.num_rows - intra], pa.int64()),
            }
        )

    agg = G.edges_ds().map_batches(_cnt, batch_format="pyarrow").aggregate(
        ray.data.aggregate.Sum("intra", alias_name="intra"),
        ray.data.aggregate.Sum("inter", alias_name="inter"),
    )
    return {"intra": int(agg["intra"] or 0), "inter": int(agg["inter"] or 0)}


def partition_edge_counts(G, comm: np.ndarray) -> dict:
    """intra/inter community arc counts for a (possibly PARTIAL) node→block
    assignment array (−1 = unassigned), with the reference's masking
    semantics (``algorithms/community/quality.py:6-23``):

      intra = #{(u,v) ∈ A : comm[u] == comm[v] != −1}
      inter = #{(u,v) ∈ A : comm[v] != −1, comm[u] != comm[v]}

    (inter requires only the DST to be assigned — the reference computes
    ``A @ block`` masked ``~block.S``, so an unassigned src still counts,
    an unassigned dst never does.) One streaming pass over the arc table."""
    G._ensure_built()

    def _cnt(t: pa.Table) -> pa.Table:
        cs = comm[t["src"].to_numpy(zero_copy_only=False)]
        cd = comm[t["dst"].to_numpy(zero_copy_only=False)]
        intra = int(((cs == cd) & (cd >= 0)).sum())
        inter = int(((cs != cd) & (cd >= 0)).sum())
        return pa.table(
            {
                "intra": pa.array([intra], pa.int64()),
                "inter": pa.array([inter], pa.int64()),
            }
        )

    agg = G.edges_ds().map_batches(_cnt, batch_format="pyarrow").aggregate(
        ray.data.aggregate.Sum("intra", alias_name="intra"),
        ray.data.aggregate.Sum("inter", alias_name="inter"),
    )
    return {"intra": int(agg["intra"] or 0), "inter": int(agg["inter"] or 0)}
