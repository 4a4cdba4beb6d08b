"""NodeSet / NodeMap algebra over vertex-id Datasets.

The reference implements set predicates as masked dot products on boolean
Vectors (``classes/nodeset.py:58-81``: isequal/isdisjoint = ``any_pair`` /
``plus_pair`` reductions; ``classes/nodemap.py`` compares values). The
Ray-Data-first analog: one tagged union + per-batch pre-combine +
``groupby(v)`` — the dot product becomes a distributed key-match count.

A NodeSet here is any Dataset with a vertex-id column (default ``v``);
a NodeMap adds a value column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _tagged_partials(ds: ray.data.Dataset, col: str, side: int) -> ray.data.Dataset:
    """Per-batch distinct (v, in_a, in_b) partial rows."""

    def _tag(t: pa.Table) -> pa.Table:
        v = np.unique(t[col].to_numpy(zero_copy_only=False))
        ones = np.ones(v.size, np.int64)
        zeros = np.zeros(v.size, np.int64)
        return pa.table(
            {
                "v": pa.array(v),
                "in_a": pa.array(ones if side == 0 else zeros),
                "in_b": pa.array(zeros if side == 0 else ones),
            }
        )

    return ds.map_batches(_tag, batch_format="pyarrow")


def _membership(a, b, col_a: str = "v", col_b: str = "v") -> ray.data.Dataset:
    """(v, in_a, in_b) with 0/1 membership flags (distinct per side)."""
    u = _tagged_partials(a, col_a, 0).union(_tagged_partials(b, col_b, 1))
    return u.groupby("v").aggregate(
        ray.data.aggregate.Max("in_a", alias_name="in_a"),
        ray.data.aggregate.Max("in_b", alias_name="in_b"),
    )


def set_isequal(a, b, col_a: str = "v", col_b: str = "v") -> bool:
    """Reference ``nodeset.py:58-66`` (any_pair dot product + nvals check)."""
    m = _membership(a, b, col_a, col_b)

    def _bad(t: pa.Table) -> pa.Table:
        ia = t["in_a"].to_numpy(zero_copy_only=False)
        ib = t["in_b"].to_numpy(zero_copy_only=False)
        return pa.table({"bad": pa.array([int((ia != ib).sum())], pa.int64())})

    return (m.map_batches(_bad, batch_format="pyarrow").sum("bad") or 0) == 0


def set_isdisjoint(a, b, col_a: str = "v", col_b: str = "v") -> bool:
    """Reference ``nodeset.py:68-75`` (plus_pair overlap count == 0)."""
    return set_intersection_size(a, b, col_a, col_b) == 0


def set_intersection_size(a, b, col_a: str = "v", col_b: str = "v") -> int:
    m = _membership(a, b, col_a, col_b)

    def _both(t: pa.Table) -> pa.Table:
        ia = t["in_a"].to_numpy(zero_copy_only=False)
        ib = t["in_b"].to_numpy(zero_copy_only=False)
        return pa.table({"c": pa.array([int(((ia == 1) & (ib == 1)).sum())], pa.int64())})

    return int(m.map_batches(_both, batch_format="pyarrow").sum("c") or 0)


def set_union_size(a, b, col_a: str = "v", col_b: str = "v") -> int:
    return int(_membership(a, b, col_a, col_b).count())


def set_issubset(a, b, col_a: str = "v", col_b: str = "v") -> bool:
    """a ⊆ b (reference nodeset issubset via masked reduction)."""
    m = _membership(a, b, col_a, col_b)

    def _only_a(t: pa.Table) -> pa.Table:
        ia = t["in_a"].to_numpy(zero_copy_only=False)
        ib = t["in_b"].to_numpy(zero_copy_only=False)
        return pa.table({"c": pa.array([int(((ia == 1) & (ib == 0)).sum())], pa.int64())})

    return (m.map_batches(_only_a, batch_format="pyarrow").sum("c") or 0) == 0


def map_isequal(a, b, key: str = "v", val_a: str | None = None, val_b: str | None = None, atol: float = 0.0) -> bool:
    """NodeMap equality: same key set AND values equal (within atol).
    Reference ``classes/nodemap.py`` isequal semantics."""
    if val_a is None:
        val_a = [c for c in a.schema().names if c != key][0]
    if val_b is None:
        val_b = [c for c in b.schema().names if c != key][0]

    def _tag(side, val_col):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "v": t[key],
                    "side": pa.array(np.full(t.num_rows, side, np.int8)),
                    "x": t[val_col].cast(pa.float64()),
                }
            )

        _f.__name__ = f"tag{side}"
        return _f

    u = a.map_batches(_tag(0, val_a), batch_format="pyarrow").union(
        b.map_batches(_tag(1, val_b), batch_format="pyarrow")
    )

    class _Check:
        def __init__(self, atol):
            self.atol = atol

        def __call__(self, g: pa.Table) -> pa.Table:
            side = g["side"].to_numpy(zero_copy_only=False)
            x = g["x"].to_numpy(zero_copy_only=False)
            a_vals, b_vals = x[side == 0], x[side == 1]
            bad = (
                a_vals.size != 1
                or b_vals.size != 1
                or abs(a_vals[0] - b_vals[0]) > self.atol
            )
            return pa.table({"bad": pa.array([int(bad)], pa.int64())})

    from .._util import named

    bad = u.groupby("v").map_groups(named(_Check(atol)), batch_format="pyarrow").sum("bad")
    return (bad or 0) == 0
