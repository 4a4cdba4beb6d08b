"""As-of join — match each left row to the most recent right row at or
before it, per key. The operator Ray Data lacks natively; the classic
time-series / event-attribution primitive.

Scale shape: ONE shuffle. Both sides are tagged and unioned (schemas
aligned with null fill), then ``groupby(by)`` co-locates each key's rows
and a numpy ``searchsorted`` merge runs inside ``map_groups``. Per-key
group size is the key's event count — the usual as-of partitioning
assumption (a single hot key's history must fit one task; salt by time
range if that ever breaks).

Tie/dup semantics: ``on`` values equal on the two sides DO match
(``l.on >= r.on``, DuckDB ASOF semantics); duplicate right rows at the
same ``(by, on)`` are resolved deterministically to the row with the
largest ``tie_col`` value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .._util import named


class _Tag:
    """Align a side to the union schema: by, on, __side, then every value
    column (null-filled when the column belongs to the other side)."""

    def __init__(self, by, on, side, schema_cols):
        self.by, self.on, self.side = by, on, side
        self.schema_cols = schema_cols  # [(name, pa.type, source_col|None)]

    def __call__(self, t: pa.Table) -> pa.Table:
        cols = {
            self.by: t[self.by],
            self.on: t[self.on],
            "__side": pa.array(np.full(t.num_rows, self.side, np.int8)),
        }
        for name, typ, src in self.schema_cols:
            cols[name] = t[src] if src is not None else pa.nulls(t.num_rows, typ)
        return pa.table(cols)


class _AsofMerge:
    def __init__(self, by, on, left_cols, right_cols, tie_col):
        self.by, self.on = by, on
        self.left_cols, self.right_cols = left_cols, right_cols
        self.tie_col = tie_col

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        out_cols = (
            [self.by] + self.left_cols + [self.on] + self.right_cols
        )
        r = g[g["__side"] == 0]
        l = g[g["__side"] == 1]
        if len(l) == 0 or len(r) == 0:
            return g.iloc[0:0][[self.by, self.on] + self.left_cols].assign(
                **{c: pd.Series(dtype=r[c].dtype) for c in self.right_cols}
            )[out_cols]
        # dedup right at equal `on`: keep the max tie_col row (stable sort
        # then last-per-on)
        r = r.sort_values([self.on, self.tie_col], kind="stable")
        keep_last = np.ones(len(r), dtype=bool)
        ron = r[self.on].values
        keep_last[:-1] = ron[:-1] != ron[1:]
        r = r[keep_last]
        ron = r[self.on].values
        idx = np.searchsorted(ron, l[self.on].values, side="right") - 1
        matched = idx >= 0
        l = l[matched]
        ridx = idx[matched]
        out = {self.by: l[self.by].values, self.on: l[self.on].values}
        for c in self.left_cols:
            out[c] = l[c].values
        for c in self.right_cols:
            out[c] = r[c].values[ridx]
        return pd.DataFrame(out)[out_cols]


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    by: str,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    tie_col: str | None = None,
) -> ray.data.Dataset:
    """Inner as-of join: for every left row, the most recent right row with
    ``right.on <= left.on`` and the same ``by`` key. Unmatched left rows
    are dropped (inner semantics — NULL-free output compares cleanly).

    ``left_cols`` / ``right_cols`` name the value columns carried from
    each side (must be disjoint; ``by``/``on`` are implicit). ``tie_col``
    (default: first right col) breaks duplicate right timestamps."""
    tie_col = tie_col or right_cols[0]
    lschema = left.schema()
    rschema = right.schema()

    def _typ(schema, name):
        base = schema.base_schema
        if isinstance(base, pa.Schema):
            return base.field(name).type
        # PandasBlockSchema (names + numpy dtypes), not pa.Schema
        i = list(base.names).index(name)
        t = base.types[i]
        return t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t)

    schema_cols = [(c, _typ(lschema, c), None) for c in left_cols] + [
        (c, _typ(rschema, c), None) for c in right_cols
    ]
    left_tag = left.map_batches(
        _Tag(
            by,
            on,
            1,
            [
                (n, t, n if n in left_cols else None)
                for n, t, _ in schema_cols
            ],
        ),
        batch_format="pyarrow",
    )
    right_tag = right.map_batches(
        _Tag(
            by,
            on,
            0,
            [
                (n, t, n if n in right_cols else None)
                for n, t, _ in schema_cols
            ],
        ),
        batch_format="pyarrow",
    )
    unioned = left_tag.union(right_tag)
    merged = unioned.groupby(by).map_groups(
        named(_AsofMerge(by, on, left_cols, right_cols, tie_col)),
        batch_format="pandas",
    )

    # the null-filled union forces int columns to float64 inside the pandas
    # groups; restore every value column's declared type (inner join ==>
    # no nulls survive)
    want = {n: t for n, t, _ in schema_cols}

    def _restore(t: pa.Table) -> pa.Table:
        cols = {}
        for name in t.column_names:
            col = t[name]
            if name in want and col.type != want[name]:
                col = pa.compute.cast(col, want[name])
            cols[name] = col
        return pa.table(cols)

    return merged.map_batches(_restore, batch_format="pyarrow")
