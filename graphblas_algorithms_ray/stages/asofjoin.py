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
    """Arrow-native group merge: the side split, right-dup resolution and
    searchsorted run on the group's Arrow table directly — int64 value
    columns never take a float64 detour (a pandas hop would silently
    round ids above 2^53)."""

    def __init__(self, by, on, left_cols, right_cols, tie_col):
        self.by, self.on = by, on
        self.left_cols, self.right_cols = left_cols, right_cols
        self.tie_col = tie_col

    @staticmethod
    def _ordkey(tbl: pa.Table, col: str) -> np.ndarray:
        c = tbl[col]
        if pa.types.is_timestamp(c.type):
            c = pa.compute.cast(c, pa.int64())
        return c.to_numpy(zero_copy_only=False)

    def __call__(self, g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out_cols = [self.by] + self.left_cols + [self.on] + self.right_cols
        side = g["__side"].to_numpy(zero_copy_only=False)
        r = g.filter(pa.array(side == 0)).select(
            [self.by, self.on] + self.right_cols
        )
        l = g.filter(pa.array(side == 1)).select(
            [self.by, self.on] + self.left_cols
        )
        if l.num_rows == 0 or r.num_rows == 0:
            # zero-length ALL columns before table construction (a group
            # with left rows but no right rows would otherwise mix lengths)
            l0 = l.slice(0, 0)
            empty = {self.by: l0[self.by], self.on: l0[self.on]}
            for c in self.left_cols:
                empty[c] = l0[c]
            for c in self.right_cols:
                empty[c] = r[c].slice(0, 0)
            return pa.table(empty).select(out_cols)
        # dedup right at equal `on`: keep the max tie_col row (stable sort
        # by (on, tie) then last-per-on)
        order = np.lexsort(
            (self._ordkey(r, self.tie_col), self._ordkey(r, self.on))
        )
        r = r.take(pa.array(order))
        ron = self._ordkey(r, self.on)
        keep_last = np.ones(len(ron), dtype=bool)
        keep_last[:-1] = ron[:-1] != ron[1:]
        r = r.filter(pa.array(keep_last))
        ron = ron[keep_last]
        idx = np.searchsorted(ron, self._ordkey(l, self.on), side="right") - 1
        matched = idx >= 0
        l = l.filter(pa.array(matched))
        ridx = pa.array(idx[matched])
        out = {self.by: l[self.by], self.on: l[self.on]}
        for c in self.left_cols:
            out[c] = l[c]
        for c in self.right_cols:
            out[c] = r[c].take(ridx)
        return pa.table(out).select(out_cols)


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
        batch_format="pyarrow",
    )

    # safety net: if any engine-internal conversion widened a declared
    # type, cast it back (inner join ==> no nulls survive the merge)
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
