"""Bucketed hash join — the scale path when both join sides are large.

The portable Ray Data pattern (no Dataset.join dependency): add
``bucket = stable_hash(key) % B`` to both sides, union them with a side
tag, ``groupby(bucket)``, and join matching buckets inside ``map_groups``.
Skew note: bucket count B is the salt granularity — a hot key hashes to one
bucket, but dictionary keys (urls) are near-unique so per-bucket load is
uniform; for genuinely hot keys pass a larger B.

Used by ``sources.extract.map_edges_to_ids`` when the vertex dictionary
exceeds the broadcast limit; the broadcast path (ray.put once + per-batch
searchsorted) stays the default for small dimension tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .._util import named


def _stable_hash_strings(arr: np.ndarray) -> np.ndarray:
    import polars as pl

    return pl.Series(arr).hash(seed=42).to_numpy().astype(np.uint64)


class _TagFact:
    def __init__(self, key_col, out_col, out_type, num_buckets):
        self.key_col, self.out_col = key_col, out_col
        self.out_type, self.B = out_type, num_buckets

    def __call__(self, t: pa.Table) -> pa.Table:
        k = t[self.key_col].to_numpy(zero_copy_only=False)
        b = (_stable_hash_strings(k) % np.uint64(self.B)).astype(np.int32)
        t = t.append_column("__bucket", pa.array(b))
        t = t.append_column("__side", pa.array(np.zeros(t.num_rows, np.int8)))
        return t.append_column(self.out_col, pa.nulls(t.num_rows, self.out_type))


class _TagDim:
    def __init__(self, dim_key, dim_val, fact_schema, key_col, out_col, num_buckets):
        self.dim_key, self.dim_val = dim_key, dim_val
        self.fact_schema = fact_schema
        self.key_col, self.out_col, self.B = key_col, out_col, num_buckets

    def __call__(self, t: pa.Table) -> pa.Table:
        k = t[self.dim_key].to_numpy(zero_copy_only=False)
        b = (_stable_hash_strings(k) % np.uint64(self.B)).astype(np.int32)
        n = t.num_rows
        cols = {}
        for f in self.fact_schema:
            if f.name == self.key_col:
                cols[f.name] = t[self.dim_key].cast(f.type)
            else:
                cols[f.name] = pa.nulls(n, f.type)
        cols["__bucket"] = pa.array(b)
        cols["__side"] = pa.array(np.ones(n, np.int8))
        cols[self.out_col] = t[self.dim_val]
        return pa.table(cols)


class _JoinBucket:
    def __init__(self, key_col, out_col, drop_missing):
        self.key_col, self.out_col, self.drop_missing = key_col, out_col, drop_missing

    def __call__(self, g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dim = g.filter(pc.equal(g["__side"], 1))
        fact = g.filter(pc.equal(g["__side"], 0))
        dk = dim[self.key_col].to_numpy(zero_copy_only=False)
        dv = dim[self.out_col].combine_chunks()
        order = np.argsort(dk)
        fk = fact[self.key_col].to_numpy(zero_copy_only=False)
        if dk.size:
            dks = dk[order]
            pos = np.minimum(np.searchsorted(dks, fk), dks.size - 1)
            ok = dks[pos] == fk
            src_idx = order[pos]
        else:
            ok = np.zeros(fk.size, dtype=bool)
            src_idx = np.zeros(fk.size, dtype=np.int64)
        fact = fact.drop_columns(["__bucket", "__side", self.out_col])
        # Arrow take (null index → null value) instead of numpy fancy
        # indexing: works for ANY value type incl. list columns
        idx = pa.array(src_idx, mask=~ok)
        vals = dv.take(idx) if fk.size else pa.nulls(0, dv.type)
        fact = fact.append_column(self.out_col, vals)
        if self.drop_missing:
            fact = fact.filter(pa.array(ok))
        return fact


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    """Dataset schema as a pyarrow schema (pandas-block datasets report a
    PandasBlockSchema; normalize)."""
    s = ds.schema()
    fields = []
    for name, typ in zip(s.names, s.types):
        if not isinstance(typ, pa.DataType):
            typ = pa.from_numpy_dtype(typ) if typ is not object else pa.string()
        fields.append(pa.field(name, typ))
    return pa.schema(fields)


def lookup_join(
    fact: ray.data.Dataset,
    key_col: str,
    dim: ray.data.Dataset,
    dim_key: str,
    dim_val: str,
    out_col: str,
    *,
    num_buckets: int | None = None,
    drop_missing: bool = True,
    fact_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """fact ⋈ dim on fact[key_col] == dim[dim_key]; appends out_col.

    ``num_buckets`` defaults to max(64, 4 x cluster CPUs) so the join's
    reduce-side parallelism scales with the cluster instead of capping at
    a constant (ADVICE r3: a fixed 64 means ~1.6 TB per bucket at 100 TB);
    callers with a known fact-block count can pass it explicitly.

    Pass ``fact_schema`` when the fact side's schema cannot be inferred
    lazily (e.g. a groupby output whose sampled blocks are all empty)."""
    if num_buckets is None:
        ncpu = int(ray.cluster_resources().get("CPU", 16)) if ray.is_initialized() else 16
        num_buckets = max(64, 4 * ncpu)
    if fact_schema is None:
        fact_schema = _arrow_schema(fact)
    dim_schema = _arrow_schema(dim)
    out_type = dim_schema.field(dim_val).type
    tagged_fact = fact.map_batches(
        _TagFact(key_col, out_col, out_type, num_buckets), batch_format="pyarrow"
    )
    tagged_dim = dim.map_batches(
        _TagDim(dim_key, dim_val, fact_schema, key_col, out_col, num_buckets),
        batch_format="pyarrow",
    )
    return (
        tagged_fact.union(tagged_dim)
        .groupby("__bucket")
        .map_groups(named(_JoinBucket(key_col, out_col, drop_missing)), batch_format="pyarrow")
    )
