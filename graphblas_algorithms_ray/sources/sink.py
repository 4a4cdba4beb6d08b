"""Resumable partitioned parquet output — the 100-TB-run contract: one
directory per partition-key value, each committed atomically (tmp dir +
``os.replace`` + ``_SUCCESS`` marker), so a failed run re-executed with
``resume=True`` skips every finished partition instead of recomputing or
(worse) appending duplicate rows into an existing directory.

Partition key choice IS the resume granularity: pick a bounded-cardinality
column (lang, shard id, component label, time bucket). Rows are routed
with one ``groupby`` shuffle; each group writes its own directory, so a
partition is either fully present (marker) or absent — never half-written.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from .._util import named


def _part_dir(path: str, by: str, value) -> str:
    return os.path.join(path, f"{by}={value}")


def finished_partitions(path: str, by: str) -> set[str]:
    """Partition VALUES (as strings) already committed under ``path``."""
    if not os.path.isdir(path):
        return set()
    done = set()
    prefix = f"{by}="
    for d in os.listdir(path):
        if d.startswith(prefix) and os.path.exists(
            os.path.join(path, d, "_SUCCESS")
        ):
            done.add(d[len(prefix):])
    return done


class _WritePart:
    def __init__(self, path: str, by: str):
        self.path, self.by = path, by

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        value = g[self.by].iloc[0]
        target = _part_dir(self.path, self.by, value)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(g, preserve_index=False),
            os.path.join(tmp, "part-0.parquet"),
        )
        with open(os.path.join(tmp, "_SUCCESS"), "w"):
            pass
        if os.path.isdir(target):  # stale half-write from a dead run
            shutil.rmtree(target)
        os.replace(tmp, target)
        return pd.DataFrame(
            {
                "partition": [str(value)],
                "rows": np.array([len(g)], np.int64),
                "skipped": [False],
            }
        )


def write_partitioned(
    ds: ray.data.Dataset,
    path: str,
    by: str,
    *,
    resume: bool = True,
) -> pd.DataFrame:
    """Write ``ds`` under ``path`` as one parquet directory per distinct
    ``by`` value. Returns a (partition, rows, skipped) manifest DataFrame.

    ``resume=True``: partitions with a ``_SUCCESS`` marker are pruned from
    the shuffle entirely (filtered before the groupby, broadcast done-set)
    and reported with ``skipped=True``."""
    os.makedirs(path, exist_ok=True)
    # sweep tmp dirs orphaned by dead runs (killed between write_table and
    # os.replace) — they are invisible to readers but accumulate on disk
    for d in os.listdir(path):
        if d.startswith(".tmp-"):
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    done = finished_partitions(path, by) if resume else set()
    work = ds
    if done:
        done_arr = np.array(sorted(done))

        def _prune(t: pa.Table) -> pa.Table:
            vals = np.array([str(v) for v in t[by].to_pylist()])
            keep = ~np.isin(vals, done_arr)
            return t.filter(pa.array(keep))

        work = ds.map_batches(_prune, batch_format="pyarrow")

    manifest = (
        work.groupby(by)
        .map_groups(named(_WritePart(path, by)), batch_format="pandas")
        .to_pandas()
    )
    if len(manifest) == 0:
        manifest = pd.DataFrame(
            {
                "partition": pd.Series(dtype=str),
                "rows": pd.Series(dtype=np.int64),
                "skipped": pd.Series(dtype=bool),
            }
        )
    if done:
        manifest = pd.concat(
            [
                manifest,
                pd.DataFrame(
                    {
                        "partition": sorted(done),
                        "rows": np.zeros(len(done), np.int64),
                        "skipped": True,
                    }
                ),
            ],
            ignore_index=True,
        )
    return manifest.sort_values("partition").reset_index(drop=True)


def read_partitioned(path: str) -> ray.data.Dataset:
    """Read back a ``write_partitioned`` directory (only committed
    partitions — directories carrying a ``_SUCCESS`` marker)."""
    parts = [
        os.path.join(path, d)
        for d in sorted(os.listdir(path))
        if "=" in d and os.path.exists(os.path.join(path, d, "_SUCCESS"))
    ]
    files = [
        os.path.join(p, f)
        for p in parts
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    return ray.data.read_parquet(files)
