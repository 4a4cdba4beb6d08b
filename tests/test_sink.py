"""write_partitioned / read_partitioned: atomic commit, resume-skip, no
duplicate rows on rerun into an existing directory."""

import os
import shutil

import numpy as np
import pandas as pd
import ray.data

from graphblas_algorithms_ray.sources.sink import (
    finished_partitions,
    read_partitioned,
    write_partitioned,
)


def _df(n=300):
    rng = np.random.default_rng(11)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "de", "fr", "es"], n),
            "x": rng.uniform(size=n),
        }
    )


def test_write_read_roundtrip(tmp_path):
    df = _df()
    path = str(tmp_path / "out")
    manifest = write_partitioned(ray.data.from_pandas(df), path, by="lang")
    assert set(manifest["partition"]) == set(df["lang"].unique())
    assert not manifest["skipped"].any()
    assert manifest["rows"].sum() == len(df)
    back = read_partitioned(path).to_pandas()
    assert len(back) == len(df)
    assert sorted(back["doc_id"]) == sorted(df["doc_id"])


def test_resume_skips_finished_and_rewrites_missing(tmp_path):
    df = _df()
    path = str(tmp_path / "out")
    write_partitioned(ray.data.from_pandas(df), path, by="lang")
    # simulate a dead run: one partition half-written (no marker)
    victim = os.path.join(path, "lang=de")
    os.remove(os.path.join(victim, "_SUCCESS"))
    assert finished_partitions(path, "lang") == {"en", "fr", "es"}

    manifest = write_partitioned(
        ray.data.from_pandas(df), path, by="lang", resume=True
    )
    m = manifest.set_index("partition")
    assert bool(m.loc["en", "skipped"]) and bool(m.loc["fr", "skipped"])
    assert not bool(m.loc["de", "skipped"])
    assert int(m.loc["de", "rows"]) == int((df["lang"] == "de").sum())
    # rerun did NOT duplicate rows anywhere
    back = read_partitioned(path).to_pandas()
    assert len(back) == len(df)
    assert back["doc_id"].is_unique


def test_rerun_without_resume_overwrites_not_appends(tmp_path):
    df = _df()
    path = str(tmp_path / "out")
    write_partitioned(ray.data.from_pandas(df), path, by="lang")
    write_partitioned(
        ray.data.from_pandas(df), path, by="lang", resume=False
    )
    back = read_partitioned(path).to_pandas()
    assert len(back) == len(df)  # os.replace swap, never append


def test_orphan_tmp_dirs_swept(tmp_path):
    df = _df()
    path = str(tmp_path / "out")
    os.makedirs(os.path.join(path, ".tmp-deadbeef"))
    with open(os.path.join(path, ".tmp-deadbeef", "part-0.parquet"), "w") as f:
        f.write("junk")
    write_partitioned(ray.data.from_pandas(df), path, by="lang")
    assert not any(d.startswith(".tmp-") for d in os.listdir(path))
