"""The ``ray job submit`` entrypoint (graphblas_algorithms_ray.job):
argument surface, per-kernel parquet output, _DONE-marker job resume,
and the north-rule throughput fields."""

import json
import os

import pandas as pd
import pytest

from graphblas_algorithms_ray import job


def test_job_end_to_end(tmp_path, capsys):
    out = str(tmp_path / "results")
    m = job.main([
        "--docs", "400", "--num-parts", "4",
        "--kernels", "pagerank,components,triangles",
        "--pagerank-iters", "10",
        "--out", out,
    ])
    # one JSON metrics line on stdout
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["metric"] == "link_graph_job"
    assert m["edges"] > 0 and m["vertices"] > 0
    assert m["pagerank_iters_per_sec"] > 0
    # both fields are independently rounded — compare loosely
    assert m["pagerank_edges_per_sec"] == pytest.approx(
        m["pagerank_iters_per_sec"] * m["edges"], rel=1e-3
    )
    assert m["triangles"] >= 0 and m["skipped"] == []
    assert set(m["queries"]) == {"extract_and_build", "pagerank",
                                 "components", "triangles"}

    # per-kernel parquet landed, url-joined, complete (_DONE after data)
    for kernel in ("pagerank", "components"):
        dest = os.path.join(out, kernel)
        assert os.path.exists(os.path.join(dest, "_DONE"))
        files = [f for f in os.listdir(dest) if f.endswith(".parquet")]
        df = pd.concat(pd.read_parquet(os.path.join(dest, f)) for f in files)
        assert len(df) == m["vertices"]
        assert "url" in df.columns and df["url"].is_unique

    # PageRank scores over the synthetic corpus sum to 1
    prf = os.path.join(out, "pagerank")
    df = pd.concat(
        pd.read_parquet(os.path.join(prf, f))
        for f in os.listdir(prf) if f.endswith(".parquet")
    )
    assert df["pagerank"].sum() == pytest.approx(1.0, abs=1e-6)


def test_job_resume_skips_finished_kernels(tmp_path, capsys):
    out = str(tmp_path / "results")
    job.main(["--docs", "400", "--num-parts", "4",
              "--kernels", "pagerank", "--pagerank-iters", "5",
              "--out", out])
    first = sorted(os.listdir(os.path.join(out, "pagerank")))
    m = job.main(["--docs", "400", "--num-parts", "4",
                  "--kernels", "pagerank", "--pagerank-iters", "5",
                  "--out", out])
    # second submit skipped the finished kernel BEFORE any compute:
    # no new/duplicated files, and the kernel's timing is zero
    assert m["skipped"] == ["pagerank"]
    assert m["queries"]["pagerank"] == 0.0
    assert sorted(os.listdir(os.path.join(out, "pagerank"))) == first
    capsys.readouterr()


def test_job_resume_after_crash_never_duplicates_rows(tmp_path, capsys):
    # crash window: parquet landed but the _DONE marker did not. The
    # re-submit must REPLACE the directory, not append a second copy.
    import pandas as pd

    out = str(tmp_path / "results")
    job.main(["--docs", "400", "--num-parts", "4",
              "--kernels", "pagerank", "--pagerank-iters", "5",
              "--out", out])
    dest = os.path.join(out, "pagerank")
    marker = os.path.join(dest, "_DONE")
    os.remove(marker)  # simulate dying between write and marker
    job.main(["--docs", "400", "--num-parts", "4",
              "--kernels", "pagerank", "--pagerank-iters", "5",
              "--out", out])
    assert os.path.exists(marker)
    df = pd.concat(
        pd.read_parquet(os.path.join(dest, f))
        for f in os.listdir(dest) if f.endswith(".parquet")
    )
    assert df["url"].is_unique  # a doubled write would repeat every url
    assert df["pagerank"].sum() == pytest.approx(1.0, abs=1e-6)
    # no orphaned temp dirs left behind
    assert not [d for d in os.listdir(out) if d.startswith(".tmp-")]
    capsys.readouterr()


def test_job_rejects_unknown_kernel():
    with pytest.raises(SystemExit):
        job.main(["--kernels", "nope"])


def test_job_curation_kernel(tmp_path):
    # the LLM-data tier over the same corpus: curated parquet with the same
    # _DONE resume contract; no graph build happens for a curation-only job
    out = str(tmp_path / "cur")
    m = job.main([
        "--docs", "300", "--kernels", "curation", "--out", out,
    ])
    assert "edges" not in m  # graph never built
    assert set(m["queries"]) == {"curation"}
    dest = os.path.join(out, "curation")
    assert os.path.exists(os.path.join(dest, "_DONE"))
    files = [f for f in os.listdir(dest) if f.endswith(".parquet")]
    df = pd.concat(pd.read_parquet(os.path.join(dest, f)) for f in files)
    assert set(df.columns) == {"doc_id", "lang", "n_tokens", "url"}
    assert 0 < len(df) <= 300
    assert df["url"].is_unique
    assert (df["n_tokens"] >= 20).all()
    assert set(df["lang"]) <= {"en", "de", "fr"}
    # re-submission skips the finished kernel before any compute
    m2 = job.main([
        "--docs", "300", "--kernels", "curation", "--out", out,
    ])
    assert m2["skipped"] == ["curation"]
    assert m2["queries"]["curation"] == 0.0
