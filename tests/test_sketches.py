"""HyperLogLog approx_distinct vs exact distinct counts."""

import numpy as np
import pandas as pd
import ray.data

from graphblas_algorithms_ray.functions.sketches import approx_distinct


def test_hll_accuracy_unique_heavy():
    rng = np.random.default_rng(5)
    vals = [f"url-{i}" for i in range(150_000)]
    df = pd.DataFrame({"u": vals})
    est = approx_distinct(ray.data.from_pandas(df), "u", p=14)
    assert abs(est - 150_000) / 150_000 < 0.03


def test_hll_accuracy_duplicate_heavy():
    rng = np.random.default_rng(6)
    # 500k rows drawn from only 2000 distinct values
    vals = rng.integers(0, 2000, 500_000)
    df = pd.DataFrame({"u": [f"k{v}" for v in vals]})
    est = approx_distinct(ray.data.from_pandas(df), "u", p=14)
    exact = len(set(df["u"]))
    assert abs(est - exact) / exact < 0.03


def test_hll_merge_invariant_to_partitioning():
    # same values split across many small blocks must estimate identically
    df = pd.DataFrame({"u": [f"x{i}" for i in range(30_000)]})
    one = approx_distinct(ray.data.from_pandas(df), "u", p=12)
    many = approx_distinct(
        ray.data.from_pandas(df).repartition(32), "u", p=12
    )
    assert one == many


def test_hll_ignores_nulls():
    import pyarrow as pa

    t = pa.table({"u": pa.array(["a", "b", None, "a"], pa.string())})
    est = approx_distinct(ray.data.from_arrow(t), "u", p=12)
    assert round(est) == 2
