"""asof_join / sliding_windows / purchase_attribution vs brute-force pandas."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphblas_algorithms_ray.stages.asofjoin import asof_join
from graphblas_algorithms_ray.pipelines.events import (
    purchase_attribution,
    sliding_windows,
)


def _mk_events(n=400, users=7, seed=3):
    rng = np.random.default_rng(seed)
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    ts = ts0 + rng.integers(0, 3_600_000_000 * 6, n).astype("timedelta64[us]")
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "event_type": rng.choice(
                ["click", "view", "purchase", "error"], n
            ),
            "value": np.round(rng.uniform(0, 20, n), 2),
        }
    )


def test_asof_join_matches_bruteforce():
    df = _mk_events()
    left = df[df.event_type == "purchase"][["user_id", "ts", "event_id"]]
    right = df[df.event_type == "click"][["user_id", "ts"]].copy()
    right["click_event_id"] = df[df.event_type == "click"]["event_id"].values

    got = asof_join(
        ray.data.from_pandas(left.reset_index(drop=True)),
        ray.data.from_pandas(right.reset_index(drop=True)),
        by="user_id",
        on="ts",
        left_cols=["event_id"],
        right_cols=["click_event_id"],
    ).to_pandas()

    # brute force: per purchase, max-ts click <= ts (ties: max click id)
    expect = []
    for _, l in left.iterrows():
        r = right[(right.user_id == l.user_id) & (right.ts <= l.ts)]
        if len(r):
            r = r.sort_values(["ts", "click_event_id"]).iloc[-1]
            expect.append((l.user_id, l.event_id, r.click_event_id))
    e = set(expect)
    g = set(
        map(tuple, got[["user_id", "event_id", "click_event_id"]].itertuples(index=False))
    )
    assert g == e
    assert len(got) == len(e)  # inner: unmatched dropped, no dups


def test_asof_join_equal_ts_matches():
    # a right row at exactly the left ts must match (>= semantics)
    t = np.datetime64("2024-01-01T12:00:00", "us")
    left = pd.DataFrame(
        {"user_id": [1], "ts": [t], "event_id": np.array([10], np.int64)}
    )
    right = pd.DataFrame(
        {
            "user_id": [1, 1],
            "ts": [t, t],
            "click_event_id": np.array([3, 7], np.int64),
        }
    )
    got = asof_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        by="user_id",
        on="ts",
        left_cols=["event_id"],
        right_cols=["click_event_id"],
    ).to_pandas()
    assert len(got) == 1
    assert int(got["click_event_id"].iloc[0]) == 7  # dup ts -> max tie col


def test_sliding_windows_every_event_in_k_buckets():
    df = _mk_events()
    ds = ray.data.from_pandas(df)
    got = sliding_windows(ds, window_minutes=60, slide_minutes=15).to_pandas()
    # total count = 4x the events
    assert got["n"].sum() == 4 * len(df)
    # brute force one window: pick the most common window_start
    ws = got.sort_values("n").iloc[-1]["window_start"]
    lo = np.datetime64(ws, "us")
    hi = lo + np.timedelta64(3600, "s")
    for et, grp in df.groupby("event_type"):
        m = (grp.ts.values >= lo) & (grp.ts.values < hi)
        row = got[(got.event_type == et) & (got.window_start == ws)]
        if m.sum() == 0:
            assert len(row) == 0
        else:
            assert int(row["n"].iloc[0]) == int(m.sum())
            assert float(row["sum_value"].iloc[0]) == round(
                float(grp.value.values[m].sum()), 6
            )


def test_purchase_attribution_lag_nonnegative():
    df = _mk_events(n=600)
    ds = ray.data.from_pandas(df)
    got = purchase_attribution(ds).to_pandas()
    assert (got["lag_us"] >= 0).all()
    assert got["event_id"].is_unique
    # every matched purchase's click is the latest at-or-before one
    clicks = df[df.event_type == "click"]
    for _, row in got.head(20).iterrows():
        c = clicks[(clicks.user_id == row.user_id) & (clicks.ts <= row.ts)]
        best = c.sort_values(["ts", "event_id"]).iloc[-1]
        assert best.event_id == row.click_event_id


def test_sliding_and_lag_ns_resolution_input():
    # pandas-default datetime64[ns] input must behave identically to [us]
    df = _mk_events(n=200)
    df_ns = df.copy()
    df_ns["ts"] = df_ns["ts"].astype("datetime64[ns]")
    got_us = sliding_windows(ray.data.from_pandas(df)).to_pandas()
    got_ns = sliding_windows(ray.data.from_pandas(df_ns)).to_pandas()
    a = got_us.sort_values(["event_type", "window_start"]).reset_index(drop=True)
    b = got_ns.sort_values(["event_type", "window_start"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["n"].values == b["n"].values).all()
    assert (
        a["window_start"].values.astype("datetime64[us]")
        == b["window_start"].values.astype("datetime64[us]")
    ).all()

    lag_us = purchase_attribution(ray.data.from_pandas(df)).to_pandas()
    lag_ns = purchase_attribution(ray.data.from_pandas(df_ns)).to_pandas()
    a = lag_us.sort_values("event_id").reset_index(drop=True)
    b = lag_ns.sort_values("event_id").reset_index(drop=True)
    assert (a["lag_us"].values == b["lag_us"].values).all()


def test_asof_join_preserves_large_int64():
    # ids above 2^53 must survive the join exactly (no float64 detour)
    t = np.datetime64("2024-01-01T12:00:00", "us")
    big = np.int64(2**60 + 1)
    left = pd.DataFrame(
        {"user_id": [1], "ts": [t + np.timedelta64(1, "s")],
         "event_id": np.array([big + 7], np.int64)}
    )
    right = pd.DataFrame(
        {"user_id": [1], "ts": [t], "click_event_id": np.array([big], np.int64)}
    )
    got = asof_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        by="user_id",
        on="ts",
        left_cols=["event_id"],
        right_cols=["click_event_id"],
    ).to_pandas()
    assert int(got["click_event_id"].iloc[0]) == int(big)
    assert int(got["event_id"].iloc[0]) == int(big + 7)


def test_asof_join_matches_pandas_merge_asof():
    # independent oracle: pd.merge_asof (backward, exact matches allowed),
    # right side pre-deduped to the max tie row per (user, ts)
    for seed in (11, 12, 13):
        rng = np.random.default_rng(seed)
        nl, nr = 120, 300
        t0 = np.datetime64("2024-01-01", "us")
        left = pd.DataFrame(
            {
                "user_id": rng.integers(0, 5, nl).astype(np.int64),
                "ts": t0 + rng.integers(0, 10_000_000, nl).astype("timedelta64[us]"),
                "event_id": np.arange(nl, dtype=np.int64),
            }
        )
        right = pd.DataFrame(
            {
                "user_id": rng.integers(0, 5, nr).astype(np.int64),
                "ts": t0 + rng.integers(0, 10_000_000, nr).astype("timedelta64[us]"),
                "click_event_id": np.arange(nr, dtype=np.int64) + 1000,
            }
        )
        got = (
            asof_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                by="user_id",
                on="ts",
                left_cols=["event_id"],
                right_cols=["click_event_id"],
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        rdedup = (
            right.sort_values(["ts", "click_event_id"])
            .groupby(["user_id", "ts"], as_index=False)
            .last()
        )
        expect = pd.merge_asof(
            left.sort_values("ts"),
            rdedup.sort_values("ts"),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        ).dropna(subset=["click_event_id"])
        expect = expect.sort_values("event_id").reset_index(drop=True)
        assert len(got) == len(expect), seed
        assert (got["event_id"].values == expect["event_id"].values).all()
        assert (
            got["click_event_id"].values
            == expect["click_event_id"].values.astype(np.int64)
        ).all()


def test_asof_join_group_with_no_right_rows():
    # user 2 has purchases but zero clicks: the group must drop cleanly
    t = np.datetime64("2024-01-01T12:00:00", "us")
    left = pd.DataFrame(
        {
            "user_id": np.array([1, 2, 2], np.int64),
            "ts": [t, t, t + np.timedelta64(5, "s")],
            "event_id": np.array([10, 11, 12], np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": np.array([1], np.int64),
            "ts": [t],
            "click_event_id": np.array([99], np.int64),
        }
    )
    got = asof_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        by="user_id",
        on="ts",
        left_cols=["event_id"],
        right_cols=["click_event_id"],
    ).to_pandas()
    assert len(got) == 1
    assert int(got["event_id"].iloc[0]) == 10
    assert int(got["click_event_id"].iloc[0]) == 99


def test_purchase_attribution_power_user_group():
    # one user owns 60k of 61k events: the per-key merge must stay
    # O(n log n) and exact (skew documented as the asof partitioning
    # assumption)
    rng = np.random.default_rng(21)
    n = 60_000
    t0 = np.datetime64("2024-01-01", "us")
    heavy = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": t0 + np.sort(rng.integers(0, 10**9, n)).astype("timedelta64[us]"),
            "user_id": np.zeros(n, np.int64),
            "event_type": rng.choice(["click", "purchase"], n, p=[0.9, 0.1]),
            "value": np.ones(n),
        }
    )
    light = pd.DataFrame(
        {
            "event_id": np.arange(n, n + 1000, dtype=np.int64),
            "ts": t0 + rng.integers(0, 10**9, 1000).astype("timedelta64[us]"),
            "user_id": np.full(1000, 7, np.int64),
            "event_type": rng.choice(["click", "purchase"], 1000),
            "value": np.ones(1000),
        }
    )
    df = pd.concat([heavy, light], ignore_index=True)
    got = purchase_attribution(ray.data.from_pandas(df)).to_pandas()
    n_purch_with_click = 0
    for uid, grp in df.groupby("user_id"):
        clicks = grp[grp.event_type == "click"].sort_values(["ts", "event_id"])
        purchases = grp[grp.event_type == "purchase"]
        idx = np.searchsorted(clicks["ts"].values, purchases["ts"].values, side="right")
        n_purch_with_click += int((idx > 0).sum())
    assert len(got) == n_purch_with_click
    assert (got["lag_us"] >= 0).all()
