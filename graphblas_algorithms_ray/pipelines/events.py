"""Stream-shaped operators over the events table (ts-ordered log).

Ray Data has no event-time windows; tumbling windows are a key-bucketed
groupby with the bucket computed vectorized per batch (pre-aggregated —
the combiner), sessions are a coarse-hash groupby over complete users
with a vectorized lexsort + gap-cumsum per coarse group.
Ordering assumption: none for tumbling (bucketing is stateless); sessions
sort within the coarse group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .._util import named


def hourly_windows(events: ray.data.Dataset) -> ray.data.Dataset:
    """(event_type, hour, n, sum_value): tumbling 1h event-time windows."""

    def _partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        tt = pa.table(
            {"event_type": t["event_type"], "hour": hour, "value": t["value"]}
        )
        g = tt.group_by(["event_type", "hour"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "hour": g["hour"],
                "n": pc.cast(g["value_count"], pa.int64()),
                "sum_value": g["value_sum"],
            }
        )

    partial = events.select_columns(["event_type", "ts", "value"]).map_batches(
        _partial, batch_format="pyarrow"
    )
    out = partial.groupby(["event_type", "hour"]).aggregate(
        ray.data.aggregate.Sum("n", alias_name="n"),
        ray.data.aggregate.Sum("sum_value", alias_name="sum_value"),
    )

    def _round(t: pa.Table) -> pa.Table:
        # np.round (scale→rint→unscale) matches DuckDB ROUND bit-for-bit on
        # these values; pc.round uses a different algorithm and can keep
        # 18.580000000000002 instead of snapping to 18.58
        sv = np.round(t["sum_value"].to_numpy(zero_copy_only=False), 6)
        return t.set_column(
            t.schema.get_field_index("sum_value"), "sum_value", pa.array(sv)
        )

    return out.map_batches(_round, batch_format="pyarrow")


class _GroupedSessions:
    """Coarse group (~thousands of COMPLETE user_id groups per call via
    `_CoarseKey`) → session windows, one lexsort + vectorized gap-cumsum
    per call instead of one Python call per user (the r3 scale-killer).

    All timestamp math happens in int64 microseconds (Arrow-native —
    pandas group hops lose int64 > 2^53 and ns-resolution columns bucket
    1000x too fine)."""

    def __init__(self, gap_minutes: int):
        self.gap_us = int(gap_minutes) * 60 * 1_000_000

    def __call__(self, g: pa.Table) -> pa.Table:
        ts_type = pa.timestamp("us")  # ns inputs normalize to us
        if g.num_rows == 0:
            uid_type = (
                g.schema.field("user_id").type
                if g.schema.get_field_index("user_id") >= 0
                else pa.int64()
            )
            return pa.table(
                {
                    "user_id": pa.array([], uid_type),
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "start_ts": pa.array([], ts_type),
                    "end_ts": pa.array([], ts_type),
                }
            )
        user_raw = g["user_id"].to_numpy(zero_copy_only=False)
        ev_raw = g["event_id"].to_numpy(zero_copy_only=False)
        # sort surrogates: integer ids sort as-is; string/float ids are
        # factorized to dense ints (int64-casting would crash strings and
        # MERGE distinct float ids via truncation — ADVICE r4). Output
        # carries the ORIGINAL values either way.
        if np.issubdtype(user_raw.dtype, np.integer):
            user = user_raw.astype(np.int64)
        else:
            _, user = np.unique(user_raw, return_inverse=True)
        if np.issubdtype(ev_raw.dtype, np.integer):
            ev = ev_raw.astype(np.int64)
        else:
            _, ev = np.unique(ev_raw, return_inverse=True)
        ts_us = (
            pc.cast(pc.cast(g["ts"], pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((ev, ts_us, user))
        u, t = user[order], ts_us[order]
        u_raw = user_raw[order]
        new = np.ones(u.size, dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > self.gap_us)
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, u.size))
        # per-user session index: global session ordinal minus the ordinal
        # of the user's first session
        sess_ord = np.arange(starts.size)
        newuser = np.ones(starts.size, dtype=bool)
        su = u[starts]
        newuser[1:] = su[1:] != su[:-1]
        first_ord = sess_ord[newuser]
        user_seg = np.cumsum(newuser) - 1
        sid = sess_ord - first_ord[user_seg]
        start_ts = t[starts]
        end_ts = t[starts + counts - 1]
        return pa.table(
            {
                "user_id": pa.array(u_raw[starts]),
                "session_id": pa.array(sid.astype(np.int64)),
                "n_events": pa.array(counts.astype(np.int64)),
                "start_ts": pa.array(start_ts).cast(ts_type),
                "end_ts": pa.array(end_ts).cast(ts_type),
            }
        )


def sessionize(events: ray.data.Dataset, gap_minutes: int = 30) -> ray.data.Dataset:
    """(user_id, session_id, n_events, start_ts, end_ts): session windows
    per user, new session when the gap to the previous event exceeds the
    threshold.

    Scale shape: one shuffle on a ~256-way coarse hash of user_id (each
    coarse group holds COMPLETE users), then one vectorized
    lexsort-over-(user, ts) + gap-cumsum call per coarse group — never one
    Python call per user."""
    from .dedup import _CoarseKey

    return (
        events.select_columns(["user_id", "event_id", "ts"])
        .map_batches(_CoarseKey(["user_id"]), batch_format="pyarrow")
        .groupby("__g")
        .map_groups(named(_GroupedSessions(gap_minutes)), batch_format="pyarrow")
    )


def sliding_windows(
    events: ray.data.Dataset,
    window_minutes: int = 60,
    slide_minutes: int = 15,
) -> ray.data.Dataset:
    """(event_type, window_start, n, sum_value): sliding event-time windows
    — every event lands in window_minutes/slide_minutes overlapping
    buckets, expanded vectorized per batch and pre-aggregated before the
    one groupby shuffle (shuffle volume = W/S x the tumbling volume)."""
    if window_minutes % slide_minutes:
        raise ValueError("window must be a multiple of slide")
    k = window_minutes // slide_minutes
    slide_us = slide_minutes * 60 * 1_000_000

    def _partial(t: pa.Table) -> pa.Table:
        # normalize to microseconds first: a ns-resolution ts column would
        # otherwise cast to ns-since-epoch and bucket 1000x too fine
        ep = pc.cast(
            pc.cast(t["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        b0 = ep // slide_us
        parts = []
        for o in range(k):
            ws = (b0 - o) * slide_us
            parts.append(
                pa.table(
                    {
                        "event_type": t["event_type"],
                        "window_start": pa.array(ws),
                        "value": t["value"],
                    }
                )
            )
        tt = pa.concat_tables(parts)
        g = tt.group_by(["event_type", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "window_start": g["window_start"],
                "n": pc.cast(g["value_count"], pa.int64()),
                "sum_value": g["value_sum"],
            }
        )

    partial = events.select_columns(["event_type", "ts", "value"]).map_batches(
        _partial, batch_format="pyarrow"
    )
    out = partial.groupby(["event_type", "window_start"]).aggregate(
        ray.data.aggregate.Sum("n", alias_name="n"),
        ray.data.aggregate.Sum("sum_value", alias_name="sum_value"),
    )

    def _finish(t: pa.Table) -> pa.Table:
        sv = np.round(t["sum_value"].to_numpy(zero_copy_only=False), 6)
        ws = pc.cast(t["window_start"], pa.timestamp("us"))
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": ws,
                "n": t["n"],
                "sum_value": pa.array(sv),
            }
        )

    return out.map_batches(_finish, batch_format="pyarrow")


def purchase_attribution(events: ray.data.Dataset) -> ray.data.Dataset:
    """(user_id, event_id, ts, click_event_id, click_ts, lag_us): each
    purchase matched to the same user's most recent click at or before it
    (inner as-of join; unattributed purchases drop). The event-attribution
    pipeline: one shuffle, per-user searchsorted merge."""
    from ..stages.asofjoin import asof_join

    def _purchases(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], "purchase")
        t = t.filter(m)
        return t.select(["user_id", "ts", "event_id"])

    def _clicks(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], "click")
        t = t.filter(m)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "click_event_id": t["event_id"],
                "click_ts": t["ts"],
            }
        )

    cols = ["event_id", "ts", "user_id", "event_type"]
    # both join sides branch off this dataset — materialize once or the
    # read+projection lineage executes twice
    base = events.select_columns(cols).materialize()
    left = base.map_batches(_purchases, batch_format="pyarrow")
    right = base.map_batches(_clicks, batch_format="pyarrow")
    joined = asof_join(
        left,
        right,
        by="user_id",
        on="ts",
        left_cols=["event_id"],
        right_cols=["click_event_id", "click_ts"],
    )

    def _lag(t: pa.Table) -> pa.Table:
        # cast through timestamp[us] so lag_us is microseconds whatever
        # resolution the input column carried
        us = lambda c: pc.cast(pc.cast(c, pa.timestamp("us")), pa.int64())
        lag = us(t["ts"]).to_numpy(zero_copy_only=False) - us(
            t["click_ts"]
        ).to_numpy(zero_copy_only=False)
        return t.append_column("lag_us", pa.array(lag))

    return joined.map_batches(_lag, batch_format="pyarrow")
