"""Windowed aggregates over the ``events`` table — the streaming-shaped
extension (the reference itself has no streaming tier, SURVEY §2.14; this
is the Ray Data pattern for stream-shaped inputs: treat events as an
ordered partitioned log, window inside ``groupby(key).map_groups`` /
vectorized batch math)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window_stats(sf_dir: str, window_s: int = 3600):
    """→ per (event_type, hour window): count + sum/min/max of value.
    Pre-aggregated per batch then reduced — no raw-row shuffle."""
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type", "value"]
    )

    def add_window(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        w = pc.multiply(
            pc.divide(us, pa.scalar(window_s * 1_000_000, pa.int64())),
            pa.scalar(window_s * 1_000_000, pa.int64()),
        )
        return b.append_column("w_us", w)

    windowed = ds.map_batches(add_window, batch_format="pyarrow")
    out = windowed.groupby(["event_type", "w_us"]).aggregate(
        Count(alias_name="n"),
        Sum("value", alias_name="sum_value"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "w_us": b.column("w_us"),
                "n": b.column("n").cast(pa.int64()),
                # values are 2-decimal; sum*100 is integer-ish, so round
                # half-up — immune to cross-engine accumulation noise where
                # floor() would coin-flip at the boundary
                "sum_bp": pc.cast(
                    pc.floor(
                        pc.add(
                            pc.multiply(b.column("sum_value"), pa.scalar(100.0)),
                            pa.scalar(0.5),
                        )
                    ),
                    pa.int64(),
                ),
                "min_bp": pc.cast(
                    pc.floor(pc.multiply(b.column("min_value"), pa.scalar(100.0))),
                    pa.int64(),
                ),
                "max_bp": pc.cast(
                    pc.floor(pc.multiply(b.column("max_value"), pa.scalar(100.0))),
                    pa.int64(),
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def sql_tumbling_window_stats(window_s: int = 3600) -> str:
    # sum of doubles: DuckDB's accumulation order can differ from Ray's at
    # ~1e-12 relative; *_bp floors at 1e-2 granularity to stay exact
    return f"""
select event_type,
       (epoch_us(ts) // {window_s * 1_000_000}) * {window_s * 1_000_000} as w_us,
       count(*)::bigint as n,
       cast(floor(sum(value) * 100 + 0.5) as bigint) as sum_bp,
       cast(floor(min(value) * 100) as bigint) as min_bp,
       cast(floor(max(value) * 100) as bigint) as max_bp
from events
group by 1, 2
"""


def sessionize(sf_dir: str, gap_s: int = 1800, n_buckets: int = None):
    """→ per (user_id, session): start, n_events, duration — classic
    sessionization, hash-bucketed and fully vectorized.

    Ray shape: users hash into ``n_buckets`` buckets (splitmix, stable
    cross-process); ONE ``groupby(bucket)`` shuffle co-locates each
    user's events; the per-bucket kernel sessionizes EVERY user in the
    bucket with a single lexsort + run-length pass — no per-user pandas
    group (a task's work is a whole bucket of users, so many small
    users amortize into one Arrow kernel; one hot user costs one
    bucket, the sessionization lower bound, not one task per user).

    ``n_buckets=None`` derives the count from the parquet FOOTER row
    count (~64k events per bucket task, min 16 — the span_dedup
    discipline, ``dedup.py``), so a 100-TB event table shards into
    corpus-proportional tasks instead of corpus/64."""
    import ray.data

    def add_bucket(b: pa.Table) -> pa.Table:
        uid = np.asarray(b.column("user_id"), dtype=np.int64)
        z = (uid.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(-1)
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(-1)
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(-1)
        z ^= z >> np.uint64(31)
        return b.append_column(
            "ub", pa.array((z % np.uint64(n_buckets)).astype(np.int32))
        )

    def bucket_sessions(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "dur_s": pa.array([], pa.int64()),
                }
            )
        uid = np.asarray(group.column("user_id"), dtype=np.int64)
        ns = np.asarray(
            group.column("ts").cast(pa.timestamp("ns")).cast(pa.int64()),
            dtype=np.int64,
        )
        order = np.lexsort((ns, uid))
        uid_s, ns_s = uid[order], ns[order]
        sec = ns_s // 1_000_000_000
        brk = np.empty(len(uid_s), dtype=bool)
        brk[0] = True
        np.logical_or(
            uid_s[1:] != uid_s[:-1],
            (sec[1:] - sec[:-1]) > gap_s,
            out=brk[1:],
        )
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(uid_s))
        first_ns = ns_s[starts]
        last_ns = ns_s[ends - 1]
        return pa.table(
            {
                "user_id": pa.array(uid_s[starts]),
                "start_us": pa.array(first_ns // 1000, pa.int64()),
                "n_events": pa.array(
                    (ends - starts).astype(np.int64), pa.int64()
                ),
                "dur_s": pa.array(
                    (last_ns - first_ns) // 1_000_000_000, pa.int64()
                ),
            }
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    if n_buckets is None:
        # footer-only count (no data read): ~64k events per bucket task
        n_rows = ds.count()
        n_buckets = max(16, -(-n_rows // 65536))
    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(bucket_sessions, batch_format="pyarrow")
    )


def sql_sessionize(gap_s: int = 1800) -> str:
    return f"""
with o as (
  select user_id, ts,
         case when epoch(ts) - lag(epoch(ts)) over (partition by user_id order by ts)
                   > {gap_s} or lag(ts) over (partition by user_id order by ts) is null
              then 1 else 0 end as brk
  from events
),
s as (
  select user_id, ts,
         sum(brk) over (partition by user_id order by ts
                        rows unbounded preceding) as sess
  from o
)
select user_id, cast(epoch_us(min(ts)) as bigint) as start_us,
       count(*)::bigint as n_events,
       cast(floor(epoch(max(ts)) - epoch(min(ts))) as bigint) as dur_s
from s group by user_id, sess
"""


def hopping_window_stats(
    sf_dir: str, window_s: int = 3600, step_s: int = 900
):
    """Hopping (sliding) windows: size ``window_s`` advancing by
    ``step_s`` (must divide it) — every event lands in exactly
    ``window_s // step_s`` overlapping windows. Per batch, rows
    replicate vectorized into their windows (np.tile, no Python row
    loop), then the SAME pre-aggregated groupby reduction as the
    tumbling path — the replication factor, not raw rows, bounds the
    shuffle.

    → per (event_type, window start): count + sum basis points."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    assert window_s % step_s == 0, "step must divide the window"
    n_hops = window_s // step_s

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )

    def explode(b: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(b.column("ts"), pa.int64()))
        step_us = step_s * 1_000_000
        base = us // step_us  # the LAST window start containing the event
        hops = np.arange(n_hops, dtype=np.int64)
        w_us = ((base[:, None] - hops[None, :]) * step_us).ravel()
        n = len(b)
        et = b.column("event_type").take(
            pa.array(np.repeat(np.arange(n), n_hops))
        )
        val = b.column("value").take(
            pa.array(np.repeat(np.arange(n), n_hops))
        )
        return pa.table(
            {"event_type": et, "w_us": pa.array(w_us), "value": val}
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "w_us"])
        .aggregate(
            Count(alias_name="n"), Sum("value", alias_name="sum_value")
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "w_us": b.column("w_us"),
                "n": b.column("n").cast(pa.int64()),
                "sum_bp": pc.cast(
                    pc.floor(
                        pc.add(
                            pc.multiply(
                                b.column("sum_value"), pa.scalar(100.0)
                            ),
                            pa.scalar(0.5),
                        )
                    ),
                    pa.int64(),
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def sql_hopping_window_stats(window_s: int = 3600, step_s: int = 900) -> str:
    n_hops = window_s // step_s
    step_us = step_s * 1_000_000
    return f"""
select event_type,
       ((epoch_us(ts) // {step_us}) - h.i) * {step_us} as w_us,
       count(*)::bigint as n,
       cast(floor(sum(value) * 100 + 0.5) as bigint) as sum_bp
from events
cross join (select unnest(generate_series(0, {n_hops - 1})) as i) h
group by 1, 2
"""
