"""Gap-based sessionization over an event stream.

The canonical event-analytics operator (usage funnels, crawl-session
reconstruction, rate-limit forensics): split each user's event sequence
into sessions wherever the inter-event gap exceeds a timeout, then
aggregate per session. (The streaming counterpart of this repo's
watermarked windows — sessions are DATA-driven windows, not clock-driven;
`streaming/ingest.py windowed_event_counts` covers the clock-driven
form.)

Spark-first shape: session boundaries are a lag comparison and session
ids a running sum of boundary flags — two window functions over ONE
hash-partition by user (`Window.partitionBy(user).orderBy(ts)`). The
per-user ordering never leaves its partition; the only exchange is the
user_id hash distribution, and a power-user's events are still just one
partition-local sorted run. Session aggregation reuses the same
partitioning (groupBy user_id, session_no — a prefix of the window key,
no second exchange under AQE)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """→ events + (session_no, is_new_session): ``session_no`` counts a
    user's sessions from 1 in time order; a session breaks when the gap
    since the previous event exceeds ``gap_minutes``."""
    # exact integer MICROSECONDS on both engines (unix_micros / epoch_us);
    # a seconds cast would truncate in Spark but round in DuckDB. The
    # ntz→tz cast is a constant offset that cancels in every difference.
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = us - F.lag(us).over(w)
    new = F.when(
        gap_us.isNull() | (gap_us > int(gap_minutes * 60 * 1_000_000)), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn("is_new_session", new).withColumn(
        "session_no", F.sum("is_new_session").over(w).cast("long")
    )


def session_stats(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """→ (user_id, session_no, n_events, duration_s, n_types): one row per
    session, ordered (user, session)."""
    s = sessionize(events, gap_minutes, user_col, ts_col)
    return (
        s.groupBy(user_col, "session_no")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.floor(
                (
                    F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
                    - F.min(F.unix_micros(F.col(ts_col).cast("timestamp")))
                )
                / 1_000_000
            )
            .cast("long")
            .alias("duration_s"),
            F.count_distinct("event_type").cast("long").alias("n_types"),
        )
        .orderBy(user_col, "session_no")
    )
