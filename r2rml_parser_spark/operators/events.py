"""Event-stream analytics over the events table (batch surface).

The reference has no time/window operators at all (SURVEY.md §3.4: "no
group-by/window/limit" — its only aggregation is triple-set dedup). A
KG-construction pipeline over a live corpus needs them for ingestion
telemetry and activity modeling, so they are first-class here:

* ``windowed_event_stats`` — tumbling-window counts/sums per event type
  (the batch twin of streaming.incremental.windowed_event_counts; one
  partial-aggregatable groupBy, map-side combine, no window function).
* ``sessionize`` — classic gap-based sessionization: lag + cumulative
  sum over a (user_id)-partitioned window, then one groupBy. Two
  shuffles total, both on user_id — Catalyst reuses the exchange for
  the window and the groupBy (same key).

Determinism notes: value sums go through DECIMAL(18,6) so the result is
associative (double partial-sum order differs between Spark partitions
and the DuckDB oracle); window ordering ties break on event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def windowed_event_stats(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window event stats per event_type.

    Output: (window_start string, event_type, n_events, sum_value,
    avg_value) — sums exact via decimal, rendered as rounded doubles.
    """
    dec = F.col("value").cast("decimal(18,6)")
    return (
        events.groupBy(
            F.window("ts", window).alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec).alias("_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            F.round(F.col("_sum").cast("double"), 6).alias("sum_value"),
            F.round((F.col("_sum") / F.col("n_events")).cast("double"), 6).alias("avg_value"),
        )
    )


def windowed_event_stats_sql(window_seconds: int = 3600) -> str:
    """DuckDB oracle for ``windowed_event_stats`` (UTC tumbling buckets)."""
    return f"""
SELECT strftime(time_bucket(INTERVAL {window_seconds} SECONDS, ts),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value,
       round(CAST(SUM(CAST(value AS DECIMAL(18,6))) / COUNT(*) AS DOUBLE), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessions: a new session starts when the user's
    inter-event gap exceeds ``gap_seconds``.

    Output: (user_id, session_seq, n_events, session_start,
    session_end, duration_us). Both the window and the final groupBy
    shuffle on user_id, so the exchange is reused.

    Skew note (10^12-event scale): the window partitions on user_id, so
    one pathological hot user (a bot emitting a large fraction of all
    events) funnels its entire history through a single task — windows
    cannot be salted without breaking the running session_seq. The
    mitigation at scale is upstream: cap events per (user_id, day) with
    an approximate filter, or pre-split known-hot service accounts into
    (user_id, epoch-day) sub-users and stitch sessions crossing the day
    boundary in a cheap second pass (at a 30-min gap, at most one
    session per user per boundary can straddle it). AQE cannot split a
    running-window partition, so the guard must be data-level.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact arithmetic: ts carries sub-second precision, and
    # a float epoch would round differently here vs the DuckDB oracle.
    # Parquet arrives as TIMESTAMP_NTZ; the session TZ is UTC, so the
    # cast is a pure type change, matching DuckDB's naive timestamps.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    sess = events.select(
        "user_id", "ts", "event_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_seq"),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("_start"),
            F.max("ts").alias("_end"),
        )
        .select(
            "user_id",
            "session_seq",
            "n_events",
            F.date_format("_start", TS_FMT).alias("session_start"),
            F.date_format("_end", TS_FMT).alias("session_end"),
            (
                F.unix_micros(F.col("_end").cast("timestamp"))
                - F.unix_micros(F.col("_start").cast("timestamp"))
            ).alias("duration_us"),
        )
    )


def sessionize_sql(gap_seconds: int = 1800) -> str:
    """DuckDB oracle for ``sessionize`` (identical window semantics).

    DuckDB's SUM(CASE...) returns HUGEINT and COUNT(*) BIGINT; both are
    cast to BIGINT so the canonicalized frame types match Spark's long
    columns exactly (a HUGEINT reaches pandas as object/float and the
    value-hash diverges even when every value is equal)."""
    return f"""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
marked AS (
  SELECT user_id, ts,
         SUM(CASE WHEN gap IS NULL OR gap > {gap_seconds} * 1000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM gaps
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM marked
GROUP BY user_id, session_seq
"""
