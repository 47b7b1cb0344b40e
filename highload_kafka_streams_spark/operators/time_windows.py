"""Time-windowed aggregation (SURVEY.md §2.5) — the Kafka Streams core.

KS surface: ``TimeWindows#ofSize`` (tumbling), ``#advanceBy`` (hopping),
``SlidingWindows`` (per-record ±Δ), ``SessionWindows#ofInactivityGap``.

Spark-first: the SAME ``window()`` / ``session_window()`` expressions run
in batch (verified here against the oracle) and in Structured Streaming
(``streaming.topology``) — declarative incrementalization means the
query text doesn't change, only the source. Grace/lateness is a
watermark concern and only exists in the streaming form.

Scale: windowed groupBy shuffles on (window, key); window count is
bounded by time range / slide, so state and shuffle volume are
predictable. Hopping windows multiply rows by (size/slide) before the
shuffle — exactly KS's behavior of updating size/slide windows per
record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from highload_kafka_streams_spark.compat import dsum
from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query


def tumbling(df: DataFrame, ts: str, size: str, *keys: str):
    """KS TimeWindows.ofSize(size) — fixed non-overlapping windows."""
    return df.groupBy(F.window(ts, size), *keys)


def hopping(df: DataFrame, ts: str, size: str, slide: str, *keys: str):
    """KS TimeWindows.ofSize(size).advanceBy(slide) — overlapping windows."""
    return df.groupBy(F.window(ts, size, slide), *keys)


def session(df: DataFrame, ts: str, gap: str, *keys: str):
    """KS SessionWindows.ofInactivityGap(gap) — gap-merged sessions."""
    return df.groupBy(F.session_window(ts, gap), *keys)


@query(
    "q_window_tumbling",
    oracle="""
SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS w_start,
       count(*) AS n,
       SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) / 10000.0 AS total
FROM events
GROUP BY 1
ORDER BY w_start
""",
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling count+sum over the event stream (batch replay)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        tumbling(ev, "ts", "1 hour")
        .agg(F.count("*").alias("n"), dsum("value", "total"))
        .select(F.col("window.start").alias("w_start"), "n", "total")
        .orderBy("w_start")
    )


@query(
    "q_window_hopping",
    oracle="""
WITH shifted AS (
  SELECT e.*,
         time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
           - k * (INTERVAL 15 MINUTE) AS w_start
  FROM events e
  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
)
SELECT w_start, event_type, count(*) AS n
FROM shifted
WHERE CAST(ts AS TIMESTAMP) >= w_start
  AND CAST(ts AS TIMESTAMP) < w_start + INTERVAL 1 HOUR
GROUP BY w_start, event_type
ORDER BY w_start, event_type
""",
)
def q_window_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows advancing every 15 min, per event type — each event
    lands in size/slide = 4 windows (KS TimeWindows#advanceBy)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        hopping(ev, "ts", "1 hour", "15 minutes", "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("w_start"), "event_type", "n")
        .orderBy("w_start", "event_type")
    )


@query(
    "q_window_sliding",
    oracle="""
SELECT event_id, user_id,
       count(*) OVER (
         PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
         RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW
       ) AS n_last_10m
FROM events
ORDER BY event_id
""",
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS SlidingWindows — exact per-record look-back: events by the same
    user in the trailing 10 minutes, via a RANGE frame over event-time
    microseconds (one shuffle on user_id, no self-join)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-600_000_000, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count("*").over(w).alias("n_last_10m"),
        )
        .orderBy("event_id")
    )


@query(
    "q_window_session",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         CASE WHEN CAST(ts AS TIMESTAMP)
                   - lag(CAST(ts AS TIMESTAMP))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) / 10000.0 AS total_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS SessionWindows.ofInactivityGap(30m) — native ``session_window``:
    per-user activity sessions closed after 30 idle minutes. Spark's
    session end = last event + gap; the oracle reproduces that with the
    lag/cumsum sessionization idiom."""
    ev = load_table(spark, sf_dir, "events")
    return (
        session(ev, "ts", "30 minutes", "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "q_time_rollup_hierarchy",
    oracle="""
SELECT date_trunc('month', CAST(ts AS TIMESTAMP)) AS bucket_month,
       date_trunc('day', CAST(ts AS TIMESTAMP)) AS bucket_day,
       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_hour,
       count(*) AS n_events,
       SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) / 10000.0
         AS total_value
FROM events
GROUP BY ROLLUP (date_trunc('month', CAST(ts AS TIMESTAMP)),
                 date_trunc('day', CAST(ts AS TIMESTAMP)),
                 date_trunc('hour', CAST(ts AS TIMESTAMP)))
ORDER BY bucket_month NULLS FIRST, bucket_day NULLS FIRST,
         bucket_hour NULLS FIRST
""",
)
def q_time_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup: hour → day → month →
    grand total in ONE pass via ROLLUP over derived time buckets — the
    continuous-aggregate shape a time-series store maintains. Spark
    computes all levels with a single shuffle (partial aggregation
    map-side); at 100 TB this replaces N separate per-granularity scans,
    and the coarse levels come almost free because they aggregate the
    fine level's partials. date_trunc is identical in both engines;
    the measure uses the fixed-point sum (compat.dsum idiom)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("month", "ts").alias("bucket_month"),
            F.date_trunc("day", "ts").alias("bucket_day"),
            F.date_trunc("hour", "ts").alias("bucket_hour"),
            "value",
        )
        .rollup("bucket_month", "bucket_day", "bucket_hour")
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .orderBy(
            F.col("bucket_month").asc_nulls_first(),
            F.col("bucket_day").asc_nulls_first(),
            F.col("bucket_hour").asc_nulls_first(),
        )
    )
