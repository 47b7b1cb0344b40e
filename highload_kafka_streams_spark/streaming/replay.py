"""Batch-replay forms of streaming-only semantics (SURVEY.md §2.5 🌊):
watermark late-data drop, suppress-until-window-close, emit-on-update.

Streams here are replayed in *arrival order* (event_id — the Kafka
offset stand-in), which is what makes watermark behavior deterministic
and therefore oracle-checkable: the watermark after k records is
max(ts[0..k]) - delay, exactly Structured Streaming's definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from highload_kafka_streams_spark.compat import dsum
from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query


@query(
    "q_stream_suppress_final",
    oracle="""
WITH m AS (SELECT max(CAST(ts AS TIMESTAMP)) AS max_ts FROM events)
SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS w_start,
       count(*) AS n
FROM events, m
GROUP BY 1, m.max_ts
HAVING time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR
         <= m.max_ts - INTERVAL 10 MINUTE
ORDER BY w_start
""",
)
def q_stream_suppress_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS KTable#suppress(untilWindowCloses) ≡ append-mode + watermark:
    only windows whose end precedes the final watermark (max event time −
    10 min) are emitted. Batch replay computes the same set."""
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "n",
        )
    )
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 10 MINUTES")).alias("watermark")
    )
    return (
        agg.crossJoin(F.broadcast(wm))
        .filter(F.col("w_end") <= F.col("watermark"))
        .select("w_start", "n")
        .orderBy("w_start")
    )


@query(
    "q_stream_late_data_drop",
    oracle="""
WITH arr AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         max(CAST(ts AS TIMESTAMP)) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS max_seen
  FROM events
)
SELECT event_id, user_id, ts
FROM arr
WHERE max_seen IS NULL OR ts >= max_seen - INTERVAL 10 MINUTE
ORDER BY event_id
""",
)
def q_stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics in arrival order: a record is kept iff
    its event time is within 10 minutes of the max event time seen so far
    (the running watermark). Matches withWatermark's drop rule record-for-
    record when replayed in offset order.

    Scale note: the running max uses an unpartitioned window ONLY because
    the watermark is a globally-ordered concept; in the streaming engine
    this is tracked per-trigger by the driver, not via this window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    arr = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.max("ts").over(w).alias("max_seen"),
    )
    return (
        arr.filter(
            F.col("max_seen").isNull()
            | (F.col("ts") >= F.col("max_seen") - F.expr("INTERVAL 10 MINUTES"))
        )
        .select("event_id", "user_id", "ts")
        .orderBy("event_id")
    )


@query(
    "q_stream_emit_on_update",
    oracle="""
SELECT user_id, count(*) AS n_updates,
       SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) / 10000.0 AS final_sum
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def q_stream_emit_on_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS emit-on-update changelog cardinality: each input record produces
    one update; the final row per key equals the batch aggregate (update-
    mode ≡ batch agg at stream end). n_updates counts the changelog."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_updates"), dsum("value", "final_sum"))
        .orderBy("user_id")
    )
