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
    record when replayed in offset order; in the streaming engine the
    watermark is tracked per-trigger by the driver.

    Scale shape (de-weaked in r4 per VERDICT — the old form ran ONE
    unpartitioned window over the whole fact table): the running max is
    a distributed two-phase prefix max, the llm/packing.py prefix-sum
    idiom with max as the combiner. Offsets bucket by ``event_id div
    65536`` (monotone in arrival order), per-bucket maxima roll up to a
    tiny table whose exclusive prefix max broadcasts back, and the
    exclusive within-bucket running max is partitioned by bucket — so
    per-task work is bounded by bucket size, not stream length.
    ``greatest`` skips nulls, so max_seen is NULL exactly for the first
    record overall, record-for-record identical to the single window."""
    ev = load_table(spark, sf_dir, "events")
    ev2 = ev.select("event_id", "user_id", "ts").withColumn(
        "bucket", F.expr("event_id div 65536")
    )
    bucket_w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev = (
        ev2.groupBy("bucket")
        .agg(F.max("ts").alias("bucket_max"))
        .select(
            "bucket",
            F.max("bucket_max").over(bucket_w).alias("prev_bucket_max"),
        )
    )
    within = Window.partitionBy("bucket").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    arr = ev2.join(F.broadcast(prev), "bucket").select(
        "event_id",
        "user_id",
        "ts",
        F.greatest(
            F.col("prev_bucket_max"), F.max("ts").over(within)
        ).alias("max_seen"),
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


@query(
    "q_stream_debounce",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS BIGINT)
              AS session_id
  FROM marked
),
last_per AS (
  SELECT user_id, session_id, event_id, event_type, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM sess
)
SELECT user_id, session_id, event_id AS last_event_id,
       event_type AS last_event_type, value AS last_value, ts AS settled_ts
FROM last_per WHERE rk = 1
ORDER BY user_id, session_id
""",
)
def q_stream_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS ``KTable#suppress(untilTimeLimit)`` as a debounce: per key,
    emit only the LAST update of each burst, where a burst ends after
    30 minutes of inactivity. Batch replay = gap-sessionization (the
    lag/cumsum idiom shared with q_window_session) + last-per-session.

    In the live streaming form this is `applyInPandasWithState` with a
    30-minute event-time timeout emitting the buffered newest value —
    the rate-limited changelog consumers want when a hot key updates
    1000×/s but downstream wants one settled row per burst. One shuffle
    on user_id; all three window passes reuse it; deterministic via the
    (ts, event_id) tie-break. The gap test compares MICROSECONDS
    (unix_micros) so it agrees with the oracle's exact
    ``ts - LAG(ts) > INTERVAL 30 MINUTE`` for gaps within ~1 s of the
    boundary (ADVICE r3 — floored-second diffs disagreed on sub-second
    alignment)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id", "ts", "event_id", "event_type", "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > 1_800_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = marked.withColumn("session_id", F.sum("is_new").over(w))
    w_last = Window.partitionBy("user_id", "session_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        sess.withColumn("rk", F.row_number().over(w_last))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "session_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("settled_ts"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "q_stream_rate_limit",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_id, ts, event_type,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, time_bucket(INTERVAL 1 HOUR, ts)
           ORDER BY ts, event_id
         ) AS k
  FROM events
)
SELECT user_id, event_id, ts, event_type,
       CAST(k <= 5 AS BOOLEAN) AS admitted
FROM ranked
ORDER BY event_id
""",
)
def q_stream_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key rate limiting (throttle): admit at most 5 events per user
    per hour, in arrival order, and FLAG the rest rather than dropping
    them (auditable backpressure — the downstream can count rejected
    load). The batch twin of a token-bucket processor with hourly
    refill: row_number within (key, hour bucket) ≤ k, deterministic
    under the (ts, event_id) arrival order. One shuffle on the
    composite key; the streaming form is the same state machine as
    debounce with a counter instead of a buffer."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", F.date_trunc("hour", "ts")
    ).orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id", "event_id", "ts", "event_type",
            (F.row_number().over(w) <= 5).alias("admitted"),
        )
        .orderBy("event_id")
    )
