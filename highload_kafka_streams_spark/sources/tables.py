"""Source abstractions (SURVEY.md §2.1): stream / table / global-table.

Kafka Streams surface: ``StreamsBuilder#stream`` (append-only record
stream), ``StreamsBuilder#table`` (changelog → latest value per key),
``StreamsBuilder#globalTable`` (fully replicated lookup table).

Spark-first mapping:
- stream → streaming DataFrame (``streaming.topology``); in the batch
  replay verified here, a plain DataFrame with an event-time column
- table → latest-per-key snapshot: ``row_number() OVER (PARTITION BY key
  ORDER BY ts DESC) = 1``. At scale this is one shuffle on the key —
  exactly the state Kafka Streams would hold in its KeyValueStore
- global table → ``broadcast(dim)``: replicated to every executor, no
  co-partitioning requirement, non-key lookups allowed — semantics
  identical to GlobalKTable
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query


def stream(spark: SparkSession, sf_dir: str, name: str = "events") -> DataFrame:
    """KS ``StreamsBuilder#stream`` — batch-replay form."""
    return load_table(spark, sf_dir, name)


def table_latest_per_key(
    df: DataFrame, key_cols: list[str], ts_col: str, tiebreak: str
) -> DataFrame:
    """KS ``StreamsBuilder#table`` — changelog compaction to latest-per-key.

    ``tiebreak`` makes the snapshot deterministic when timestamps collide
    (Kafka's own resolution is by offset; we use a unique id column).
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def global_table(df: DataFrame) -> DataFrame:
    """KS ``StreamsBuilder#globalTable`` — broadcast-replicated lookup."""
    return F.broadcast(df)


# ---------------------------------------------------------------------------
# oracle-checked demonstrations
# ---------------------------------------------------------------------------

@query(
    "q_source_stream_replay",
    oracle="""
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_type IN ('click', 'purchase')
ORDER BY event_id
""",
)
def q_source_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream source consumed in batch-replay mode (KS StreamsBuilder#stream)."""
    ev = stream(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


@query(
    "q_source_table_latest_per_key",
    oracle="""
SELECT user_id, event_type AS last_event_type, value AS last_value
FROM (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1
ORDER BY user_id
""",
)
def q_source_table_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table source: topic compacted to latest value per key (KS StreamsBuilder#table)."""
    ev = stream(spark, sf_dir, "events")
    snap = table_latest_per_key(ev, ["user_id"], "ts", "event_id")
    return snap.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    ).orderBy("user_id")


@query(
    "q_source_global_table",
    oracle="""
SELECT r.r_name, count(*) AS n_nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
""",
)
def q_source_global_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-table lookup join (KS StreamsBuilder#globalTable + KStream#join)."""
    nation = load_table(spark, sf_dir, "nation")
    region = global_table(load_table(spark, sf_dir, "region"))
    return (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_nations"))
        .orderBy("r_name")
    )


@query(
    "q_cdc_log_compaction",
    oracle="""
WITH log AS (
  SELECT user_id,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS t,
         event_id,
         (event_type = 'error') AS tombstone,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_c
  FROM events
),
latest AS (
  SELECT user_id, t, tombstone, value_c,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
           AS n_versions,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY t DESC, event_id DESC) AS rn
  FROM log
)
SELECT user_id, t AS last_t_us, value_c AS last_value_c, n_versions
FROM latest
WHERE rn = 1 AND NOT tombstone
ORDER BY user_id
""",
)
def q_cdc_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-style log compaction with tombstone semantics: the change
    log compacts to each key's LATEST record, and a key whose latest
    record is a tombstone (here: an 'error' event) disappears from the
    compacted state entirely — exactly what a compacted topic's
    retention does, and the delete-aware half that the plain
    latest-per-key table source (q_source_table_latest_per_key) does
    not model. Emits each surviving key's last offset-time, last
    value and total version count, so both the keep AND the drop
    decisions are value-hash-checked.

    Scale shape: ONE shuffle on the key; the latest-record rank
    plans a WindowGroupLimit (rank pushdown — no per-key sort
    materialization beyond the running top-1), and the version count
    rides the same partitioning. This is the standard 100 TB CDC
    snapshot recipe (Delta/Iceberg 'deduplicate on merge key' with
    delete handling)."""
    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        F.expr("unix_micros(ts)").alias("t"),
        "event_id",
        (F.col("event_type") == "error").alias("tombstone"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("value_c"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.desc("t"), F.desc("event_id")
    )
    wc = Window.partitionBy("user_id")
    latest = log.select(
        "user_id",
        "t",
        "tombstone",
        "value_c",
        F.count("*").over(wc).cast("long").alias("n_versions"),
        F.row_number().over(wr).alias("rn"),
    )
    return (
        latest.filter((F.col("rn") == 1) & (~F.col("tombstone")))
        .select(
            "user_id",
            F.col("t").alias("last_t_us"),
            F.col("value_c").alias("last_value_c"),
            "n_versions",
        )
        .orderBy("user_id")
    )
