"""Kafka source/sink wiring (SURVEY.md §2.1; BASELINE.json:7
"Structured Streaming with Kafka source").

No broker (or spark-sql-kafka package) exists in this container, so
these builders are code-complete and unit-tested for plan construction
only — ``tests/test_streaming.py`` exercises the identical topology
through file/memory sources, which share every operator downstream of
the source.

Schema policy (KS Serdes-at-the-edge, SURVEY.md §1.1): Kafka delivers
``key/value: binary``; we apply a *declared* StructType via from_json —
never inference — so the topology's schema is stable across restarts.

Scale notes: one Spark input partition per Kafka topic-partition;
``minPartitions`` can oversplit hot partitions; offsets + state live in
the checkpoint, giving exactly-once into transactional/idempotent sinks
(KS processing.guarantee=exactly_once_v2 equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DEFAULT_STARTING_OFFSETS = "earliest"


def read_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    value_schema: StructType,
    ts_field: str | None = None,
    starting_offsets: str = DEFAULT_STARTING_OFFSETS,
    min_partitions: int | None = None,
) -> DataFrame:
    """KS StreamsBuilder#stream(topic) → streaming DataFrame with typed
    value columns and an event-time column.

    ``ts_field``: value field to use as event time; defaults to the
    Kafka record timestamp (KS's TimestampExtractor default).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    raw = reader.load()
    parsed = raw.select(
        F.col("key").cast("string").alias("record_key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        F.col("timestamp").alias("kafka_ts"),
        "partition",
        "offset",
    ).select("record_key", "v.*", "kafka_ts", "partition", "offset")
    if ts_field:
        parsed = parsed.withColumn("ts", F.col(ts_field))
    else:
        parsed = parsed.withColumn("ts", F.col("kafka_ts"))
    return parsed


def write_stream(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    key_col: str | None = None,
    output_mode: str = "append",
):
    """KS KStream#to(topic) — value serialized as JSON of all non-key
    columns; exactly-once via checkpointed offsets + Kafka idempotence."""
    cols = [c for c in df.columns if c != key_col]
    out = df.select(
        *(
            [F.col(key_col).cast("string").alias("key")]
            if key_col
            else []
        ),
        F.to_json(F.struct(*cols)).alias("value"),
    )
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .start()
    )


def kafka_package_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka integration is on the classpath."""
    try:
        spark._jvm.org.apache.spark.sql.kafka010.KafkaSourceProvider  # noqa: B018
        return True
    except Exception:
        return False
