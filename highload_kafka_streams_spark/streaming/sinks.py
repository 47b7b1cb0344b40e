"""Exactly-once sinks (SURVEY.md §2.6 — KS processing.guarantee=
exactly_once_v2 equivalent).

Structured Streaming gives at-least-once re-execution of a micro-batch
after failure; end-to-end exactly-once = checkpointed offsets +
an IDEMPOTENT sink. Two standard shapes:

- partitioned-overwrite-by-batchId (this module): each micro-batch
  writes to ``batch_id=<n>/`` with ``overwrite`` mode — a re-executed
  batch replaces its own previous (possibly partial) output instead of
  appending duplicates. In ``update`` mode a key revised in several
  micro-batches lands in several batch partitions, so a PLAIN read of
  the directory returns every historical version of that key; readers
  must take the max-``batch_id`` row per key, which is what
  ``read_latest_per_key`` does. Append-mode pipelines (each key emitted
  exactly once, e.g. suppressed final window results) may read plainly.
- transactional two-phase (Kafka txn producer / Delta) — not available
  in this container; the seam is the same ``foreachBatch`` hook.

The replay test (tests/test_streaming.py) restarts the query from the
same checkpoint and asserts the sink contents did not change — the
observable definition of exactly-once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def idempotent_parquet_sink(base_path: str):
    """foreachBatch hook: overwrite-by-batchId parquet writer."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(base_path, f"batch_id={batch_id}")
        )

    return write_batch


def write_exactly_once(
    df: DataFrame, base_path: str, checkpoint: str, query_name: str
):
    """Start a streaming query with exactly-once delivery into parquet:
    checkpointed source offsets + idempotent per-batch overwrite."""
    return (
        df.writeStream.foreachBatch(idempotent_parquet_sink(base_path))
        .outputMode("update")  # foreachBatch receives the changed rows;
        # idempotence comes from the per-batch overwrite, not the mode
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def read_latest_per_key(
    spark: SparkSession, base_path: str, key_cols: list[str]
) -> DataFrame:
    """Read an update-mode exactly-once sink: one row per key, the
    version from the highest ``batch_id`` partition (later micro-batch
    revisions shadow earlier ones). Partition pruning still applies to
    any batch_id/key filters pushed on top."""
    df = spark.read.option("basePath", base_path).parquet(base_path)
    w = Window.partitionBy(*key_cols).orderBy(F.col("batch_id").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "batch_id")
    )
