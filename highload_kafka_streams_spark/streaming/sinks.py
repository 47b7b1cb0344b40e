"""Exactly-once sinks (SURVEY.md §2.6 — KS processing.guarantee=
exactly_once_v2 equivalent).

Structured Streaming gives at-least-once re-execution of a micro-batch
after failure; end-to-end exactly-once = checkpointed offsets +
an IDEMPOTENT sink. Two standard shapes:

- partitioned-overwrite-by-batchId (this module): each micro-batch
  writes to ``batch_id=<n>/`` with ``overwrite`` mode — a re-executed
  batch replaces its own previous (possibly partial) output instead of
  appending duplicates. Readers see the union of batch partitions.
- transactional two-phase (Kafka txn producer / Delta) — not available
  in this container; the seam is the same ``foreachBatch`` hook.

The replay test (tests/test_streaming.py) restarts the query from the
same checkpoint and asserts the sink contents did not change — the
observable definition of exactly-once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


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
