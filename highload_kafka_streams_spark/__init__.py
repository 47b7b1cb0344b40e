"""highload_kafka_streams_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``winsold107/highload_kafka_streams`` (a Kafka Streams stream
processor; see SURVEY.md §0 for the evidentiary basis), re-expressed
Spark-first:

- the full Kafka Streams DSL surface (stateless transforms, all join
  kinds, grouped/windowed aggregation, watermarked late data, custom
  stateful processors) as Spark DataFrame / Structured Streaming plans
  (SURVEY.md §2);
- LLM-data-pipeline extensions mandated by BASELINE.json:6 — exact and
  near-duplicate dedup, embedding similarity search, multimodal binary
  columns, text analysis;
- every batch-expressible operator verified against a DuckDB oracle
  (``plans.oracle``).

Design posture: DataFrame-declarative so Catalyst/AQE picks physical
strategies; broadcast bounded dims; no driver-side collect loops;
pandas UDFs (Arrow) only where built-ins cannot express the semantics.
"""

from highload_kafka_streams_spark.session import get_spark, configure_session

__all__ = ["get_spark", "configure_session"]
