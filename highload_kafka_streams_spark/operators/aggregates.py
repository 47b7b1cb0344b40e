"""Grouping & aggregation operators (SURVEY.md §2.4).

Kafka Streams surface covered: ``KGroupedStream#count/reduce/aggregate``,
``KGroupedStream#cogroup``, plus the analytics extensions (distinct,
count-distinct, rollup/cube/grouping-sets) the oracle harness requires.

Spark-first design notes:
- every groupBy here compiles to partial (map-side) HashAggregate →
  Exchange on the group key → final HashAggregate; at 100 TB the
  pre-shuffle combine is what keeps shuffle volume ∝ |groups|, not |rows|
- aggregates over doubles use the deterministic decimal-backed forms in
  ``compat`` so the DuckDB oracle hash-matches bit-for-bit
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from highload_kafka_streams_spark.compat import davg, davg_sql, dsum, dsum_sql
from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query


# ---------------------------------------------------------------------------
# flagship: pricing summary (filter → groupBy → 8 aggs → sort), TPC-H Q1 shape
# exercises scan→filter→project→partial agg→shuffle→final agg→sort,
# i.e. the whole batch lifecycle of SURVEY.md §3.2
# ---------------------------------------------------------------------------

@query(
    "q_pricing_summary",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql('l_quantity', 'sum_qty')},
  {dsum_sql('l_extendedprice', 'sum_base_price')},
  {dsum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
  {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
  {davg_sql('l_quantity', 'avg_qty')},
  {davg_sql('l_extendedprice', 'avg_price')},
  {davg_sql('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS equivalent: stream→groupBy(flag,status)→aggregate (KGroupedStream#aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
