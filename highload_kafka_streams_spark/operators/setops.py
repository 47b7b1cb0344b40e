"""Sorts, limits, top-k, and set operations (SURVEY.md §2.7).

Not expressible in the KS DSL (streams are unordered) but required by
the analytics north star. Scale notes:

- ``orderBy(...).limit(k)`` plans ``TakeOrderedAndProject`` — each task
  keeps a k-element heap and the driver merges ~tasks×k rows, so top-k
  never materializes a global sort even at 100 TB
- a bare global ``orderBy`` range-partitions (sampled boundaries) —
  used only when the full ordered output is the product
- intersect/except plan as aggregates + joins, all shuffle-partitioned
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query


@query(
    "q_sort_limit_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 orders by price (TakeOrderedAndProject; unique
    o_orderkey tiebreak keeps the cut deterministic)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q_global_sort",
    oracle="""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
ORDER BY s_acctbal DESC, s_suppkey
""",
)
def q_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full global sort (range-partitioned exchange + per-partition sort)."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select("s_suppkey", "s_name", "s_acctbal").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )


@query(
    "q_union_all",
    oracle="""
SELECT user_id, 'click' AS src FROM events WHERE event_type = 'click'
UNION ALL
SELECT user_id, 'purchase' AS src FROM events WHERE event_type = 'purchase'
ORDER BY user_id, src
""",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.lit("click").alias("src")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.lit("purchase").alias("src")
    )
    return a.unionByName(b).orderBy("user_id", "src")


@query(
    "q_union_distinct",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
UNION
SELECT user_id FROM events WHERE event_type = 'signup'
ORDER BY user_id
""",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.unionByName(b).distinct().orderBy("user_id")


@query(
    "q_intersect",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
ORDER BY user_id
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both clicked and purchased."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b).orderBy("user_id")


@query(
    "q_except",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150.0
ORDER BY user_id
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who viewed but never made a large purchase (EXCEPT DISTINCT)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 150.0)
    ).select("user_id")
    return a.subtract(b).orderBy("user_id")  # subtract == EXCEPT DISTINCT
