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


def _morton_sql(x: str, y: str, dialect: str) -> str:
    """16+16-bit Morton (Z-order) interleave as a flat bit expression.

    Bit positions are disjoint so `+` ≡ `|`; generated per dialect
    because Spark SQL spells shifts as functions while DuckDB uses
    operators. Identical integer semantics on both engines.
    """
    parts = []
    for i in range(16):
        if dialect == "spark":
            parts.append(f"(shiftleft(shiftright({x}, {i}) & 1, {2 * i}))")
            parts.append(f"(shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1}))")
        else:
            parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
            parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(parts)


_Z_X = "CAST(o_custkey % 65536 AS BIGINT)"
_Z_Y = (
    "CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)"
)
_Z_Y_SPARK = "CAST(datediff(o_orderdate, TIMESTAMP '1995-01-01') AS BIGINT)"


@query(
    "q_sort_zorder_layout",
    oracle=f"""
WITH keyed AS (
  SELECT {_Z_X} AS x, {_Z_Y} AS y FROM orders
),
z AS (
  SELECT x, y, CAST({_morton_sql('x', 'y', 'duckdb')} AS BIGINT) AS zcode
  FROM keyed
)
SELECT CAST(zcode >> 18 AS BIGINT) AS zbucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
       CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
FROM z
GROUP BY 1
ORDER BY zbucket
""",
)
def q_sort_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout statistics over (customer, order
    day) — the multidimensional clustering technique behind
    Delta/Iceberg `OPTIMIZE ZORDER`: interleaving the two keys' bits
    makes one sort order cluster BOTH dimensions, so per-file min/max
    stats prune scans for either predicate. The output is exactly the
    skipping index such a layout yields: per z-bucket (a contiguous
    2¹⁸-codepoint curve segment ≈ one target file) the row count and
    the x/y bounding rectangle — tight rectangles are the whole point,
    and the locality test asserts them.

    Exact: the interleave is pure integer bit arithmetic (32 disjoint
    bit positions, `+` ≡ `|`), identical on both engines.

    Scale shape: computing zcode is a zero-shuffle projection; at
    100 TB you'd `repartitionByRange(zcode)` + write — this query's
    group-by-bucket is that layout's manifest, shuffling only
    (bucket, stats) pairs."""
    o = load_table(spark, sf_dir, "orders")
    keyed = o.selectExpr(
        f"{_Z_X} AS x",
        f"{_Z_Y_SPARK} AS y",
    )
    z = keyed.selectExpr(
        "x",
        "y",
        f"CAST({_morton_sql('x', 'y', 'spark')} AS BIGINT) AS zcode",
    )
    return (
        z.selectExpr("CAST(shiftright(zcode, 18) AS BIGINT) AS zbucket", "x", "y")
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .orderBy("zbucket")
    )


@query(
    "q_layout_pruning_audit",
    oracle="""
WITH by_week AS (
  SELECT (CAST(epoch_us(l_shipdate) AS BIGINT) // 86400000000) // 7
           AS file_id,
         CAST(count(*) AS BIGINT) AS n_rows,
         min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
  FROM lineitem GROUP BY 1
),
by_part AS (
  SELECT l_partkey // 64 AS file_id,
         CAST(count(*) AS BIGINT) AS n_rows,
         min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
  FROM lineitem GROUP BY 1
),
audit AS (
  SELECT 'clustered_by_shipdate' AS layout,
         CAST(count(*) AS BIGINT) AS n_files,
         CAST(SUM(n_rows) AS BIGINT) AS n_rows_total,
         CAST(SUM(CASE WHEN max_ship >= TIMESTAMP '1997-01-01'
                        AND min_ship < TIMESTAMP '1997-04-01'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_files_hit,
         CAST(SUM(CASE WHEN max_ship >= TIMESTAMP '1997-01-01'
                        AND min_ship < TIMESTAMP '1997-04-01'
                       THEN n_rows ELSE 0 END) AS BIGINT) AS n_rows_scanned
  FROM by_week
  UNION ALL
  SELECT 'clustered_by_partkey',
         CAST(count(*) AS BIGINT),
         CAST(SUM(n_rows) AS BIGINT),
         CAST(SUM(CASE WHEN max_ship >= TIMESTAMP '1997-01-01'
                        AND min_ship < TIMESTAMP '1997-04-01'
                       THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN max_ship >= TIMESTAMP '1997-01-01'
                        AND min_ship < TIMESTAMP '1997-04-01'
                       THEN n_rows ELSE 0 END) AS BIGINT)
  FROM by_part
)
SELECT layout, n_files, n_rows_total, n_files_hit, n_rows_scanned,
       (n_files_hit * 1000000) // n_files AS files_hit_ppm,
       (n_rows_scanned * 1000000) // n_rows_total AS rows_scanned_ppm
FROM audit ORDER BY layout
""",
)
def q_layout_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max data-skipping) effectiveness audit: simulate
    two file layouts of the fact table — clustered by ship WEEK vs
    clustered by PARTKEY range — build each layout's per-file min/max
    manifest for l_shipdate, and measure what fraction of files (and
    rows) a one-quarter date predicate must read under each. This is
    the measurement that justifies a `repartitionByRange`/Z-order
    rewrite at 100 TB: the date-clustered layout prunes to ~the
    quarter's files, the partkey-clustered one reads everything
    because every file's date range spans the full table
    (q_sort_zorder_layout builds the manifest such a rewrite yields;
    this query quantifies WHY). File ids are value-domain buckets of
    the cluster key — no global row-number, no layout actually
    written. All ratios exact integer floor-divisions.

    Scale shape: two map-side-combinable aggregates over the fact
    scan (one per candidate layout), manifests are |files|-sized,
    verdict is 2 rows. A real audit over live parquet footers reads
    ONLY metadata; this one scans because the fixture has no
    manifest — the plan shape of the decision logic is identical."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-04-01").cast("timestamp")

    def manifest(df, file_id, layout):
        m = df.groupBy(file_id.alias("file_id")).agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
        )
        hit = (F.col("max_ship") >= lo) & (F.col("min_ship") < hi)
        return m.agg(
            F.lit(layout).alias("layout"),
            F.count("*").cast("long").alias("n_files"),
            F.sum("n_rows").cast("long").alias("n_rows_total"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias(
                "n_files_hit"
            ),
            F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("n_rows_scanned"),
        )

    audit = manifest(
        li,
        F.expr("(unix_micros(l_shipdate) DIV 86400000000) DIV 7"),
        "clustered_by_shipdate",
    ).unionByName(
        manifest(li, F.expr("l_partkey DIV 64"), "clustered_by_partkey")
    )
    return audit.select(
        "layout",
        "n_files",
        "n_rows_total",
        "n_files_hit",
        "n_rows_scanned",
        F.expr("(n_files_hit * 1000000) DIV n_files").alias(
            "files_hit_ppm"
        ),
        F.expr("(n_rows_scanned * 1000000) DIV n_rows_total").alias(
            "rows_scanned_ppm"
        ),
    ).orderBy("layout")
