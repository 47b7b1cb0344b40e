"""Analytic (OVER-clause) window functions (SURVEY.md §2.8).

These back the KTable latest-per-key emulation, per-group top-k, and
the sessionization oracle. All are single-shuffle operators: one
Exchange on the PARTITION BY key, then a sort within partitions —
at 100 TB the key choice (user_id, custkey) spreads evenly, and no
driver-side work happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from highload_kafka_streams_spark.compat import fixed
from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query


@query(
    "q_window_rank_topk",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_custkey
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) t
WHERE rn <= 3
ORDER BY c_custkey, rn
""",
)
def q_window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-3 orders by price (row_number ≤ k). The rank filter
    is evaluated per partition — only k rows per key survive the window,
    never a global sort."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("c_custkey", "rn")
    )


@query(
    "q_window_ranking_fns",
    oracle="""
SELECT s_suppkey, n_name,
       rank()        OVER w AS rnk,
       dense_rank()  OVER w AS drnk,
       ntile(4)      OVER w AS quartile,
       percent_rank() OVER w AS prank
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey)
ORDER BY s_suppkey
""",
)
def q_window_ranking_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank over per-nation balances."""
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    w = Window.partitionBy("n_name").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .select(
            "s_suppkey",
            "n_name",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("prank"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q_window_lag_lead",
    oracle="""
SELECT event_id, user_id,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       CAST(date_diff('microseconds', lag(CAST(ts AS TIMESTAMP)) OVER w,
                      CAST(ts AS TIMESTAMP)) AS BIGINT) AS micros_since_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
""",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead — per-user previous/next event value and inter-arrival gap
    (the building block for sessionization and funnel analysis)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            ).alias("micros_since_prev"),
        )
        .orderBy("event_id")
    )


@query(
    "q_window_running_agg",
    oracle="""
SELECT event_id, user_id,
       SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 10000.0
         AS running_value,
       count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS running_n
FROM events
ORDER BY event_id
""",
)
def q_window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed running aggregates (cumulative per-user spend) — the
    fixed-point form keeps every prefix sum bit-identical cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            (F.sum(fixed("value")).over(w) / 10000.0).alias("running_value"),
            F.count("*").over(w).alias("running_n"),
        )
        .orderBy("event_id")
    )


@query(
    "q_window_distribution_fns",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       round(percent_rank() OVER w, 9) AS pct_rank,
       round(cume_dist() OVER w, 9) AS cume,
       ntile(4) OVER w AS quartile
FROM orders
WHERE o_orderkey < 1000
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey
""",
)
def q_window_distribution_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytic functions (percent_rank / cume_dist /
    ntile) — the §2.8 family beyond ranking. The window orders on
    (price, key) so ties can't make ntile/cume_dist assignment
    engine-dependent; the rational outputs are rounded to absorb
    last-ulp division differences."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 1000
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("o_orderkey")


@query(
    "q_window_range_frame",
    oracle="""
SELECT event_id, user_id,
       SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) / 10000.0
         AS trailing_1h_value,
       count(*) OVER (PARTITION BY user_id
                      ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         AS trailing_1h_n
FROM events
ORDER BY event_id
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window aggregates — the VALUE-bounded frame (all rows
    within the trailing hour of event time) vs q_window_running_agg's
    ROW-bounded frame. This is the per-record sliding aggregate KS
    SlidingWindows computes; ordering is FLOORED epoch seconds in both
    engines — Spark's unix_timestamp floors, while DuckDB's
    CAST(epoch(ts) AS BIGINT) ROUNDS fractional seconds, so the oracle
    must FLOOR(epoch(ts)) first or frame boundaries disagree on
    sub-second timestamps (ADVICE r3, confirmed at sf0.1) — and the sum
    is fixed-point. Same single user_id shuffle as every other per-user
    window."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            (F.sum(fixed("value")).over(w) / 10000.0).alias("trailing_1h_value"),
            F.count("*").over(w).alias("trailing_1h_n"),
        )
        .orderBy("event_id")
    )


@query(
    "q_pattern_sequence",
    oracle="""
WITH tv AS (
  SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS t_view
  FROM events GROUP BY user_id
),
tc AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN tv ON e.user_id = tv.user_id
  WHERE e.event_type = 'click' AND e.ts > tv.t_view
  GROUP BY e.user_id
),
tp AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN tc ON e.user_id = tc.user_id
  WHERE e.event_type = 'purchase' AND e.ts > tc.t_click
  GROUP BY e.user_id
)
SELECT tv.user_id, tv.t_view, tc.t_click, tp.t_purchase,
       CAST(tp.t_purchase IS NOT NULL AS BOOLEAN) AS completed,
       CAST(tp.t_purchase IS NOT NULL
            AND tp.t_purchase <= tv.t_view + INTERVAL 24 HOUR
            AS BOOLEAN) AS completed_24h
FROM tv
LEFT JOIN tc ON tv.user_id = tc.user_id
LEFT JOIN tp ON tv.user_id = tp.user_id
WHERE tv.t_view IS NOT NULL
ORDER BY tv.user_id
""",
)
def q_pattern_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-sequence pattern detection (CEP): the earliest
    view → click-after-view → purchase-after-click chain per user, plus
    a 24-hour completion deadline — the MATCH_RECOGNIZE / Flink-CEP
    shape a Kafka Streams app hand-rolls with per-key state.

    Spark form: THREE chained conditional-min window passes over ONE
    user_id partitioning (t_view feeds the click predicate, t_click
    feeds the purchase predicate) and a final first-row collapse —
    no self-joins, where the oracle's equivalent SQL needs three.
    At 100 TB each pass is a linear scan of the already-shuffled
    partition; pattern depth adds passes, never joins or state blow-up."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    with_v = ev.withColumn(
        "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu)
    )
    with_c = with_v.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(wu),
    )
    with_p = with_c.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(wu),
    )
    per_user = (
        with_p.groupBy("user_id")
        .agg(
            F.first("t_view").alias("t_view"),
            F.first("t_click").alias("t_click"),
            F.first("t_purchase").alias("t_purchase"),
        )
        .filter(F.col("t_view").isNotNull())
    )
    return per_user.select(
        "user_id",
        "t_view",
        "t_click",
        "t_purchase",
        F.col("t_purchase").isNotNull().alias("completed"),
        (
            F.col("t_purchase").isNotNull()
            & (
                F.col("t_purchase")
                <= F.col("t_view") + F.expr("INTERVAL 24 HOURS")
            )
        ).alias("completed_24h"),
    ).orderBy("user_id")


@query(
    "q_window_rolling_median",
    oracle="""
SELECT event_id, user_id, value,
       median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         AS smoothed
FROM events
ORDER BY event_id
""",
)
def q_window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-median smoothing (5-tap) — the robust denoiser: unlike a
    moving average, one corrupted reading cannot drag the smoothed
    series (the monitoring prefilter ahead of z-score anomaly
    scoring). Spark has no median window function; the exact
    `percentile(0.5)` aggregate over the same ROWS frame computes the
    identical linear-interpolated statistic (semantics pinned
    cross-engine by q_agg_percentiles). Frame width is constant, so
    state per row is O(5) and the pass stays one user_id shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            F.expr("percentile(value, 0.5)")
            .over(w)
            .alias("smoothed"),
        )
        .orderBy("event_id")
    )


@query(
    "q_window_cume_distinct",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id,
         CASE WHEN row_number() OVER (
             PARTITION BY user_id, event_type
             ORDER BY CAST(ts AS TIMESTAMP), event_id) = 1
           THEN 1 ELSE 0 END AS first_seen,
         CAST(ts AS TIMESTAMP) AS tst
  FROM events
)
SELECT user_id, event_id,
       CAST(SUM(first_seen) OVER (
           PARTITION BY user_id ORDER BY tst, event_id) AS BIGINT)
         AS distinct_types_so_far
FROM flagged
ORDER BY user_id, event_id
""",
)
def q_window_cume_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT count over a window — 'how many distinct
    event types has this user produced so far' — which plain running
    aggregation cannot express (COUNT(DISTINCT) is not a supported
    window aggregate in either engine). The standard decomposition:
    flag each row that is the FIRST occurrence of its (user, type)
    (row_number over the narrower partition = 1), then a running SUM
    of the 0/1 flags over the user's timeline. Both windows partition
    by user (the second by a prefix of the first's key), so Catalyst
    plans one exchange on user_id and two in-partition sorts — no
    global window, no state beyond the partition."""
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_cume = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
    )
    return (
        flagged.select(
            "user_id",
            "event_id",
            F.sum("first_seen").over(w_cume).alias("distinct_types_so_far"),
        )
        .orderBy("user_id", "event_id")
    )
