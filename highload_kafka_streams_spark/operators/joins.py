"""Join operators (SURVEY.md §2.3) — every Kafka Streams join kind plus
the relational extensions (semi/anti/theta/cross) the analytics surface
needs.

KS surface covered: ``KStream#join/leftJoin/outerJoin(KStream,
JoinWindows)`` (windowed stream-stream), ``KStream#join/leftJoin(KTable)``
(enrichment), ``KStream#join(GlobalKTable)`` (broadcast lookup),
``KTable#join/leftJoin/outerJoin(KTable)`` and the foreign-key variant.

Scale notes (the part that matters at 100 TB):
- dims bounded by domain (region=5, nation=25, supplier≈10k) are
  broadcast — zero shuffle on the fact side, identical to GlobalKTable
- fact-fact joins shuffle both sides on the key; AQE handles skew splits
- the windowed stream-stream join is an equi-join on key plus a time
  range predicate, so Spark plans a hash join with the range as a
  post-filter — NOT a cartesian; state growth in the streaming form is
  bounded by watermarks (see streaming.topology)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from highload_kafka_streams_spark.compat import dsum, dsum_sql
from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query
from highload_kafka_streams_spark.sources.tables import table_latest_per_key


@query(
    "q_join_stream_stream_windowed",
    oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 30 MINUTE
ORDER BY click_id, purchase_id
""",
)
def q_join_stream_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KStream#join(KStream, JoinWindows.ofTimeDifference(30m)) — purchases
    within 30 minutes after a click by the same user. Batch-replay form of
    the windowed stream-stream join: equi-key hash join + time-range filter."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    cond = (
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return (
        c.join(p, cond)
        .select(
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
            F.col("c.user_id").alias("user_id"),
            F.col("p.value").alias("purchase_value"),
        )
        .orderBy("click_id", "purchase_id")
    )


@query(
    "q_join_stream_stream_windowed_left",
    oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
       p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 30 MINUTE
ORDER BY click_id, purchase_id
""",
)
def q_join_stream_stream_windowed_left(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KStream#leftJoin(KStream, JoinWindows.ofTimeDifference(30m)) —
    every click is emitted; purchase columns are NULL when no purchase
    landed inside the window. Same hash-join + time-range-filter plan as
    the inner form; the left preservation is free."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    cond = (
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return (
        c.join(p, cond, "left")
        .select(
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
            F.col("c.user_id").alias("user_id"),
            F.col("p.value").alias("purchase_value"),
        )
        .orderBy("click_id", "purchase_id")
    )


@query(
    "q_join_stream_stream_windowed_outer",
    oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       coalesce(c.user_id, p.user_id) AS user_id,
       p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
FULL OUTER JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 30 MINUTE
ORDER BY click_id, purchase_id
""",
)
def q_join_stream_stream_windowed_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KStream#outerJoin(KStream, JoinWindows) — clicks with no in-window
    purchase AND purchases with no in-window click both surface with the
    other side NULL (KS emits these on window close; batch replay emits
    them directly)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    cond = (
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return (
        c.join(p, cond, "full_outer")
        .select(
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
            F.coalesce(F.col("c.user_id"), F.col("p.user_id")).alias("user_id"),
            F.col("p.value").alias("purchase_value"),
        )
        .orderBy("click_id", "purchase_id")
    )


@query(
    "q_join_stream_table",
    oracle="""
WITH latest AS (
  SELECT user_id, event_type AS last_type
  FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.value, l.last_type
FROM (SELECT * FROM events WHERE event_type = 'purchase') e
JOIN latest l ON e.user_id = l.user_id
ORDER BY e.event_id
""",
)
def q_join_stream_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KStream#join(KTable) — enrich each purchase with the user's current
    table row (latest-per-key snapshot in batch replay)."""
    ev = load_table(spark, sf_dir, "events")
    latest = table_latest_per_key(ev, ["user_id"], "ts", "event_id").select(
        "user_id", F.col("event_type").alias("last_type")
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    return (
        purchases.join(latest, "user_id")
        .select("event_id", "user_id", "value", "last_type")
        .orderBy("event_id")
    )


@query(
    "q_join_global_table",
    oracle="""
SELECT n.n_name AS nation,
       SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
                AS BIGINT)) / 10000.0 AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY nation
""",
)
def q_join_global_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KStream#join(GlobalKTable) — fact stream joined to broadcast dims.

    supplier/nation are bounded dims → broadcast to every executor: the
    600k-row (at sf0.1; billions at 100 TB) lineitem side never shuffles
    for the join, only for the final 25-group aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(rev, "revenue"))
        .orderBy("nation")
    )


@query(
    "q_join_table_table",
    oracle="""
SELECT c.c_custkey, c.c_name, o.n_orders, o.best_price
FROM customer c
JOIN (
  SELECT o_custkey, count(*) AS n_orders, max(o_totalprice) AS best_price
  FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
ORDER BY c.c_custkey
""",
)
def q_join_table_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KTable#join(KTable) — two changelog snapshots joined on key."""
    cust = load_table(spark, sf_dir, "customer")
    orders_tbl = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.max("o_totalprice").alias("best_price"),
        )
    )
    return (
        cust.join(orders_tbl, cust.c_custkey == orders_tbl.o_custkey)
        .select("c_custkey", "c_name", "n_orders", "best_price")
        .orderBy("c_custkey")
    )


@query(
    "q_join_table_table_outer",
    oracle="""
SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
       c.c_mktsegment AS segment,
       coalesce(o.n_orders, 0) AS n_orders
FROM customer c
FULL OUTER JOIN (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
ORDER BY custkey
""",
)
def q_join_table_table_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KTable#outerJoin(KTable) — both sides' tombstone/null semantics."""
    cust = load_table(spark, sf_dir, "customer")
    orders_tbl = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        cust.join(orders_tbl, cust.c_custkey == orders_tbl.o_custkey, "full_outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("segment"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
        .orderBy("custkey")
    )


@query(
    "q_join_foreign_key",
    oracle="""
SELECT n.n_name AS nation, count(*) AS n_customers,
       SUM(CAST(FLOOR(c.c_acctbal * 10000 + 0.5) AS BIGINT)) / 10000.0
         AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY nation
""",
)
def q_join_foreign_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KTable#join(KTable, foreignKeyExtractor) — 1:N join on a value field.
    KS needs subscription/response topics for this; Spark expresses it as a
    plain equi-join (broadcast here since nation is bounded)."""
    cust = load_table(spark, sf_dir, "customer")
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal", "total_acctbal"),
        )
        .orderBy("nation")
    )


@query(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — customers with ≥1 urgent order (EXISTS). Emulated in
    KS via join+dedupe; first-class in Spark (no row multiplication, the
    probe side short-circuits on first match)."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — customers with no urgent orders (NOT EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "q_join_theta",
    oracle="""
SELECT s.s_suppkey, c.c_custkey
FROM supplier s
JOIN customer c
  ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal + 9000.0
ORDER BY s.s_suppkey, c.c_custkey
""",
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join — equi-key on nation plus a non-equi balance predicate
    (planned as hash join on the equi part, theta as post-filter)."""
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    return (
        sup.join(
            cust,
            (sup.s_nationkey == cust.c_nationkey)
            & (sup.s_acctbal > cust.c_acctbal + 9000.0),
        )
        .select("s_suppkey", "c_custkey")
        .orderBy("s_suppkey", "c_custkey")
    )


@query(
    "q_join_cross",
    oracle="""
SELECT r1.r_name AS from_region, r2.r_name AS to_region
FROM region r1 CROSS JOIN region r2
WHERE r1.r_regionkey <> r2.r_regionkey
ORDER BY from_region, to_region
""",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join — bounded-side cartesian (route matrix over regions)."""
    r1 = load_table(spark, sf_dir, "region").alias("r1")
    r2 = load_table(spark, sf_dir, "region").alias("r2")
    return (
        r1.crossJoin(r2)
        .filter(F.col("r1.r_regionkey") != F.col("r2.r_regionkey"))
        .select(
            F.col("r1.r_name").alias("from_region"),
            F.col("r2.r_name").alias("to_region"),
        )
        .orderBy("from_region", "to_region")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_tiebreak: str | None = None,
):
    """As-of join: for each left row, the single latest right row with
    ``right.ts <= left.ts`` on the same key (NULLs when none) — the
    canonical market-data/enrichment operator Spark lacks natively.

    Implementation is the MERGE form, not a range join: union both
    sides tagged, one window pass per key carrying the last-seen right
    row forward (``last(..., ignorenulls)`` over rows preceding), then
    keep left rows. One shuffle + one sort on (key, ts) — linear in
    |left|+|right| and skew-bounded by the key, where the naive
    range-join candidate set is |left|×|right| per key.

    Right-side ties at the same (key, ts): pass ``right_tiebreak`` (a
    right column name) and the MAX-tiebreak row wins deterministically
    — resolved INSIDE the merge sort, so the right side needs no
    dedup pre-aggregation (one whole shuffle saved). Without it,
    ``right`` must be unique per (key, right_ts) or the matched row is
    undefined. ALL right value columns come back prefixed ``r_<col>``
    (not just the timestamp), so collisions with left column names
    cannot produce duplicate output columns.
    """
    rcols = [c for c in right.columns if c not in (key, right_ts)]
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        (
            F.col(right_tiebreak) if right_tiebreak else F.lit(0)
        ).alias("__tb"),
        F.struct(
            F.col(right_ts).alias(f"r_{right_ts}"),
            *[F.col(c).alias(f"r_{c}") for c in rcols],
        ).alias("__rval"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != key],
    )
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(0).cast(r_tag.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r_tag.schema["__rval"].dataType).alias("__rval"),
        *[F.col(c) for c in left.columns if c != key],
    )
    # right rows sort before left rows at equal ts → "<=" semantics;
    # ascending tiebreak among equal-ts right rows → last() carries the
    # MAX-tiebreak row (left rows' __tb is inert: their __rval is null)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__is_left", "__tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r_tag.unionByName(l_tag).withColumn(
        "__match", F.last("__rval", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("__is_left") == 1)
        .select(
            key,
            *[c for c in left.columns if c != key],
            "__match.*",
        )
    )


@query(
    "q_join_asof",
    oracle="""
WITH c AS (
  SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS c_ts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         max(event_id) AS purchase_id,
         arg_max(value, event_id) AS p_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, CAST(ts AS TIMESTAMP)
)
SELECT c.click_id, c.user_id, c.c_ts,
       p.ts AS r_ts, p.purchase_id AS r_purchase_id, p.p_value AS r_p_value
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.c_ts >= p.ts
ORDER BY click_id
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click enriched with the user's latest at-or-before purchase
    (oracle: DuckDB's native ASOF LEFT JOIN over the max_by-deduped
    right side). Ties at (user, ts) resolve to the max purchase_id
    INSIDE the merge window (right_tiebreak) — no dedup pre-aggregation,
    so the purchases side contributes zero extra shuffles."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("p_value"),
    )
    return asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="c_ts",
        right_ts="ts",
        right_tiebreak="purchase_id",
    ).orderBy("click_id")


@query(
    "q_join_range_bucketed",
    oracle="""
WITH iv AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 6 HOUR AS w_start,
         date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 9 HOUR AS w_end
  FROM events GROUP BY 1, 2
)
SELECT iv.w_start, iv.w_end,
       count(e.event_id) AS n_events,
       count(DISTINCT e.user_id) AS n_users
FROM iv LEFT JOIN events e
  ON CAST(e.ts AS TIMESTAMP) >= iv.w_start
 AND CAST(e.ts AS TIMESTAMP) < iv.w_end
GROUP BY iv.w_start, iv.w_end
ORDER BY iv.w_start
""",
)
def q_join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment (range) join, bucket-accelerated: count the
    events falling inside each daily 06:00-09:00 window (intervals
    derived from the data so the query is self-contained).

    A naive range join is |intervals|x|events| — Spark would plan
    BroadcastNestedLoopJoin. Instead both sides are bucketed by HOUR:
    each interval explodes into the hours it covers (bounded fan-out),
    events map to their hour, the join is a plain equi-join on the
    bucket, and exact containment refines the candidates. At 100 TB the
    shuffle is linear in events + interval-hours — the standard
    bucketed range-join strategy (same trick DuckDB/Trino apply
    internally as an IEJoin/bucketing rewrite)."""
    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.select(F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .select(
            (F.col("d") + F.expr("INTERVAL 6 HOURS")).alias("w_start"),
            (F.col("d") + F.expr("INTERVAL 9 HOURS")).alias("w_end"),
        )
    )
    # explode each interval into covered hour buckets (here 3/interval)
    iv_b = iv.select(
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                (F.col("w_start").cast("long") / 3600).cast("long"),
                ((F.col("w_end").cast("long") - 1) / 3600).cast("long"),
            )
        ).alias("hb"),
    )
    ev_b = ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("ts").cast("long") / 3600).cast("long").alias("hb"),
    )
    hits = (
        iv_b.join(ev_b, "hb")
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .select("w_start", "w_end", "event_id", "user_id")
    )
    # LEFT semantics: keep intervals with zero events
    return (
        iv.join(hits, ["w_start", "w_end"], "left")
        .groupBy("w_start", "w_end")
        .agg(
            F.count("event_id").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("w_start")
    )


@query(
    "q_join_asof_tolerance",
    oracle="""
WITH c AS (
  SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS c_ts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         max(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, CAST(ts AS TIMESTAMP)
)
SELECT c.click_id, c.user_id, c.c_ts,
       CASE WHEN c.c_ts - p.ts <= INTERVAL 2 HOUR THEN p.ts END AS r_ts,
       CASE WHEN c.c_ts - p.ts <= INTERVAL 2 HOUR THEN p.purchase_id END
         AS r_purchase_id
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.c_ts >= p.ts
ORDER BY click_id
""",
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas merge_asof's
    ``tolerance=`` semantics): the latest at-or-before purchase counts
    only if it happened within the last 2 hours — stale matches null
    out. Same merge-form linear plan as q_join_asof; the tolerance is a
    post-pass projection, so the scale story is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    joined = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="c_ts",
        right_ts="ts",
        right_tiebreak="purchase_id",
    )
    # µs-exact tolerance test, matching the oracle's c_ts - p.ts <=
    # INTERVAL 2 HOUR (floored-second diffs disagree for gaps within
    # ~1 s of the boundary — the r3-ADVICE precision class)
    fresh = (
        F.unix_micros("c_ts") - F.unix_micros("r_ts") <= 7_200_000_000
    )
    return joined.select(
        "click_id",
        "user_id",
        "c_ts",
        F.when(fresh, F.col("r_ts")).alias("r_ts"),
        F.when(fresh, F.col("r_purchase_id")).alias("r_purchase_id"),
    ).orderBy("click_id")


@query(
    "q_join_stream_table_versioned",
    oracle="""
WITH s AS (
  SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts,
         value AS amount
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         max(event_id) AS signup_id,
         arg_max(value, event_id) AS profile_value
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id, CAST(ts AS TIMESTAMP)
)
SELECT s.purchase_id, s.user_id, s.p_ts,
       v.ts AS r_ts, v.signup_id AS r_signup_id,
       v.profile_value AS r_profile_value
FROM s ASOF LEFT JOIN v ON s.user_id = v.user_id AND s.p_ts >= v.ts
ORDER BY purchase_id
""",
)
def q_join_stream_table_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KStream#join(KTable) against a VERSIONED table (KS 3.5
    ``VersionedKeyValueStore``): each stream record joins the table
    version in effect AT ITS OWN event time, not the latest snapshot —
    out-of-order stream records therefore enrich against historically
    correct values, where ``q_join_stream_table``'s latest-per-key
    semantics would leak the future. Same merge-form as-of machinery
    (union + one last(ignorenulls) window pass — linear, one shuffle);
    the signup changelog plays the versioned table."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("amount"),
    )
    versions = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.col("event_id").alias("signup_id"),
        F.col("value").alias("profile_value"),
    )
    return (
        asof_join(
            purchases,
            versions,
            key="user_id",
            left_ts="p_ts",
            right_ts="ts",
            right_tiebreak="signup_id",
        )
        .drop("amount")
        .orderBy("purchase_id")
    )


@query(
    "q_join_bucketed_colocated",
    oracle=f"""
SELECT o_orderstatus, count(*) AS n_lines,
       {dsum_sql("l_extendedprice", "revenue")}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def q_join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-fact join via storage bucketing — KS's
    co-partitioned-topics invariant, Spark-native. Both sides are
    written once bucketed on the join key (`io.write_bucketed_table`);
    the join then runs with ZERO exchange: task *i* reads bucket *i*
    of each side (outputPartitioning already satisfies the join's
    distribution requirement). The MERGE hint pins sort-merge so the
    demonstration doesn't degenerate into a broadcast at toy scale;
    at 100 TB neither side broadcasts and this plan — bucketed scans,
    local sorts, no shuffle — is exactly what repeated joins against a
    curated fact layout should produce. Results are identical to the
    plain parquet join, which is what the oracle checks."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    from highload_kafka_streams_spark.io import write_bucketed_table

    write_bucketed_table(
        li, "hks_bkt_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    write_bucketed_table(
        orders, "hks_bkt_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    bl = spark.table("hks_bkt_lineitem")
    bo = spark.table("hks_bkt_orders")
    joined = bl.join(
        bo.hint("merge"), bl.l_orderkey == bo.o_orderkey
    )
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice"), "revenue"),
        )
        .orderBy("o_orderstatus")
    )


def bucketed_join_plan_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-aggregation join subtree of ``q_join_bucketed_colocated``,
    exposed for plan assertions: tests check it contains a SortMergeJoin
    and NO Exchange (the bucketed scans satisfy the join distribution)."""
    from highload_kafka_streams_spark.io import write_bucketed_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    write_bucketed_table(
        li, "hks_bkt_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    write_bucketed_table(
        orders, "hks_bkt_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    bl = spark.table("hks_bkt_lineitem")
    bo = spark.table("hks_bkt_orders")
    return bl.join(bo.hint("merge"), bl.l_orderkey == bo.o_orderkey)


@query(
    "q_join_nearest_event",
    oracle="""
WITH merged AS (
  SELECT user_id, ts, event_id, NULL::BIGINT AS click_id, 1 AS is_p
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, event_id, 0
  FROM events WHERE event_type = 'click'
),
carried AS (
  SELECT user_id, ts, event_id, is_p,
         LAST_VALUE(click_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, is_p, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS before_id,
         LAST_VALUE(CASE WHEN click_id IS NOT NULL THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS before_ts,
         FIRST_VALUE(click_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, is_p, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS after_id,
         FIRST_VALUE(CASE WHEN click_id IS NOT NULL THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS after_ts
  FROM merged
)
SELECT event_id AS purchase_id, user_id,
       CASE
         WHEN before_id IS NULL THEN after_id
         WHEN after_id IS NULL THEN before_id
         WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                - CAST(FLOOR(epoch(before_ts)) AS BIGINT)
              <= CAST(FLOOR(epoch(after_ts)) AS BIGINT)
                - CAST(FLOOR(epoch(ts)) AS BIGINT)
           THEN before_id ELSE after_id
       END AS nearest_click
FROM carried
WHERE is_p = 1
ORDER BY purchase_id
""",
)
def q_join_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-event join — each purchase matched to the user's closest
    click in EITHER direction (sensor-alignment semantics, vs the
    as-of join's strictly-backward match). Merge form both ways: one
    window pass carries the last click forward, a mirrored pass
    carries the next click backward, and an integer-second comparison
    picks the closer (ties → the earlier click, matching both
    engines' floor'd epochs). Still one user_id shuffle and zero join
    nodes — the |purchases|×|clicks| candidate square never exists."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("long").alias("click_id"),
        F.lit(1).alias("is_p"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id",
        F.col("event_id").alias("click_id"),
        F.lit(0).alias("is_p"),
    )
    merged = purchases.unionByName(clicks)
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("click_id").isNotNull(), F.col("ts"))
    carried = merged.select(
        "user_id", "ts", "event_id", "is_p",
        F.last("click_id", ignorenulls=True).over(fwd).alias("before_id"),
        F.last(click_ts, ignorenulls=True).over(fwd).alias("before_ts"),
        F.first("click_id", ignorenulls=True).over(bwd).alias("after_id"),
        F.first(click_ts, ignorenulls=True).over(bwd).alias("after_ts"),
    )
    sec = F.unix_timestamp
    nearest = (
        F.when(F.col("before_id").isNull(), F.col("after_id"))
        .when(F.col("after_id").isNull(), F.col("before_id"))
        .when(
            sec(F.col("ts")) - sec(F.col("before_ts"))
            <= sec(F.col("after_ts")) - sec(F.col("ts")),
            F.col("before_id"),
        )
        .otherwise(F.col("after_id"))
    )
    return (
        carried.filter(F.col("is_p") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            nearest.alias("nearest_click"),
        )
        .orderBy("purchase_id")
    )


@query(
    "q_join_interval_overlap",
    oracle="""
WITH hv AS (
  SELECT o_orderkey, o_orderdate AS s,
         o_orderdate + INTERVAL 7 DAY AS e
  FROM orders WHERE o_totalprice > 495000
)
SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b,
       date_diff('day', greatest(a.s, b.s), least(a.e, b.e))
         AS overlap_days
FROM hv a JOIN hv b
  ON a.o_orderkey < b.o_orderkey AND a.s < b.e AND b.s < a.e
ORDER BY key_a, key_b
""",
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join — every pair of high-value order
    activity windows (7 days from placement) that overlap in time, with
    the exact overlap length. The oracle states the quadratic
    definition; the engine computes it the scale way: each interval
    EXPLODES to the 7-day-grain buckets it touches, pairs join on the
    bucket (equi-join — never a cross product), the exact overlap
    predicate filters within buckets, and distinct collapses pairs that
    share several buckets. Any two overlapping intervals share the
    bucket containing their overlap start, so the bucket join loses no
    pairs; per-bucket work is |intervals in bucket|², bounded by the
    bucket grain, not the table. The same shape handles session
    overlap, campaign concurrency, and any temporal self-join at
    100 TB. Overlap length is exact integer days."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 495000
    )
    day = lambda c: F.datediff(c, F.lit("1970-01-01"))  # noqa: E731
    hv = o.select(
        "o_orderkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("e"),
    )
    bucketed = hv.select(
        "o_orderkey",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.floor(day(F.col("s")) / 7).cast("long"),
                F.floor((day(F.col("e")) - 1) / 7).cast("long"),
            )
        ).alias("bucket"),
    )
    a = bucketed.select(
        F.col("o_orderkey").alias("key_a"),
        F.col("s").alias("s_a"),
        F.col("e").alias("e_a"),
        "bucket",
    )
    b = bucketed.select(
        F.col("o_orderkey").alias("key_b"),
        F.col("s").alias("s_b"),
        F.col("e").alias("e_b"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.col("s_a") < F.col("e_b"))
            & (F.col("s_b") < F.col("e_a"))
        )
        .select(
            "key_a",
            "key_b",
            F.datediff(
                F.least("e_a", "e_b"), F.greatest("s_a", "s_b")
            ).alias("overlap_days"),
        )
        .distinct()
        .orderBy("key_a", "key_b")
    )


@query(
    "q_join_asof_forward",
    oracle="""
WITH c AS (
  SELECT event_id AS click_id, user_id,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS c_us
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS p_us,
         max(event_id) AS purchase_id,
         arg_max(value, event_id) AS p_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)
)
SELECT c.click_id, c.user_id, c.c_us,
       p.p_us AS r_us, p.purchase_id AS r_purchase_id,
       p.p_value AS r_p_value
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.c_us <= p.p_us
ORDER BY click_id
""",
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click matched to the user's EARLIEST
    at-or-after purchase — the 'next event' direction (time-to-action
    enrichment), completing the as-of family's direction matrix
    (backward / backward+tolerance / nearest / forward).

    Implementation is a pure REDUCTION onto the existing merge-form
    operator: negate both µs timestamps and run the backward as-of —
    'latest right with −r ≤ −l' IS 'earliest right with r ≥ l'. Zero
    new operator code, same single (key, ts) shuffle+sort; timestamps
    travel as exact unix-micros BIGINTs (ns-fixture-safe). Right-side
    ties keep the max purchase_id, identical to the backward query's
    convention (the oracle pre-dedups with arg_max to express the same
    choice in DuckDB's native ASOF, which joins on c_us <= p_us for
    the forward direction)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("c_us"),
        (-F.unix_micros("ts")).alias("neg_l"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        (-F.unix_micros("ts")).alias("neg_r"),
        F.unix_micros("ts").alias("p_us"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("p_value"),
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="neg_l",
        right_ts="neg_r",
        right_tiebreak="purchase_id",
    )
    return out.select(
        "click_id",
        "user_id",
        "c_us",
        F.col("r_p_us").alias("r_us"),
        "r_purchase_id",
        "r_p_value",
    ).orderBy("click_id")
