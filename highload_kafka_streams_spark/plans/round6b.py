"""Round-6 continuation — ledger matching, classical ANOVA, data-quality
dependency auditing, and link-analysis (HITS) shapes.

House rules apply (SURVEY.md §5 hazards): every value that reaches the
driver's hash is exact BIGINT arithmetic or one deterministic
fixed-point step; integer division is `//`/`DIV` (both truncate toward
zero — verified safe for the all-positive operands used here); LIMIT
always rides a total deterministic order; DuckDB BIGINT sums are
re-CAST because SUM(BIGINT) widens to HUGEINT there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query

# FIFO matching: cumulative-quantity intervals are bucketed into
# fixed-width blocks so the pairing join is an equi-join on
# (partkey, block) — never a per-part cross join. Quantities are
# 1..50, so one interval spans at most ceil(50 / 64) + 1 = 2 blocks.
_FIFO_BLOCK = 64


@query(
    "q_alloc_fifo_inventory",
    oracle=f"""
WITH supply AS (
  SELECT l_partkey,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS hi
  FROM lineitem WHERE l_linestatus = 'F' AND l_quantity > 0
),
s AS (SELECT l_partkey, qty, hi, hi - qty AS lo FROM supply),
demand AS (
  SELECT l_partkey,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS hi
  FROM lineitem WHERE l_linestatus = 'O' AND l_quantity > 0
),
d AS (SELECT l_partkey, qty, hi, hi - qty AS lo FROM demand),
matched AS (
  SELECT s.l_partkey,
         LEAST(s.hi, d.hi) - GREATEST(s.lo, d.lo) AS m
  FROM s JOIN d ON s.l_partkey = d.l_partkey
   AND s.lo < d.hi AND d.lo < s.hi
),
per_part AS (
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(SUM(m) AS BIGINT) AS matched_qty
  FROM matched GROUP BY l_partkey
),
dem_tot AS (
  SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS demand_qty
  FROM d GROUP BY l_partkey
)
SELECT p.p_brand AS brand,
       CAST(SUM(COALESCE(pp.n_pairs, 0)) AS BIGINT) AS n_pairs,
       CAST(SUM(COALESCE(pp.matched_qty, 0)) AS BIGINT) AS matched_qty,
       CAST(SUM(dt.demand_qty) AS BIGINT) AS demand_qty,
       CAST(SUM(dt.demand_qty) - SUM(COALESCE(pp.matched_qty, 0))
            AS BIGINT) AS unfilled_qty
FROM dem_tot dt
LEFT JOIN per_part pp ON pp.l_partkey = dt.l_partkey
JOIN part p ON p.p_partkey = dt.l_partkey
GROUP BY p.p_brand
ORDER BY brand
""",
)
def q_alloc_fifo_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching — the classic inventory / tax-lot ledger
    operator: per part, finished lines ('F', ordered by ship date) form
    supply lots, open lines ('O') form demand, and each demand draws
    from supply strictly first-in-first-out. The FIFO recurrence is
    reframed as pure relational algebra via the cumulative-interval
    identity: lot i occupies cumulative-quantity interval
    [hi−qty, hi) and demand j likewise; the FIFO-matched quantity
    between them is exactly the overlap length of the two intervals,
    so the whole allocation is one overlap join over prefix sums — no
    per-row loop, no recursion.

    Determinism: quantities are integer-valued doubles cast to BIGINT
    before the prefix sum (exact), the ordering key
    (shipdate, orderkey, linenumber) is unique, and every output is an
    integer.

    Scale shape: the prefix sums are per-part windows (hash exchange on
    partkey, no global sort). The pairing join is NOT the naive
    per-part overlap theta-join: both interval sets are exploded into
    fixed-width cumulative blocks (width 64 ≥ max qty 50, so each
    interval spans ≤ 2 blocks) and the join is an equi-join on
    (partkey, block) with the exact overlap predicate as a residual
    filter — the q_join_range_bucketed recipe transplanted to the
    cumulative axis, so a part with a million lots pairs each lot with
    O(1) candidates instead of O(n). The quadratic overlap join exists
    only in the DuckDB oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def lots(status: str) -> DataFrame:
        w = (
            Window.partitionBy("l_partkey")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            li.filter(
                (F.col("l_linestatus") == status) & (F.col("l_quantity") > 0)
            )
            .select(
                "l_partkey",
                "l_shipdate",
                "l_orderkey",
                "l_linenumber",
                F.col("l_quantity").cast("long").alias("qty"),
            )
            .select(
                "l_partkey",
                "qty",
                F.sum("qty").over(w).alias("hi"),
            )
            .select(
                "l_partkey",
                "qty",
                "hi",
                (F.col("hi") - F.col("qty")).alias("lo"),
            )
        )

    def blocked(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("lo_b", F.expr(f"lo DIV {_FIFO_BLOCK}"))
            .withColumn("hi_b", F.expr(f"(hi - 1) DIV {_FIFO_BLOCK}"))
            .withColumn("blk", F.explode(F.sequence("lo_b", "hi_b")))
        )

    d_base = lots("O").persist()
    s = blocked(lots("F"))
    dm = blocked(d_base)
    sa, da = s.alias("s"), dm.alias("d")
    matched = (
        sa.join(
            da,
            (F.col("s.l_partkey") == F.col("d.l_partkey"))
            & (F.col("s.blk") == F.col("d.blk"))
            & (F.col("s.lo") < F.col("d.hi"))
            & (F.col("d.lo") < F.col("s.hi")),
        )
        .select(
            F.col("s.l_partkey").alias("l_partkey"),
            F.col("s.lo").alias("s_lo"),
            F.col("d.lo").alias("d_lo"),
            (
                F.least(F.col("s.hi"), F.col("d.hi"))
                - F.greatest(F.col("s.lo"), F.col("d.lo"))
            ).alias("m"),
        )
        .distinct()  # an overlap spanning a block boundary pairs twice
    )
    per_part = matched.groupBy("l_partkey").agg(
        F.count("*").alias("n_pairs"), F.sum("m").alias("matched_qty")
    )
    dem_tot = d_base.groupBy("l_partkey").agg(
        F.sum("qty").alias("demand_qty")
    )
    return (
        dem_tot.join(per_part, "l_partkey", "left")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.coalesce("n_pairs", F.lit(0))).alias("n_pairs"),
            F.sum(F.coalesce("matched_qty", F.lit(0))).alias("matched_qty"),
            F.sum("demand_qty").alias("demand_qty"),
            (
                F.sum("demand_qty")
                - F.sum(F.coalesce("matched_qty", F.lit(0)))
            ).alias("unfilled_qty"),
        )
        .orderBy("brand")
    )


@query(
    "q_agg_anova_f",
    oracle="""
WITH base AS (
  SELECT CAST(date_part('year', l_shipdate) * 100
              + date_part('month', l_shipdate) AS BIGINT) AS ym,
         l_returnflag AS grp,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem
),
per_g AS (
  SELECT ym, grp,
         CAST(count(*) AS BIGINT) AS n_g,
         CAST(SUM(q) AS BIGINT) AS t_g
  FROM base GROUP BY ym, grp
),
per_m AS (
  SELECT ym,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT grp) AS BIGINT) AS k,
         CAST(SUM(q) AS BIGINT) AS t,
         CAST(SUM(q * q) AS BIGINT) AS sq
  FROM base GROUP BY ym
),
ssb AS (
  SELECT g.ym,
         CAST(SUM((g.t_g * g.t_g * 1000000) // g.n_g) AS BIGINT) AS between_raw
  FROM per_g g GROUP BY g.ym
),
joined AS (
  SELECT m.ym, m.n, m.k,
         b.between_raw - (m.t * m.t * 1000000) // m.n AS ssb_fx,
         m.sq * 1000000 - (m.t * m.t * 1000000) // m.n AS sstot_fx
  FROM per_m m JOIN ssb b ON m.ym = b.ym
)
SELECT ym, n, k,
       ssb_fx,
       sstot_fx - ssb_fx AS ssw_fx,
       CASE WHEN k > 1 AND n > k
                 AND (sstot_fx - ssb_fx) // (n - k) > 0
            THEN ((ssb_fx // (k - 1)) * 10000)
                 // ((sstot_fx - ssb_fx) // (n - k))
            ELSE NULL END AS f_fx
FROM joined
ORDER BY ym
""",
)
def q_agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic of order quantity across return-flag
    classes, one test per ship month — the parametric counterpart of
    q_agg_kruskal_wallis (rank-based) and q_agg_welch_ttest
    (two-sample). Uses the computational identity
    SS_between = Σ_g T_g²/n_g − T²/N and
    SS_total = ΣX² − T²/N so the whole test is four integer sums per
    group — no mean subtraction, no variance pass.

    Determinism: quantities are integer-valued; the only divisions are
    integer `//` at fixed-point scale 1e6 (per-class terms) and the
    final 1e4-scaled F ratio — all operands positive, and Spark `DIV`
    and DuckDB `//` both truncate toward zero, so the engines agree
    bit-for-bit. F is computed mean-square-first
    ((SSB//(k−1)) · 1e4 // (SSW//(N−k))) so no intermediate exceeds
    ssb_fx·1e4 — the naive SSB·(N−k)·1e4 form can overflow int64 at
    large N.

    Scale shape: two groupBy passes (class-level then month-level) with
    map-side partial aggregation; the month-level join is
    month-cardinality-sized (bounded by the calendar, not the data), so
    the whole test runs in one shuffle round over the fact table at any
    scale. Per-month sums stay far inside int64: T ≤ n·50 so
    T²·1e6 < 9.2e18 up to n ≈ 60M rows per month; beyond that drop the
    fixed-point scale (compat.py's documented knob)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
        .cast("long")
        .alias("ym"),
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    per_g = base.groupBy("ym", "grp").agg(
        F.count("*").alias("n_g"), F.sum("q").alias("t_g")
    )
    per_m = base.groupBy("ym").agg(
        F.count("*").alias("n"),
        F.countDistinct("grp").alias("k"),
        F.sum("q").alias("t"),
        F.sum(F.col("q") * F.col("q")).alias("sq"),
    )
    ssb = per_g.groupBy("ym").agg(
        F.sum(
            F.expr("t_g * t_g * 1000000 DIV n_g")
        ).alias("between_raw")
    )
    joined = per_m.join(ssb, "ym").select(
        "ym",
        "n",
        "k",
        F.expr(
            "between_raw - (t * t * 1000000) DIV n"
        ).alias("ssb_fx"),
        F.expr(
            "sq * 1000000 - (t * t * 1000000) DIV n"
        ).alias("sstot_fx"),
    )
    return joined.select(
        "ym",
        "n",
        "k",
        "ssb_fx",
        (F.col("sstot_fx") - F.col("ssb_fx")).alias("ssw_fx"),
        F.expr(
            "CASE WHEN k > 1 AND n > k "
            "AND (sstot_fx - ssb_fx) DIV (n - k) > 0 "
            "THEN ((ssb_fx DIV (k - 1)) * 10000) "
            "DIV ((sstot_fx - ssb_fx) DIV (n - k)) "
            "ELSE NULL END"
        ).alias("f_fx"),
    ).orderBy("ym")


# Candidate functional dependencies audited by q_dq_functional_dependency.
# (name, table, determinant, dependent) — a mix of true keys (must hold),
# near-FDs, and deliberately-violated pairs so the audit exercises every
# verdict lane.
_FD_CANDIDATES = (
    ("orders.o_orderkey->o_orderstatus", "orders", "o_orderkey", "o_orderstatus"),
    ("lineitem.l_orderkey->l_linestatus", "lineitem", "l_orderkey", "l_linestatus"),
    ("lineitem.l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ("events.user_id->event_type", "events", "user_id", "event_type"),
)


def _fd_oracle() -> str:
    parts = []
    for name, tbl, det, dep in _FD_CANDIDATES:
        parts.append(
            f"""
SELECT '{name}' AS fd,
       CAST(count(*) AS BIGINT) AS n_determinants,
       CAST(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating,
       CAST(SUM(CASE WHEN n_dep > 1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS violating_rows,
       CAST(max(n_dep) AS BIGINT) AS max_branching,
       max(n_dep) = 1 AS holds
FROM (
  SELECT {det} AS det,
         count(DISTINCT {dep}) AS n_dep,
         count(*) AS n_rows
  FROM {tbl} GROUP BY {det}
)"""
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY fd"


@query("q_dq_functional_dependency", oracle=_fd_oracle())
def q_dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — for each candidate FD `det → dep`
    report how many determinant values exist, how many branch to more
    than one dependent value (FD violations), how many underlying rows
    sit in violating groups, the worst branching factor, and the
    verdict. The candidate set mixes a true key FD
    (o_orderkey → o_orderstatus, must hold), two near-FDs on lineitem,
    and a deliberately-violated behavioral pair
    (user_id → event_type) so every verdict lane is exercised — the
    profiling shape every schema-discovery / DQ tool (and the
    reference's constraint checking) is built from, alongside
    q_dq_constraint_suite (row predicates) and q_referential_audit
    (cross-table keys).

    Scale shape: one groupBy per candidate over (det) with
    count(DISTINCT dep) — Catalyst expands to the standard two-phase
    distinct aggregate with map-side partials, then each audit reduces
    to ONE summary row before the union, so the combined result is
    candidate-count-sized. No joins, no windows; each pass is a single
    shuffle on the determinant at any scale."""
    outs = []
    for name, tbl, det, dep in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, tbl)
        g = t.groupBy(F.col(det).alias("det")).agg(
            F.countDistinct(dep).alias("n_dep"),
            F.count("*").alias("n_rows"),
        )
        outs.append(
            g.agg(
                F.lit(name).alias("fd"),
                F.count("*").alias("n_determinants"),
                F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0)).alias(
                    "n_violating"
                ),
                F.sum(
                    F.when(F.col("n_dep") > 1, F.col("n_rows")).otherwise(0)
                ).alias("violating_rows"),
                F.max("n_dep").alias("max_branching"),
                (F.max("n_dep") == 1).alias("holds"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.orderBy("fd")


_HITS_ONE = 1_000_000  # fixed-point unit for hub/authority scores


@query(
    "q_graph_hits",
    oracle=f"""
WITH w AS (
  SELECT user_id AS u, event_type AS e,
         CAST(count(*) AS BIGINT) AS w
  FROM events GROUP BY user_id, event_type
),
a1r AS (
  SELECT e, CAST(SUM(w * {_HITS_ONE}) AS BIGINT) AS a FROM w GROUP BY e
),
a1 AS (
  SELECT e, (a * {_HITS_ONE}) // (SELECT max(a) FROM a1r) AS a FROM a1r
),
h1r AS (
  SELECT w.u, CAST(SUM(w.w * a1.a) AS BIGINT) AS h
  FROM w JOIN a1 ON w.e = a1.e GROUP BY w.u
),
h1 AS (
  SELECT u, (h * {_HITS_ONE}) // (SELECT max(h) FROM h1r) AS h FROM h1r
),
a2r AS (
  SELECT w.e, CAST(SUM(w.w * h1.h) AS BIGINT) AS a
  FROM w JOIN h1 ON w.u = h1.u GROUP BY w.e
),
a2 AS (
  SELECT e, (a * {_HITS_ONE}) // (SELECT max(a) FROM a2r) AS a FROM a2r
),
deg AS (
  SELECT e, CAST(count(*) AS BIGINT) AS n_users FROM w GROUP BY e
)
SELECT a2.e AS event_type,
       CAST(a1.a AS BIGINT) AS auth1_fx,
       CAST(a2.a AS BIGINT) AS auth2_fx,
       deg.n_users
FROM a2 JOIN a1 ON a1.e = a2.e JOIN deg ON deg.e = a2.e
ORDER BY auth2_fx DESC, event_type
""",
)
def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (hubs & authorities) over the weighted user → event-type
    bipartite graph, two unrolled iterations in max-normalized
    fixed-point — the link-analysis counterpart of q_graph_pagerank_fx
    (eigenvector centrality on a different operator: A^T A instead of
    the stochastic walk). Users act as hubs, event types as
    authorities; edge weight = interaction count. Each half-step is
    auth(e) = Σ_u w·hub(u) / hub(u) = Σ_e w·auth(e), renormalized by
    the maximum so scores stay in [0, 1e6] as exact integers.

    Determinism: weights and scores are BIGINT throughout; the only
    division is `//` by the per-iteration maximum (positive), identical
    in both engines. Reporting auth1 AND auth2 pins the whole
    trajectory, not just the fixpoint.

    Scale shape: each half-step is one groupBy over the edge list
    (map-side combine) plus a join against the previous score table —
    and the score tables are ENTITY-sized, not edge-sized. The
    normalizing max is a 1-row aggregate crossed back in (broadcast of
    one row). The event-type side is bounded (authority table is tiny);
    the user-side join in a2 is edges ⋈ users on the edge's natural
    key — a shuffle join on user_id at 100 TB, never a broadcast of the
    user table (the q_graph_pagerank_fx de-weak lesson: no
    corpus-proportional broadcast hints)."""
    ev = load_table(spark, sf_dir, "events")
    w = ev.groupBy(
        F.col("user_id").alias("u"), F.col("event_type").alias("e")
    ).agg(F.count("*").alias("w"))
    w = w.persist()

    def norm(df: DataFrame, col: str) -> DataFrame:
        mx = df.agg(F.max(col).alias("mx"))
        return df.crossJoin(F.broadcast(mx)).select(
            *[c for c in df.columns if c != col],
            F.expr(f"({col} * {_HITS_ONE}) DIV mx").alias(col),
        )

    a1r = w.groupBy("e").agg(
        F.sum(F.col("w") * _HITS_ONE).alias("a")
    )
    a1 = norm(a1r, "a")
    h1r = (
        w.join(a1.withColumnRenamed("a", "a1"), "e")
        .groupBy("u")
        .agg(F.sum(F.col("w") * F.col("a1")).alias("h"))
    )
    h1 = norm(h1r, "h")
    a2r = (
        w.join(h1, "u")
        .groupBy("e")
        .agg(F.sum(F.col("w") * F.col("h")).alias("a"))
    )
    a2 = norm(a2r, "a")
    deg = w.groupBy("e").agg(F.count("*").alias("n_users"))
    return (
        a2.withColumnRenamed("a", "auth2_fx")
        .join(a1.withColumnRenamed("a", "auth1_fx"), "e")
        .join(deg, "e")
        .select(
            F.col("e").alias("event_type"),
            "auth1_fx",
            "auth2_fx",
            "n_users",
        )
        .orderBy(F.desc("auth2_fx"), "event_type")
    )
