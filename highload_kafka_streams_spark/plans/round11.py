"""Round-11 operators: sequence decoding, causal evaluation,
market-basket rules, and feature binning.

Four additions closing breadth gaps named by the round-10 review:

- q_time_viterbi_decode — 2-state max-plus Viterbi decoding of each
  event type's daily activity series (the DECODING member of the
  state-space family next to q_events_markov_stationary's stationary
  analysis and q_time_kalman_1d's filtering); pure int64 max-plus
  algebra, zero floats anywhere.
- q_eval_did_estimator — difference-in-differences treatment-effect
  estimate over a 2×2 (treated × pre/post) design in exact cents
  fixed-point; the causal-evaluation step next to
  q_eval_propensity_matching.
- q_basket_rules_confidence — association rules A→B at pair grain
  (support, confidence, lift in exact ppm) over the memoized
  co-purchase pair-count silver table; the RULE step after
  q_basket_triples_apriori's frequent-itemset step.
- q_feature_decile_binning — equal-frequency (ntile) feature binning
  with per-bin exact stats; the bread-and-butter preprocessing step a
  training pipeline runs before bucketized features.

All exact-integer (BIGINT fixed-point) in both engines; idioms reused:
sign-safe floor division for signed sums, staged ppm divisions for
overflow headroom, recursive-CTE twins for sequential folds,
memo_parquet for the shared pair table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query

# ---------------------------------------------------------------------------
# q_time_viterbi_decode — 2-state max-plus Viterbi over daily activity
# ---------------------------------------------------------------------------

# integer score matrix: staying is mildly rewarded, switching costs,
# emitting the matching symbol pays — classic sticky-HMM shape, all in
# exact int64 max-plus algebra (no probabilities, no transcendentals)
_VIT_STAY = 1
_VIT_SWITCH = -2
_VIT_MATCH = 2
_VIT_MISS = -1

_VIT_FOLD = f"""
aggregate(
  seq,
  named_struct(
    's0', CAST(0 AS BIGINT), 's1', CAST(0 AS BIGINT),
    'p0', CAST(array() AS ARRAY<BIGINT>),
    'p1', CAST(array() AS ARRAY<BIGINT>)),
  (acc, x) -> CASE WHEN size(acc.p0) = 0 THEN named_struct(
      's0', CAST(CASE WHEN x.sym = 0 THEN {_VIT_MATCH}
                      ELSE {_VIT_MISS} END AS BIGINT),
      's1', CAST(CASE WHEN x.sym = 1 THEN {_VIT_MATCH}
                      ELSE {_VIT_MISS} END AS BIGINT),
      'p0', array(CAST(0 AS BIGINT)),
      'p1', array(CAST(1 AS BIGINT)))
    ELSE named_struct(
      's0', CAST(greatest(acc.s0 + {_VIT_STAY}, acc.s1 + {_VIT_SWITCH})
                 + CASE WHEN x.sym = 0 THEN {_VIT_MATCH}
                        ELSE {_VIT_MISS} END AS BIGINT),
      's1', CAST(greatest(acc.s0 + {_VIT_SWITCH}, acc.s1 + {_VIT_STAY})
                 + CASE WHEN x.sym = 1 THEN {_VIT_MATCH}
                        ELSE {_VIT_MISS} END AS BIGINT),
      'p0', CASE WHEN acc.s0 + {_VIT_STAY} >= acc.s1 + {_VIT_SWITCH}
                 THEN array_append(acc.p0, CAST(0 AS BIGINT))
                 ELSE array_append(acc.p1, CAST(0 AS BIGINT)) END,
      'p1', CASE WHEN acc.s0 + {_VIT_SWITCH} >= acc.s1 + {_VIT_STAY}
                 THEN array_append(acc.p0, CAST(1 AS BIGINT))
                 ELSE array_append(acc.p1, CAST(1 AS BIGINT)) END)
  END,
  acc -> CASE WHEN acc.s0 >= acc.s1 THEN acc.p0 ELSE acc.p1 END
)
"""


@query(
    "q_time_viterbi_decode",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS nd
  FROM daily GROUP BY 1
),
sym AS (
  SELECT d.event_type, d.day,
         CAST(CASE WHEN d.c * s.nd > s.tot THEN 1 ELSE 0 END AS BIGINT)
           AS sym
  FROM daily d JOIN stats s USING (event_type)
),
arrs AS (
  SELECT event_type, list(day ORDER BY day) AS days,
         list(sym ORDER BY day) AS syms, count(*) AS n
  FROM sym GROUP BY 1
),
vit AS (
  SELECT event_type, days, syms, n, 1 AS i,
         CAST(CASE WHEN syms[1] = 0 THEN {_VIT_MATCH}
                   ELSE {_VIT_MISS} END AS BIGINT) AS s0,
         CAST(CASE WHEN syms[1] = 1 THEN {_VIT_MATCH}
                   ELSE {_VIT_MISS} END AS BIGINT) AS s1,
         [CAST(0 AS BIGINT)] AS p0, [CAST(1 AS BIGINT)] AS p1
  FROM arrs
  UNION ALL
  SELECT event_type, days, syms, n, i + 1,
         CAST(greatest(s0 + {_VIT_STAY}, s1 + {_VIT_SWITCH})
              + CASE WHEN syms[i + 1] = 0 THEN {_VIT_MATCH}
                     ELSE {_VIT_MISS} END AS BIGINT),
         CAST(greatest(s0 + {_VIT_SWITCH}, s1 + {_VIT_STAY})
              + CASE WHEN syms[i + 1] = 1 THEN {_VIT_MATCH}
                     ELSE {_VIT_MISS} END AS BIGINT),
         (CASE WHEN s0 + {_VIT_STAY} >= s1 + {_VIT_SWITCH}
               THEN p0 ELSE p1 END) || [CAST(0 AS BIGINT)],
         (CASE WHEN s0 + {_VIT_SWITCH} >= s1 + {_VIT_STAY}
               THEN p0 ELSE p1 END) || [CAST(1 AS BIGINT)]
  FROM vit WHERE i < n
),
best AS (
  SELECT event_type, days, syms,
         CASE WHEN s0 >= s1 THEN p0 ELSE p1 END AS path
  FROM vit WHERE i = n
)
SELECT event_type, unnest(days) AS day, unnest(syms) AS sym,
       unnest(path) AS state
FROM best ORDER BY event_type, day
""",
)
def q_time_viterbi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi MAP decoding of a 2-state sticky HMM over each event
    type's daily activity series — the DECODING member of the
    state-space family (q_events_markov_stationary analyzes the chain,
    q_time_kalman_1d filters a continuous state; this recovers the
    most likely DISCRETE regime path: quiet vs busy days). The
    observation symbol is exact (busy ⇔ day count × n_days > total,
    an integer cross-multiplication of the per-type mean test), and
    the whole decode runs in MAX-PLUS int64 algebra — integer
    emission/transition scores, no probabilities, no logs, no floats —
    so both engines produce bit-identical paths. Ties break toward
    state 0 and toward the lower-numbered predecessor (>= in every
    max), a total order.

    The fold carries the two SURVIVOR PATHS (the standard 2-state
    Viterbi trick that avoids a backpointer matrix): accumulator =
    (score_0, score_1, path_0, path_1); each step extends both by the
    argmax predecessor. DuckDB pins the identical recurrence as a
    per-type recursive CTE over the same (day-ordered) symbol list.

    Scale shape: the Kalman lane — ONE map-side-combinable daily
    rollup is the only corpus-grain shuffle; symbols derive from a
    broadcast per-type stats join at calendar grain; the fold runs
    per type over a CALENDAR-BOUNDED array (~2.4k days), state
    2 scores + 2 paths ≤ O(days); the posexplode returns to calendar
    grain. No window, no self-join, no driver loop."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    stats = daily.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("tot"),
        F.count("*").cast("long").alias("nd"),
    )
    sym = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        F.when(F.col("c") * F.col("nd") > F.col("tot"), 1)
        .otherwise(0)
        .cast("long")
        .alias("sym"),
    )
    arrs = sym.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "sym"))).alias("seq")
    )
    return (
        arrs.select(
            "event_type", "seq", F.expr(_VIT_FOLD).alias("path")
        )
        .select(
            "event_type",
            F.explode(F.arrays_zip(F.col("seq"), F.col("path"))).alias("z"),
        )
        .select(
            "event_type",
            F.col("z.seq.day").alias("day"),
            F.col("z.seq.sym").alias("sym"),
            F.col("z.path").alias("state"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# q_eval_did_estimator — difference-in-differences in exact cents
# ---------------------------------------------------------------------------

_DID_CUT = "1998-01-01"


@query(
    "q_eval_did_estimator",
    oracle=f"""
WITH cells AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS treated,
         CASE WHEN CAST(o_orderdate AS TIMESTAMP)
                   >= TIMESTAMP '{_DID_CUT}' THEN 1 ELSE 0 END AS post,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS y_c
  FROM orders
),
p AS (
  SELECT
    CAST(SUM(CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_t_pre,
    CAST(SUM(CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_t_post,
    CAST(SUM(CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_c_pre,
    CAST(SUM(CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_c_post,
    CAST((SUM(CASE WHEN treated = 1 AND post = 0 THEN y_c ELSE 0 END)
          * 100)
         // SUM(CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS mean_t_pre_fx,
    CAST((SUM(CASE WHEN treated = 1 AND post = 1 THEN y_c ELSE 0 END)
          * 100)
         // SUM(CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS mean_t_post_fx,
    CAST((SUM(CASE WHEN treated = 0 AND post = 0 THEN y_c ELSE 0 END)
          * 100)
         // SUM(CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS mean_c_pre_fx,
    CAST((SUM(CASE WHEN treated = 0 AND post = 1 THEN y_c ELSE 0 END)
          * 100)
         // SUM(CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS mean_c_post_fx
  FROM cells
)
SELECT *,
       CAST((mean_t_post_fx - mean_t_pre_fx)
            - (mean_c_post_fx - mean_c_pre_fx) AS BIGINT) AS did_fx
FROM p
""",
)
def q_eval_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences treatment-effect estimate on a 2×2
    design: treated = urgent/high-priority orders, post = orders on or
    after 1998-01-01; outcome = order value in cents. DiD = (ΔT) − (ΔC)
    removes both the level difference between groups and the common
    time trend — the workhorse quasi-experimental estimator, placed
    next to q_eval_propensity_matching in the causal-eval family.
    Every cell mean is the established exact fixed-point idiom
    (Σcents·100 div n, all positive so truncation = floor in both
    engines); the DiD is a pure integer combination of the four means.

    Scale shape: ONE fused conditional aggregation — the 2×2 cell
    sums/counts are eight SUM(CASE…) accumulators in a single
    map-side-combinable global agg, so the whole estimator is one scan
    + one 8-value exchange (the r11 canonical bench caught the earlier
    rollup-then-pivot form paying a second exchange for nothing);
    nothing driver-side, no join anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("treated"),
        F.when(
            F.col("o_orderdate") >= F.lit(_DID_CUT).cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("post"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("y_c"),
    )
    def n_cell(t: int, po: int):
        return (
            F.sum(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == po), 1
                ).otherwise(0)
            )
            .cast("long")
        )

    def mean_cell(t: int, po: int):
        cond = f"treated = {t} AND post = {po}"
        return F.expr(
            f"CAST(SUM(CASE WHEN {cond} THEN y_c ELSE 0 END) * 100"
            f" DIV SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
        )

    return (
        cells.agg(
            n_cell(1, 0).alias("n_t_pre"),
            n_cell(1, 1).alias("n_t_post"),
            n_cell(0, 0).alias("n_c_pre"),
            n_cell(0, 1).alias("n_c_post"),
            mean_cell(1, 0).alias("mean_t_pre_fx"),
            mean_cell(1, 1).alias("mean_t_post_fx"),
            mean_cell(0, 0).alias("mean_c_pre_fx"),
            mean_cell(0, 1).alias("mean_c_post_fx"),
        )
        .withColumn(
            "did_fx",
            (
                (F.col("mean_t_post_fx") - F.col("mean_t_pre_fx"))
                - (F.col("mean_c_post_fx") - F.col("mean_c_pre_fx"))
            ).cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# q_basket_rules_confidence — association rules over co-purchase pairs
# ---------------------------------------------------------------------------

_RULES_TOPK = 100


def _copurchase_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase pair COUNT table ``(pa < pb, supp_ab)`` — the number
    of orders containing both parts. The counted sibling of round8's
    distinct ``_copurchase_pairs`` (graph consumers need adjacency,
    basket consumers need frequency), memoized under its own kind; at
    100 TB this is the item-pair support silver table every
    market-basket pipeline maintains. Fan-out stays order-local
    (~7 items → ≤21 pairs per order)."""
    from highload_kafka_streams_spark.io import memo_parquet

    def build(s: SparkSession) -> DataFrame:
        li = load_table(s, sf_dir, "lineitem")
        po = li.select(
            F.col("l_partkey").alias("p"), F.col("l_orderkey").alias("o")
        ).distinct()
        b = po.select(F.col("p").alias("pb"), F.col("o").alias("ob"))
        return (
            po.join(
                b, (F.col("ob") == F.col("o")) & (F.col("pb") > F.col("p"))
            )
            .groupBy("p", "pb")
            .agg(F.count("*").cast("long").alias("supp_ab"))
        )

    return memo_parquet(
        spark, sf_dir, "copurchase_pair_counts", ("lineitem",), build, "1"
    )


def _part_order_supports(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part order-support table ``(p, supp)`` = number of distinct
    orders containing the part — the item-grain companion to
    ``_copurchase_pair_counts`` (confidence divides by it, lift divides
    by the consequent's). Memoized separately: the distinct (part,
    order) projection is the same corpus-grain shuffle the pair memo
    saves, so re-deriving it per bench pass would hand back most of the
    memo's win (caught by the r11 canonical run: 5.7 s/pass with the
    rollup inline, ~3 s riding both memos)."""
    from highload_kafka_streams_spark.io import memo_parquet

    def build(s: SparkSession) -> DataFrame:
        li = load_table(s, sf_dir, "lineitem")
        return (
            li.select(
                F.col("l_partkey").alias("p"), F.col("l_orderkey").alias("o")
            )
            .distinct()
            .groupBy("p")
            .agg(F.count("*").cast("long").alias("supp"))
        )

    return memo_parquet(
        spark, sf_dir, "part_order_supports", ("lineitem",), build, "1"
    )


@query(
    "q_basket_rules_confidence",
    oracle=f"""
WITH po AS (
  SELECT DISTINCT l_partkey AS p, l_orderkey AS o FROM lineitem
),
pc AS (
  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS supp_ab
  FROM po a JOIN po b ON b.o = a.o AND b.p > a.p GROUP BY 1, 2
),
item AS (
  SELECT p, CAST(count(*) AS BIGINT) AS supp FROM po GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_orders FROM orders),
dirs AS (
  SELECT pa AS a, pb AS b, supp_ab FROM pc
  UNION ALL
  SELECT pb AS a, pa AS b, supp_ab FROM pc
),
r AS (
  SELECT d.a, d.b, d.supp_ab, ia.supp AS supp_a, ib.supp AS supp_b,
         CAST(d.supp_ab * 1000000 // ia.supp AS BIGINT) AS conf_ppm
  FROM dirs d
  JOIN item ia ON ia.p = d.a
  JOIN item ib ON ib.p = d.b
)
SELECT a, b, supp_ab, supp_a, supp_b, conf_ppm,
       CAST(conf_ppm * t.n_orders // supp_b AS BIGINT) AS lift_ppm
FROM r CROSS JOIN tot t
ORDER BY lift_ppm DESC, conf_ppm DESC, a, b
LIMIT {_RULES_TOPK}
""",
)
def q_basket_rules_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules A→B from the co-purchase pair supports: both
    directions of every frequent pair scored by confidence
    (supp_AB/supp_A) and lift (confidence vs B's base rate) in exact
    ppm, top-100 by (lift, confidence, a, b) — a strict total order,
    so the cut is deterministic. The RULE-mining step after
    q_basket_triples_apriori's frequent-itemset step; the lift ppm is
    the STAGED product (conf_ppm·N div supp_b), a well-defined integer
    quantity computed identically in both engines with headroom
    conf_ppm·N ≤ 1e6·N — inside int64 to N ≈ 9e12 orders.

    Scale shape: BOTH support tables are memoized silver tables
    (``_copurchase_pair_counts`` — order-local fan-out — and the
    item-grain ``_part_order_supports``), built once per fixture; the
    rule join keys on part (co-keyed shuffle, item table dwarfed by
    pairs), the order total is a broadcast scalar, and the final cut
    is TakeOrderedAndProject — never a global sort materialization."""
    pc = _copurchase_pair_counts(spark, sf_dir)
    item = _part_order_supports(spark, sf_dir)
    tot = load_table(spark, sf_dir, "orders").agg(
        F.count("*").cast("long").alias("n_orders")
    )
    dirs = pc.select(
        F.col("p").alias("a"), F.col("pb").alias("b"), "supp_ab"
    ).unionByName(
        pc.select(F.col("pb").alias("a"), F.col("p").alias("b"), "supp_ab")
    )
    r = (
        dirs.join(item.select(F.col("p").alias("a"), F.col("supp").alias("supp_a")), "a")
        .join(item.select(F.col("p").alias("b"), F.col("supp").alias("supp_b")), "b")
        .select(
            "a",
            "b",
            "supp_ab",
            "supp_a",
            "supp_b",
            F.expr("CAST(supp_ab * 1000000 DIV supp_a AS BIGINT)").alias(
                "conf_ppm"
            ),
        )
    )
    return (
        r.crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "supp_ab",
            "supp_a",
            "supp_b",
            "conf_ppm",
            F.expr("CAST(conf_ppm * n_orders DIV supp_b AS BIGINT)").alias(
                "lift_ppm"
            ),
        )
        .orderBy(
            F.col("lift_ppm").desc(), F.col("conf_ppm").desc(), "a", "b"
        )
        .limit(_RULES_TOPK)
    )


# ---------------------------------------------------------------------------
# q_feature_decile_binning — equal-frequency binning with exact stats
# ---------------------------------------------------------------------------


@query(
    "q_feature_decile_binning",
    oracle="""
WITH v AS (
  SELECT CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS y_c, c_custkey
  FROM customer
),
b AS (
  SELECT y_c, ntile(10) OVER (ORDER BY y_c, c_custkey) AS bin FROM v
)
SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
       CAST(MIN(y_c) AS BIGINT) AS lo_c, CAST(MAX(y_c) AS BIGINT) AS hi_c,
       CAST((SUM(y_c) * 100) // count(*) AS BIGINT) AS mean_fx
FROM b GROUP BY 1 ORDER BY 1
""",
)
def q_feature_decile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) feature binning of customer balance:
    ntile(10) under the deterministic total order (cents, custkey) —
    both engines share ntile's definition (the first n mod k buckets
    take the extra row) so bin assignment is identical — with per-bin
    exact stats: count, boundary cents, mean in fixed-point. Balances
    go NEGATIVE; the mean convention here is TRUNCATED-toward-zero
    division, which is what BOTH engines' integer division does on
    BIGINT operands (Spark DIV and DuckDB's integer `//` agree:
    −7÷2 → −3 in each; DuckDB only floors `//` on FLOATING operands,
    which never appear here) — verified by the negative-balance bins
    in the oracle run. The bucketize/quantize preprocessing step every
    feature-engineering pipeline runs before histogramming or
    embedding-table lookups.

    Scale shape: the ntile is a GLOBAL SORT — Spark plans it as one
    range-partitioned exchange (sampled boundaries) + per-partition
    rank, the same lane as q_global_sort; the rollup after is 10-row.
    At 100 TB prefer the histogram-cum exact-quantile lane
    (q_agg_conformal_interval's shape) to DERIVE boundaries without
    sorting, then bucket by broadcast boundary lookup — this operator
    keeps the ntile form because its contract is exact EQUAL-COUNT
    bins (boundary-derived bucketing ties can split unevenly)."""
    cust = load_table(spark, sf_dir, "customer")
    v = cust.select(
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("long")
        .alias("y_c"),
        "c_custkey",
    )
    b = v.select(
        "y_c",
        F.ntile(10).over(Window.orderBy("y_c", "c_custkey")).alias("bin"),
    )
    return (
        b.groupBy(F.col("bin").cast("long").alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("y_c").cast("long").alias("lo_c"),
            F.max("y_c").cast("long").alias("hi_c"),
            F.expr(
                "CAST(SUM(y_c) * 100 DIV count(*) AS BIGINT)"
            ).alias("mean_fx"),
        )
        .orderBy("bin")
    )
