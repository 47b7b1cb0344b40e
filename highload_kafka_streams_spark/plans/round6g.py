"""Round-6 continuation (g) — count-process diagnostics.

Same house rules as round6b-f (SURVEY.md §5): exact BIGINT arithmetic
or one deterministic fixed-point step per emitted value; `DIV`/`//`
integer division only; FLOOR∘SQRT on exact-integer doubles < 2^53 for
the normal-approximation bound (the isqrt idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query

# ---------------------------------------------------------------------------
# q_events_poisson_dispersion — index-of-dispersion (overdispersion) test
# ---------------------------------------------------------------------------


@query(
    "q_events_poisson_dispersion",
    oracle="""
WITH hourly AS (
  SELECT event_type,
         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM hourly GROUP BY 1
)
SELECT event_type, n_buckets,
       CAST((s1 * 10000) // n_buckets AS BIGINT) AS mean_fx,
       CAST(((n_buckets * s2 - s1 * s1) * 10000)
            // (n_buckets * (n_buckets - 1)) AS BIGINT) AS var_fx,
       CAST((n_buckets * s2 - s1 * s1) * 10000
            // ((n_buckets - 1) * s1) AS BIGINT) AS dispersion_fx,
       CASE WHEN (n_buckets * s2 - s1 * s1) * 1000
                 >= ((n_buckets - 1) * s1)
                    * (1000 + 3000 * CAST(FLOOR(SQRT(CAST(
                        2 * (n_buckets - 1) AS DOUBLE))) AS BIGINT)
                      // (n_buckets - 1))
            THEN 1 ELSE 0 END AS overdispersed
FROM agg
WHERE n_buckets >= 2
ORDER BY event_type
""",
)
def q_events_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-of-dispersion (Fisher) test per event type: is the hourly
    arrival count Poisson (variance ≈ mean, D ≈ 1) or OVERDISPERSED
    (bursty/clumped traffic — the signal that rate-based capacity
    models and anomaly thresholds calibrated on Poisson assumptions
    will under-alarm)? D = s²/x̄ over the type's OCCUPIED hourly
    buckets (zero hours are excluded — the conditional view; at
    production traffic every hour is occupied, and at sparse fixtures
    the exclusion is what keeps the statistic well-defined per type
    without assuming a global calendar); the flag applies
    the normal approximation D ≥ 1 + 3·√(2/(n−1)), cross-multiplied so
    the whole rule is integer: (n·S₂ − S₁²)·1000 ≥ (n−1)·S₁·(1000 +
    3000·⌊√(2(n−1))⌋//(n−1)) — the isqrt idiom keeps √ exact and
    identical cross-engine. Complements q_anomaly_cusum (location
    shifts) and q_time_control_chart (pointwise limits) with the
    COUNT-process axis.

    Scale shape: one (type, hour) rollup with map-side combine, then a
    per-type rollup of three algebraic sums — two exchanges, both at
    aggregate grain; the corpus is read once."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("h"),
        )
        .agg(F.count("*").alias("c"))
    )
    agg = hourly.groupBy("event_type").agg(
        F.count("*").alias("n_buckets"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    return (
        agg.filter(F.col("n_buckets") >= 2)
        .select(
            "event_type",
            "n_buckets",
            F.expr("CAST((s1 * 10000) DIV n_buckets AS BIGINT)").alias(
                "mean_fx"
            ),
            F.expr(
                "CAST(((n_buckets * s2 - s1 * s1) * 10000)"
                " DIV (n_buckets * (n_buckets - 1)) AS BIGINT)"
            ).alias("var_fx"),
            F.expr(
                "CAST((n_buckets * s2 - s1 * s1) * 10000"
                " DIV ((n_buckets - 1) * s1) AS BIGINT)"
            ).alias("dispersion_fx"),
            F.expr(
                "CASE WHEN (n_buckets * s2 - s1 * s1) * 1000"
                " >= ((n_buckets - 1) * s1)"
                " * (1000 + 3000 * CAST(FLOOR(SQRT(CAST("
                " 2 * (n_buckets - 1) AS DOUBLE))) AS BIGINT)"
                " DIV (n_buckets - 1))"
                " THEN 1 ELSE 0 END"
            ).alias("overdispersed"),
        )
        .orderBy("event_type")
    )
