"""Round-6 continuation (c) — key discovery, EWMA signals, robust
location estimation, and audio-style frame scanning.

Same house rules as round6b (SURVEY.md §5): exact BIGINT arithmetic or
one deterministic fixed-point step per emitted value; `DIV`/`//`
integer division only; deterministic total orders under every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query

# Candidate keys audited by q_dq_uniqueness_profile:
# (name, table, [columns]) — true keys, a near-key, and a non-key.
_KEY_CANDIDATES = (
    ("orders[o_orderkey]", "orders", ("o_orderkey",)),
    ("orders[o_custkey]", "orders", ("o_custkey",)),
    ("orders[o_custkey,o_orderdate]", "orders", ("o_custkey", "o_orderdate")),
    ("lineitem[l_orderkey,l_linenumber]", "lineitem",
     ("l_orderkey", "l_linenumber")),
    ("events[event_id]", "events", ("event_id",)),
)


def _uniq_oracle() -> str:
    parts = []
    for name, tbl, cols in _KEY_CANDIDATES:
        tup = ", ".join(cols)
        parts.append(
            f"""
SELECT '{name}' AS candidate,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT ({tup})) AS BIGINT) AS n_distinct,
       CAST((count(DISTINCT ({tup})) * 1000000) // count(*) AS BIGINT)
         AS uniqueness_fx,
       count(DISTINCT ({tup})) = count(*) AS is_key
FROM {tbl}"""
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY candidate"


@query("q_dq_uniqueness_profile", oracle=_uniq_oracle())
def q_dq_uniqueness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery — uniqueness ratio
    distinct(cols)/count(*) for a set of single- and multi-column
    candidates spanning true keys, a near-key and a non-key, with the
    is_key verdict. The key-side twin of
    q_dq_functional_dependency (FDs audit determinant→dependent;
    this audits determinant→row): together they are the schema-
    profiling pair every catalog/DQ tool runs first.

    Scale shape: each candidate is one count-distinct aggregate —
    Catalyst's two-phase distinct with map-side partials (multi-column
    candidates group on the column tuple, so the shuffle key is the
    tuple hash); every audit collapses to ONE row before the union.
    No joins, no windows."""
    outs = []
    for name, tbl, cols in _KEY_CANDIDATES:
        t = load_table(spark, sf_dir, tbl)
        outs.append(
            t.agg(
                F.lit(name).alias("candidate"),
                F.count("*").alias("n_rows"),
                F.countDistinct(*[F.col(c) for c in cols]).alias(
                    "n_distinct"
                ),
            ).select(
                "candidate",
                "n_rows",
                "n_distinct",
                F.expr(
                    "CAST((n_distinct * 1000000) DIV n_rows AS BIGINT)"
                ).alias("uniqueness_fx"),
                (F.col("n_distinct") == F.col("n_rows")).alias("is_key"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.orderBy("candidate")


_EWMA_TAPS = 10  # truncated EWMA window (weights 2^9 .. 2^0)
_EWMA_DENOM = (1 << _EWMA_TAPS) - 1  # 1023


def _ewma_terms_sql(lag_fn: str = "lag") -> str:
    """Σ_{k=0..9} lag_k(x)·2^(9−k) as engine-portable SQL."""
    return " + ".join(
        f"{lag_fn}(x, {k}) OVER w * {1 << (_EWMA_TAPS - 1 - k)}"
        for k in range(_EWMA_TAPS)
    )


@query(
    "q_time_ewma_crossover",
    oracle=f"""
WITH s AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE event_type = 'click'
  GROUP BY day
),
r AS (
  SELECT day, x,
         CAST(row_number() OVER w AS BIGINT) AS rn,
         CAST(({_ewma_terms_sql()}) // {_EWMA_DENOM} AS BIGINT) AS ewma_c,
         CAST(CAST(SUM(x) OVER (ORDER BY day
                ROWS BETWEEN {_EWMA_TAPS - 1} PRECEDING AND CURRENT ROW)
              AS BIGINT) // {_EWMA_TAPS} AS BIGINT) AS sma_c
  FROM s
  WINDOW w AS (ORDER BY day)
)
SELECT day, x, ewma_c, sma_c, ewma_c > sma_c AS above
FROM r WHERE rn >= {_EWMA_TAPS}
ORDER BY day
""",
)
def q_time_ewma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2, truncated at 10
    taps) vs the 10-day simple moving average, with the crossover
    signal — the trend-following indicator pair that completes the
    q_time_bollinger / q_time_rsi family. The EWMA recurrence is
    UNROLLED into a fixed dot product over ten lag() taps with exact
    power-of-two weights (Σ x_{t−k}·2^{9−k} // 1023): truncating the
    geometric tail at 2⁻¹⁰ makes an inherently recursive smoother
    expressible as a pure window query with zero recursion — and
    bit-identical across engines because the weights and division are
    integers.

    Scale shape: one map-side-combinable daily rollup; the ten taps
    ride ONE ordered window over the calendar-bounded day series (a
    single exchange; the window is day-grain, never event-grain)."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.date_trunc("day", "ts").alias("day"),
            F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").alias("x"))
    )
    w = Window.orderBy("day")
    ewma_num = None
    for k in range(_EWMA_TAPS):
        term = F.lag("x", k).over(w) * (1 << (_EWMA_TAPS - 1 - k))
        ewma_num = term if ewma_num is None else ewma_num + term
    r = (
        s.withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("ewma_num", ewma_num)
        .withColumn(
            "sma_num",
            F.sum("x")
            .over(w.rowsBetween(-(_EWMA_TAPS - 1), Window.currentRow))
            .cast("long"),
        )
    )
    return (
        r.filter(F.col("rn") >= _EWMA_TAPS)
        .select(
            "day",
            "x",
            F.expr(f"CAST(ewma_num DIV {_EWMA_DENOM} AS BIGINT)").alias(
                "ewma_c"
            ),
            F.expr(f"CAST(sma_num DIV {_EWMA_TAPS} AS BIGINT)").alias(
                "sma_c"
            ),
        )
        .withColumn("above", F.col("ewma_c") > F.col("sma_c"))
        .orderBy("day")
    )


@query(
    "q_agg_hodges_lehmann",
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY event_type, d
),
walsh AS (
  SELECT a.event_type, a.x + b.x AS w2
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d <= b.d
),
ranked AS (
  SELECT event_type, w2,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY w2)
              AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM walsh
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_pairs,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN w2 END) // 2 AS BIGINT)
         AS hl_c
FROM ranked
GROUP BY event_type
ORDER BY event_type
""",
)
def q_agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann location estimator per event type — the median
    of all Walsh averages (xᵢ+xⱼ)/2 over the daily series, the
    rank-based robust center with ~95% Gaussian efficiency (vs the
    plain median's 64%) that pairs naturally with q_agg_mann_whitney
    (it inverts the same signed-rank statistic). Kept exact: the
    pairwise sums stay doubled integers, the median is the
    lower-median row_number pick (the q_select_grouped_median
    convention), and the final halving is one integer division.

    Scale shape: the Walsh self-join is DAY-grain (calendar-bounded —
    at any fact volume the pair table is |days|²/2 per group, built
    from an equi-join on the group key); the fact table itself is
    touched once by the daily rollup. For unbounded-cardinality
    groups the estimator would switch to the iterative
    selection recipe (operators/selection.py) over the implicit pair
    distribution."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr("CAST(unix_micros(ts) AS BIGINT) DIV 86400000000").alias(
                "d"
            ),
            F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("c").alias("x"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    walsh = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") <= F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("a.x") + F.col("b.x")).alias("w2"),
    )
    wp = Window.partitionBy("event_type").orderBy("w2")
    wc = Window.partitionBy("event_type")
    ranked = walsh.withColumn(
        "rn", F.row_number().over(wp).cast("long")
    ).withColumn("n", F.count("*").over(wc).cast("long"))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").alias("n_pairs"),
            F.expr(
                "CAST(max(CASE WHEN rn = (n + 1) DIV 2 THEN w2 END)"
                " DIV 2 AS BIGINT)"
            ).alias("hl_c"),
        )
        .orderBy("event_type")
    )


_FRAME_LEN = 32  # frame length (chars standing in for samples)
_FRAME_HOP = 16  # 50% overlap


@query(
    "q_multimodal_frame_energy",
    oracle=f"""
WITH framed AS (
  SELECT doc_id, f.f AS frame,
         CAST((len(text) - {_FRAME_LEN}) // {_FRAME_HOP} + 1 AS BIGINT)
           AS n_frames,
         CAST(list_sum(list_transform(range({_FRAME_LEN}),
           i -> ord(substr(text, {_FRAME_HOP} * f.f + i + 1, 1))))
           AS BIGINT) AS energy
  FROM documents,
       (SELECT unnest(range(64)) AS f) f
  WHERE len(text) >= {_FRAME_LEN}
    AND f.f <= (len(text) - {_FRAME_LEN}) // {_FRAME_HOP}
)
SELECT doc_id, frame, n_frames, energy
FROM framed
ORDER BY energy DESC, doc_id, frame
LIMIT 10
""",
)
def q_multimodal_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style frame scan over the multimodal payload: split each
    payload into 32-sample frames with 50% overlap (hop 16), compute
    per-frame energy (sum of sample magnitudes — here the payload
    convention's char codes), and surface the 10 loudest frames —
    the windowing primitive under VAD, loudness normalization and
    spectral feature extraction, expressed relationally so the frame
    *bookkeeping* (boundaries, overlap, per-doc frame counts) is
    value-hash-checked. In production only the inner energy kernel
    moves into the decode mapInPandas stage; the frame-explode join
    shape stays.

    Determinism: frame boundaries are integer arithmetic on the
    payload length; energies are exact code-point sums; the top-10
    rides the total order (energy DESC, doc_id, frame).

    Scale shape: frames explode ×(len/hop) per document but carry
    only (id, int, int) — and the explode is generated from a bounded
    sequence, not a join; the top-10 is a TakeOrderedAndProject
    (per-partition heads, no global sort)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= _FRAME_LEN
    )
    framed = d.select(
        "doc_id",
        F.expr(
            f"(length(text) - {_FRAME_LEN}) DIV {_FRAME_HOP} + 1"
        ).alias("n_frames"),
        F.explode(
            F.expr(
                f"sequence(0, (length(text) - {_FRAME_LEN}) DIV {_FRAME_HOP})"
            )
        ).alias("frame"),
        F.col("text"),
    ).select(
        "doc_id",
        F.col("frame").cast("long").alias("frame"),
        "n_frames",
        F.expr(
            f"CAST(aggregate(transform(sequence(1, {_FRAME_LEN}),"
            f" i -> ascii(substring(text, {_FRAME_HOP} * frame + i, 1))),"
            " 0, (a, x) -> a + x) AS BIGINT)"
        ).alias("energy"),
    )
    return framed.orderBy(
        F.desc("energy"), "doc_id", "frame"
    ).limit(10)
