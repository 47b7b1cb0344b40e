"""Round-10 operators: annotation agreement, calibration repair,
privacy auditing, weighted sampling, rule-bundle quality gating,
conformal intervals, summary-overlap evaluation, and Kalman smoothing.

Eleven additions — the remaining breadth gaps a production LLM-data
pipeline hits that no earlier round covered:

- q_eval_krippendorff_alpha — multi-rater chance-corrected agreement
  (the ≥3-rater generalization of q_agg_cohens_kappa) over three
  deterministic document-quality raters, per source.
- q_eval_isotonic_calibration — PAVA-fitted monotone calibration curve
  via the max-min (minimax) characterization on the bounded bin grid;
  the REPAIR step to q_eval_calibration_bins' diagnostic.
- q_privacy_l_diversity — distinct-l sensitive-attribute diversity per
  quasi-identifier group; the companion audit to q_privacy_k_anonymity
  (k bounds re-identification, l bounds attribute disclosure).
- q_sample_pps_bottomk — probability-proportional-to-size bottom-k
  sampling (priority sampling) with the Duffield-Lund-Thorup
  max(w, tau) estimator terms; mergeable by construction.
- q_text_gopher_rules — the Gopher-style rule-bundle quality gate with
  a per-rule failure bitmask, so the audit shows WHICH rule kills a
  document, not just that one did.
- q_agg_conformal_interval — split-conformal prediction intervals:
  exact calibration-residual P90 per group + held-out coverage audit.
- q_eval_rouge_overlap — ROUGE-1/ROUGE-2 recall (clipped n-gram
  overlap) between deterministic candidate/reference document pairs.
- q_time_kalman_1d — scalar constant-level Kalman filter per event
  type, folded in exact fixed-point (adaptive-gain smoothing; the
  state-space upgrade of q_time_ses_forecast's fixed-alpha fold).
- q_privacy_t_closeness — ordered earth-mover's distance between each
  QI group's sensitive distribution and the global one (the stricter
  sibling of l-diversity), cross-multiplied integers throughout.
- q_sample_neyman_allocation — variance-optimal stratified sample
  sizes (n_h ∝ N_h·S_h) from exact integer moments; the DESIGN step
  in front of q_sample_stratified's execution step.
- q_privacy_dp_noisy_count — seeded-Laplace differentially-private
  count release (ε=1), one ⌊ln·1e6⌋ transcendental per calendar cell;
  completes the privacy family (k-anon, l-div, t-close, DP).

Every query is exact-integer (fixed-point BIGINT) in both engines
except where a double is the DERIVED output of identical int64
operands (IEEE division of exact longs is correctly rounded in both).
Cross-engine idioms reused from earlier rounds: md5-nibble buckets via
conv/strpos, sign-safe floor division ((s − ((s%k)+k)%k)/k — Spark DIV
truncates, DuckDB // floors; this form floors on both), exact-multiple
double division for < 2^53 values, recursive-CTE twins for sequential
folds, histogram-cum exact quantiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query

# ---------------------------------------------------------------------------
# q_eval_krippendorff_alpha — multi-rater nominal agreement per source
# ---------------------------------------------------------------------------

# three deterministic binary "raters" over a document (is-high-quality
# votes): length, verbosity, and lexical-density heuristics. Thresholds
# sit near the fixture medians so votes genuinely disagree.
_KRIPP_R1 = "CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END"
_KRIPP_R2_DUCK = (
    "CASE WHEN len(string_split(text, ' ')) >= 56 THEN 1 ELSE 0 END"
)
_KRIPP_R3_DUCK = (
    "CASE WHEN length(text) * 10 >= 55 * len(string_split(text, ' '))"
    " THEN 1 ELSE 0 END"
)


@query(
    "q_eval_krippendorff_alpha",
    oracle=f"""
WITH rated AS (
  SELECT source,
         CAST({_KRIPP_R1} + {_KRIPP_R2_DUCK} + {_KRIPP_R3_DUCK}
              AS BIGINT) AS nu1
  FROM documents
),
agg AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_units,
         CAST(SUM(3 - nu1) AS BIGINT) AS n0,
         CAST(SUM(nu1) AS BIGINT) AS n1,
         CAST(SUM(nu1 * (3 - nu1)) AS BIGINT) AS d_o
  FROM rated GROUP BY source
)
SELECT source, n_units, n0, n1, d_o,
       CAST(1000000 - ((3 * n_units - 1) * d_o * 1000000)
            // NULLIF(2 * n0 * n1, 0) AS BIGINT) AS alpha_ppm
FROM agg ORDER BY source
""",
)
def q_eval_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal, binary values, 3 raters, no
    missing data) per source — THE inter-annotator agreement statistic
    a labeling pipeline reports when more than two raters judge each
    unit (q_agg_cohens_kappa covers the 2-rater case). Raters are three
    deterministic quality heuristics voting is-high-quality on every
    document; for m=3 raters and binary values the coincidence-matrix
    formulation collapses to
    alpha = 1 − (n−1)·Σ_u n_u0·n_u1 / (2·n_0·n_1) with n = 3N pairable
    values, n_uc the per-unit value counts and n_c the marginals — all
    exact BIGINT counts, one integer division (non-negative numerator
    and denominator, so floor == truncate and the idiom is sign-safe
    as written). Headroom: (3N−1)·D·1e6 with D ≤ 2N stays inside int64
    to N ≈ 35k units per source; per-source grouping is what keeps the
    statistic bounded at corpus scale (the same contract as
    q_agg_cohens_kappa).

    Scale shape: one narrow projection (three per-row votes, no
    tokenize shuffle — the word count is a split-length expression)
    and ONE map-side-combinable grouped aggregate to source grain;
    the alpha arithmetic runs on the ≤|sources| result rows."""
    docs = load_table(spark, sf_dir, "documents")
    rated = docs.select(
        "source",
        (
            F.when(F.length("text") >= 300, 1).otherwise(0)
            + F.when(F.size(F.split(F.col("text"), " ")) >= 56, 1).otherwise(0)
            + F.when(
                F.length("text") * 10
                >= 55 * F.size(F.split(F.col("text"), " ")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("nu1"),
    )
    agg = rated.groupBy("source").agg(
        F.count("*").cast("long").alias("n_units"),
        F.sum(3 - F.col("nu1")).cast("long").alias("n0"),
        F.sum("nu1").cast("long").alias("n1"),
        F.sum(F.col("nu1") * (3 - F.col("nu1"))).cast("long").alias("d_o"),
    )
    return agg.select(
        "source",
        "n_units",
        "n0",
        "n1",
        "d_o",
        F.expr(
            "CAST(1000000 - ((3 * n_units - 1) * d_o * 1000000)"
            " DIV NULLIF(2 * n0 * n1, 0) AS BIGINT)"
        ).alias("alpha_ppm"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q_eval_isotonic_calibration — PAVA monotone calibration fit (minimax form)
# ---------------------------------------------------------------------------


@query(
    "q_eval_isotonic_calibration",
    oracle="""
WITH scored AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) % 101 AS p_pct,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
bins AS (
  SELECT p_pct // 10 AS bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS n_pos
  FROM scored GROUP BY 1
),
cum AS (
  SELECT bin, n, n_pos,
         CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
         CAST(SUM(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cp
  FROM bins
),
iv AS (
  SELECT j.bin AS j, k.bin AS k,
         CAST(k.cp - j.cp + j.n_pos AS DOUBLE)
           / (k.cn - j.cn + j.n) AS rate
  FROM cum j JOIN cum k ON j.bin <= k.bin
),
inner_min AS (
  SELECT b.bin, iv.j, MIN(iv.rate) AS minr
  FROM bins b JOIN iv ON iv.j <= b.bin AND iv.k >= b.bin
  GROUP BY b.bin, iv.j
),
fitted AS (
  SELECT bin, MAX(minr) AS fitted_rate FROM inner_min GROUP BY bin
)
SELECT b.bin, b.n, b.n_pos,
       CAST(b.n_pos AS DOUBLE) / b.n AS raw_rate,
       f.fitted_rate
FROM bins b JOIN fitted f ON f.bin = b.bin
ORDER BY b.bin
""",
)
def q_eval_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic-regression calibration fit (PAVA) over the reliability
    bins of q_eval_calibration_bins — the standard REPAIR step after
    the diagnostic: replace each bin's raw positive rate with the
    closest MONOTONE non-decreasing sequence in weighted least squares,
    which is what a score-calibration layer (reward models, quality
    classifiers) actually deploys. Computed via the exact minimax
    characterization fitted_i = max_{j≤i} min_{k≥i} rate(j..k), which
    equals the pool-adjacent-violators solution without any sequential
    pooling loop. Interval rates are IEEE divisions of exact int64
    prefix sums — correctly rounded identically in both engines, so
    min/max over them are deterministic.

    Scale shape: ONE map-side-combinable aggregate to the fixed 11-bin
    grid; everything after (cum window, 66 intervals, minimax) runs on
    ≤11 rows — corpus-size-independent, the q_agg_median_polish
    bounded-grid contract. No per-row window, no second scan."""
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        (F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long") % 101)
        .alias("p_pct"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    bins = scored.groupBy(F.expr("p_pct DIV 10").alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin",
        "n",
        "n_pos",
        F.sum("n").over(w).cast("long").alias("cn"),
        F.sum("n_pos").over(w).cast("long").alias("cp"),
    )
    j = cum.select(
        F.col("bin").alias("j"),
        F.col("n").alias("j_n"),
        F.col("n_pos").alias("j_pos"),
        F.col("cn").alias("j_cn"),
        F.col("cp").alias("j_cp"),
    )
    k = cum.select(
        F.col("bin").alias("k"),
        F.col("cn").alias("k_cn"),
        F.col("cp").alias("k_cp"),
    )
    iv = j.join(k, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("k_cp") - F.col("j_cp") + F.col("j_pos")).cast("double")
            / (F.col("k_cn") - F.col("j_cn") + F.col("j_n"))
        ).alias("rate"),
    )
    b = bins.select(F.col("bin").alias("i"))
    inner_min = (
        b.join(iv, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("rate").alias("minr"))
    )
    fitted = inner_min.groupBy("i").agg(F.max("minr").alias("fitted_rate"))
    return (
        bins.join(fitted, bins["bin"] == fitted["i"])
        .select(
            "bin",
            "n",
            "n_pos",
            (F.col("n_pos").cast("double") / F.col("n")).alias("raw_rate"),
            "fitted_rate",
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q_privacy_l_diversity — sensitive-attribute diversity per QI group
# ---------------------------------------------------------------------------


@query(
    "q_privacy_l_diversity",
    oracle="""
WITH sens AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS sens_bucket
  FROM customer
),
cell AS (
  SELECT c_nationkey, c_mktsegment, sens_bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM sens GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment,
       CAST(SUM(cnt) AS BIGINT) AS k_anon,
       CAST(count(*) AS BIGINT) AS l_distinct,
       CAST(MAX(cnt) AS BIGINT) AS max_sens_cnt,
       CAST(CASE WHEN count(*) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS ok_l3
FROM cell
GROUP BY c_nationkey, c_mktsegment
ORDER BY c_nationkey, c_mktsegment
""",
)
def q_privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l diversity audit per quasi-identifier group: for every
    (nation, market-segment) equivalence class, how many DISTINCT
    values of the sensitive attribute (account-balance band) appear —
    k-anonymity (q_privacy_k_anonymity) bounds re-identification, but a
    k-anonymous group whose members all share one sensitive value still
    discloses it; l-diversity is the standard follow-up audit before a
    dataset (or a training corpus derived from user data) ships.
    max_sens_cnt supports the stricter recursive (c,l)-diversity check
    downstream; ok_l3 flags classes meeting l ≥ 3. FLOOR on a double
    is IEEE-identical in both engines, so the band assignment is exact.

    Scale shape: two stacked map-side-combinable aggregates
    (QI+sensitive cell grain, then QI grain) — the same two-level
    rollup as q_dq_uniqueness_profile; output is bounded by the QI
    domain (|nations|×|segments|), never the row count."""
    cust = load_table(spark, sf_dir, "customer")
    cell = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias(
                "sens_bucket"
            ),
        )
        .groupBy("c_nationkey", "c_mktsegment", "sens_bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        cell.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum("cnt").cast("long").alias("k_anon"),
            F.count("*").cast("long").alias("l_distinct"),
            F.max("cnt").cast("long").alias("max_sens_cnt"),
            F.when(F.count("*") >= 3, 1).otherwise(0).cast("long").alias(
                "ok_l3"
            ),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q_sample_pps_bottomk — priority (PPS bottom-k) sampling with estimator
# ---------------------------------------------------------------------------

_PPS_K = 50
# 13 hex nibbles = 52 bits: exact in BIGINT and in a double's mantissa
_PPS_H_DUCK = (
    "CAST(('0x' || substring(md5('pps:' || CAST(l_partkey AS VARCHAR)), 1, 13))"
    " AS BIGINT)"
)


@query(
    "q_sample_pps_bottomk",
    oracle=f"""
WITH w AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS w_fx
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT l_partkey, w_fx,
         CAST(({_PPS_H_DUCK} + 1) * 1000 // w_fx AS BIGINT) AS rank1000
  FROM w
),
topk1 AS (
  SELECT l_partkey, w_fx, rank1000,
         row_number() OVER (ORDER BY rank1000, l_partkey) AS rn
  FROM ranked
  ORDER BY rank1000, l_partkey
  LIMIT {_PPS_K + 1}
),
tau AS (
  SELECT CAST(MAX(rank1000) AS BIGINT) AS tau1000,
         CAST(count(*) AS BIGINT) AS n_seen
  FROM topk1
)
SELECT t.l_partkey, t.w_fx, t.rank1000,
       CAST(CASE WHEN tau.n_seen > {_PPS_K}
                 THEN LEAST(1000000,
                      t.w_fx * 1000000
                      // (4503599627370496000 // tau.tau1000))
                 ELSE 1000000 END AS BIGINT) AS p_ppm,
       CAST(CASE WHEN tau.n_seen > {_PPS_K}
                 THEN GREATEST(t.w_fx,
                      4503599627370496000 // tau.tau1000)
                 ELSE t.w_fx END AS BIGINT) AS est_term
FROM topk1 t CROSS JOIN tau
WHERE t.rn <= {_PPS_K}
ORDER BY t.rank1000, t.l_partkey
""",
)
def q_sample_pps_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size bottom-k sample (priority
    sampling, Duffield-Lund-Thorup) of parts weighted by total sold
    quantity: each key draws a deterministic 52-bit uniform u from
    md5(key) and keeps rank u/w — the k SMALLEST ranks are the sample,
    the (k+1)-th rank is the threshold tau, and each sampled item
    contributes est_term = max(w, 1/tau) to the unbiased total
    estimator. The rank is held as (u+1)·1000 // w_fx (u+1 ≤ 2^52, so
    the product ≤ 4.5e18 stays in int64) and 1/tau as
    2^52·1000 // tau1000; p_ppm is the resulting inclusion
    probability. Degenerate corpora with ≤ k keys return everything at
    p = 1. The weighted generalization of q_sample_reservoir_bottomk
    (uniform bottom-k): heavy keys enter with probability → 1, and the
    estimator stays unbiased for the light tail.

    Scale shape: one map-side-combinable weight rollup, then bottom-k
    as TakeOrderedAndProject — no global sort, no second scan.
    Mergeable BY CONSTRUCTION: ranks are pure row functions, so the
    bottom-k of a union is the bottom-k of merged per-shard bottom-ks
    — the property that lets 1000 executors each ship k rows."""
    li = load_table(spark, sf_dir, "lineitem")
    w = li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
        ).alias("w_fx")
    )
    ranked = w.select(
        "l_partkey",
        "w_fx",
        F.expr(
            "CAST((CAST(conv(substr(md5(concat('pps:',"
            " CAST(l_partkey AS STRING))), 1, 13), 16, 10) AS BIGINT) + 1)"
            " * 1000 DIV w_fx AS BIGINT)"
        ).alias("rank1000"),
    )
    topk1 = (
        ranked.orderBy("rank1000", "l_partkey")
        .limit(_PPS_K + 1)
        .select(
            "l_partkey",
            "w_fx",
            "rank1000",
            F.row_number()
            .over(Window.orderBy("rank1000", "l_partkey"))
            .alias("rn"),
        )
    )
    tau = topk1.agg(
        F.max("rank1000").cast("long").alias("tau1000"),
        F.count("*").cast("long").alias("n_seen"),
    )
    return (
        topk1.filter(F.col("rn") <= _PPS_K)
        .crossJoin(F.broadcast(tau))
        .select(
            "l_partkey",
            "w_fx",
            "rank1000",
            F.expr(
                f"CAST(CASE WHEN n_seen > {_PPS_K}"
                f" THEN LEAST(1000000, w_fx * 1000000"
                f" DIV (4503599627370496000 DIV tau1000))"
                f" ELSE 1000000 END AS BIGINT)"
            ).alias("p_ppm"),
            F.expr(
                f"CAST(CASE WHEN n_seen > {_PPS_K}"
                f" THEN GREATEST(w_fx, 4503599627370496000 DIV tau1000)"
                f" ELSE w_fx END AS BIGINT)"
            ).alias("est_term"),
        )
        .orderBy("rank1000", "l_partkey")
    )


# ---------------------------------------------------------------------------
# q_text_gopher_rules — rule-bundle quality gate with failure bitmask
# ---------------------------------------------------------------------------

_GOPHER_STOPS = "['the','and','for','with','that','this','are','was']"


@query(
    "q_text_gopher_rules",
    oracle=f"""
WITH feats AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
         CAST((length(text) - len(string_split(text, ' ')) + 1)
              // len(string_split(text, ' ')) AS BIGINT) AS mean_wl,
         CAST(len(list_filter(string_split(text, ' '),
              x -> list_contains({_GOPHER_STOPS}, x))) AS BIGINT)
           AS stop_hits,
         CAST(list_max(list_transform(string_split(text, ' '),
              x -> length(x))) AS BIGINT) AS max_wl,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           AS uniq_toks
  FROM documents
),
flagged AS (
  SELECT doc_id, source,
         CAST((CASE WHEN words < 20 OR words > 1000 THEN 1 ELSE 0 END)
            + 2 * (CASE WHEN mean_wl < 3 OR mean_wl > 12 THEN 1 ELSE 0 END)
            + 4 * (CASE WHEN stop_hits < 2 THEN 1 ELSE 0 END)
            + 8 * (CASE WHEN max_wl > 30 THEN 1 ELSE 0 END)
            + 16 * (CASE WHEN uniq_toks * 100 < 30 * words THEN 1 ELSE 0 END)
            AS BIGINT) AS fail_mask
  FROM feats
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN fail_mask = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass,
       CAST(SUM(fail_mask % 2) AS BIGINT) AS f_words,
       CAST(SUM((fail_mask // 2) % 2) AS BIGINT) AS f_mean_wl,
       CAST(SUM((fail_mask // 4) % 2) AS BIGINT) AS f_stopwords,
       CAST(SUM((fail_mask // 8) % 2) AS BIGINT) AS f_max_wl,
       CAST(SUM((fail_mask // 16) % 2) AS BIGINT) AS f_uniq,
       CAST(SUM(CASE WHEN fail_mask = 0 THEN doc_id ELSE 0 END) AS BIGINT)
         AS kept_checksum
FROM flagged GROUP BY source ORDER BY source
""",
)
def q_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-bundle quality gate with a per-rule failure
    BITMASK — the canonical pretraining-corpus filter (Rae et al.'s
    repetition/length/symbol rules) in audit form: a document fails on
    word count out of range, mean word length out of [3,12], too few
    stopword hits, an over-long token, or a unique-token ratio under
    30%, and the mask records WHICH rules fired so the per-source
    report shows each rule's kill rate instead of one opaque pass
    count (thresholds scaled to this fixture's snippet-length
    documents; the rule STRUCTURE is the operator). kept_checksum
    (sum of surviving doc_ids) pins the exact surviving set across
    engines, not just its size.

    Scale shape: every feature is a per-row expression over the token
    array (split once, reused — no tokenize shuffle, no join); ONE
    map-side-combinable aggregate to source grain. The whole gate is a
    single corpus scan, which is why rule bundles are the cheapest
    filter stage a 100 TB pipeline runs first."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    words = F.size(toks).cast("long")
    feats = docs.select(
        "doc_id",
        "source",
        words.alias("words"),
        F.expr(
            "CAST((length(text) - size(split(text, ' ')) + 1)"
            " DIV size(split(text, ' ')) AS BIGINT)"
        ).alias("mean_wl"),
        F.size(
            F.filter(
                toks,
                lambda x: x.isin(
                    "the", "and", "for", "with", "that", "this", "are", "was"
                ),
            )
        )
        .cast("long")
        .alias("stop_hits"),
        F.array_max(F.transform(toks, F.length)).cast("long").alias("max_wl"),
        F.size(F.array_distinct(toks)).cast("long").alias("uniq_toks"),
    )
    flagged = feats.select(
        "doc_id",
        "source",
        (
            F.when((F.col("words") < 20) | (F.col("words") > 1000), 1)
            .otherwise(0)
            + 2
            * F.when((F.col("mean_wl") < 3) | (F.col("mean_wl") > 12), 1)
            .otherwise(0)
            + 4 * F.when(F.col("stop_hits") < 2, 1).otherwise(0)
            + 8 * F.when(F.col("max_wl") > 30, 1).otherwise(0)
            + 16
            * F.when(F.col("uniq_toks") * 100 < 30 * F.col("words"), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("fail_mask"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("fail_mask") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_pass"),
            F.sum(F.col("fail_mask") % 2).cast("long").alias("f_words"),
            F.sum(F.expr("(fail_mask DIV 2) % 2"))
            .cast("long")
            .alias("f_mean_wl"),
            F.sum(F.expr("(fail_mask DIV 4) % 2"))
            .cast("long")
            .alias("f_stopwords"),
            F.sum(F.expr("(fail_mask DIV 8) % 2"))
            .cast("long")
            .alias("f_max_wl"),
            F.sum(F.expr("(fail_mask DIV 16) % 2"))
            .cast("long")
            .alias("f_uniq"),
            F.sum(
                F.when(F.col("fail_mask") == 0, F.col("doc_id")).otherwise(0)
            )
            .cast("long")
            .alias("kept_checksum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q_agg_conformal_interval — split-conformal P90 intervals + coverage audit
# ---------------------------------------------------------------------------


@query(
    "q_agg_conformal_interval",
    oracle="""
WITH split AS (
  SELECT o_orderpriority AS g,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS y_c,
         strpos('0123456789abcdef',
                substr(md5('conf:' || CAST(o_orderkey AS VARCHAR)), 1, 1))
           - 1 AS nib
  FROM orders
),
model AS (
  SELECT g, CAST(SUM(y_c) // count(*) AS BIGINT) AS pred_c
  FROM split WHERE nib >= 4 AND nib < 12 GROUP BY g
),
calib AS (
  SELECT s.g,
         CAST(CASE WHEN s.y_c >= m.pred_c THEN s.y_c - m.pred_c
                   ELSE m.pred_c - s.y_c END AS BIGINT) AS r
  FROM split s JOIN model m ON m.g = s.g
  WHERE s.nib < 4
),
hist AS (
  SELECT g, r, CAST(count(*) AS BIGINT) AS cnt FROM calib GROUP BY g, r
),
cum AS (
  SELECT g, r, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY r) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n_calib
  FROM hist
),
thr AS (
  SELECT g, CAST(MIN(r) AS BIGINT) AS q90_c,
         CAST(MIN(n_calib) AS BIGINT) AS n_calib
  FROM cum WHERE cum * 10 >= n_calib * 9 GROUP BY g
)
SELECT m.g, m.pred_c, t.q90_c, t.n_calib,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN (CASE WHEN s.y_c >= m.pred_c
                                THEN s.y_c - m.pred_c
                                ELSE m.pred_c - s.y_c END) <= t.q90_c
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       CAST(SUM(CASE WHEN (CASE WHEN s.y_c >= m.pred_c
                                THEN s.y_c - m.pred_c
                                ELSE m.pred_c - s.y_c END) <= t.q90_c
                     THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         AS coverage_ppm
FROM split s
JOIN model m ON m.g = s.g
JOIN thr t ON t.g = s.g
WHERE s.nib >= 12
GROUP BY m.g, m.pred_c, t.q90_c, t.n_calib
ORDER BY m.g
""",
)
def q_agg_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals with a held-out coverage
    audit: hash-split orders into train (50%) / calibration (25%) /
    test (25%) by an md5 nibble of the order key (a pure row function,
    so the split is reproducible shard-by-shard), fit the trivial
    per-priority mean model on train, take the EXACT P90 of absolute
    calibration residuals per group via the histogram-cum quantile
    (no sort, no approx), and report what fraction of test rows the
    interval pred ± q90 actually covers — the distribution-free ~90%
    guarantee conformal prediction promises, audited in ppm. This is
    the modern uncertainty wrapper an ML-serving pipeline bolts onto
    ANY point model; q_agg_bootstrap_ci bounds the MEAN, this bounds
    each PREDICTION.

    Scale shape: three filtered aggregates over one scan lineage —
    model (5 rows, broadcast), residual histogram (value-grain,
    map-side combinable, the q_text_quality_per_lang_filter quantile
    shape), coverage rollup (5 rows). The per-group threshold join is
    a broadcast of |groups| rows; nothing driver-side."""
    from highload_kafka_streams_spark.registry import scoped_persist

    orders = load_table(spark, sf_dir, "orders")
    # r12 (guide §5 caching): three consumers (model, calib, test) each
    # re-ran the orders scan AND the per-row md5 split nibble; the
    # split table is three narrow columns, exactly the
    # recompute-includes-a-scan+heavy-projection profile where persist
    # pays (the jaccard-neighbors `po` precedent). Scoped: released
    # when the next query builds.
    split = scoped_persist(
        orders.select(
            F.col("o_orderpriority").alias("g"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("y_c"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("conf:"), F.col("o_orderkey").cast("string")
                        )
                    ),
                    1,
                    1,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("nib"),
        )
    )
    model = (
        split.filter((F.col("nib") >= 4) & (F.col("nib") < 12))
        .groupBy("g")
        .agg(F.expr("CAST(SUM(y_c) DIV count(*) AS BIGINT)").alias("pred_c"))
    )
    resid = F.expr(
        "CAST(CASE WHEN y_c >= pred_c THEN y_c - pred_c"
        " ELSE pred_c - y_c END AS BIGINT)"
    )
    calib = (
        split.filter(F.col("nib") < 4)
        .join(F.broadcast(model), "g")
        .select("g", resid.alias("r"))
    )
    hist = calib.groupBy("g", "r").agg(F.count("*").cast("long").alias("cnt"))
    wg = Window.partitionBy("g").orderBy("r")
    cum = hist.select(
        "g",
        "r",
        F.sum("cnt").over(
            wg.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy("g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("n_calib"),
    )
    thr = (
        cum.filter(F.col("cum") * 10 >= F.col("n_calib") * 9)
        .groupBy("g")
        .agg(
            F.min("r").cast("long").alias("q90_c"),
            F.min("n_calib").cast("long").alias("n_calib"),
        )
    )
    test = (
        split.filter(F.col("nib") >= 12)
        .join(F.broadcast(model), "g")
        .join(F.broadcast(thr), "g")
    )
    return (
        test.groupBy("g", "pred_c", "q90_c", "n_calib")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(F.when(resid <= F.col("q90_c"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
        )
        .select(
            "g",
            "pred_c",
            "q90_c",
            "n_calib",
            "n_test",
            "n_covered",
            F.expr("CAST(n_covered * 1000000 DIV n_test AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
        .orderBy("g")
    )


# ---------------------------------------------------------------------------
# q_eval_rouge_overlap — clipped n-gram recall between document pairs
# ---------------------------------------------------------------------------


def _rouge_kernel(batches):
    """Arrow-vectorized clipped n-gram overlap (guide §4.2): per pair
    row, count uni/bigram multisets with hash maps and emit the
    finished ROUGE scalars. Exact parity with the relational form:
    Python ``text.split(" ")`` keeps empty fields exactly like Spark's
    ``split(text, ' ')`` (limit −1) and DuckDB's ``string_split``;
    counts and ppm are unbounded Python ints with ``//`` on
    non-negative operands — identical to BIGINT ``DIV``; ``rouge2_ppm``
    is NULL when the reference has no bigram (the NULLIF contract)."""
    from collections import Counter

    import pyarrow as pa

    out_fields = [
        ("cand_id", pa.int64()),
        ("ref_id", pa.int64()),
        ("ref_unigrams", pa.int64()),
        ("inter1", pa.int64()),
        ("rouge1_ppm", pa.int64()),
        ("ref_bigrams", pa.int64()),
        ("inter2", pa.int64()),
        ("rouge2_ppm", pa.int64()),
    ]

    def clipped(a: Counter, b: Counter) -> int:
        return sum(min(n, b[g]) for g, n in a.items() if g in b)

    for batch in batches:
        d = batch.to_pydict()
        rows = {name: [] for name, _ in out_fields}
        for cand_id, ref_id, cand_text, ref_text in zip(
            d["cand_id"], d["ref_id"], d["cand_text"], d["ref_text"]
        ):
            tc = cand_text.split(" ")
            tr = ref_text.split(" ")
            inter1 = clipped(Counter(tc), Counter(tr))
            bc = [f"{x} {y}" for x, y in zip(tc, tc[1:])]
            br = [f"{x} {y}" for x, y in zip(tr, tr[1:])]
            inter2 = clipped(Counter(bc), Counter(br))
            nr, nb = len(tr), len(tr) - 1
            rows["cand_id"].append(cand_id)
            rows["ref_id"].append(ref_id)
            rows["ref_unigrams"].append(nr)
            rows["inter1"].append(inter1)
            rows["rouge1_ppm"].append(inter1 * 1000000 // nr)
            rows["ref_bigrams"].append(nb)
            rows["inter2"].append(inter2)
            rows["rouge2_ppm"].append(
                inter2 * 1000000 // nb if nb != 0 else None
            )
        yield pa.RecordBatch.from_arrays(
            [pa.array(rows[n], t) for n, t in out_fields],
            [n for n, _ in out_fields],
        )


@query(
    "q_eval_rouge_overlap",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, text,
         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
              AS BIGINT) AS rn
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS cand_id, b.doc_id AS ref_id,
         a.text AS cand_text, b.text AS ref_text
  FROM ranked a
  JOIN ranked b ON b.source = a.source AND b.rn = a.rn + 1
  WHERE a.rn % 2 = 1
),
ct1 AS (
  SELECT cand_id, tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT cand_id, unnest(string_split(cand_text, ' ')) AS tok
        FROM pairs)
  GROUP BY cand_id, tok
),
rt1 AS (
  SELECT cand_id, tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT cand_id, unnest(string_split(ref_text, ' ')) AS tok
        FROM pairs)
  GROUP BY cand_id, tok
),
i1 AS (
  SELECT ct1.cand_id,
         CAST(SUM(LEAST(ct1.c, rt1.c)) AS BIGINT) AS inter1
  FROM ct1 JOIN rt1 ON rt1.cand_id = ct1.cand_id AND rt1.tok = ct1.tok
  GROUP BY ct1.cand_id
),
cb AS (
  SELECT cand_id, toks[i.pos + 1] || ' ' || toks[i.pos + 2] AS bg
  FROM (SELECT cand_id, string_split(cand_text, ' ') AS toks FROM pairs) t,
       unnest(range(len(toks) - 1)) AS i(pos)
),
rb AS (
  SELECT cand_id, toks[i.pos + 1] || ' ' || toks[i.pos + 2] AS bg
  FROM (SELECT cand_id, string_split(ref_text, ' ') AS toks FROM pairs) t,
       unnest(range(len(toks) - 1)) AS i(pos)
),
ct2 AS (
  SELECT cand_id, bg, CAST(count(*) AS BIGINT) AS c FROM cb
  GROUP BY cand_id, bg
),
rt2 AS (
  SELECT cand_id, bg, CAST(count(*) AS BIGINT) AS c FROM rb
  GROUP BY cand_id, bg
),
i2 AS (
  SELECT ct2.cand_id,
         CAST(SUM(LEAST(ct2.c, rt2.c)) AS BIGINT) AS inter2
  FROM ct2 JOIN rt2 ON rt2.cand_id = ct2.cand_id AND rt2.bg = ct2.bg
  GROUP BY ct2.cand_id
)
SELECT p.cand_id, p.ref_id,
       CAST(len(string_split(p.ref_text, ' ')) AS BIGINT) AS ref_unigrams,
       CAST(COALESCE(i1.inter1, 0) AS BIGINT) AS inter1,
       CAST(COALESCE(i1.inter1, 0) * 1000000
            // len(string_split(p.ref_text, ' ')) AS BIGINT) AS rouge1_ppm,
       CAST(len(string_split(p.ref_text, ' ')) - 1 AS BIGINT) AS ref_bigrams,
       CAST(COALESCE(i2.inter2, 0) AS BIGINT) AS inter2,
       CAST(COALESCE(i2.inter2, 0) * 1000000
            // NULLIF(len(string_split(p.ref_text, ' ')) - 1, 0)
            AS BIGINT) AS rouge2_ppm
FROM pairs p
LEFT JOIN i1 ON i1.cand_id = p.cand_id
LEFT JOIN i2 ON i2.cand_id = p.cand_id
ORDER BY p.cand_id
""",
)
def q_eval_rouge_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 / ROUGE-2 recall between deterministic candidate /
    reference document pairs (each odd-ranked document within a source
    against its same-source successor) — the clipped n-gram overlap
    that summarization and paraphrase evals report: inter_n = Σ_gram
    min(count_cand, count_ref) over n-gram TYPES (clipping stops a
    repeated gram from over-crediting), recall = inter_n /
    ref_gram_count, in exact ppm. The asymmetric-recall counterpart to
    q_dedup_ngram_jaccard's symmetric similarity; pairs whose texts
    share nothing still emit a 0-ppm row (LEFT join), so the eval
    covers the full pair set.

    Scale shape: pairing needs an order, so one row_number window
    PARTITIONED BY SOURCE ranks documents (the sorted-neighborhood-ER
    shape — a per-source sort, never a global one), and pairs join on
    (source, rank+1). The clipped overlap itself is PAIR-LOCAL — every
    gram count it needs lives inside one pair row's two texts — so
    after the pair join it is per-row work, not relational work
    (guide §2.4/§4.2): one Arrow batch per partition rides into
    `_rouge_kernel`, which counts grams with hash maps and emits the
    finished scalars. Nothing explodes, nothing shuffles except the
    final presentation orderBy."""
    from highload_kafka_streams_spark.io import memo_parquet

    def _build_pairs(s: SparkSession) -> DataFrame:
        docs = load_table(s, sf_dir, "documents")
        ranked = docs.select(
            "doc_id",
            "source",
            "text",
            F.row_number()
            .over(Window.partitionBy("source").orderBy("doc_id"))
            .cast("long")
            .alias("rn"),
        )
        a = ranked.filter(F.col("rn") % 2 == 1).select(
            F.col("doc_id").alias("cand_id"),
            F.col("source").alias("a_src"),
            F.col("text").alias("cand_text"),
            F.col("rn").alias("a_rn"),
        )
        b = ranked.select(
            F.col("doc_id").alias("ref_id"),
            F.col("source").alias("b_src"),
            F.col("text").alias("ref_text"),
            F.col("rn").alias("b_rn"),
        )
        return a.join(
            b,
            (F.col("b_src") == F.col("a_src"))
            & (F.col("b_rn") == F.col("a_rn") + 1),
        ).select("cand_id", "ref_id", "cand_text", "ref_text")

    # three consumers (cand counts, ref counts, final readout) — the
    # ranking window and pair join must run once, not three times (the
    # 10x audit caught the recomputation as an 11.8x scale ratio). r10
    # shipped persist()+count() here, which leaked the cached table for
    # the life of any long-lived driver (r10 advice); memo_parquet is
    # the package's bounded-lifetime answer: materialized once per
    # (fixture, version), served from parquet, no executor-memory pin.
    pairs = memo_parquet(
        spark, sf_dir, "rouge_pairs", ("documents",), _build_pairs, "1"
    )

    # r12 (guide §2.4 remove shuffles outright + §4.2 heavy lifting in
    # native code): the clipped overlap Σ_gram min(count_cand,
    # count_ref) is PAIR-LOCAL — every gram count it needs lives inside
    # one pair row's two texts. The r10/r11 shape exploded both texts
    # to (pair, gram) rows, paid two hash-aggregate exchanges, a
    # sort-merge join on (pair, gram) and a re-aggregate to pair grain,
    # only to join the result back to the pair it came from. Now the
    # pair rows ride ONE Arrow batch per partition into `_rouge_kernel`
    # (hash-map gram counting, exact Python int arithmetic — see the
    # kernel docstring for the split()-parity argument); nothing
    # explodes and nothing shuffles except the final presentation
    # orderBy, which samples/sorts the kernel's finished 8-column rows.
    # r12 NEGATIVE RESULTS (measured in the same windows, not shipped):
    # two pure-JVM per-row HOF forms of the same idea — (a) a fold over
    # array_distinct(cand) of least(size(filter(c,=g)),
    # size(filter(r,=g))) (~8 000 interpreted lambda evals/row,
    # 3.2 → 5.8 s vs the explode shape), and (b) occurrence-tagged
    # array_intersect over sorted gram arrays (~214 lambda evals/row,
    # 2.3 s before the orderBy but the range-exchange sampling re-runs
    # the un-materialized heavy projection, 6.7 s end-to-end). The
    # interpreted HOF path loses to a vectorized Python kernel by an
    # order of magnitude here — exactly the guide §4.2 trade.
    # r11 NEGATIVE RESULT kept for the record: fusing the two explode
    # pipelines into side-tagged structs + one (pair, gram) aggregate
    # was oracle-identical but 1.2–1.5× slower host-normalized.
    return pairs.mapInArrow(
        _rouge_kernel,
        "cand_id long, ref_id long, ref_unigrams long, inter1 long,"
        " rouge1_ppm long, ref_bigrams long, inter2 long, rouge2_ppm long",
    ).orderBy("cand_id")


# ---------------------------------------------------------------------------
# q_time_kalman_1d — scalar constant-level Kalman filter, exact fixed-point
# ---------------------------------------------------------------------------

# Q (process noise) = 1.0, R (measurement noise) = 9.0 in 1e4 fixed
# point; the gain K adapts from trusting the prior (P small) toward the
# data (P large) and converges to the steady-state Riccati value.
_KAL_K = "((r.p + 10000) * 1000000 // (r.p + 100000))"
_KAL_NUM = f"({_KAL_K} * (i.z - r.x))"


@query(
    "q_time_kalman_1d",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) // count(*)
              AS BIGINT) AS z
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, z,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS t
  FROM daily
),
n AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM idx GROUP BY 1
),
rec AS (
  SELECT event_type, CAST(1 AS BIGINT) AS t, z AS x,
         CAST(90000 AS BIGINT) AS p
  FROM idx WHERE t = 1
  UNION ALL
  SELECT r.event_type, r.t + 1,
         CAST(r.x + ({_KAL_NUM}
              - (({_KAL_NUM} % 1000000) + 1000000) % 1000000) // 1000000
              AS BIGINT),
         CAST(((1000000 - {_KAL_K}) * (r.p + 10000)) // 1000000 AS BIGINT)
  FROM rec r
  JOIN idx i ON i.event_type = r.event_type AND i.t = r.t + 1
)
SELECT n.event_type, n.n_days, rec.x AS level_fx, rec.p AS p_fx,
       rec.x / 10000.0 AS smoothed_mean
FROM rec JOIN n ON n.event_type = rec.event_type AND rec.t = n.n_days
ORDER BY n.event_type
""",
)
def q_time_kalman_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar constant-level Kalman filter over each event type's daily
    mean value (local-level state-space model, Q=1, R=9): per step the
    prior variance inflates by Q, the gain K = P⁻/(P⁻+R) re-weights the
    innovation, and level and variance update as x += K·(z−x),
    P = (1−K)·P⁻ — the adaptive-gain upgrade of q_time_ses_forecast's
    FIXED-alpha fold (K starts high while the state is uncertain and
    converges to the steady-state Riccati gain; SES is the special case
    of frozen K). Everything runs in exact integer fixed-point: K in
    ppm via positive integer division, the signed innovation term via
    the sign-safe floor form ((s−((s%k)+k)%k)/k — identical in Spark
    DIV-truncate and DuckDB //-floor), and the daily mean as an exact
    integer quotient. The oracle re-derives the fold as a recursive
    CTE, so agreement is a genuine cross-engine check of the
    recurrence, the q_time_theta_forecast pattern.

    Headroom: z is a DAILY MEAN (bounded by the value domain ~5e6 fx,
    not the row count), P ≤ P₀+Q per step ≤ 1e5, so K·innovation stays
    ≤ 1e6·1e7 = 1e13 — inside both int64 and the exact-multiple 2^53
    double-division window at ANY corpus size.

    Scale shape: one map-side-combinable daily rollup, then a per-key
    F.aggregate fold over the CALENDAR-bounded array — one struct(x,P)
    accumulator, no per-row state, no driver loop."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT))"
            " DIV count(*) AS BIGINT)"
        ).alias("z")
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "z"))),
            lambda s: s["z"],
        ).alias("xs"),
        F.count("*").cast("long").alias("n_days"),
    )
    L = F.lit(1000000).cast("long")

    def _exact_div(num, den):
        # num is made an exact multiple of den, so the double division
        # is exact below 2^53 (the SES/theta idiom)
        return ((num - num % den) / den).cast("long")

    def _floor_div_signed(num, den_lit):
        return (
            (num - ((num % den_lit) + den_lit) % den_lit) / den_lit
        ).cast("long")

    def _step(acc, z):
        pp = acc["p"] + F.lit(10000).cast("long")
        k = _exact_div(pp * L, pp + F.lit(90000).cast("long"))
        num = k * (z - acc["x"])
        xn = acc["x"] + _floor_div_signed(num, L)
        pn = _exact_div((L - k) * pp, L)
        return F.struct(xn.alias("x"), pn.alias("p"))

    init = F.struct(
        F.element_at(F.col("xs"), 1).alias("x"),
        F.lit(90000).cast("long").alias("p"),
    )
    st = F.aggregate(
        F.slice(F.col("xs"), 2, F.size(F.col("xs")) - 1), init, _step
    )
    return (
        series.select(
            "event_type",
            "n_days",
            st["x"].alias("level_fx"),
            st["p"].alias("p_fx"),
            (st["x"] / 10000.0).alias("smoothed_mean"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q_privacy_t_closeness — ordered EMD between group and global sensitive dist
# ---------------------------------------------------------------------------


@query(
    "q_privacy_t_closeness",
    oracle="""
WITH sens AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS sens_bucket
  FROM customer
),
gdist AS (
  SELECT sens_bucket, CAST(count(*) AS BIGINT) AS t_b FROM sens GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(t_b) AS BIGINT) AS n_all,
         CAST(count(*) AS BIGINT) AS n_buckets
  FROM gdist
),
grp AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS k
  FROM sens GROUP BY 1, 2
),
cell AS (
  SELECT c_nationkey, c_mktsegment, sens_bucket,
         CAST(count(*) AS BIGINT) AS c_b
  FROM sens GROUP BY 1, 2, 3
),
grid AS (
  SELECT g.c_nationkey, g.c_mktsegment, g.k, gl.sens_bucket, gl.t_b,
         COALESCE(cell.c_b, 0) AS c_b
  FROM grp g CROSS JOIN gdist gl
  LEFT JOIN cell ON cell.c_nationkey = g.c_nationkey
   AND cell.c_mktsegment = g.c_mktsegment
   AND cell.sens_bucket = gl.sens_bucket
),
cums AS (
  SELECT c_nationkey, c_mktsegment, k, sens_bucket,
         CAST(SUM(c_b) OVER (PARTITION BY c_nationkey, c_mktsegment
              ORDER BY sens_bucket) AS BIGINT) AS c_cum,
         CAST(SUM(t_b) OVER (PARTITION BY c_nationkey, c_mktsegment
              ORDER BY sens_bucket) AS BIGINT) AS t_cum
  FROM grid
)
, emd AS (
  SELECT c.c_nationkey, c.c_mktsegment, CAST(MIN(c.k) AS BIGINT) AS k_anon,
         CAST(SUM(CASE WHEN c.c_cum * t.n_all >= c.t_cum * c.k
                       THEN c.c_cum * t.n_all - c.t_cum * c.k
                       ELSE c.t_cum * c.k - c.c_cum * t.n_all END)
              AS BIGINT) AS r_abs,
         CAST(MIN(c.k) * t.n_all * (t.n_buckets - 1) AS BIGINT) AS d_den
  FROM cums c CROSS JOIN tot t
  GROUP BY c.c_nationkey, c.c_mktsegment, t.n_all, t.n_buckets
)
SELECT c_nationkey, c_mktsegment, k_anon,
       CAST((r_abs * 1000 // d_den) * 1000
            + ((r_abs * 1000 % d_den) * 1000) // d_den AS BIGINT) AS emd_ppm,
       CAST(CASE WHEN (r_abs * 1000 // d_den) * 1000
                      + ((r_abs * 1000 % d_den) * 1000) // d_den <= 300000
                 THEN 1 ELSE 0 END AS BIGINT) AS ok_t03
FROM emd
ORDER BY c_nationkey, c_mktsegment
""",
)
def q_privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit per quasi-identifier group — the stricter
    sibling of q_privacy_l_diversity: a group can be l-diverse yet
    still leak (its sensitive distribution may be badly skewed vs the
    population), so t-closeness bounds the ORDERED earth-mover's
    distance between the group's sensitive-attribute distribution and
    the global one. For ordinal buckets EMD = Σ|cum_p − cum_q|/(B−1),
    computed here entirely in cross-multiplied integers
    (|c_cum·N − t_cum·k| avoids normalizing divisions until the one
    final ppm division), with absent buckets zero-filled via a
    group×bucket grid so the cumulative walk is complete. ok_t03 flags
    groups within the conventional t = 0.3. The ppm scaling is STAGED
    (r10 advice: the old SUM(diff)·1e6 needed B·k·N·1e6 ≤ 9.2e18, i.e.
    k·N ≲ 6e11 — breached near TPC-H sf≥50, where Spark's non-ANSI
    int64 silently wraps while DuckDB errors): EMD ≤ 1 guarantees
    R = Σdiff ≤ D = k·N·(B−1), so ⌊R·1e6/D⌋ =
    (R·1e3 div D)·1e3 + ((R·1e3 mod D)·1e3 div D) exactly, and every
    intermediate stays ≤ D·1e3. Headroom: per-term c_cum·N ≤ k·N ≤
    9.2e18, staged terms need k·N·(B−1) ≤ 9.2e15 → k·N ≤ 6e14 at
    B≈15 — sf≈1,900 (~190 TB) at this QI grain, vs sf≈50 before;
    beyond that, pre-divide the bucket counts or widen to DECIMAL.

    Scale shape: two map-side-combinable rollups (cell, group) plus
    the FIXED global bucket table (broadcast, ≤ a dozen rows); the
    grid and its per-group cumulative windows live at |QI|×|buckets|
    grain — bounded by the attribute domains, never the row count."""
    cust = load_table(spark, sf_dir, "customer")
    sens = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("sens_bucket"),
    )
    glob = sens.groupBy("sens_bucket").agg(
        F.count("*").cast("long").alias("t_b")
    )
    tot = glob.agg(
        F.sum("t_b").cast("long").alias("n_all"),
        F.count("*").cast("long").alias("n_buckets"),
    )
    grp = sens.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("k")
    )
    cell = sens.groupBy("c_nationkey", "c_mktsegment", "sens_bucket").agg(
        F.count("*").cast("long").alias("c_b")
    )
    grid = (
        grp.crossJoin(F.broadcast(glob))
        .join(
            cell,
            ["c_nationkey", "c_mktsegment", "sens_bucket"],
            "left",
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k",
            "sens_bucket",
            "t_b",
            F.coalesce(F.col("c_b"), F.lit(0)).cast("long").alias("c_b"),
        )
    )
    wq = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        "sens_bucket"
    ).rowsBetween(Window.unboundedPreceding, 0)
    cums = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "k",
        "sens_bucket",
        F.sum("c_b").over(wq).cast("long").alias("c_cum"),
        F.sum("t_b").over(wq).cast("long").alias("t_cum"),
    )
    diff = F.expr(
        "CASE WHEN c_cum * n_all >= t_cum * k"
        " THEN c_cum * n_all - t_cum * k"
        " ELSE t_cum * k - c_cum * n_all END"
    )
    return (
        cums.crossJoin(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment", "n_all", "n_buckets")
        .agg(
            F.min("k").cast("long").alias("k_anon"),
            F.sum(diff).cast("long").alias("r_abs"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k_anon",
            "r_abs",
            F.expr(
                "CAST(k_anon * n_all * (n_buckets - 1) AS BIGINT)"
            ).alias("d_den"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k_anon",
            F.expr(
                "CAST((r_abs * 1000 DIV d_den) * 1000"
                " + ((r_abs * 1000 % d_den) * 1000) DIV d_den AS BIGINT)"
            ).alias("emd_ppm"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k_anon",
            "emd_ppm",
            F.when(F.col("emd_ppm") <= 300000, 1)
            .otherwise(0)
            .cast("long")
            .alias("ok_t03"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q_sample_neyman_allocation — variance-optimal stratified sample sizes
# ---------------------------------------------------------------------------

_NEYMAN_N = 100


@query(
    "q_sample_neyman_allocation",
    oracle=f"""
WITH strata AS (
  SELECT c_mktsegment AS stratum,
         CAST(count(*) AS BIGINT) AS n_h,
         CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS s1,
         CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
                  * CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS s2
  FROM customer GROUP BY 1
),
sd AS (
  SELECT stratum, n_h,
         CAST(FLOOR(SQRT(GREATEST(s2 / CAST(n_h AS DOUBLE)
              - (s1 / CAST(n_h AS DOUBLE))
                * (s1 / CAST(n_h AS DOUBLE)), 0.0))) AS BIGINT) AS s_c
  FROM strata
),
tot AS (
  SELECT CAST(SUM(n_h) AS BIGINT) AS n_pop,
         CAST(SUM(n_h * s_c) AS BIGINT) AS sum_ns
  FROM sd
)
SELECT sd.stratum, sd.n_h, sd.s_c,
       CAST({_NEYMAN_N} * sd.n_h * sd.s_c // t.sum_ns AS BIGINT)
         AS neyman_n,
       CAST({_NEYMAN_N} * sd.n_h // t.n_pop AS BIGINT) AS proportional_n
FROM sd CROSS JOIN tot t
ORDER BY sd.stratum
""",
)
def q_sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (variance-optimal) stratified-sample allocation over the
    customer segments: for a fixed budget n, sample n_h ∝ N_h·S_h —
    strata that are BIG or VOLATILE get more budget, which minimizes
    the variance of the stratified mean estimator; the proportional
    allocation (n_h ∝ N_h) is emitted beside it as the naive baseline.
    The survey-sampling DESIGN step in front of q_sample_stratified's
    md5-bucket EXECUTION step. Determinism: the population sd per
    stratum is computed from integer moments (cents); the moments are
    exact in int64 but s2 exceeds 2^53 at even modest strata, so the
    long→double conversion and the variance cancellation are ROUNDED —
    the guarantee is identical IEEE operations in both engines (same
    conversion, same division, same correctly-rounded sqrt), not exact
    arithmetic (r10 advice softening). The variance argument is
    clamped at 0 (GREATEST) so a near-zero-variance stratum whose
    cancellation lands epsilon-negative pins to s_c = 0 in both
    engines instead of Spark NaN vs DuckDB error; the result is
    floored straight back to an integer cents scale before the exact
    integer allocation arithmetic.

    Scale shape: one map-side-combinable moments rollup to |strata|
    rows; everything after runs on the bounded strata table. Headroom:
    Σy² in cents² reaches int64 limits near 1e9 rows per stratum at
    this value domain — shard-and-merge the moments (they add) before
    that."""
    cust = load_table(spark, sf_dir, "customer")
    y = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    strata = cust.groupBy(F.col("c_mktsegment").alias("stratum")).agg(
        F.count("*").cast("long").alias("n_h"),
        F.sum(y).cast("long").alias("s1"),
        F.sum(y * y).cast("long").alias("s2"),
    )
    sd = strata.select(
        "stratum",
        "n_h",
        F.floor(
            F.sqrt(
                F.greatest(
                    F.col("s2") / F.col("n_h").cast("double")
                    - (F.col("s1") / F.col("n_h").cast("double"))
                    * (F.col("s1") / F.col("n_h").cast("double")),
                    F.lit(0.0),
                )
            )
        )
        .cast("long")
        .alias("s_c"),
    )
    tot = sd.agg(
        F.sum("n_h").cast("long").alias("n_pop"),
        F.sum(F.col("n_h") * F.col("s_c")).cast("long").alias("sum_ns"),
    )
    return (
        sd.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_h",
            "s_c",
            F.expr(
                f"CAST({_NEYMAN_N} * n_h * s_c DIV sum_ns AS BIGINT)"
            ).alias("neyman_n"),
            F.expr(
                f"CAST({_NEYMAN_N} * n_h DIV n_pop AS BIGINT)"
            ).alias("proportional_n"),
        )
        .orderBy("stratum")
    )


# ---------------------------------------------------------------------------
# q_privacy_dp_noisy_count — seeded-Laplace differentially-private release
# ---------------------------------------------------------------------------

# 2^52 as a double divisor: a power of two, so u = h / 2^52 is EXACT
# (no rounding), and identical in both engines.
_DP_POW52 = "4503599627370496.0"


@query(
    "q_privacy_dp_noisy_count",
    oracle=f"""
WITH g AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(count(*) AS BIGINT) AS true_cnt
  FROM events GROUP BY 1, 2
),
u AS (
  SELECT event_type, day, true_cnt,
         CAST(('0x' || substring(md5('dp:' || event_type || ':'
              || CAST(CAST(day AS DATE) AS VARCHAR)), 1, 13)) AS BIGINT)
           / {_DP_POW52} AS uu
  FROM g
),
lap AS (
  SELECT event_type, day, true_cnt,
         CASE WHEN uu >= 0.5 THEN -1 ELSE 1 END AS sgn,
         CAST(FLOOR(ln(CASE WHEN uu >= 0.5 THEN 2 * (1 - uu)
                            ELSE 2 * uu END) * 1000000) AS BIGINT)
           AS lnterm_fx
  FROM u
)
SELECT event_type, day, true_cnt,
       CAST(-sgn * lnterm_fx AS BIGINT) AS noise_fx,
       CAST(true_cnt * 1000000 - sgn * lnterm_fx AS BIGINT)
         AS noisy_cnt_fx,
       (true_cnt * 1000000 - sgn * lnterm_fx) / 1000000.0 AS noisy_cnt
FROM lap ORDER BY event_type, day
""",
)
def q_privacy_dp_noisy_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Laplace mechanism, ε = 1,
    sensitivity 1) over the per-type daily event counts — the fourth
    member of the privacy family: k-anonymity bounds re-identification,
    l-diversity and t-closeness bound attribute disclosure, and DP
    bounds what ANY release reveals about one row. Noise is Laplace(1/ε)
    via the inverse CDF −sgn(u−½)·ln(1−2|u−½|) with u drawn from a
    SEEDED md5 of the group key — deterministic for the cross-engine
    check (a production release would use a fresh secret seed per
    release and project away true_cnt; both are emitted here because
    the correctness gate needs the truth beside the mechanism).
    Determinism chain: the 52-bit hash is exact in int64 and double,
    u = h/2^52 divides by a power of two (exact), the CASE folds to an
    exact double, and ln lands in the ⌊ln·1e6⌋ fixed-point idiom the
    bigram-LM oracle established — one transcendental per GROUP (a few
    hundred calendar cells), never per row.

    Scale shape: ONE map-side-combinable rollup to the calendar-bounded
    (type, day) grid; the mechanism is a pure projection on the grid
    rows. This is the standard shape of a DP telemetry release at any
    corpus size — the noise cost is O(cells), the scan cost O(rows)."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("long").alias("true_cnt"))
    u = g.select(
        "event_type",
        "day",
        "true_cnt",
        (
            F.expr(
                "CAST(conv(substr(md5(concat('dp:', event_type, ':',"
                " CAST(CAST(day AS DATE) AS STRING))), 1, 13), 16, 10) AS BIGINT)"
            )
            / F.lit(4503599627370496.0)
        ).alias("uu"),
    )
    lap = u.select(
        "event_type",
        "day",
        "true_cnt",
        F.when(F.col("uu") >= 0.5, -1).otherwise(1).alias("sgn"),
        F.floor(
            F.log(
                F.when(F.col("uu") >= 0.5, 2 * (1 - F.col("uu"))).otherwise(
                    2 * F.col("uu")
                )
            )
            * 1000000
        )
        .cast("long")
        .alias("lnterm_fx"),
    )
    return lap.select(
        "event_type",
        "day",
        "true_cnt",
        (-F.col("sgn") * F.col("lnterm_fx")).cast("long").alias("noise_fx"),
        (F.col("true_cnt") * 1000000 - F.col("sgn") * F.col("lnterm_fx"))
        .cast("long")
        .alias("noisy_cnt_fx"),
        (
            (F.col("true_cnt") * 1000000 - F.col("sgn") * F.col("lnterm_fx"))
            / 1000000.0
        ).alias("noisy_cnt"),
    ).orderBy("event_type", "day")
