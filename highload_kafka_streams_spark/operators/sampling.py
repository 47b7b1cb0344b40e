"""Deterministic sampling & dataset splitting.

`df.sample()` is per-partition seeded — its output changes with the
partitioning, which silently breaks reproducibility at scale (AQE remap,
repartition, retry). Training pipelines need CONTENT-keyed sampling:
hash a stable key, bucket by the hash, select buckets. Same row → same
split on any cluster layout, any engine (md5 is portable, so the split
itself is oracle-checkable — the property that lets a 100 TB corpus be
re-split identically by a different system).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query

N_BUCKETS = 4096  # 3 hex chars of md5


def hash_bucket(key: Column) -> Column:
    """Stable [0, 4096) bucket from the md5 of a key column."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 3), 16, 10
    ).cast("int")


def split_corpus(
    df: DataFrame, key: str, holdout_fraction: float = 0.05
) -> DataFrame:
    """Adds a deterministic `split` column: 'holdout' for the first
    `holdout_fraction` of hash buckets, 'train' otherwise."""
    cut = int(N_BUCKETS * holdout_fraction)
    return df.withColumn(
        "split",
        F.when(hash_bucket(F.col(key)) < cut, "holdout").otherwise("train"),
    )


@query(
    "q_split_train_holdout",
    oracle="""
WITH b AS (
  SELECT doc_id, lang,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 3)) AS BIGINT)
           AS bucket
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < 204 THEN 'holdout' ELSE 'train' END AS split,
       count(*) AS n_docs,
       min(doc_id) AS min_doc_id
FROM b
GROUP BY 1, 2
ORDER BY lang, split
""",
)
def q_split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~5% content-keyed holdout split of the corpus, counted per
    language — identical assignment under any partitioning/engine
    (204/4096 ≈ 4.98%)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        split_corpus(d, "doc_id", holdout_fraction=204 / 4096)
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .orderBy("lang", "split")
    )


@query(
    "q_fn_bitwise",
    oracle="""
SELECT n_nationkey,
       n_nationkey & 12 AS b_and,
       n_nationkey | 5 AS b_or,
       xor(CAST(n_nationkey AS BIGINT), 21) AS b_xor,
       n_nationkey << 3 AS b_shl,
       n_nationkey >> 1 AS b_shr,
       ~n_nationkey AS b_not,
       bit_count(CAST(n_nationkey AS BIGINT)) AS b_pop
FROM nation
ORDER BY n_nationkey
""",
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family — the mask/flag arithmetic KS apps do in
    mapValues lambdas (and this engine's own LSH banding uses)."""
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        k.bitwiseAND(F.lit(12)).alias("b_and"),
        k.bitwiseOR(F.lit(5)).alias("b_or"),
        k.cast("long").bitwiseXOR(F.lit(21)).alias("b_xor"),
        F.shiftleft(k, 3).alias("b_shl"),
        F.shiftright(k, 1).alias("b_shr"),
        F.expr("~n_nationkey").alias("b_not"),
        F.bit_count(k.cast("long")).alias("b_pop"),
    ).orderBy("n_nationkey")


@query(
    "q_sample_stratified",
    oracle="""
WITH b AS (
  SELECT doc_id, lang,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 3)) AS BIGINT)
           AS bucket
  FROM documents
),
kept AS (
  SELECT * FROM b
  WHERE bucket < CASE WHEN lang = 'en' THEN 410 ELSE 2048 END
)
SELECT lang, count(*) AS n_kept, min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM kept
GROUP BY lang
ORDER BY lang
""",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-class rates (en ≈10%, everything
    else ≈50% — the rebalance a skewed multilingual corpus needs before
    training). Content-keyed md5 buckets, NOT ``sampleBy``: Spark's
    sampler is per-partition seeded, so its output changes under AQE
    re-planning / retries; hash-bucket selection is identical on any
    cluster layout and any engine (410/4096 ≈ 10.0%, 2048/4096 = 50%)."""
    d = load_table(spark, sf_dir, "documents")
    keep_cut = F.when(F.col("lang") == "en", 410).otherwise(2048)
    return (
        d.withColumn("bucket", hash_bucket(F.col("doc_id")))
        .filter(F.col("bucket") < keep_cut)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang")
    )


def mixture_balance_cuts(df: DataFrame, class_col: str) -> DataFrame:
    """(class, n_docs, cut) — per-class hash-bucket cutoffs that
    downsample every class toward the smallest class's size.

    ``cut = floor(N_BUCKETS * min_n / n_class)`` keeps ~min_n documents
    of each class (the smallest class keeps everything, cut=N_BUCKETS).
    Rates are DERIVED from corpus statistics — one cheap single-column
    aggregation — then broadcast back; the corpus itself is never
    shuffled and the kept-set is reproducible under any partitioning.
    This is the scale form of mixture rebalancing: an exact-k variant
    would need a per-class global rank (a skew-prone shuffle of the
    whole corpus when classes are few); hash-rate selection is
    embarrassingly parallel and deterministic, at the cost of keeping
    ~min_n rather than exactly min_n per class.
    """
    counts = df.groupBy(class_col).agg(F.count("*").alias("n_docs"))
    mn = counts.agg(F.min("n_docs").alias("mn"))
    return (
        counts.crossJoin(F.broadcast(mn))
        .withColumn(
            "cut", F.expr(f"CAST(({N_BUCKETS} * mn) div n_docs AS BIGINT)")
        )
        .select(class_col, "n_docs", "cut")
    )


@query(
    "q_sample_mixture_balance",
    oracle=f"""
WITH c AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
),
r AS (
  SELECT source, n_docs,
         CAST(({N_BUCKETS} * (SELECT min(n_docs) FROM c)) // n_docs
              AS BIGINT) AS cut
  FROM c
),
b AS (
  SELECT d.doc_id, d.source,
         CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 3))
              AS BIGINT) AS bucket
  FROM documents d
)
SELECT r.source, r.n_docs, r.cut,
       count(*) FILTER (WHERE b.bucket < r.cut) AS n_kept,
       min(b.doc_id) FILTER (WHERE b.bucket < r.cut) AS min_kept_doc
FROM b JOIN r USING (source)
GROUP BY r.source, r.n_docs, r.cut
ORDER BY r.source
""",
)
def q_sample_mixture_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing: derive per-source sampling rates from the
    corpus's own source distribution (downsample toward the smallest
    source), apply them content-keyed, report kept counts per source."""
    d = load_table(spark, sf_dir, "documents")
    cuts = mixture_balance_cuts(d, "source")
    kept = F.col("bucket") < F.col("cut")
    return (
        d.withColumn("bucket", hash_bucket(F.col("doc_id")).cast("bigint"))
        .join(F.broadcast(cuts), "source")
        .groupBy("source", "n_docs", "cut")
        .agg(
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.min(F.when(kept, F.col("doc_id"))).alias("min_kept_doc"),
        )
        .orderBy("source")
    )


@query(
    "q_sample_temperature",
    oracle="""
WITH c AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
),
t AS (SELECT SUM(n_docs) AS n_total FROM c),
w AS (
  SELECT lang, n_docs, n_total,
         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE) / n_total) * 1000000 + 0.5)
              AS BIGINT) AS w6
  FROM c, t
),
s AS (SELECT SUM(w6) AS w6_sum FROM w)
SELECT lang, n_docs, w6,
       CAST(w6 AS DOUBLE) / w6_sum AS p_sample,
       (CAST(w6 AS DOUBLE) / w6_sum)
         / (CAST(n_docs AS DOUBLE) / n_total) AS boost
FROM w, s
ORDER BY lang
""",
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened sampling weights per language — the
    multilingual-corpus rebalance (sample class i with p_i ∝ f_i^α,
    α = 0.5): high-resource languages are down-weighted, low-resource
    up-weighted (`boost` > 1), without ever reaching uniform.

    α is fixed at 1/2 so the exponentiation is `sqrt`, which IEEE-754
    requires to be correctly rounded — bit-identical in Spark (JVM) and
    DuckDB (libm), unlike `pow(x, 0.7)` whose last ulp is libm-specific.
    The weight normalization sums fixed-point integers (order-free), and
    the final probabilities divide exact integers, so every output
    double is deterministic cross-engine.

    Plan: one shuffle for the per-class count (map-side combined to
    |classes| rows); the totals are single-row broadcasts. At 100 TB
    the heavy input pass is the count — everything after it is
    driver-free arithmetic on a classes-sized table; the weights then
    drive `sample_stratified`-style md5-bucket cuts."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("n_total"))
    w = (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "w6",
            F.floor(
                F.sqrt(F.col("n_docs").cast("double") / F.col("n_total"))
                * 1000000
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    wsum = w.agg(F.sum("w6").alias("w6_sum"))
    return (
        w.crossJoin(F.broadcast(wsum))
        .select(
            "lang",
            "n_docs",
            "w6",
            (F.col("w6").cast("double") / F.col("w6_sum")).alias("p_sample"),
            (
                (F.col("w6").cast("double") / F.col("w6_sum"))
                / (F.col("n_docs").cast("double") / F.col("n_total"))
            ).alias("boost"),
        )
        .orderBy("lang")
    )


@query(
    "q_sample_cap_per_source",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, lang,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
SELECT doc_id, source, lang FROM ranked WHERE rk <= 15
ORDER BY source, doc_id
""",
)
def q_sample_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the anti-domination rule every
    crawl-derived corpus applies (no single domain may contribute more
    than K docs). Selection order is md5(doc_id): content-keyed and
    therefore reproducible under any partitioning or cluster layout —
    never `ORDER BY random()`, and never first-K-in-partition-order,
    both of which change between runs.

    Plan: one shuffle on source, one window pass, filter. Skew note:
    a monster domain makes one partition hot; at 100 TB you pre-filter
    with an approximate per-source count and salt only the offenders —
    the exact top-K-by-hash semantics are unchanged because the
    md5 order is global per source."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "source", "lang")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 15)
        .select("doc_id", "source", "lang")
        .orderBy("source", "doc_id")
    )
