"""Deduplication operators for LLM training-data pipelines
(SURVEY.md §2.11, mandated by BASELINE.json:6).

Tiers:
- exact dedup — hash-groupBy on the full text (or its digest): one
  shuffle keyed by text hash; at 100 TB group on ``xxhash64(text)``
  (8 bytes) instead of the text itself to shrink the shuffle
- n-gram Jaccard near-dup — exact pair detection, blocked by language
  so the self-join is |lang-group|² not |corpus|²; oracle-checked
- MinHash + LSH near-dup — the scale path: signature = per-permutation
  min of seeded xxhash64 over shingles, banded into buckets, candidate
  pairs only within a bucket (shuffle ∝ corpus × bands, never ²);
  hash seeds are engine-specific → rows-only check
- SimHash — 64-bit bit-vote fingerprint, Hamming-adjacent buckets;
  rows-only for the same reason
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query


@query(
    "q_dedup_exact",
    oracle="""
SELECT min(doc_id) AS keep_doc_id,
       count(*) AS n_copies,
       md5(text) AS text_md5
FROM documents
GROUP BY text
ORDER BY keep_doc_id
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per identical text. The groupBy
    key in the plan is the text digest, so the shuffle carries 16-byte
    keys, not documents."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies", "text_md5")
        .orderBy("keep_doc_id")
    )


def shingles(text_col, n: int = 3):
    """Word n-gram shingle array (distinct, sorted) from a text column."""
    toks = F.split(text_col, " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.sort_array(F.array_distinct(grams))


@query(
    "q_dedup_ngram_jaccard",
    oracle="""
WITH sh AS (
  SELECT doc_id, lang,
         list_sort(list_distinct(
           list_transform(
             range(len(string_split(text,' ')) - 2),
             i -> array_to_string(string_split(text,' ')[i+1:i+3], ' ')
           ))) AS grams
  FROM documents
  WHERE len(string_split(text,' ')) >= 3
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
         AS jaccard
FROM sh a JOIN sh b
  ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
      >= 0.5
ORDER BY doc_a, doc_b
""",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (≥0.5), blocked by language.

    Blocking bounds the self-join to per-language groups; at 100 TB you'd
    block further (length band, source) or switch to the MinHash path
    below. |A∩B| / |A∪B| computed on distinct shingle sets.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    )
    sh = d.select("doc_id", "lang", shingles(F.col("text")).alias("grams"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = (
        F.size(F.col("a.grams")) + F.size(F.col("b.grams")) - inter
    )
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


N_PERM = 32  # minhash permutations
N_BANDS = 8  # → 4 rows per band; P(candidate) = 1-(1-j^4)^8


def minhash_signature(grams_col, n_perm: int = N_PERM):
    """MinHash signature: per-seed minimum of seeded xxhash64 over shingles."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    grams_col,
                    lambda g: F.xxhash64(g, F.lit(seed)),
                )
            )
            for seed in range(n_perm)
        ]
    )


@query("q_dedup_minhash_lsh")  # hash-seed-dependent → rows-only
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup pairs — the 100 TB dedup path.

    shingle → 32-permutation minhash → 8 bands of 4 → explode bands →
    groupBy band bucket self-join (only within-bucket candidates) →
    verify with exact Jaccard ≥ 0.5. Shuffle volume is corpus × 8 band
    keys; the quadratic blowup only happens inside tiny buckets.
    Emits the same columns as the exact-Jaccard query for comparison.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    )
    sh = d.select("doc_id", shingles(F.col("text")).alias("grams"))
    sig = sh.select(
        "doc_id", "grams", minhash_signature(F.col("grams")).alias("sig")
    )
    rows_per_band = N_PERM // N_BANDS
    banded = sig.select(
        "doc_id",
        "grams",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.hash(
                            *[
                                F.element_at("sig", i * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "grams", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.grams").alias("grams_a"),
            F.col("b.grams").alias("grams_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size("grams_a") + F.size("grams_b") - inter
    jac = inter.cast("double") / union
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


@query("q_dedup_simhash")  # engine-native hash bits → rows-only
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints: per-token xxhash64, bit-position vote, 64-bit
    fingerprint reassembled from the vote signs; near-dup candidates share
    a 16-bit prefix block (Hamming-style blocking). Entirely built-in
    expressions — no Python in the loop."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).withColumn("h", F.xxhash64("token"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    voted = tok.groupBy("doc_id").agg(*votes)
    fp = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return (
        voted.select("doc_id", fp.alias("simhash"))
        .withColumn("block16", F.shiftrightunsigned(F.col("simhash"), 48))
        .orderBy("doc_id")
    )
