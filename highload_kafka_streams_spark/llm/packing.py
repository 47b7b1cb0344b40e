"""Training-data sharding & passage-level dedup (SURVEY.md §2.11).

Three pipeline stages a 100 TB pre-training corpus needs between
"cleaned documents" and "training shards":

- **Shard packing** — assign documents to fixed-token-budget shards in a
  stable global order. The semantics are a global prefix sum; the naive
  Spark form (one window over ``ORDER BY doc_id`` with no partition key)
  funnels the whole corpus through a single task. We compute it as a
  *distributed* prefix sum instead: per-bucket partial sums, a tiny
  bucket-offset window, and a within-bucket window — the classic
  two-pass scan, all in DataFrame ops.
- **Passage (chunk) dedup** — exact dedup at sub-document granularity:
  fixed-size word chunks, hashed, counted across documents. Shuffles
  16-byte digests, never chunk text.
- **Boilerplate fraction** — per-document share of chunks that are
  duplicated elsewhere in the corpus; documents dominated by shared
  passages get flagged for removal.
- **Corpus shuffle** — a deterministic global permutation (training
  order) as a distributed row_number over md5(doc_id) order: the hash
  prefix IS the bucket, so bucket order + within-bucket order compose
  into the exact global hash order without a single-task window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query

# Words per passage chunk. Small enough that a shared near-dup span
# yields several matching chunks, large enough that chance collisions
# are negligible.
CHUNK_WORDS = 8

# Documents per prefix-sum bucket. The bucket table (``N / BUCKET_DOCS``
# rows) must stay small enough for a single-partition window — at test
# scale 64 exercises the multi-bucket path; at 100 TB you would raise it
# so the bucket table stays ~1e5 rows (it only carries two longs/row).
BUCKET_DOCS = 64

# Token budget per training shard.
SHARD_TOKENS = 2000

# Hex chars of the md5 prefix used as the shuffle bucket: 2 → 256
# buckets (plenty at test scale); at 100 TB use 4 (65 536 buckets) so
# each bucket's window task holds ~corpus/65k rows. Uniform by
# construction — md5 prefixes don't skew.
SHUFFLE_PREFIX_HEX = 2

# Documents per output training file in the shuffled order.
SHUFFLE_FILE_DOCS = 128


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) with whitespace tokenization, long-typed."""
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )


def pack_shards(
    docs: DataFrame,
    budget: int = SHARD_TOKENS,
    bucket_docs: int = BUCKET_DOCS,
) -> DataFrame:
    """Assign each document a shard id = floor(prefix_tokens / budget)
    in global doc_id order, via a distributed two-pass prefix sum.

    Pass 1 groups on ``bucket = doc_id div bucket_docs`` (monotonic in
    doc_id, so bucket order == doc order) and sums tokens per bucket;
    the unpartitioned window runs over that tiny table only. Pass 2
    broadcasts the offsets back and finishes with a window partitioned
    by bucket — per-task work is bounded by bucket size, not corpus
    size. All arithmetic stays integral (``div``, never ``/``) so the
    result is exact past 2^53 tokens.
    """
    toks = token_counts(docs).withColumn(
        "bucket", F.expr(f"doc_id div {int(bucket_docs)}")
    )
    bucket_offsets = (
        toks.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("bucket_tokens"))
        .withColumn(
            "bucket_offset",
            F.coalesce(
                F.sum("bucket_tokens").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("bigint"),
            ),
        )
        .select("bucket", "bucket_offset")
    )
    within = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        toks.join(F.broadcast(bucket_offsets), "bucket")
        .withColumn(
            "cum_before",
            F.col("bucket_offset")
            + F.sum("n_tokens").over(within)
            - F.col("n_tokens"),
        )
        .withColumn(
            "shard_id",
            F.expr(f"CAST(cum_before div {int(budget)} AS BIGINT)"),
        )
        .select("doc_id", "n_tokens", "shard_id")
    )


@query(
    "q_shard_packing",
    oracle=f"""
WITH toks AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM toks
)
SELECT CAST(cum_before // {SHARD_TOKENS} AS BIGINT) AS shard_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM cum
GROUP BY 1
ORDER BY shard_id
""",
)
def q_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing summary. The oracle states the
    semantics as the single global window; the engine computes the same
    prefix sum distributed (see :func:`pack_shards`)."""
    d = load_table(spark, sf_dir, "documents")
    packed = pack_shards(d)
    return (
        packed.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard_id")
    )


def shuffle_positions(
    docs: DataFrame, prefix_hex: int = SHUFFLE_PREFIX_HEX
) -> DataFrame:
    """(doc_id, pos) — the document's 0-based position in a
    deterministic global shuffle ordered by ``(md5(doc_id), doc_id)``.

    A naive ``row_number() OVER (ORDER BY md5(...))`` funnels the corpus
    through one task. Instead the hash's own prefix partitions the sort:
    md5 strings are fixed-length lowercase hex, so lexicographic order
    over the full digest equals (numeric prefix order, then full-digest
    order within a prefix). Per-bucket counts give exact global offsets
    via a window over the tiny 16^prefix_hex-row bucket table; a
    within-bucket row_number finishes the permutation. Every stage's
    per-task work is bounded by bucket size.
    """
    keyed = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.md5(F.col("doc_id").cast("string")).alias("skey"),
    ).withColumn(
        "bucket",
        F.conv(F.substring("skey", 1, int(prefix_hex)), 16, 10).cast("bigint"),
    )
    offsets = (
        keyed.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("bigint"),
            ),
        )
        .select("bucket", "offset")
    )
    rn = F.row_number().over(
        Window.partitionBy("bucket").orderBy("skey", "doc_id")
    )
    return (
        keyed.join(F.broadcast(offsets), "bucket")
        .withColumn("pos", (F.col("offset") + rn - F.lit(1)).cast("bigint"))
        .select("doc_id", "pos")
    )


@query(
    "q_corpus_shuffle",
    oracle=f"""
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(ROW_NUMBER() OVER (
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) - 1 AS BIGINT) AS pos
  FROM documents
)
SELECT doc_id, pos,
       CAST(pos // {SHUFFLE_FILE_DOCS} AS BIGINT) AS out_file
FROM p
ORDER BY doc_id
""",
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pre-training corpus shuffle: every document's
    global position and output-file assignment. The oracle states the
    semantics as one global window; the engine computes the identical
    permutation distributed (see :func:`shuffle_positions`)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        shuffle_positions(d)
        .select(
            "doc_id",
            "pos",
            F.expr(f"CAST(pos div {SHUFFLE_FILE_DOCS} AS BIGINT)").alias(
                "out_file"
            ),
        )
        .orderBy("doc_id")
    )


def doc_chunks(docs: DataFrame, chunk_words: int = CHUNK_WORDS) -> DataFrame:
    """(doc_id, chunk_hash) — md5 digests of fixed-size word chunks.

    ``toks`` is materialized as a projected column BEFORE the transform
    lambda (HOF lambda bodies re-evaluate outer expressions per element;
    see llm/dedup.py:54's measured note), and only the 16-byte digest
    leaves the map stage.
    """
    k = int(chunk_words)
    staged = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.split(F.col("text"), " ").alias("toks"),
    )
    n_chunks = F.expr(f"CAST(ceil(size(toks) / {k}.0) AS INT)")
    idx = F.sequence(F.lit(0), n_chunks - F.lit(1))
    hashes = F.transform(
        idx,
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(F.col("toks"), i * k + 1, k))
        ),
    )
    return staged.select("doc_id", F.explode(hashes).alias("chunk_hash"))


@query(
    "q_dedup_chunks",
    oracle=f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         string_split(text, ' ') AS toks
  FROM documents
),
c AS (
  SELECT doc_id,
         md5(array_to_string(
           toks[i*{CHUNK_WORDS}+1 : i*{CHUNK_WORDS}+{CHUNK_WORDS}], ' '
         )) AS chunk_hash
  FROM t, unnest(generate_series(
    0, CAST(ceil(len(toks) / {CHUNK_WORDS}.0) AS BIGINT) - 1)) AS u(i)
)
SELECT chunk_hash,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occurrences
FROM c
GROUP BY chunk_hash
HAVING count(DISTINCT doc_id) >= 2
ORDER BY chunk_hash
""",
)
def q_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup: fixed-size word chunks shared by two
    or more documents. Grouping key is the md5 digest, so the shuffle
    carries 16 bytes per chunk regardless of chunk text size."""
    d = load_table(spark, sf_dir, "documents")
    return (
        doc_chunks(d)
        .groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("chunk_hash")
    )


@query(
    "q_text_boilerplate",
    oracle=f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         string_split(text, ' ') AS toks
  FROM documents
),
c AS (
  SELECT doc_id,
         md5(array_to_string(
           toks[i*{CHUNK_WORDS}+1 : i*{CHUNK_WORDS}+{CHUNK_WORDS}], ' '
         )) AS chunk_hash
  FROM t, unnest(generate_series(
    0, CAST(ceil(len(toks) / {CHUNK_WORDS}.0) AS BIGINT) - 1)) AS u(i)
),
shared AS (
  SELECT chunk_hash FROM c GROUP BY chunk_hash
  HAVING count(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT c.doc_id,
         count(*) AS n_chunks,
         count(*) FILTER (WHERE s.chunk_hash IS NOT NULL) AS n_shared
  FROM c LEFT JOIN shared s ON c.chunk_hash = s.chunk_hash
  GROUP BY c.doc_id
)
SELECT doc_id, n_chunks, n_shared,
       round(CAST(n_shared AS DOUBLE) / n_chunks, 9) AS boiler_ratio,
       n_shared * 2 >= n_chunks AS is_boiler_heavy
FROM per_doc
WHERE n_shared > 0
ORDER BY doc_id
""",
)
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate fraction: share of a document's chunks
    that also appear in other documents; docs where shared passages are
    at least half the text get flagged. The shared-chunk set is the
    duplicate inventory from :func:`q_dedup_chunks` — small by
    construction, broadcast back onto the chunk stream."""
    d = load_table(spark, sf_dir, "documents")
    chunks = doc_chunks(d)
    shared = (
        chunks.groupBy("chunk_hash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("chunk_hash")
    )
    per_doc = (
        chunks.join(
            F.broadcast(shared.withColumn("hit", F.lit(1))),
            "chunk_hash",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count("hit").alias("n_shared"),
        )
        .filter(F.col("n_shared") > 0)
    )
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_shared",
        F.round(
            F.col("n_shared").cast("double") / F.col("n_chunks"), 9
        ).alias("boiler_ratio"),
        (F.col("n_shared") * 2 >= F.col("n_chunks")).alias("is_boiler_heavy"),
    ).orderBy("doc_id")
