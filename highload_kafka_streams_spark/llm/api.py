"""Public API for the LLM-data-pipeline operators — reusable functions
over arbitrary DataFrames (the registered ``queries()`` are thin
fixture-bound wrappers around these).

Data contracts:
- text corpus frames: ``(doc_id: long, text: string)`` + any extra cols
- embedding frames: ``(vec_id: long, label: int, embedding: array<float>)``

Everything here follows the engine's scale rules: no driver-side data,
narrow shuffles, deterministic hashing (safe under task retries),
Arrow-batched Python only where built-ins can't express the kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from highload_kafka_streams_spark.llm.dedup import (  # noqa: F401
    minhash_near_duplicates,
    minhash_signatures,
    shingles,
)
from highload_kafka_streams_spark.llm.multimodal import (  # noqa: F401
    with_blob_column,
)
from highload_kafka_streams_spark.llm.similarity import (  # noqa: F401
    cosine,
    cosine_top_k,
    fdot,
)
from highload_kafka_streams_spark.operators.joins import asof_join  # noqa: F401
from highload_kafka_streams_spark.operators.skew import (  # noqa: F401
    salted_agg_sum,
    salted_join,
)


def exact_duplicates(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """(keep_doc_id, n_copies, text_md5) — one row per distinct text,
    keeping the lowest doc_id. Shuffle key is the 16-byte digest."""
    return (
        corpus.groupBy(F.md5(text_col).alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies", "text_md5")
    )


def drop_exact_duplicates(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus with one survivor (lowest doc_id) per distinct text."""
    keep = exact_duplicates(corpus, text_col).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    return corpus.join(keep, "doc_id", "left_semi")


def token_stats(corpus: DataFrame, min_tf: int = 1) -> DataFrame:
    """(token, tf, df) corpus term/document frequencies via two-level agg."""
    toks = corpus.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    per_doc = toks.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    return (
        per_doc.groupBy("token")
        .agg(F.sum("c").alias("tf"), F.count("*").alias("df"))
        .filter(F.col("tf") >= min_tf)
    )
