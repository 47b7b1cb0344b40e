"""Retrieval-corpus preparation pipeline — the chunk-level counterpart
of examples/corpus_pipeline.py, composed from round-4 operators:

1. chunk      — sliding 32-token windows, stride 24 (q_text_chunk_overlap)
2. fluency    — unigram-LM average negative logprob   (q_text_unigram_lm)
3. gate       — drop the worst-scoring documents before embedding
4. chunk dedup — keep the first (doc_id, chunk_idx) per chunk digest
                 (boilerplate windows repeat across documents; dedup by
                 content digest, not by document)

The fluency gate runs at DOCUMENT granularity (one score per doc, cheap)
while dedup runs at CHUNK granularity (digest-keyed, the only wide
shuffle) — the standard cost split for RAG-corpus builds. Everything
upstream of the dedup is a narrow pass.

    python examples/retrieval_prep.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from highload_kafka_streams_spark.llm.text import (
    q_text_chunk_overlap,
    q_text_unigram_lm,
)


def retrieval_corpus(
    spark: SparkSession, sf_dir: str, fluency_cutoff: float = 6.0
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_len, chunk_md5, avg_neg_logprob) — one
    row per unique kept chunk."""
    chunks = q_text_chunk_overlap(spark, sf_dir)
    fluency = q_text_unigram_lm(spark, sf_dir).select(
        "doc_id", "avg_neg_logprob"
    )
    gated = chunks.join(fluency, "doc_id").filter(
        F.col("avg_neg_logprob") < fluency_cutoff
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_idx")
    return (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


if __name__ == "__main__":
    from highload_kafka_streams_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = retrieval_corpus(get_spark(app_name="retrieval-prep"), sf)
    out.show(10, truncate=False)
    print("kept chunks:", out.count())
