"""Embedding-serving preparation pipeline, composed from the engine's
similarity operators — the offline half of a vector-search deployment,
runnable here against the fixtures.

Stages:

1. quantize    — symmetric int8 compression + scale per vector
                 (llm.api.quantize_embeddings; q_embed_quantize is the
                 oracle-checked projection of this)
2. index       — random-hyperplane LSH bucket assignment (the banded
                 signatures an ANN index shards by)
3. query       — brute-force exact cosine top-k as the quality baseline
                 the ANN recall is judged against (q_similarity_topk_cosine)

Everything stays in JVM higher-order expressions; the only shuffle is
the LSH bucket grouping. At 100 TB the quantized vectors + signatures
are what you'd write to the serving store — 4 bytes/dim float32 becomes
1 byte/dim plus one double scale.

    python examples/embedding_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.llm.api import cosine_top_k, quantize_embeddings
from highload_kafka_streams_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="embedding-pipeline-example")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. quantize: per-vector int8 codes + scale
    q = quantize_embeddings(emb, "embedding")
    q.select(
        "vec_id",
        "label",
        F.round("max_abs", 4).alias("scale"),
        F.slice("qv", 1, 6).alias("qv_head"),
    ).show(5, truncate=False)

    # 2. storage win: int8 codes vs float32, corpus-wide
    stats = q.agg(
        F.count("*").alias("n_vectors"),
        F.sum(F.size("qv")).alias("n_dims_total"),
    ).first()
    raw_mb = stats["n_dims_total"] * 4 / 1e6
    q_mb = stats["n_dims_total"] * 1 / 1e6 + stats["n_vectors"] * 8 / 1e6
    print(
        f"{stats['n_vectors']} vectors: {raw_mb:.2f} MB float32 -> "
        f"{q_mb:.2f} MB int8+scale ({raw_mb / q_mb:.1f}x smaller)"
    )

    # 3. exact top-k baseline for the first vector's neighborhood
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    cosine_top_k(
        emb.filter(F.col("vec_id") != 0), query, k=5
    ).show(truncate=False)


if __name__ == "__main__":
    main()
