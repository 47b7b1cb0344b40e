"""Public LLM API over arbitrary (non-fixture) frames."""

import pandas as pd
from pyspark.sql import functions as F

from highload_kafka_streams_spark.llm import api


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup
        (3, "the quick brown fox leaps over the lazy dog"),   # near dup
        (4, "completely different text about spark engines here"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_and_drop_duplicates(spark):
    c = _corpus(spark)
    dups = api.exact_duplicates(c).collect()
    assert {(r["keep_doc_id"], r["n_copies"]) for r in dups} == {
        (1, 2), (3, 1), (4, 1)
    }
    kept = api.drop_exact_duplicates(c)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4]


def test_minhash_near_duplicates_api(spark):
    c = _corpus(spark)
    pairs = api.minhash_near_duplicates(c, threshold=0.5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in found            # identical docs always collide
    assert all(p[0] < p[1] for p in found)
    for r in pairs:
        assert r["jaccard"] >= 0.5


def test_cosine_top_k_api(spark):
    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [1, 2, 3],
                "label": [0, 0, 1],
                "embedding": [
                    [1.0] + [0.0] * 63,
                    [0.8] + [0.6] + [0.0] * 62,
                    [0.0, 1.0] + [0.0] * 62,
                ],
            }
        )
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    q = spark.createDataFrame(
        pd.DataFrame({"qe": [[1.0] + [0.0] * 63]})
    ).withColumn("qe", F.col("qe").cast("array<float>"))
    top = api.cosine_top_k(emb, q, k=2).collect()
    assert [r["vec_id"] for r in top] == [1, 2]
    assert abs(top[0]["cos_sim"] - 1.0) < 1e-9


def test_token_stats_api(spark):
    c = _corpus(spark)
    stats = {r["token"]: (r["tf"], r["df"]) for r in api.token_stats(c).collect()}
    assert stats["the"] == (6, 3)
    assert stats["fox"] == (3, 3)
    assert stats["spark"] == (1, 1)
