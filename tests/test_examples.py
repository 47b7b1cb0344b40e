"""The migration examples must stay runnable — they are the 'a KS user
could switch' demonstration surface."""

from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.streaming.topology import StreamsBuilder


def test_wordcount_example(spark, sf_smoke):
    from examples.wordcount import wordcount

    b = StreamsBuilder(spark)
    docs = load_table(spark, sf_smoke, "documents")
    counts = wordcount(b, b.stream(docs, ts_col="doc_id")).df
    total = counts.agg(F.sum("n")).first()[0]
    want = docs.select(
        F.sum(F.size(F.split(F.lower("text"), " ")))
    ).first()[0]
    assert total == want  # every token counted exactly once


def test_session_enrichment_example(spark, sf_smoke):
    from examples.session_enrichment import topology

    b = StreamsBuilder(spark)
    events = load_table(spark, sf_smoke, "events")
    region = load_table(spark, sf_smoke, "region")
    out = topology(b, events, events, region).df
    rows = out.collect()
    assert len(rows) > 0
    assert {"w_start", "w_end", "r_name", "n_clicks"} <= set(out.columns)


def test_corpus_pipeline_example(spark, sf_smoke):
    from examples.corpus_pipeline import clean_corpus

    docs = load_table(spark, sf_smoke, "documents")
    out = clean_corpus(docs)
    rows = out.collect()
    assert 0 < len(rows) <= docs.count()
    assert {"doc_id", "lang", "text", "n_tokens", "split"} <= set(out.columns)
    # dedup really deduped: cleaned text is unique
    assert len({r["text"] for r in rows}) == len(rows)
    # split is deterministic content-keyed: recompute matches
    again = {(r["doc_id"], r["split"]) for r in clean_corpus(docs).collect()}
    assert {(r["doc_id"], r["split"]) for r in rows} == again


def test_embedding_pipeline_example(spark, sf_smoke):
    from highload_kafka_streams_spark.llm.api import (
        cosine_top_k,
        quantize_embeddings,
    )

    emb = load_table(spark, sf_smoke, "embeddings")
    q = quantize_embeddings(emb, "embedding")
    rows = q.select("vec_id", "qv").collect()
    assert len(rows) == emb.count()
    assert all(-127 <= v <= 127 for r in rows for v in r["qv"])
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    top = cosine_top_k(emb.filter(F.col("vec_id") != 0), query, k=3).collect()
    assert len(top) == 3
    assert top[0]["cos_sim"] >= top[-1]["cos_sim"]


def test_warehouse_layout_example(spark, sf_smoke):
    from examples.warehouse_layout import curated_join

    joined = curated_join(spark, sf_smoke)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert joined.count() > 0


def test_retrieval_prep_example(spark, sf_smoke):
    from examples.retrieval_prep import retrieval_corpus

    out = retrieval_corpus(spark, sf_smoke)
    rows = out.collect()
    assert len(rows) > 0
    # chunk-level dedup: digests unique after the keep-first pass
    digests = [r.chunk_md5 for r in rows]
    assert len(digests) == len(set(digests))
    assert {"doc_id", "chunk_idx", "chunk_len", "chunk_md5"} <= set(out.columns)
