"""End-to-end training-corpus preparation pipeline, composed from the
engine's LLM-data operators — the shape a 100 TB pre-training data job
takes, runnable here against the fixtures.

Stages (each one is an independently oracle-verified operator):

1. normalize   — canonical lowercase/punct-strip form (q_text_normalize)
2. PII mask    — email/URL/digit-run redaction    (q_text_pii_mask)
3. quality     — length/stopword heuristics        (q_text_quality)
4. repetition  — duplicate-trigram screening       (q_text_repetition)
5. exact dedup — keep lowest doc_id per normalized text (q_dedup_exact)
6. split       — content-keyed train/holdout       (q_split_train_holdout)

Everything is a single declarative plan until the final action: Catalyst
fuses the per-doc stages (1-4) into one whole-stage-codegen'd scan, the
dedup is the only wide shuffle (16-byte digest keys), and the split adds
no shuffle at all. At 100 TB you'd break the plan at stage 5 with a
checkpoint to parquet; locally it runs in one job.

    python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.llm.api import pii_masked
from highload_kafka_streams_spark.operators.sampling import split_corpus
from highload_kafka_streams_spark.session import get_spark


def clean_corpus(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, ...) → cleaned, deduped, split corpus.

    Returns (doc_id, lang, text, n_tokens, split) — one row per kept doc.
    """
    masked = pii_masked("text")
    # normalize AFTER masking, keeping the <EMAIL>/<URL>/<NUM> sentinels
    # (llm.api.normalized strips <>, so the example inlines its variant)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(masked), "[^a-z0-9<> ]", " "), " +", " "
        )
    )
    staged = docs.select("doc_id", "lang", norm.alias("text"))

    toks = F.split(F.col("text"), " ")
    staged = staged.select(
        "doc_id", "lang", "text", toks.alias("toks"), F.size(toks).alias("n_tokens")
    )
    tk = F.col("toks")
    tris = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tk) - 3, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(tk, i + 1, 3)),
    )
    staged = staged.select(
        "doc_id", "lang", "text", "toks", "n_tokens", tris.alias("tris")
    )

    avg_tok = F.length("text").cast("double") / F.col("n_tokens")
    tri_rep = 1.0 - F.size(F.array_distinct("tris")).cast("double") / F.size("tris")
    kept = staged.filter(
        (F.col("n_tokens") >= 5) & avg_tok.between(2.0, 12.0) & (tri_rep <= 0.5)
    )

    # exact dedup on the CLEANED text: group on its digest (16-byte
    # shuffle keys), keep the lowest doc_id deterministically
    deduped = (
        kept.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.expr("min_by(lang, doc_id)").alias("lang"),
            F.expr("min_by(text, doc_id)").alias("text"),
            F.expr("min_by(n_tokens, doc_id)").alias("n_tokens"),
        )
        .drop("text_md5")
    )
    return split_corpus(deduped, "doc_id", holdout_fraction=204 / 4096)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus-pipeline-example")
    out = clean_corpus(load_table(spark, sf_dir, "documents"))
    out.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    ).orderBy("lang", "split").show(20, truncate=False)


if __name__ == "__main__":
    main()
