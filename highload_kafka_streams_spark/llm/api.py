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
    quantize_embeddings,
)
from highload_kafka_streams_spark.llm.text import (  # noqa: F401
    normalized,
    pii_masked,
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


def mask_pii(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus with ``text`` replaced by its PII-masked form (emails,
    URLs, long digit runs → sentinel tokens). One codegen'd scan."""
    return corpus.withColumn(text_col, pii_masked(text_col))


def normalize_corpus(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus with ``text`` replaced by its canonical normalized form
    (lowercase, punctuation stripped, whitespace collapsed)."""
    return corpus.withColumn(text_col, normalized(F.col(text_col)))


def dedup_within_window(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    window_seconds: int = 600,
) -> DataFrame:
    """First row per (keys, time bucket) with a deterministic
    (ts, tiebreak) order — reproducible under retries, unlike a bare
    dropDuplicates. Batch twin of dropDuplicatesWithinWatermark."""
    from pyspark.sql.window import Window

    bucket = (
        (F.unix_timestamp(ts_col) / window_seconds).cast("long")
        * window_seconds
    )
    w = Window.partitionBy(*key_cols, "bucket_s").orderBy(ts_col, tiebreak_col)
    return (
        df.withColumn("bucket_s", bucket)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def stratified_sample(
    corpus: DataFrame,
    key_col: str,
    class_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
) -> DataFrame:
    """Per-class content-keyed downsample: each row kept iff its md5
    bucket falls under its class's cut. Identical output on any cluster
    layout / engine — never ``sampleBy`` (per-partition seeded)."""
    from highload_kafka_streams_spark.operators.sampling import (
        N_BUCKETS,
        hash_bucket,
    )

    cut = F.lit(int(N_BUCKETS * default_fraction))
    for cls, frac in fractions.items():
        cut = F.when(F.col(class_col) == cls, int(N_BUCKETS * frac)).otherwise(
            cut
        )
    return corpus.filter(hash_bucket(F.col(key_col)) < cut)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
    max_overlap: int = 0,
) -> DataFrame:
    """Drop corpus docs sharing more than ``max_overlap`` word-n-grams
    with the benchmark frame (GPT-3/C4-style decontamination). Join keys
    are md5 gram digests; the benchmark key set broadcasts."""
    from highload_kafka_streams_spark.llm.dedup import shingles

    def gram_keys(df):
        staged = df.select(
            "doc_id", F.split(F.col(text_col), " ").alias("toks")
        )
        return staged.select(
            "doc_id",
            F.explode(
                F.transform(shingles(F.col("toks"), n), lambda g: F.md5(g))
            ).alias("gkey"),
        )

    bench_keys = gram_keys(benchmark).select("gkey").distinct()
    overlaps = (
        gram_keys(corpus)
        .join(F.broadcast(bench_keys), "gkey", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("__n_overlap"))
        .filter(F.col("__n_overlap") > max_overlap)
        .select("doc_id")
    )
    return corpus.join(overlaps, "doc_id", "left_anti")


def curate_corpus(
    corpus: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
) -> DataFrame:
    """The standard curation cascade as one declarative plan: quality
    gate (token count + average token length) → canonical normalization
    → normalized-exact dedup keeping the lowest doc_id. Returns the
    surviving corpus rows (original text, all columns). The only wide
    exchange groups on the 16-byte md5 of the normalized text; see
    ``q_pipeline_curation`` for the per-language statistics view."""
    t = F.col(text_col)
    n_tokens = F.size(F.split(t, " "))
    avg_len = F.length(t).cast("double") / n_tokens
    quality = corpus.filter(
        (n_tokens >= min_tokens)
        & avg_len.between(min_avg_token_len, max_avg_token_len)
    )
    keep = (
        quality.groupBy(F.md5(normalized(t)).alias("__norm_md5"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return quality.join(keep, "doc_id", "left_semi")


def exact_quantiles(
    df: DataFrame, col: str, quantiles: list[float]
) -> list[float]:
    """EXACT quantiles (type-1, the k-th order statistic at
    ``ceil(q * n)``) via iterative histogram selection — no global
    sort, no per-group value buffers; see ``operators/selection.py``
    for the algorithm and its 100 TB rationale."""
    import math

    from highload_kafka_streams_spark.operators.selection import (
        kth_smallest,
    )

    n = df.count()
    return [
        kth_smallest(df, col, max(1, math.ceil(q * n))) for q in quantiles
    ]


def incremental_dedup(
    batch: DataFrame,
    seen_digests: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup an incoming ``batch`` against an accepted-corpus digest set
    (a frame with a ``digest`` column — md5 hex of the text), then
    within itself (first id per digest wins). Returns the surviving
    rows of ``batch`` with their ``digest`` attached; union the digests
    back into the snapshot to advance it. Anti-join + window shuffle
    16-byte digests, never document text."""
    from pyspark.sql.window import Window

    hashed = batch.withColumn("digest", F.md5(F.col(text_col)))
    novel = hashed.join(
        seen_digests.select("digest"), "digest", "left_anti"
    )
    w = Window.partitionBy("digest").orderBy(id_col)
    return (
        novel.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def temperature_weights(
    corpus: DataFrame, class_col: str = "lang"
) -> DataFrame:
    """Per-class sampling probabilities p_i ∝ f_i^(1/2) (temperature-
    flattened mixture; α fixed at 1/2 so the exponent is IEEE-exact
    sqrt). Returns (class, n_docs, p_sample, boost); deterministic on
    any engine/layout — see q_sample_temperature."""
    counts = corpus.groupBy(class_col).agg(F.count("*").alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("n_total"))
    w = counts.crossJoin(F.broadcast(total)).withColumn(
        "__w6",
        F.floor(
            F.sqrt(F.col("n_docs").cast("double") / F.col("n_total")) * 1e6
            + F.lit(0.5)
        ).cast("long"),
    )
    wsum = w.agg(F.sum("__w6").alias("__w6_sum"))
    return w.crossJoin(F.broadcast(wsum)).select(
        class_col,
        "n_docs",
        (F.col("__w6").cast("double") / F.col("__w6_sum")).alias("p_sample"),
        (
            (F.col("__w6").cast("double") / F.col("__w6_sum"))
            / (F.col("n_docs").cast("double") / F.col("n_total"))
        ).alias("boost"),
    )


def cap_per_class(
    corpus: DataFrame,
    class_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``k`` rows per class, selected by content-keyed md5
    order — reproducible under any partitioning (the anti-domination
    rule; see q_sample_cap_per_source)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(class_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        corpus.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def embedding_dim_stats(
    emb: DataFrame, emb_col: str = "embedding"
) -> DataFrame:
    """Per-dimension (dim, n, sum6, mn, mx) profile of a vector column —
    quantizer calibration / dead-dimension detection; `sum6` is the
    fixed-point mean numerator (divide by 1e6 * n at the consumer)."""
    pivoted = emb.select(F.posexplode(emb_col).alias("dim", "v")).select(
        "dim", F.col("v").cast("double").alias("v")
    )
    return pivoted.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("v") * 1e6 + F.lit(0.5)).cast("long")).alias("sum6"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )


def importance_weights(
    corpus: DataFrame,
    is_target,
    text_col: str = "text",
    buckets: int = 256,
) -> DataFrame:
    """DSIR-shaped importance weight per document (see
    q_select_dsir_importance for the fixture-bound twin): hash unigrams
    into ``buckets`` cells, build the target LM (rows where the
    ``is_target`` Column predicate holds) and the raw LM in ONE rollup,
    and score each doc the mean per-token ratio of bucket target-share
    to global target-share, in ppm (>1e6 = target-like). Exact integer
    arithmetic; the weight table is ``buckets`` rows broadcast, so the
    only wide exchanges are the two token-grain aggregates — the LM is
    mergeable across shards by construction.

    Returns (doc_id, n_tokens, avg_wppm); select candidates with
    ``.orderBy(F.desc("avg_wppm"))`` + limit (TakeOrderedAndProject)."""
    toks = corpus.select(
        "doc_id",
        is_target.cast("int").alias("_t"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).select(
        "doc_id",
        "_t",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("dsir:"), F.col("tok"))), 1, 4
                ),
                16,
                10,
            ).cast("long")
            % buckets
        ).alias("bucket"),
    )
    vocab = toks.groupBy("bucket").agg(
        F.count("*").cast("long").alias("cnt_r"),
        F.sum("_t").cast("long").alias("cnt_t"),
    )
    tot = vocab.agg(
        F.sum("cnt_r").cast("long").alias("n_r"),
        F.sum("cnt_t").cast("long").alias("n_t"),
    )
    w = vocab.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.expr(
            f"CAST(((cnt_t + 1) * 100000000 DIV (cnt_r + 1)) * 1000000"
            f" DIV NULLIF((n_t + {int(buckets)}) * 100000000"
            f" DIV (n_r + {int(buckets)}), 0) AS BIGINT)"
        ).alias("w_ppm"),
    )
    return (
        toks.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.expr("CAST(SUM(w_ppm) DIV count(*) AS BIGINT)")
            .alias("avg_wppm"),
        )
    )


def relative_quality_filter(
    corpus: DataFrame,
    score_col: str,
    group_col: str,
    keep_percent: int = 90,
) -> DataFrame:
    """Keep each group's rows with ``score_col`` STRICTLY below the
    group's exact ``keep_percent`` quantile — the per-group relative
    gate that avoids one absolute threshold gutting minority groups
    (see q_text_quality_per_lang_filter). Exact histogram quantile: a
    (group, score) cell rollup, a cumulative window over CELLS only,
    and a broadcast threshold join — no per-row window, no raw-value
    sort. ``score_col`` must be integer-valued (fixed-point your score
    first); ties at the threshold are excluded, deterministically."""
    from pyspark.sql.window import Window

    hist = corpus.groupBy(group_col, score_col).agg(
        F.count("*").cast("long").alias("__cnt")
    )
    wl = Window.partitionBy(group_col).orderBy(score_col)
    wn = Window.partitionBy(group_col)
    thr = (
        hist.select(
            group_col,
            score_col,
            F.sum("__cnt").over(wl).cast("long").alias("__cum"),
            F.sum("__cnt").over(wn).cast("long").alias("__n"),
        )
        .filter(F.col("__cum") * 100 > F.col("__n") * int(keep_percent))
        .groupBy(group_col)
        .agg(F.min(score_col).alias("__thr"))
    )
    return (
        corpus.join(F.broadcast(thr), group_col)
        .filter(F.col(score_col) < F.col("__thr"))
        .drop("__thr")
    )


def group_kfold(df: DataFrame, group_col: str, k: int = 5) -> DataFrame:
    """Add a ``fold`` column that is a pure function of the group key
    (first four md5 nibbles mod k — 65536 % k keeps the structural
    modulus skew ≤ k/65536), so every row of a group lands in one fold
    (leakage-safe), the assignment survives any repartition or task
    retry, and adding data never reshuffles existing groups. See
    q_sample_group_kfold for the audited fixture-bound twin."""
    return df.withColumn(
        "fold",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("fold:"), F.col(group_col).cast("string")
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % int(k)
        ),
    )
