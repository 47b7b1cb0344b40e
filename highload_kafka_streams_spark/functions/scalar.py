"""Scalar function families (SURVEY.md §2.9).

A Kafka Streams app computes these inside opaque ``mapValues`` lambdas;
our engine exposes them as Spark built-ins so they stay inside
whole-stage codegen (JVM, vectorized) instead of a per-record Python
hop. One oracle-checked query per family, written to exercise the
representative functions where Spark and DuckDB dialects can be made to
agree exactly.

Transcendentals (exp/ln/pow) are rounded to 9 decimals in BOTH engines:
libm implementations may differ in the last ulp, everything above that
is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query


@query(
    "q_fn_string",
    oracle="""
SELECT p_partkey,
       lower(p_name) AS lname,
       upper(p_brand) AS ubrand,
       trim(p_type) AS ttype,
       substring(p_name, 1, 8) AS name8,
       concat_ws('/', p_brand, p_type) AS brand_type,
       length(p_name) AS name_len,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       replace(p_type, ' ', '_') AS type_us,
       (p_type LIKE 'PROMO%') AS is_promo,
       split_part(p_type, ' ', 1) AS type_head
FROM part
ORDER BY p_partkey
""",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.trim("p_type").alias("ttype"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.col("p_type").like("PROMO%").alias("is_promo"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
    ).orderBy("p_partkey")


@query(
    "q_fn_datetime",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS y,
       month(o_orderdate) AS m,
       day(o_orderdate) AS d,
       date_part('dow', o_orderdate) AS dow,
       date_trunc('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL 30 DAY AS due_date,
       date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
         AS days_since_epoch_start,
       CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
FROM orders
WHERE o_orderkey < 1000
ORDER BY o_orderkey
""",
)
def q_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dow: 0=Sunday..6
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_epoch_start"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
    ).orderBy("o_orderkey")


@query(
    "q_fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1) AS price_r1,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       abs(l_discount - 0.05) AS disc_dev,
       sqrt(l_quantity) AS qty_sqrt,
       round(pow(l_quantity, 2.0), 9) AS qty_sq,
       round(exp(l_discount), 9) AS disc_exp,
       round(ln(l_extendedprice), 9) AS price_ln,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod
FROM lineitem
WHERE l_orderkey < 2000
ORDER BY l_orderkey, l_linenumber
""",
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.pow("l_quantity", F.lit(2.0)), 9).alias("qty_sq"),
        F.round(F.exp("l_discount"), 9).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 9).alias("price_ln"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q_fn_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS price_tier,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
       greatest(o_totalprice, 150000.0) AS floor_price,
       least(o_totalprice, 150000.0) AS capped_price,
       (o_orderstatus = 'F' AND o_totalprice > 200000) AS big_final
FROM orders
ORDER BY o_orderkey
""",
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_tier"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.greatest("o_totalprice", F.lit(150000.0)).alias("floor_price"),
        F.least("o_totalprice", F.lit(150000.0)).alias("capped_price"),
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000)).alias(
            "big_final"
        ),
    ).orderBy("o_orderkey")


@query(
    "q_fn_array",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       list_contains(toks, 'data') AS has_data,
       COALESCE(array_to_string(toks[1:5], ','), '') AS head5,
       COALESCE(array_to_string(list_sort(list_distinct(toks))[1:3], ','), '') AS first3_distinct,
       len(list_filter(toks, x -> length(x) > 5)) AS n_long,
       COALESCE(array_to_string(list_transform(toks[1:3], x -> upper(x)), ','), '') AS head3_upper
FROM t
ORDER BY doc_id
""",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions (slice/sort/distinct/filter/transform).
    list_distinct order is unspecified in DuckDB → always sort after.
    Array results are array_join-stringified (↔ DuckDB array_to_string)
    because the driver canonicalizer cannot hash top-level array columns —
    same encoding rule proven on q_agg_collect; the higher-order
    expressions themselves are unchanged."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "data").alias("has_data"),
        F.array_join(F.slice(toks, 1, 5), ",").alias("head5"),
        F.array_join(
            F.slice(F.sort_array(F.array_distinct(toks)), 1, 3), ","
        ).alias("first3_distinct"),
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long"),
        F.array_join(
            F.transform(F.slice(toks, 1, 3), lambda x: F.upper(x)), ","
        ).alias("head3_upper"),
    ).orderBy("doc_id")


@query(
    "q_fn_map",
    oracle="""
SELECT doc_id,
       COALESCE(array_to_string(map_keys(map {'lang': lang, 'source': source}), ','), '') AS meta_keys,
       (map {'lang': lang, 'source': source}['lang'])[1] AS lang_val,
       cardinality(map {'lang': lang, 'source': source}) AS n_keys
FROM documents
ORDER BY doc_id
""",
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key/value extraction (KS record headers live in
    exactly this shape). meta_keys is array_join-stringified (↔ DuckDB
    array_to_string) — driver canon cannot hash top-level arrays."""
    d = load_table(spark, sf_dir, "documents")
    meta = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.array_join(F.map_keys(meta), ",").alias("meta_keys"),
        F.element_at(meta, "lang").alias("lang_val"),
        F.size(meta).alias("n_keys"),
    ).orderBy("doc_id")


@query(
    "q_fn_json",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract(props, '$.k') AS BIGINT) % 3 AS k_mod
FROM events
WHERE event_type = 'purchase'
ORDER BY event_id
""",
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload decoding — KS Serdes-at-the-edge equivalent: declared
    schema via from_json, never inference."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    schema = StructType([StructField("k", LongType())])
    parsed = ev.withColumn("j", F.from_json("props", schema))
    return parsed.select(
        "event_id",
        F.col("j.k").alias("k"),
        (F.col("j.k") % 3).alias("k_mod"),
    ).orderBy("event_id")


@query(
    "q_fn_hash",
    oracle="""
SELECT doc_id,
       md5(text) AS text_md5,
       sha256(text) AS text_sha256
FROM documents
ORDER BY doc_id
""",
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized hashes (md5/sha256 agree across engines byte-for-byte;
    engine-native xxhash64/murmur are exercised rows-only below)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    ).orderBy("doc_id")


@query("q_fn_hash_native")  # xxhash64/murmur3 values are engine-specific
def q_fn_hash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native hashes (xxhash64, murmur3) — the fast path used by
    dedup bucketing and salting at scale; rows-only check."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.xxhash64("text").alias("text_xxh64"),
        F.hash("text").alias("text_murmur3"),
        F.abs(F.xxhash64("text") % 1024).alias("bucket"),
    ).orderBy("doc_id")


@query(
    "q_fn_string_similarity",
    oracle="""
SELECT n_nationkey,
       levenshtein(n_name, 'GERMANY') AS lev_germany,
       lpad(n_name, 14, '.') AS padded,
       reverse(n_name) AS rev,
       repeat(substring(n_name, 1, 2), 2) AS rep2,
       translate(n_name, 'AEIOU', 'aeiou') AS lowvowel,
       left(n_name, 3) AS l3,
       right(n_name, 3) AS r3,
       strpos(n_name, 'AN') AS an_pos
FROM nation
ORDER BY n_nationkey
""",
)
def q_fn_string_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: edit distance + case/slice/search helpers
    (levenshtein is the scalar workhorse of fuzzy entity matching)."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.levenshtein(F.col("n_name"), F.lit("GERMANY")).alias("lev_germany"),
        F.lpad("n_name", 14, ".").alias("padded"),
        F.reverse("n_name").alias("rev"),
        F.repeat(F.substring("n_name", 1, 2), 2).alias("rep2"),
        F.translate("n_name", "AEIOU", "aeiou").alias("lowvowel"),
        F.substring("n_name", 1, 3).alias("l3"),
        F.col("n_name").substr(F.length("n_name") - 2, F.lit(3)).alias("r3"),
        F.locate("AN", "n_name").alias("an_pos"),
    ).orderBy("n_nationkey")


@query(
    "q_unpivot",
    oracle="""
WITH src AS (
  SELECT o_orderpriority,
         count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
         count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
         count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, status, n
FROM src UNPIVOT (n FOR status IN (F, O, P))
ORDER BY o_orderpriority, status
""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide status-count columns back to long form —
    the inverse of q_pivot_status_by_priority, zero-shuffle (a
    Generate over the already-aggregated rows)."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return (
        wide.unpivot(
            ids=["o_orderpriority"],
            values=["F", "O", "P"],
            variableColumnName="status",
            valueColumnName="n",
        )
        .orderBy("o_orderpriority", "status")
    )


@query("q_agg_approx_percentile")  # t-digest sketch — engine-specific, rows-only
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the sketch-based percentile used at 100 TB
    where the exact form's per-group sort is prohibitive; mergeable
    across partitions (rows-only: sketch internals differ per engine,
    the exact twin q_agg_percentiles is the value-checked one)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.expr(
                "approx_percentile(o_totalprice, array(0.25, 0.5, 0.9), 10000)"
            ).alias("approx_pcts")
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q_fn_regexp",
    oracle="""
SELECT doc_id,
       -- DuckDB array_to_string([]) is NULL; Spark array_join([]) is ''
       COALESCE(array_to_string(regexp_extract_all(text, '[a-z]*ing'), ','), '') AS ing_words,
       len(regexp_extract_all(text, '[a-z]*ing')) AS n_ing,
       regexp_replace(text, ' [a-z]{1,2} ', ' _ ', 'g') AS short_masked,
       regexp_matches(text, '(data|spark|stream)') AS mentions_tech
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
""",
)
def q_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family beyond extract: extract_all (array result, stringified
    for the driver canon — see q_agg_collect), match counting, global
    replace, boolean match — the text-wrangling core of any corpus
    pipeline. NOTE Spark regexp_replace is global by default; DuckDB needs
    the 'g' flag — an engine-parity hazard worth pinning."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.array_join(
            F.regexp_extract_all("text", F.lit("[a-z]*ing"), 0), ","
        ).alias("ing_words"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]*ing"), 0)).alias("n_ing"),
        F.regexp_replace("text", " [a-z]{1,2} ", " _ ").alias("short_masked"),
        F.col("text").rlike("(data|spark|stream)").alias("mentions_tech"),
    ).orderBy("doc_id")


@query(
    "q_fn_url",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/' || lang || '/doc/'
           || doc_id || '?ref=' || lang || '&pos=' || (doc_id % 10) AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       regexp_extract(regexp_extract(url, '^https?://([^/]+)', 1),
                      '([^.]+[.][^.]+)$', 1) AS domain,
       regexp_extract(url, '^https?://[^/?]+([^?]*)', 1) AS path,
       len(string_split(regexp_extract(url, '^https?://[^/?]+([^?]*)', 1),
                        '/')) - 1 AS path_depth,
       regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref_param,
       regexp_extract(url, '^(https?)://', 1) AS scheme
FROM u
ORDER BY doc_id
""",
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing family — the web-corpus column every crawl-derived
    training set carries. Spark side uses the native `parse_url`
    (HOST / PATH / QUERY-key extraction, JVM codegen'd); the oracle
    reproduces each part with portable regexes, which pins down the
    exact semantics (scheme-relative host, query excluded from path,
    single-param lookup). The registrable-domain approximation (last
    two labels) is what per-domain corpus stats group on; at 100 TB
    this family runs as pure projections — zero shuffle, full
    whole-stage codegen. URLs are synthesized deterministically from
    fixture columns because no fixture table carries raw URLs."""
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/"),
            F.col("lang"),
            F.lit("/doc/"),
            F.col("doc_id"),
            F.lit("?ref="),
            F.col("lang"),
            F.lit("&pos="),
            F.col("doc_id") % 10,
        ).alias("url"),
    )
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    path = F.parse_url(F.col("url"), F.lit("PATH"))
    return u.select(
        "doc_id",
        "url",
        host.alias("host"),
        F.regexp_extract(host, r"([^.]+[.][^.]+)$", 1).alias("domain"),
        path.alias("path"),
        (F.size(F.split(path, "/")) - 1).alias("path_depth"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("scheme"),
    ).orderBy("doc_id")


@query(
    "q_fn_struct",
    oracle="""
SELECT doc_id,
       struct_pack(lang := lang, source := source).lang AS s_lang,
       struct_pack(lang := lang, source := source).source AS s_source,
       to_json(struct_pack(id := doc_id, lang := lang,
                           n_chars := n_chars)) AS packed_json,
       CAST(row(lang, n_chars) = row('en', n_chars) AS BOOLEAN) AS is_en_pair
FROM documents
ORDER BY doc_id
""",
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct (nested record) family — create, field-access, struct
    equality, and canonical JSON encoding. Spark `named_struct` ↔ DuckDB
    `struct_pack`/`row`; both serialize field-order-preserving compact
    JSON, which the oracle pins. Structs are the carrier type for the
    multimodal metadata convention and for every composite key the
    engine ships through a shuffle — all pure codegen projections."""
    docs = load_table(spark, sf_dir, "documents")
    s = F.struct(F.col("lang").alias("lang"), F.col("source").alias("source"))
    return docs.select(
        "doc_id",
        s.getField("lang").alias("s_lang"),
        s.getField("source").alias("s_source"),
        F.to_json(
            F.struct(
                F.col("doc_id").alias("id"),
                F.col("lang").alias("lang"),
                F.col("n_chars").alias("n_chars"),
            )
        ).alias("packed_json"),
        (
            F.struct(F.col("lang"), F.col("n_chars"))
            == F.struct(F.lit("en").alias("lang"), F.col("n_chars"))
        ).alias("is_en_pair"),
    ).orderBy("doc_id")


@query(
    "q_fn_encoding",
    oracle="""
SELECT doc_id,
       base64(CAST(substring(text, 1, 24) AS BLOB)) AS b64_head,
       CAST(CAST(from_base64(base64(CAST(substring(text, 1, 24) AS BLOB)))
                 AS VARCHAR) = substring(text, 1, 24) AS BOOLEAN)
         AS roundtrip_ok,
       to_hex(n_chars) AS hex_len,
       ascii(substring(text, 1, 1)) AS first_cp,
       chr(ascii(substring(text, 1, 1))) AS first_ch
FROM documents
ORDER BY doc_id
""",
)
def q_fn_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/text encoding family — base64 encode + decode round-trip,
    integer→hex, codepoint extraction and reconstruction. The
    serialization seams every byte-level pipeline stage (Kafka payloads,
    blob metadata, digest rendering) crosses; all pure codegen
    projections, proven byte-exact against DuckDB's encoders."""
    docs = load_table(spark, sf_dir, "documents")
    head = F.substring("text", 1, 24)
    b64 = F.base64(head.cast("binary"))
    return docs.select(
        "doc_id",
        b64.alias("b64_head"),
        (F.unbase64(b64).cast("string") == head).alias("roundtrip_ok"),
        F.hex(F.col("n_chars")).alias("hex_len"),
        F.ascii(head).alias("first_cp"),
        F.char(F.ascii(head)).alias("first_ch"),
    ).orderBy("doc_id")


@query(
    "q_fn_format",
    oracle="""
SELECT p_partkey,
       printf('%05d|%s', p_partkey, p_brand) AS padded_key,
       lpad(p_brand, 12, '.') AS lpadded,
       rpad(p_type, 10, '_') AS rpadded,
       repeat('-', p_size % 5) AS bar,
       reverse(p_name) AS rname
FROM part
ORDER BY p_partkey
""",
)
def q_fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting family — printf-style templating, fixed-width
    padding, repetition, reversal: the row-rendering seams of report
    and export sinks. `format_string` follows java.util.Formatter and
    DuckDB's printf follows C's — the oracle pins that the subset used
    here (%05d, %s) renders identically. Pure codegen projections."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.format_string("%05d|%s", "p_partkey", "p_brand").alias("padded_key"),
        F.lpad("p_brand", 12, ".").alias("lpadded"),
        F.rpad("p_type", 10, "_").alias("rpadded"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5).cast("int")).alias("bar"),
        F.reverse("p_name").alias("rname"),
    ).orderBy("p_partkey")


@query(
    "q_fn_surrogate_key",
    oracle="""
WITH h AS (
  SELECT doc_id, md5('doc|' || source || '|' || doc_id) AS hx
  FROM documents
)
SELECT doc_id,
       substring(hx, 1, 8) || '-' || substring(hx, 9, 4) || '-'
         || substring(hx, 13, 4) || '-' || substring(hx, 17, 4) || '-'
         || substring(hx, 21, 12) AS surrogate_uuid,
       CAST(('0x' || substring(hx, 1, 15)) AS BIGINT) AS surrogate_int
FROM h
ORDER BY doc_id
""",
)
def q_fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate-key generation — UUID-formatted and
    integer keys derived from the md5 of the natural key, NEVER from
    `uuid()`, `rand()` or `monotonically_increasing_id()` (all three
    change across retries, partitionings or reruns, which silently
    breaks joins against previously-published keys; the content-keyed
    digest is stable forever and reproducible by any engine — the same
    discipline as the md5-bucket samplers). The integer form takes the
    top 60 bits (15 hex chars) so it stays positive in an int64."""
    docs = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("doc|"), F.col("source"), F.lit("|"), F.col("doc_id")))
    h = docs.select("doc_id", hx.alias("hx"))
    uuid_fmt = F.concat_ws(
        "-",
        F.substring("hx", 1, 8),
        F.substring("hx", 9, 4),
        F.substring("hx", 13, 4),
        F.substring("hx", 17, 4),
        F.substring("hx", 21, 12),
    )
    return h.select(
        "doc_id",
        uuid_fmt.alias("surrogate_uuid"),
        F.conv(F.substring("hx", 1, 15), 16, 10)
        .cast("long")
        .alias("surrogate_int"),
    ).orderBy("doc_id")


@query(
    "q_fn_null_semantics",
    oracle="""
WITH lo AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END
           AS st,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL
              ELSE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) END
           AS price_c
  FROM orders WHERE o_orderkey < 4000
)
SELECT st,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(price_c) AS BIGINT) AS n_priced,
       CAST(SUM(price_c) AS BIGINT) AS sum_priced,
       CAST(SUM(CASE WHEN st IS NOT DISTINCT FROM 'F' THEN 1 ELSE 0 END)
            AS BIGINT) AS nullsafe_f,
       CAST(SUM(CASE WHEN price_c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_price,
       CAST(count(DISTINCT price_c) AS BIGINT) AS n_distinct_priced
FROM lo
GROUP BY st
ORDER BY st NULLS FIRST
""",
)
def q_fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics parity suite in one aggregate: grouping BY a
    nullable key (the NULL group is a real group on both engines),
    count(*) vs count(col) (aggregates skip NULLs), SUM over a
    partially-NULL column, null-safe equality (`IS NOT DISTINCT FROM`
    ↔ Spark's `<=>`), explicit IS NULL counting, and DISTINCT over a
    nullable column (NULL is not a distinct value for count(DISTINCT)
    on either engine). These are the cross-engine edges that silently
    corrupt reports when an engine swap changes one of them — pinned
    here by the value hash rather than assumed.

    Scale note: one scan, one grouped aggregate — the semantics are
    the payload, the plan is trivial by design."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    lo = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("st"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        )
        .alias("price_c"),
    )
    return (
        lo.groupBy("st")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("price_c").alias("n_priced"),
            F.sum("price_c").cast("long").alias("sum_priced"),
            F.sum(
                F.when(F.col("st").eqNullSafe(F.lit("F")), 1).otherwise(0)
            ).cast("long").alias("nullsafe_f"),
            F.sum(F.when(F.col("price_c").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null_price"),
            F.count_distinct("price_c").alias("n_distinct_priced"),
        )
        .orderBy(F.col("st").asc_nulls_first())
    )
