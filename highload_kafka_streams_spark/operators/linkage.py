"""Entity resolution / record linkage operators.

Fuzzy matching at scale is a blocking problem: the naive form is a
levenshtein cross-join (O(n²) edit-distance calls — the DuckDB oracles
here run exactly that, which is why they stay oracles), and the
production form generates CANDIDATES through an index whose recall is
provable, then verifies only the candidates with the real distance.

This module implements the SymSpell delete-neighborhood index — the
standard spell-correction / canonicalization structure: every string s
expands to {s} ∪ {s with one character deleted}, two strings within
edit distance 1 are guaranteed to share at least one variant
(deletion → the variant equals the shorter string; insertion →
symmetric; substitution → both sides delete the differing position),
so an equi-join on the variant is a 100%-recall candidate generator
whose cost is linear in total string length, never quadratic in the
corpus. Candidates are then verified with the exact edit distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query


def _del_variants(col: str) -> F.Column:
    """{s} ∪ all single-character deletions of s, deduplicated.

    Pure projection (no shuffle): sequence(0, len) drives a transform
    where i = 0 keeps the string itself and i = k deletes character k.
    """
    return F.expr(
        f"array_distinct(transform(sequence(0, length({col})),"
        f" i -> if(i = 0, {col},"
        f" concat(substring({col}, 1, i - 1), substring({col}, i + 1)))))"
    )


@query(
    "q_er_symspell_match",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
),
v AS (
  SELECT t, CAST(count(*) AS BIGINT) AS freq
  FROM tok WHERE length(t) >= 3 GROUP BY t
),
dirty AS (
  SELECT DISTINCT
         substring(t, 1, CAST(freq % length(t) AS INTEGER))
         || substring(t, CAST(freq % length(t) AS INTEGER) + 2) AS d
  FROM v
),
cand AS (
  SELECT dirty.d AS dirty_tok, v.t AS canon_tok,
         CAST(levenshtein(dirty.d, v.t) AS BIGINT) AS lev,
         v.freq
  FROM dirty JOIN v ON levenshtein(dirty.d, v.t) <= 1
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY dirty_tok
                               ORDER BY freq DESC, canon_tok) AS rn
  FROM cand
)
SELECT dirty_tok, canon_tok, lev, freq AS canon_freq
FROM best WHERE rn = 1
ORDER BY dirty_tok
""",
)
def q_er_symspell_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell fuzzy canonicalization: map corrupted tokens back to the
    highest-frequency vocabulary term within edit distance 1 — the
    OCR-noise / typo normalization pass of a text-cleaning pipeline,
    and the same candidate-generation structure a blocked
    record-linkage join uses for names.

    The corrupted observations are derived deterministically (each
    vocabulary term loses the character at position freq mod length, a
    frequency-seeded corruption both engines compute identically), so
    the MATCHING problem is real: a dirty token can sit within distance
    1 of several canonicals and the argmax-by-frequency decides.

    Engine plan (the part under test): both sides expand to their
    delete-neighborhood {s} ∪ del1(s) as a pure projection, candidates
    come from the variant equi-join (provably ⊇ all pairs within
    distance 1 — the SymSpell guarantee), the exact `levenshtein` runs
    ONLY on candidates, and one bounded window (partitioned by dirty
    token) picks the winner. Linear in vocabulary size; the quadratic
    levenshtein join exists only in the DuckDB oracle. At 100 TB the
    vocabulary table is millions of rows, the variant explosion is
    ~(len+1)× that, and every shuffle keys on a short token — this is
    exactly how SymSpell scales where a distance cross-join cannot."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.length("t") >= 3)
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    vocab = vocab.persist()
    dirty = vocab.select(
        F.concat(
            F.expr("substring(t, 1, CAST(freq % length(t) AS INT))"),
            F.expr("substring(t, CAST(freq % length(t) AS INT) + 2)"),
        ).alias("d")
    ).distinct()
    d_var = dirty.select("d", F.explode(_del_variants("d")).alias("variant"))
    v_var = vocab.select(
        "t", "freq", F.explode(_del_variants("t")).alias("variant")
    )
    cand = (
        d_var.join(v_var, "variant")
        .select("d", "t", "freq")
        .distinct()
        .filter(F.levenshtein(F.col("d"), F.col("t")) <= 1)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("d").orderBy(F.desc("freq"), F.asc("t"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("d").alias("dirty_tok"),
            F.col("t").alias("canon_tok"),
            F.levenshtein(F.col("d"), F.col("t")).cast("long").alias("lev"),
            F.col("freq").alias("canon_freq"),
        )
        .orderBy("dirty_tok")
    )
