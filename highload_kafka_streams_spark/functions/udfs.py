"""User-defined function surface (SURVEY.md §2.10): scalar pandas UDF,
grouped-aggregate pandas UDF (UDAF), and a Python UDTF.

These are the engine's "escape hatch" tier — the KS Processor-API
equivalent for record-at-a-time logic Spark built-ins can't express.
Rules enforced here (the 100 TB posture):

- always ``pandas_udf`` (Arrow batch transfer, vectorized numpy inside),
  never row-at-a-time ``F.udf`` in a hot path — 10-100× difference
- UDAF accumulators must be order-independent (fixed-point int sums)
  because partition order is nondeterministic after a shuffle
- each demo has an exact SQL twin so even the escape hatch stays under
  the oracle gate
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.registry import query


# DataType objects, not DDL strings: DDL parsing requires a live
# SparkSession, which must not be a precondition for importing this module
@pandas_udf(StringType())
def price_band(price: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: price → tier label."""
    return pd.cut(
        price,
        bins=[-np.inf, 1000.0, 10000.0, 100000.0, np.inf],
        labels=["xs", "s", "m", "l"],
    ).astype(str)


@query(
    "q_udf_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_extendedprice <= 1000 THEN 'xs'
            WHEN l_extendedprice <= 10000 THEN 's'
            WHEN l_extendedprice <= 100000 THEN 'm'
            ELSE 'l' END AS band
FROM lineitem
WHERE l_orderkey < 5000
ORDER BY l_orderkey, l_linenumber
""",
)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        price_band("l_extendedprice").alias("band"),
    ).orderBy("l_orderkey", "l_linenumber")


@pandas_udf(DoubleType())
def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (UDAF): quantity-weighted average price.

    Accumulates in fixed-point int64 so the result is independent of the
    arbitrary row order the shuffle delivers (see compat.py).
    """
    num = np.floor(price.to_numpy() * qty.to_numpy() * 10000 + 0.5).astype(np.int64).sum()
    den = np.floor(qty.to_numpy() * 10000 + 0.5).astype(np.int64).sum()
    return float(num) / float(den) if den else float("nan")


@query(
    "q_udaf_grouped",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(FLOOR(l_extendedprice * l_quantity * 10000 + 0.5) AS BIGINT))
            AS DOUBLE)
       / CAST(SUM(CAST(FLOOR(l_quantity * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
         AS w_avg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(weighted_avg_price("l_extendedprice", "l_quantity").alias("w_avg_price"))
        .orderBy("l_returnflag")
    )


def _register_tokenize_udtf(spark: SparkSession):
    """Python UDTF (PySpark 3.5+): text → (pos, token) rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class Tokenize:
        def eval(self, text: str):
            if text:
                for i, tok in enumerate(text.split(" ")):
                    yield i, tok

    spark.udtf.register("tokenize", Tokenize)
    return Tokenize


@query(
    "q_udtf",
    oracle="""
SELECT doc_id,
       CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
       unnest(string_split(text, ' ')) AS token
FROM documents
WHERE doc_id < 50
ORDER BY doc_id, pos
""",
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF via lateral join — one (pos, token) row per word per document."""
    _register_tokenize_udtf(spark)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM docs_for_udtf d, LATERAL tokenize(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )
