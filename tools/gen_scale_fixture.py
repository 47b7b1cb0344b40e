#!/usr/bin/env python
"""Derive an N-times-larger fixture from an existing scale-factor dir —
the empirical scale point VERDICT r4 item 4 asked for (the 100 TB story
was plan-locks + sf0.1; one order of magnitude of real data catches any
super-linear surprise the plan reader can't).

Construction (replication with disjointness guarantees, NOT naive
copy): every table is replicated ``--factor`` times with per-replica
key offsets chosen so referential integrity holds within each replica
(orders.o_custkey moves with customer.c_custkey, lineitem's three FKs
move with their parents, events.user_id moves with its replica).
``documents.text`` gets a per-replica VOCABULARY BIJECTION (replica k>0
suffixes every token with ``q<k>``): within-replica shingle/Jaccard/
cluster structure is preserved exactly, while cross-replica token sets
are disjoint — so near-dup pairs, duplicate clusters, and the pagerank
graph scale exactly linearly by design. A naive text copy would make
every doc a near-dup of its 9 clones and quadratically explode the
pair queries, measuring the fixture instead of the engine.

region/nation are bounded dimensions and stay as-is (that is what
"dimension" means at 100 TB too).

Usage:
    python tools/gen_scale_fixture.py --base /root/testdata/sf0.1 \
        --out .scale/sf1 --factor 10

Output layout matches TESTDATA.md (``<out>/<table>.parquet``; written
as directories, which spark.read.parquet consumes identically).
"""

from __future__ import annotations

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from highload_kafka_streams_spark.io import load_table  # noqa: E402
from highload_kafka_streams_spark.session import get_spark  # noqa: E402


def _replicate(df: DataFrame, factor: int) -> DataFrame:
    """Cross join with a replica index column ``_k`` (0..factor-1)."""
    reps = df.sparkSession.range(factor).select(F.col("id").alias("_k"))
    return df.crossJoin(F.broadcast(reps))


def _offset(col: str, span_col: str = "_span"):
    """key + _k * span — disjoint per replica, FK-consistent when parent
    and child use the same span."""
    return (F.col(col) + F.col("_k") * F.col(span_col)).alias(col)


def _span_of(df: DataFrame, key: str) -> int:
    """One scan for max(key)+1 — the per-replica key offset stride."""
    return df.agg((F.max(key) + 1).alias("s")).collect()[0]["s"]


def generate(base: str, out: str, factor: int) -> None:
    spark = get_spark(app_name="hks-scale-fixture")

    def write(df: DataFrame, name: str, n_files: int = 4) -> None:
        path = os.path.join(out, f"{name}.parquet")
        # r12: repartition, not coalesce — coalesce(4) collapsed the
        # whole replica union into ONE written row group (parquet
        # assigns a row group to the split holding its midpoint, so
        # every scan of the fixture ran single-task and the core-count
        # probe measured the file layout, not the engine; see
        # SCALE_CORES_r12.json). Facts get one file per local core.
        n = 32 if name in ("lineitem", "orders", "events") else n_files
        df.repartition(n).write.mode("overwrite").parquet(path)
        print(f"  {name}: {spark.read.parquet(path).count()} rows")

    # bounded dims: pass through unchanged
    for name in ("region", "nation"):
        write(load_table(spark, base, name), name, n_files=1)

    sup = load_table(spark, base, "supplier")
    sup_span = _span_of(sup, "s_suppkey")
    write(
        _replicate(sup.withColumn("_span", F.lit(sup_span)), factor)
        .select(
            _offset("s_suppkey"),
            F.concat("s_name", F.lit("#r"), "_k").alias("s_name"),
            "s_nationkey",
            "s_acctbal",
        ),
        "supplier",
        n_files=1,
    )

    cust = load_table(spark, base, "customer")
    cust_span = _span_of(cust, "c_custkey")
    write(
        _replicate(cust.withColumn("_span", F.lit(cust_span)), factor)
        .select(
            _offset("c_custkey"),
            F.concat("c_name", F.lit("#r"), "_k").alias("c_name"),
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        ),
        "customer",
        n_files=1,
    )

    part = load_table(spark, base, "part")
    part_span = _span_of(part, "p_partkey")
    write(
        _replicate(part.withColumn("_span", F.lit(part_span)), factor)
        .select(
            _offset("p_partkey"),
            F.concat("p_name", F.lit("#r"), "_k").alias("p_name"),
            "p_brand",
            "p_type",
            "p_size",
            "p_retailprice",
        ),
        "part",
        n_files=1,
    )

    orders = load_table(spark, base, "orders")
    ord_span = _span_of(orders, "o_orderkey")
    write(
        _replicate(
            orders.withColumn("_span", F.lit(ord_span)).withColumn(
                "_cspan", F.lit(cust_span)
            ),
            factor,
        ).select(
            _offset("o_orderkey"),
            _offset("o_custkey", "_cspan"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ),
        "orders",
    )

    li = load_table(spark, base, "lineitem")
    write(
        _replicate(
            li.withColumn("_span", F.lit(ord_span))
            .withColumn("_pspan", F.lit(part_span))
            .withColumn("_sspan", F.lit(sup_span)),
            factor,
        ).select(
            _offset("l_orderkey"),
            _offset("l_partkey", "_pspan"),
            _offset("l_suppkey", "_sspan"),
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ),
        "lineitem",
    )

    ev = load_table(spark, base, "events")
    ev_span = _span_of(ev, "event_id")
    user_span = _span_of(ev, "user_id")
    write(
        _replicate(
            ev.withColumn("_span", F.lit(ev_span)).withColumn(
                "_uspan", F.lit(user_span)
            ),
            factor,
        ).select(
            _offset("event_id"),
            "ts",
            _offset("user_id", "_uspan"),
            "event_type",
            "value",
            "props",
        ),
        "events",
    )

    docs = load_table(spark, base, "documents")
    doc_span = _span_of(docs, "doc_id")
    # vocabulary bijection per replica: replica 0 verbatim, replica k
    # suffixes every token with q<k> — within-replica similarity exact,
    # cross-replica similarity zero
    new_text = F.when(F.col("_k") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit("q"), F.col("_k").cast("string")),
            ),
            " ",
        )
    )
    write(
        _replicate(docs.withColumn("_span", F.lit(doc_span)), factor)
        .withColumn("text", new_text)
        .select(
            _offset("doc_id"),
            "text",
            "lang",
            "source",
            F.length("text").cast("long").alias("n_chars"),
        ),
        "documents",
    )

    emb = load_table(spark, base, "embeddings")
    emb_span = _span_of(emb, "vec_id")
    write(
        _replicate(emb.withColumn("_span", F.lit(emb_span)), factor).select(
            _offset("vec_id"),
            "embedding",
            "label",
        ),
        "embeddings",
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, default=10)
    ns = ap.parse_args()
    generate(ns.base, ns.out, ns.factor)


if __name__ == "__main__":
    main()
