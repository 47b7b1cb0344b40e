"""Curated-warehouse layout lifecycle — the storage-side discipline a
100 TB deployment lives by, composed from the engine's layout and
history operators and runnable here against the fixtures:

1. compact     — size-targeted parquet files, zone-map sorted
                 (`io.write_compacted`; small-file management)
2. bucket      — hash-bucketed fact tables on the join key
                 (`io.write_bucketed_table`); repeated joins on that key
                 then run with ZERO exchange (plan-asserted in tests)
3. history     — SCD2 interval build from the change stream
                 (`q_scd2_intervals` shape): the versioned-KTable-at-rest
4. enrich      — last-touch attribution over the same change stream
                 (merge-form as-of: union + one window pass, no range join)

    python examples/warehouse_layout.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from highload_kafka_streams_spark.io import (  # noqa: E402
    load_table,
    write_bucketed_table,
    write_compacted,
)
from highload_kafka_streams_spark.registry import get_queries  # noqa: E402
from highload_kafka_streams_spark.session import get_spark  # noqa: E402


def curated_join(spark, sf_dir: str):
    """Bucket both fact tables once; join shuffle-free thereafter."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_bucketed_table(
        li, "wh_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    write_bucketed_table(
        orders, "wh_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    bl, bo = spark.table("wh_lineitem"), spark.table("wh_orders")
    return bl.join(bo.hint("merge"), bl.l_orderkey == bo.o_orderkey)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="warehouse-layout-example")

    with tempfile.TemporaryDirectory(prefix="wh_compacted_") as tmp:
        n = write_compacted(
            load_table(spark, sf_dir, "events"),
            f"{tmp}/events",
            target_file_bytes=8 * 1024 * 1024,
            sort_cols=["ts"],
        )
        print(f"compacted events into {n} zone-map-sorted file(s)")

    joined = curated_join(spark, sf_dir)
    print("bucketed join plan (expect no Exchange):")
    has_exchange = "Exchange" in joined._jdf.queryExecution().executedPlan().toString()
    print(f"  exchange present: {has_exchange}")
    joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_lines")
    ).orderBy("o_orderstatus").show()

    q = get_queries()
    print("SCD2 state history (first 10 intervals):")
    q["q_scd2_intervals"](spark, sf_dir).show(10, truncate=False)
    print("last-touch attribution coverage:")
    q["q_events_attribution"](spark, sf_dir).groupBy("attributed").count().show()


if __name__ == "__main__":
    main()
