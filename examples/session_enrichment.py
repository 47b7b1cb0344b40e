"""A production-shaped Kafka Streams migration example: enrich a click
stream against a compacted user profile table plus a broadcast reference
table, sessionize with a window, and write exactly-once.

Reference shape:

    KTable<Long, Profile> profiles = builder.table("profiles");
    GlobalKTable<Int, Region> regions = builder.globalTable("regions");
    builder.stream("events")
        .filter((k, e) -> e.type.equals("click"))
        .join(profiles, ...)             // stream-table enrichment
        .join(regions, (k, e) -> e.regionKey, ...)   // global lookup
        .groupByKey()
        .windowedBy(TimeWindows.ofSize(Duration.ofHours(1)))
        .count()
        .suppress(untilWindowCloses())
        .toStream().to("session-counts");

Migrated topology (batch replay over the fixtures; swap the source for
``spark.readStream`` and the sink for ``write_exactly_once`` to run it
live — the topology object is identical):

    python examples/session_enrichment.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.session import get_spark
from highload_kafka_streams_spark.streaming.topology import (
    KTable,
    StreamsBuilder,
    TimeWindows,
)


def topology(b: StreamsBuilder, events, profiles, regions):
    """clicks ⋈ latest-profile ⋈ broadcast-region → hourly counts."""
    clicks = (
        b.stream(events)
        .with_watermark("ts", "10 minutes")          # grace period
        .filter(F.col("event_type") == "click")
    )
    profile_table = b.table(
        profiles, key_cols=("user_id",), ts_col="ts", tiebreak="event_id"
    )
    profile_view = KTable(
        profile_table.df.select(
            F.col("user_id").alias("p_user"),
            F.col("event_type").alias("last_profile_event"),
        ),
        ("p_user",),
    )
    region_table = b.global_table(regions)
    enriched = (
        clicks.join_table(
            profile_view,
            on=F.col("user_id") == F.col("p_user"),
        )
        .join_global(
            region_table,
            on=(F.col("user_id") % 5) == F.col("r_regionkey"),
        )
    )
    return (
        enriched.group_by("r_name")
        .windowed_by(TimeWindows.of_size("1 hour"))
        .count(alias="n_clicks")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="session-enrichment-example")
    b = StreamsBuilder(spark)
    events = load_table(spark, sf_dir, "events")
    result = topology(b, events, events, load_table(spark, sf_dir, "region"))
    result.df.orderBy("w_start", "r_name").show(12, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
