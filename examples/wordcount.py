"""The canonical Kafka Streams WordCount, migrated.

Reference shape (the KS quickstart — every KS user has written this):

    builder.stream("text-input")
        .flatMapValues(v -> Arrays.asList(v.toLowerCase().split(" ")))
        .groupBy((k, word) -> word)
        .count()
        .toStream().to("counts-output");

Same topology on this engine — identical operator sequence, declarative
DataFrame plan underneath, runs in batch (shown here over the
``documents`` fixture) or streaming (pass a ``readStream`` frame)
unchanged:

    python examples/wordcount.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from highload_kafka_streams_spark.io import load_table
from highload_kafka_streams_spark.session import get_spark
from highload_kafka_streams_spark.streaming.topology import StreamsBuilder


def wordcount(builder: StreamsBuilder, text_stream):
    """KS WordCount: flatMapValues(split) → groupBy(word) → count."""
    return (
        text_stream
        .map_values(text_lc=F.lower(F.col("text")))
        .flat_map_values(F.split(F.col("text_lc"), " "), out="word")
        .group_by("word")
        .count(alias="n")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="wordcount-example")
    b = StreamsBuilder(spark)
    docs = load_table(spark, sf_dir, "documents")
    counts = wordcount(b, b.stream(docs, ts_col="doc_id"))
    counts.to_stream().df.orderBy(F.col("n").desc()).show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
