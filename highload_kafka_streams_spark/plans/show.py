"""Plan inspector CLI — print the formatted physical plan of any
registered query without executing it (the `.explain`-first workflow
this repo's plan-lock tests encode, as a user-facing tool)::

    python -m highload_kafka_streams_spark.plans.show q_pricing_summary
    python -m highload_kafka_streams_spark.plans.show q_join_asof /root/testdata/sf0.01

Prints the `explain("formatted")` output: scan pushdowns
(PushedFilters / ReadSchema), join strategies, exchanges, and
WholeStageCodegen spans — the things to check before trusting a query
at scale.
"""

from __future__ import annotations

import sys

from highload_kafka_streams_spark import registry
from highload_kafka_streams_spark.session import get_spark


def main() -> int:
    if len(sys.argv) < 2:
        names = sorted(registry.get_queries())
        print("usage: python -m highload_kafka_streams_spark.plans.show "
              "<query_name> [sf_dir]\n")
        print(f"{len(names)} registered queries:")
        for n in names:
            print(" ", n)
        return 1
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    queries = registry.get_queries()
    if name not in queries:
        print(f"unknown query {name!r}; run with no args for the list")
        return 1
    spark = get_spark(app_name=f"plan-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    queries[name](spark, sf_dir).explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
