"""Central query registry — the driver-facing surface.

Every implemented operator from SURVEY.md §2 registers one named query
(a ``(spark, sf_dir) -> DataFrame`` callable) and, when the semantics
are batch-SQL-expressible, a DuckDB oracle SQL string computing the
same result with the same column names. ``__spark_entry__.queries()`` /
``oracle_sql()`` read straight from here.

Usage in operator modules::

    from highload_kafka_streams_spark.registry import query

    @query("q_filter", oracle="SELECT ... FROM events WHERE ...")
    def q_filter(spark, sf_dir):
        ...

Queries without an oracle string (streaming-only / engine-specific-hash
semantics, SURVEY.md §2 tier 🌊) get the driver's rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# modules that register queries on import (order = SURVEY.md §2 order)
_QUERY_MODULES = (
    "highload_kafka_streams_spark.sources.tables",
    "highload_kafka_streams_spark.sources.formats",
    "highload_kafka_streams_spark.operators.stateless",
    "highload_kafka_streams_spark.operators.joins",
    "highload_kafka_streams_spark.operators.aggregates",
    "highload_kafka_streams_spark.operators.time_windows",
    "highload_kafka_streams_spark.operators.analytic",
    "highload_kafka_streams_spark.operators.setops",
    "highload_kafka_streams_spark.operators.skew",
    "highload_kafka_streams_spark.operators.sampling",
    "highload_kafka_streams_spark.plans.composite",
    "highload_kafka_streams_spark.plans.events_analytics",
    "highload_kafka_streams_spark.functions.scalar",
    "highload_kafka_streams_spark.functions.udfs",
    "highload_kafka_streams_spark.streaming.replay",
    "highload_kafka_streams_spark.llm.dedup",
    "highload_kafka_streams_spark.llm.similarity",
    "highload_kafka_streams_spark.llm.text",
    "highload_kafka_streams_spark.llm.multimodal",
)


def query(name: str, oracle: str | None = None):
    """Decorator: register a query (and optionally its oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle.strip()
        return fn

    return deco


_loaded = False


def load_all() -> None:
    """Import every query module exactly once (idempotent)."""
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # allow partial builds while phases land; missing engine
            # modules are a bug, missing optional deps are not
            if "highload_kafka_streams_spark" not in str(e):
                raise
    _loaded = True


def get_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def get_oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
