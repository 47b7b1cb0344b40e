"""Local replica of the driver's t2 gate: every oracle-backed query must
hash-match DuckDB at the correctness scale factor (sf0.01)."""

import pytest

from highload_kafka_streams_spark import registry
from highload_kafka_streams_spark.plans.oracle import compare_one, duck_connect


def _oracle_names():
    return sorted(registry.get_oracle_sql())


@pytest.fixture(scope="module")
def duck(sf_oracle):
    return duck_connect(sf_oracle)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_match(spark, duck, sf_oracle, name):
    res = compare_one(spark, duck, sf_oracle, name)
    assert res.ok, f"{name}: {res.detail}"


def test_container_outputs_rejected(spark):
    """The driver canonicalizer errs on top-level array/map columns
    (shipped the same bug two rounds running) — the local gate must
    REJECT such shapes, never pass where the driver would err."""
    import pyspark.sql.functions as F

    from highload_kafka_streams_spark.plans.oracle import (
        ContainerOutputError,
        _reject_container_cols,
    )

    arr = spark.range(3).select(F.array(F.col("id")).alias("a"))
    with pytest.raises(ContainerOutputError, match="q_bad.*\\['a'\\]"):
        _reject_container_cols("q_bad", arr)
    mp = spark.range(3).select(
        F.create_map(F.lit("k"), F.col("id")).alias("m")
    )
    with pytest.raises(ContainerOutputError, match="'m'"):
        _reject_container_cols("q_bad_map", mp)
    ok = spark.range(3).select(
        F.array_join(F.array(F.col("id").cast("string")), ",").alias("a")
    )
    _reject_container_cols("q_ok", ok)  # stringified → accepted


def test_no_oracle_backed_query_emits_containers(spark, sf_smoke):
    """Schema-level sweep: every oracle-backed query's output must be
    container-free (cheap — plan analysis only, no job runs)."""
    from highload_kafka_streams_spark.plans.oracle import _reject_container_cols

    qs = registry.get_queries()
    for name in _oracle_names():
        _reject_container_cols(name, qs[name](spark, sf_smoke))
