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
