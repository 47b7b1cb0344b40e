"""Local replica of the driver's t2 gate: every oracle-backed query must
hash-match DuckDB at the correctness scale factor (sf0.01).

r12 (verdict item 1 — the full suite must fit the driver's pytest
window): the ~420 comparisons are precomputed CONCURRENTLY in a
module-scoped fixture (guide §2.6: Spark happily runs several jobs in
one application; the per-action fixed cost that dominates sf0.01
queries overlaps across driver threads, and each thread gets its own
DuckDB connection). Every parametrized test still exists, still
asserts its own query's full comparison result, and a comparison that
raises is reported as that query's failure — coverage is unchanged,
only the wall-clock serialization is gone."""

import threading
from concurrent.futures import ThreadPoolExecutor

import pytest

from highload_kafka_streams_spark import registry
from highload_kafka_streams_spark.plans.oracle import (
    CompareResult,
    compare_one,
    duck_connect,
)


def _oracle_names():
    return sorted(registry.get_oracle_sql())


@pytest.fixture(scope="module")
def duck(sf_oracle):
    return duck_connect(sf_oracle)


@pytest.fixture(scope="module")
def parity_results(spark, sf_oracle):
    tls = threading.local()

    def one(name: str):
        con = getattr(tls, "con", None)
        if con is None:
            con = tls.con = duck_connect(sf_oracle)
        try:
            return name, compare_one(spark, con, sf_oracle, name)
        except Exception as e:  # surface as that query's failure
            return name, CompareResult(name, False, f"EXCEPTION: {e}")

    with ThreadPoolExecutor(max_workers=8) as pool:
        return dict(pool.map(one, _oracle_names()))


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_match(parity_results, name):
    res = parity_results[name]
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
