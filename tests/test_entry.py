"""Driver-contract smoke tests: entry(), queries(), oracle_sql() shape."""

import __spark_entry__ as ent


def test_entry_runs(spark):
    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracle_keys_align(spark):
    qs = ent.queries()
    osql = ent.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must have a query; not every query needs an oracle
    missing = set(osql) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"


def test_all_queries_run_at_smoke_sf(spark, sf_smoke):
    qs = ent.queries()
    for name, fn in qs.items():
        df = fn(spark, sf_smoke)
        assert df.count() >= 0, name


def test_registry_window_ordering():
    """The driver verifies a prefix of queries() (50 in round 1), so the
    ordering contract matters: every _WINDOW_PRIORITY name must exist
    (typos would silently waste window slots), the first 50 queries must
    all be oracle-backed, and every rows-only query must sort behind
    every oracle-backed one."""
    from highload_kafka_streams_spark import registry

    qs = ent.queries()
    osql = ent.oracle_sql()
    names = list(qs)
    unknown = [n for n in registry._WINDOW_PRIORITY if n not in qs]
    assert not unknown, f"_WINDOW_PRIORITY names not registered: {unknown}"
    # a rows-only name in the priority head would waste a verified-window
    # slot on a `no_oracle` row; an oracle-backed name in the tail would
    # bury verifiable evidence behind rows-only queries
    plain_in_pri = [n for n in registry._WINDOW_PRIORITY if n not in osql]
    assert not plain_in_pri, f"rows-only in _WINDOW_PRIORITY: {plain_in_pri}"
    oracle_in_tail = [n for n in registry._WINDOW_TAIL if n in osql]
    assert not oracle_in_tail, f"oracle-backed in _WINDOW_TAIL: {oracle_in_tail}"
    unknown_tail = [n for n in registry._WINDOW_TAIL if n not in qs]
    assert not unknown_tail, f"_WINDOW_TAIL names not registered: {unknown_tail}"
    window = names[:50]
    no_oracle_in_window = [n for n in window if n not in osql]
    assert not no_oracle_in_window, no_oracle_in_window
    tail_flags = [n in osql for n in names]
    # once the first rows-only query appears, no oracle-backed may follow
    # (vacuously true if every registered query becomes oracle-backed)
    if False in tail_flags:
        first_plain = tail_flags.index(False)
        assert not any(
            tail_flags[first_plain:]
        ), "oracle-backed after rows-only"


def test_pandas_udf_queries_work_from_foreign_cwd(tmp_path):
    """Driver-env regression: module-level applyInPandas kernels pickle
    BY REFERENCE, so Python workers must import the package themselves.
    Run the entry contract in a subprocess whose cwd is NOT the repo
    root — without configure_session's addPyFile shipping, the worker
    dies with ModuleNotFoundError (reproduced round 3 from /tmp)."""
    import subprocess
    import sys

    script = """
import importlib.util
from pyspark.sql import SparkSession
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
ent = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ent)
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# a query whose kernel is a module-level applyInPandas function
df = ent.queries()["q_stateful_session_processor"](
    spark, "/root/testdata/sf0.001")
print("ROWS", df.count())
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),  # decisively NOT the repo root
        capture_output=True,
        text=True,
        timeout=300,
        env={
            k: v
            for k, v in __import__("os").environ.items()
            if k not in ("PYTHONPATH",)
        },
    )
    assert "ROWS" in out.stdout, out.stderr[-2000:]
