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
