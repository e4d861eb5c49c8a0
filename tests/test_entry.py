"""Driver-contract smoke: entry() runs, queries()/oracle_sql() are wired."""

import __spark_entry__ as e


def test_entry_runs(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"check_name", "n_rows", "verdict"}


def test_queries_oracle_keys_align(spark):
    qs, oracles = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_each_query_runs_smoke(spark, sf_dir):
    for name, fn in e.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()
