"""Driver-contract smoke tests (t1 shape)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"nation", "customer", "points", "races", "wins", "position"}


def test_every_query_has_runnable_callable(spark, sf_dir):
    qs = entrymod.queries()
    assert qs, "queries() must not be empty"
    # every query must at least build a plan (schema resolvable) at sf0.001
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} produced no columns"


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    for k in entrymod.oracle_sql():
        assert k in qs
