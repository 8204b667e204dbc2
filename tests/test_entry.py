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


def test_registry_order_keeps_oracle_entries_inside_verified_window():
    """The driver verifies exactly the first 50 queries() entries in
    insertion order. Every oracle-backed key must register before every
    rows-only key, and the registry must hold exactly 50 entries — a
    reorder here silently drops queries out of the correctness gate
    (round-1 verdict's headline finding)."""
    qs = list(entrymod.queries())
    oracle = set(entrymod.oracle_sql())
    assert len(qs) == 50
    first_oracle_block = qs[: len(oracle)]
    assert set(first_oracle_block) == oracle, (
        "rows-only entries interleaved into the oracle-verified window"
    )
    assert all(k not in oracle for k in qs[len(oracle):])
