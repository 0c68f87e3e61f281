"""Smoke: every registered inventory query runs at sf0.001 and returns a
stable schema; entry() works."""

from __future__ import annotations

import pytest

from hops_spark.registry import load_all

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_runs(spark, sf_dir, name):
    df = SPECS[name].fn(spark, sf_dir)
    rows = df.limit(5).collect()
    assert df.columns, f"{name}: no columns"
    assert rows is not None


def test_entry(spark):
    import __spark_entry__ as E
    df = E.entry(spark)
    assert df.count() > 0
    assert set(E.oracle_sql()) <= set(E.queries())
