"""Every declared query must match its DuckDB oracle at sf0.001 — a fast
local replica of the driver's sf0.01 correctness gate (same comparison rules
as selfcheck.py: row count, column names, bit-exact values)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from selfcheck import compare


def _query_names():
    return sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, sf_dir).toPandas()
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        # rows-only contract: must run and produce a stable schema
        assert sdf is not None
        return
    odf = duck.execute(oracles[name]).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "bucket" in df.columns and "close" in df.columns
