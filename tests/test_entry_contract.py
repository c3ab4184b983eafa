"""Driver-contract guard: every queries() entry runs and matches its
DuckDB oracle at sf0.001 (the driver itself re-checks at sf0.01)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="testdata absent")


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.count()
    assert rows > 0
    assert df.columns  # stable schema
    # re-run → same row count (deterministic)
    assert E.entry(spark).count() == rows


def test_queries_match_oracles(spark):
    import __spark_entry__ as E
    from tools.check_entry import run

    results = run(SF, spark=spark)
    assert set(E.queries()) == set(results)
    bad = {k: v for k, v in results.items() if v}
    assert not bad, f"oracle mismatches: {bad}"
    # every oracle key has a matching query
    assert set(E.oracle_sql()) <= set(E.queries())
