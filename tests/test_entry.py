"""Driver-contract smoke: entry() + queries()/oracle_sql() consistency."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E


def test_oracle_keys_subset_of_queries():
    q = set(E.queries())
    o = set(E.oracle_sql())
    assert o <= q
    # most queries should have oracles (rows-only is the documented
    # exception — 12 of them as of round 1; keep the ratio honest)
    assert len(o) >= len(q) - 12


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"vid", "rank"}


def test_sample_query_runs_at_sf0001(spark):
    df = E.queries()["edges_cs"](spark, "/root/testdata/sf0.001")
    assert df.count() > 100
