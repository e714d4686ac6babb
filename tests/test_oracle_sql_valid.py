"""Every oracle_sql() string parses and binds in DuckDB (no Spark, ~ms).

The full Spark-vs-DuckDB value comparison is tools/check_oracles.py (and the
round driver); this test catches SQL typos/drift — a renamed column, a
DuckDB function that doesn't exist — at pytest speed by EXPLAINing each
query against views over the sf0.001 parquet tables.
"""

import os

import duckdb
import pytest

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _entry():
    import sys

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if here not in sys.path:
        sys.path.insert(0, here)
    import __spark_entry__  # same loader style as tools/check_oracles.py

    return __spark_entry__


def test_every_oracle_sql_binds_in_duckdb():
    if not os.path.isdir(SF):
        pytest.skip(f"{SF} not present")
    entry = _entry()
    oracles = entry.oracle_sql()
    queries = entry.queries()
    # contract: every oracle key is a query key
    assert set(oracles) <= set(queries)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = []
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # collect all, report together
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)
