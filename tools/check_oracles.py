"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, compares row counts + column sets +
order-insensitive values. Usage::

    python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as E
    from goffish_v3_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"[FAIL-spark] {name}: {ex}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            if len(srows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            o = con.sql(oracles[name])
            orows = o.fetchall()
            ocols = [c for c in o.columns]
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {ex}"))
            print(f"[FAIL-duckdb] {name}: {ex}")
            continue
        sc, sr = norm_rows(scols, [tuple(r) for r in srows])
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            failures.append((name, f"columns differ: spark={sc} duckdb={oc}"))
            print(f"[FAIL-cols] {name}: spark={sc} duckdb={oc}")
            continue
        if len(sr) != len(orr):
            failures.append((name, f"row count: spark={len(sr)} duckdb={len(orr)}"))
            print(f"[FAIL-rows] {name}: spark={len(sr)} duckdb={len(orr)}")
            continue
        bad = [
            (a, b) for a, b in zip(sr, orr) if a != b
        ]
        if bad:
            failures.append((name, f"{len(bad)} value mismatches, first: {bad[0]}"))
            print(f"[FAIL-vals] {name}: {len(bad)} mismatches; first {bad[0]}")
        else:
            print(f"[OK] {name}: {len(sr)} rows")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
