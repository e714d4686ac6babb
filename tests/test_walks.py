"""Deterministic random walks (operators/walks.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from goffish_v3_spark.operators.walks import (
    indexed_adjacency,
    random_walks,
    random_walks_sql,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_walks_shape_and_validity(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1)])
    rows = random_walks(e, length=3, num_walks=2).collect()
    verts = {1, 2, 3, 4}
    # every (start, walk) emits exactly length+1 rows, steps 0..3
    from collections import defaultdict

    by_walk = defaultdict(dict)
    for r in rows:
        by_walk[(r.start_vid, r.walk)][r.step] = r.vid
    assert set(by_walk) == {(v, wk) for v in verts for wk in (0, 1)}
    edges = {(1, 2), (1, 3), (2, 3), (3, 1), (4, 1)}
    for (start, _wk), path in by_walk.items():
        assert sorted(path) == [0, 1, 2, 3]
        assert path[0] == start
        for i in range(1, 4):
            a, b = path[i - 1], path[i]
            assert (a, b) in edges or a == b  # hop on a real edge, or stuck


def test_dead_end_repeats(spark):
    e = _edges(spark, [(1, 2)])  # 2 has no out-edges
    rows = {
        (r.start_vid, r.step): r.vid
        for r in random_walks(e, length=3).collect()
    }
    assert rows[(1, 0)] == 1 and rows[(1, 1)] == 2
    assert rows[(1, 2)] == 2 and rows[(1, 3)] == 2  # stuck at the sink
    assert rows[(2, 1)] == 2


def test_walks_deterministic_across_runs(spark):
    e = _edges(spark, [(i, (i * 7 + 1) % 20) for i in range(20)])
    a = sorted(tuple(r) for r in random_walks(e, length=4).collect())
    b = sorted(tuple(r) for r in random_walks(e, length=4).collect())
    assert a == b


def test_indexed_adjacency_numbering(spark):
    e = _edges(spark, [(1, 5), (1, 3), (1, 9), (2, 7), (1, 3)])
    rows = sorted(
        (r.src, r.idx, r.dst, r.deg)
        for r in indexed_adjacency(e).collect()
    )
    assert rows == [(1, 0, 3, 3), (1, 1, 5, 3), (1, 2, 9, 3), (2, 0, 7, 1)]


def test_walks_match_duckdb_twin(spark):
    pairs = [(i, (i * 3 + 1) % 30) for i in range(30)] + [
        (i, (i + 11) % 30) for i in range(30)
    ]
    e = _edges(spark, pairs)
    got = sorted(
        tuple(r) for r in random_walks(e, length=4, num_walks=2).collect()
    )
    vals = ", ".join(f"({s}, {d})" for s, d in pairs)
    sql = random_walks_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", length=4, num_walks=2
    )
    exp = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == exp


def test_walks_param_validation(spark):
    e = _edges(spark, [(1, 2)])
    for length, num in ((0, 1), (17, 1), (4, 0), (4, 1001)):
        with pytest.raises(ValueError):
            random_walks(e, length=length, num_walks=num)
        with pytest.raises(ValueError):
            random_walks_sql("edges", length=length, num_walks=num)


def test_materialize_mode_is_bit_identical(spark):
    pairs = [(i, (i * 7 + 3) % 50) for i in range(50)] + [
        (i, (i + 13) % 50) for i in range(50)
    ]
    e = _edges(spark, pairs)
    lazy = sorted(
        tuple(r) for r in random_walks(e, length=5, num_walks=2).collect()
    )
    mat = sorted(
        tuple(r)
        for r in random_walks(e, length=5, num_walks=2, materialize=True).collect()
    )
    assert lazy == mat


def test_string_ids_raise_loudly(spark):
    e = spark.createDataFrame(
        [("a", "b")], "src string, dst string"
    )
    with pytest.raises(TypeError, match="integral"):
        random_walks(e, length=2)
