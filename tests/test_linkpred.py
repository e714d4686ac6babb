"""Common-neighbor link prediction (operators/linkpred.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from goffish_v3_spark.operators.linkpred import (
    link_prediction_common_neighbors,
    link_prediction_sql,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_square_recommends_the_diagonal(spark):
    # 4-cycle 1-2-3-4: each vertex's only non-neighbor is its diagonal,
    # sharing exactly the 2 adjacent vertices
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    rows = sorted(
        tuple(r)
        for r in link_prediction_common_neighbors(e, k=3).collect()
    )
    assert rows == [
        (1, 3, 2, 1),
        (2, 4, 2, 1),
        (3, 1, 2, 1),
        (4, 2, 2, 1),
    ]


def test_excludes_existing_edges_and_self(spark):
    # triangle + pendant: 1-2, 2-3, 1-3, 3-4
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    rows = link_prediction_common_neighbors(e, k=5).collect()
    pairs = {(r.vid, r.rec_vid) for r in rows}
    for u, v in [(1, 2), (2, 3), (1, 3), (3, 4)]:
        assert (u, v) not in pairs and (v, u) not in pairs
    assert all(r.vid != r.rec_vid for r in rows)
    # 4's best candidates: 1 and 2 (via center 3), tie broken by id
    got4 = sorted((r.rank, r.rec_vid) for r in rows if r.vid == 4)
    assert got4 == [(1, 1), (2, 2)]


def test_center_degree_guard_drops_hub_wedges(spark):
    # star center 0 with leaves 1..5, plus edge 1-2: without the guard
    # every leaf pair is a candidate (via hub 0); capping the center
    # degree below 5 removes hub-mediated wedges entirely
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    e = _edges(spark, star)
    full = link_prediction_common_neighbors(e, k=10).collect()
    assert {(r.vid, r.rec_vid) for r in full} >= {(3, 4), (4, 3)}
    guarded = link_prediction_common_neighbors(
        e, k=10, max_center_degree=4
    ).collect()
    # centers left: 1 (deg 2), 2 (deg 2), leaves — hub 0 excluded
    assert all(
        {r.vid, r.rec_vid} != {3, 4} for r in guarded
    )  # leaf pairs only shared the hub


def test_matches_duckdb_twin(spark):
    pairs = [(i, (i * 5 + 2) % 25) for i in range(25)] + [
        (i, (i + 4) % 25) for i in range(25)
    ]
    e = _edges(spark, pairs)
    got = sorted(
        tuple(r)
        for r in link_prediction_common_neighbors(e, k=3).collect()
    )
    vals = ", ".join(f"({s}, {d})" for s, d in pairs)
    sql = link_prediction_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", k=3
    )
    exp = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == exp


def test_guarded_matches_duckdb_twin(spark):
    pairs = [(0, i) for i in range(1, 12)] + [(i, i + 1) for i in range(1, 11)]
    e = _edges(spark, pairs)
    got = sorted(
        tuple(r)
        for r in link_prediction_common_neighbors(
            e, k=2, max_center_degree=5
        ).collect()
    )
    vals = ", ".join(f"({s}, {d})" for s, d in pairs)
    sql = link_prediction_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)",
        k=2,
        max_center_degree=5,
    )
    exp = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == exp


def test_param_validation(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        link_prediction_common_neighbors(e, k=0)
    with pytest.raises(ValueError):
        link_prediction_common_neighbors(e, k=3, max_center_degree=0)
    with pytest.raises(ValueError):
        link_prediction_sql("edges", k=0)
    with pytest.raises(ValueError):
        link_prediction_sql("edges", k=1, max_center_degree=-1)


def test_min_common_support_matches_duckdb_twin(spark):
    pairs = [(i, (i * 5 + 2) % 25) for i in range(25)] + [
        (i, (i + 4) % 25) for i in range(25)
    ] + [(i, (i + 9) % 25) for i in range(25)]
    e = _edges(spark, pairs)
    got = sorted(
        tuple(r)
        for r in link_prediction_common_neighbors(
            e, k=3, min_common=2
        ).collect()
    )
    vals = ", ".join(f"({s}, {d})" for s, d in pairs)
    sql = link_prediction_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", k=3, min_common=2
    )
    exp = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == exp
    assert all(r[2] >= 2 for r in got) and got  # threshold held, non-empty
    with pytest.raises(ValueError):
        link_prediction_common_neighbors(e, k=3, min_common=0)
