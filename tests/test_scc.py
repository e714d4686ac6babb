"""Strongly connected components (operators/scc.py)."""

from __future__ import annotations

import duckdb
import pytest

from goffish_v3_spark.operators.scc import scc, scc_sql


def _edges(spark, pairs, schema="src long, dst long"):
    return spark.createDataFrame(pairs, schema)


def _labels(spark, pairs, **kw):
    return {r.vid: r.scc_id for r in scc(spark, _edges(spark, pairs), **kw).collect()}


def test_two_cycles_and_a_bridge(spark):
    # cycle {1,2,3} -> bridge -> cycle {10,11}; 5 dangles off 3
    pairs = [(1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 10), (3, 5)]
    got = _labels(spark, pairs)
    assert got == {1: 3, 2: 3, 3: 3, 10: 11, 11: 11, 5: 5}


def test_pure_dag_is_all_singletons(spark):
    pairs = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    got = _labels(spark, pairs)
    assert got == {v: v for v in (1, 2, 3, 4, 5)}


def test_anti_ordered_path_trims_fast(spark):
    # decreasing path — the coloring worst case; trimming must resolve it
    pairs = [(i + 1, i) for i in range(1, 8)]
    got = _labels(spark, pairs, max_outer=3)  # no FW-BW rounds needed
    assert got == {v: v for v in range(1, 9)}


def test_one_big_cycle(spark):
    n = 12
    pairs = [(i, (i + 1) % n) for i in range(n)]
    got = _labels(spark, pairs)
    assert got == {v: n - 1 for v in range(n)}


def test_string_keys(spark):
    e = _edges(
        spark,
        [("a", "b"), ("b", "a"), ("b", "c")],
        schema="src string, dst string",
    )
    got = {r.vid: r.scc_id for r in scc(spark, e).collect()}
    # string ids: max member lexicographically
    assert got == {"a": "b", "b": "b", "c": "c"}


def test_matches_duckdb_definition_oracle(spark):
    # random-ish directed graph with several nontrivial SCCs
    pairs = sorted(
        {(i % 17, (i * 5 + 3) % 17) for i in range(40)}
        | {((i * 7) % 17, i % 17) for i in range(15)}
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    got = sorted(_labels(spark, pairs).items())
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = scc_sql(f"SELECT * FROM (VALUES {vals}) AS t(src, dst)")
    exp = sorted(
        (int(r[0]), int(r[1]))
        for r in duckdb.connect().execute(sql).fetchall()
    )
    assert got == exp


def test_raises_on_exhausted_outer_rounds(spark):
    # high cycle {5,6} feeding low cycle {1,2}: round 1 colors everything
    # with 6 but only marks {5,6} — {1,2} needs a second outer round
    pairs = [(5, 6), (6, 5), (6, 1), (1, 2), (2, 1)]
    with pytest.raises(RuntimeError, match="outer"):
        scc(spark, _edges(spark, pairs), max_outer=1).collect()
    got = {
        r.vid: r.scc_id
        for r in scc(spark, _edges(spark, pairs), max_outer=3).collect()
    }
    assert got == {5: 6, 6: 6, 1: 2, 2: 2}


def test_self_loop_vertex_is_a_singleton_scc(spark):
    # a vertex whose ONLY edge is a self-loop still gets a row
    got = _labels(spark, [(1, 1), (2, 3)])
    assert got == {1: 1, 2: 2, 3: 3}


def test_self_loop_matches_duckdb_oracle(spark):
    pairs = [(1, 1), (2, 3), (3, 2)]
    got = sorted(_labels(spark, pairs).items())
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = scc_sql(f"SELECT * FROM (VALUES {vals}) AS t(src, dst)")
    exp = sorted(
        (int(r[0]), int(r[1]))
        for r in duckdb.connect().execute(sql).fetchall()
    )
    assert got == exp == [(1, 1), (2, 3), (3, 3)]


def test_condensation_is_the_scc_dag(spark):
    from goffish_v3_spark.operators.scc import condensation_edges

    # cycle {1,2,3} -> 5 -> cycle {10,11}
    pairs = [(1, 2), (2, 3), (3, 1), (3, 5), (5, 10), (10, 11), (11, 10)]
    got = sorted(
        (r.src_scc, r.dst_scc)
        for r in condensation_edges(spark, _edges(spark, pairs)).collect()
    )
    assert got == [(3, 5), (5, 11)]


def test_condensation_matches_duckdb_twin(spark):
    from goffish_v3_spark.operators.scc import condensation_sql, condensation_edges

    # functional graph i -> (3i+1) % n: one cycle per component + tails
    n = 60
    pairs = [(i, (3 * i + 1) % n) for i in range(n) if i != (3 * i + 1) % n]
    got = sorted(
        (r.src_scc, r.dst_scc)
        for r in condensation_edges(spark, _edges(spark, pairs)).collect()
    )
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = condensation_sql(f"SELECT * FROM (VALUES {vals}) AS t(src, dst)")
    exp = sorted(
        (int(a), int(b)) for a, b in duckdb.connect().execute(sql).fetchall()
    )
    assert got == exp
    assert len(got) > 0  # the functional graph has tails into its cycles
