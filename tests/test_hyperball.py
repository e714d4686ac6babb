"""HyperBall register propagation (operators/hyperball.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goffish_v3_spark.operators.hyperball import (
    hyperball_ball_sizes,
    hyperball_registers,
    hyperball_sql,
)
from goffish_v3_spark.operators.sketch import hll_registers


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_t0_registers_are_own_vertex_hll(spark):
    # at t=0 every vertex's sketch is exactly hll_registers({vid})
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    got = {
        (r.vid, r.bucket): r.register
        for r in hyperball_registers(e, t=0, m_bits=4).collect()
    }
    for vid in (1, 2, 3, 4):
        own = spark.createDataFrame([(vid,)], "vid long")
        for r in hll_registers(own, "vid", m_bits=4).collect():
            assert got[(vid, r.bucket)] == r.register
    # one register per vertex at t=0 (its own hash lands in one bucket)
    assert len(got) == 4


def test_converged_ball_equals_hll_of_reachable_set(spark):
    # path 1 -> 2 -> 3 -> 4: B(1, 3) = {1,2,3,4}; after t=3 supersteps
    # vertex 1's registers must equal hll_registers over that exact set
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    state = hyperball_registers(e, t=3, m_bits=4, seed=5)
    got = {
        (r.bucket, r.register)
        for r in state.filter(F.col("vid") == 1).collect()
    }
    reach = spark.createDataFrame([(v,) for v in (1, 2, 3, 4)], "vid long")
    want = {
        (r.bucket, r.register)
        for r in hll_registers(reach, "vid", m_bits=4, seed=5).collect()
    }
    assert got == want
    # sink vertex 4 never grows: still only its own register
    assert state.filter(F.col("vid") == 4).count() == 1


def test_est_ball_monotone_in_t(spark):
    # registers only grow under cell-wise MAX, so sum_inv is non-increasing
    # and est_ball non-decreasing in t, per vertex
    e = _edges(spark, [(i, (i * 7 + 3) % 50) for i in range(50)])
    by_t = {}
    for t in (0, 1, 2):
        by_t[t] = {
            r.vid: (r.sum_inv, r.est_ball)
            for r in hyperball_ball_sizes(e, t=t, m_bits=4).collect()
        }
    assert set(by_t[0]) == set(by_t[1]) == set(by_t[2])
    for vid in by_t[0]:
        assert by_t[0][vid][0] >= by_t[1][vid][0] >= by_t[2][vid][0]
        assert by_t[0][vid][1] <= by_t[1][vid][1] <= by_t[2][vid][1]


def test_duplicate_edges_do_not_move_registers(spark):
    # cell-wise MAX merge is idempotent: re-delivered edges are harmless
    e1 = _edges(spark, [(1, 2), (2, 3)])
    e2 = _edges(spark, [(1, 2), (1, 2), (2, 3), (2, 3), (2, 3)])
    a = {
        (r.vid, r.bucket, r.register)
        for r in hyperball_registers(e1, t=2).collect()
    }
    b = {
        (r.vid, r.bucket, r.register)
        for r in hyperball_registers(e2, t=2).collect()
    }
    assert a == b


def test_hyperball_matches_duckdb_twin(spark):
    import duckdb as _duckdb

    pairs = [(i, (i * i + 1) % 40) for i in range(40)] + [(3, 17), (17, 3)]
    e = _edges(spark, pairs)
    got = {
        r.vid: (r.n_zero_registers, r.sum_inv, r.est_ball)
        for r in hyperball_ball_sizes(e, t=2, m_bits=4, seed=9).collect()
    }
    values = ", ".join(f"({s}, {d})" for s, d in pairs)
    sql = hyperball_sql(
        f"SELECT * FROM (VALUES {values}) AS v(src, dst)", t=2, m_bits=4, seed=9
    )
    exp = {
        row[0]: (row[1], row[2], row[3])
        for row in _duckdb.connect().execute(sql).fetchall()
    }
    assert got == exp


def test_hyperball_rejects_degenerate_t(spark):
    e = _edges(spark, [(1, 2)])
    for bad in (-1, 17):
        with pytest.raises(ValueError):
            hyperball_registers(e, t=bad)
        with pytest.raises(ValueError, match="t must be"):
            hyperball_sql("SELECT 1 AS src, 2 AS dst", t=bad)


def test_harmonic_matches_ball_telescope(spark):
    # harmonic == sum over i of (est_i - est_{i-1})/i, computed from the
    # per-t ball-size operator (same states, rounded at the end only)
    from goffish_v3_spark.operators.hyperball import harmonic_centrality

    e = _edges(spark, [(i, (i * 3 + 1) % 30) for i in range(30)])
    und = e.union(e.selectExpr("dst AS src", "src AS dst"))
    t = 2
    ests = []
    for i in range(t + 1):
        ests.append(
            {r.vid: r.est_ball for r in hyperball_ball_sizes(und, t=i, m_bits=4).collect()}
        )
    got = {r.vid: r.harmonic_est for r in harmonic_centrality(und, t=t, m_bits=4).collect()}
    assert set(got) == set(ests[0])
    for vid in got:
        want = sum((ests[i][vid] - ests[i - 1][vid]) / i for i in range(1, t + 1))
        assert abs(got[vid] - want) < 2e-3


def test_harmonic_matches_duckdb_twin(spark):
    import duckdb as _duckdb

    from goffish_v3_spark.operators.hyperball import (
        harmonic_centrality,
        harmonic_centrality_sql,
    )

    pairs = [(i, (i * 5 + 2) % 25) for i in range(25)]
    e = _edges(spark, pairs)
    got = {r.vid: r.harmonic_est for r in harmonic_centrality(e, t=3, m_bits=4, seed=2).collect()}
    values = ", ".join(f"({s}, {d})" for s, d in pairs)
    sql = harmonic_centrality_sql(
        f"SELECT * FROM (VALUES {values}) AS v(src, dst)", t=3, m_bits=4, seed=2
    )
    exp = {row[0]: row[1] for row in _duckdb.connect().execute(sql).fetchall()}
    assert got == exp


def test_harmonic_rejects_t_zero(spark):
    from goffish_v3_spark.operators.hyperball import (
        harmonic_centrality,
        harmonic_centrality_sql,
    )

    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError, match="t must be"):
        harmonic_centrality(e, t=0)
    with pytest.raises(ValueError, match="t must be"):
        harmonic_centrality_sql("SELECT 1 AS src, 2 AS dst", t=0)


def test_neighborhood_function_monotone_and_exhaustive(spark):
    from goffish_v3_spark.operators.hyperball import neighborhood_function

    # path 1->2->3->4 plus back-edges: after t=3 every vertex reaches all
    e = _edges(
        spark, [(1, 2), (2, 3), (3, 4), (4, 3), (3, 2), (2, 1)]
    )
    rows = sorted(
        neighborhood_function(e, t=3, m_bits=6).collect(),
        key=lambda r: r.radius,
    )
    assert [r.radius for r in rows] == [0, 1, 2, 3]
    assert all(r.n_vertices == 4 for r in rows)
    vals = [r.pairs_scaled for r in rows]
    assert vals == sorted(vals)  # N(i) nondecreasing
    assert rows[-1].frac_of_final == 1.0
    assert rows[-1].reaches_90pct
    # the flag identifies the effective diameter: flagged radii are a suffix
    flags = [r.reaches_90pct for r in rows]
    assert flags == sorted(flags)


def test_neighborhood_function_matches_duckdb_twin(spark):
    import duckdb as _duckdb

    from goffish_v3_spark.operators.hyperball import (
        neighborhood_function,
        neighborhood_function_sql,
    )

    pairs = [(i, (i * 3 + 1) % 40) for i in range(40)] + [
        (i, (i + 7) % 40) for i in range(40)
    ]
    e = _edges(spark, pairs)
    got = sorted(
        tuple(r) for r in neighborhood_function(e, t=2, m_bits=4, seed=1).collect()
    )
    vals = ", ".join(f"({s}, {d})" for s, d in pairs)
    sql = neighborhood_function_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", t=2, m_bits=4, seed=1
    )
    exp = sorted(tuple(r) for r in _duckdb.connect().execute(sql).fetchall())
    assert got == exp


def test_neighborhood_function_rejects_bad_t(spark):
    from goffish_v3_spark.operators.hyperball import (
        neighborhood_function,
        neighborhood_function_sql,
    )

    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        neighborhood_function(e, t=0)
    with pytest.raises(ValueError):
        neighborhood_function_sql("edges", t=99)
