"""Triangle counting vs closed forms and the oracle."""

from math import comb

from goffish_v3_spark.operators.triangles import (
    triangle_count,
    triangles_per_vertex,
)
from tests import graphs
from tests.oracles import triangle_oracle, triangles_per_vertex_oracle


def test_clique_closed_form(spark):
    for k in (5, 10):
        df = graphs.to_df(spark, graphs.clique(k))
        assert triangle_count(df) == comb(k, 3)


def test_chain_has_none(spark):
    df = graphs.to_df(spark, graphs.chain(30))
    assert triangle_count(df) == 0


def test_ba_vs_oracle(spark):
    edges = graphs.barabasi_albert(150, m=3)
    df = graphs.to_df(spark, edges)
    assert triangle_count(df) == triangle_oracle(edges)


def test_per_vertex_counts(spark):
    edges = graphs.barabasi_albert(100, m=3)
    df = graphs.to_df(spark, edges)
    got = {r.vid: r.triangles for r in triangles_per_vertex(df).collect()}
    assert got == triangles_per_vertex_oracle(edges)


def test_direction_insensitive(spark):
    """Directed edges in either orientation count the same triangles."""
    edges = graphs.clique(6)
    flipped = [(v, u) for u, v in edges]
    assert triangle_count(graphs.to_df(spark, flipped)) == comb(6, 3)


def test_triangle_count_leaves_no_persisted_tables(spark):
    """triangles() must not leak a cached table per call (VERDICT r4 #2):
    net persistent-RDD count is unchanged after triangle_count returns."""
    df = graphs.to_df(spark, graphs.clique(8))
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert triangle_count(df) == comb(8, 3)
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before
