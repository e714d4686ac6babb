"""Graph statistics + meta-graph (GraphStats/VertexCount/MetaGraph parity)."""

import pyspark.sql.functions as F

from goffish_v3_spark.operators.stats import (
    degree_histogram,
    graph_stats,
    meta_graph,
    vertex_count,
)
from tests import graphs


def test_vertex_count(spark):
    df = graphs.to_df(spark, graphs.chain(25))
    assert vertex_count(df) == 25


def test_graph_stats_star(spark):
    df = graphs.to_df(spark, graphs.star_hub(40))
    s = graph_stats(spark, df, num_parts=4)
    assert s["vertices"] == 41
    assert s["edges"] == 40
    assert s["max_in_degree"] == 40
    assert s["max_out_degree"] == 1


def test_degree_histogram(spark):
    df = graphs.to_df(spark, graphs.star_hub(10))
    hist = {r.deg: r.n_vertices for r in degree_histogram(df).collect()}
    assert hist == {1: 10}


def test_meta_graph_nonempty(spark):
    df = graphs.to_df(spark, graphs.barabasi_albert(100, m=2))
    mg = meta_graph(df, num_parts=4)
    rows = mg.collect()
    assert len(rows) > 0
    assert all(r.src_part != r.dst_part for r in rows)
