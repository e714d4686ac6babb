"""Graph statistics — the reference's utility programs as single-job aggs.

Covers sample-hama GraphStats.java:61-237 (global |V|, |E|, boundary
vertices, meta-graph adjacency), VertexCount.java:36-64, EdgeList.java:36-54
and MetaGraph.java:30-46. What costs the reference multiple broadcast
supersteps (SS0-1 count exchange, GraphStats.java:77-113) is one declarative
aggregation here; the meta-graph diameter probe-flood (:118-210) is served by
the SSSP operator over the meta edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goffish_v3_spark.plans.partitioner import vertex_part


def vertex_count(edges: DataFrame) -> int:
    """VertexCount.java:36 — |V| over src ∪ dst."""
    return (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
        .count()
    )


def edge_list(edges: DataFrame) -> DataFrame:
    """EdgeList.java:36 — the src/dst projection (a sink in the reference)."""
    return edges.select("src", "dst")


def degree_histogram(edges: DataFrame) -> DataFrame:
    """out-degree → #vertices (``(deg long, n_vertices long)``), the skew
    diagnostic driving the salting plan (SURVEY.md §4 P13)."""
    return (
        edges.groupBy("src")
        .agg(F.count("*").alias("deg"))
        .groupBy("deg")
        .agg(F.count("*").alias("n_vertices"))
    )


def graph_stats(spark: SparkSession, edges: DataFrame, num_parts: int = 32) -> dict:
    """GraphStats.java:61 — one pass of global aggregates."""
    e = edges.persist()
    nv = vertex_count(e)
    ne = e.count()
    boundary = (
        e.withColumn("sp", vertex_part(F.col("src"), num_parts))
        .withColumn("dp", vertex_part(F.col("dst"), num_parts))
        .filter(F.col("sp") != F.col("dp"))
    )
    n_boundary_edges = boundary.count()
    n_boundary_vertices = boundary.select(F.col("dst").alias("v")).union(
        boundary.select(F.col("src").alias("v"))
    ).distinct().count()
    max_out = e.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    max_in = e.groupBy("dst").count().agg(F.max("count")).collect()[0][0]
    e.unpersist()
    return {
        "vertices": nv,
        "edges": ne,
        "boundary_edges": n_boundary_edges,
        "boundary_vertices": n_boundary_vertices,
        "max_out_degree": max_out,
        "max_in_degree": max_in,
        "num_parts": num_parts,
    }


def meta_graph(edges: DataFrame, num_parts: int) -> DataFrame:
    """MetaGraph.java:30 — distinct (src_part, dst_part) pairs: the
    communication topology between partitions (reference: between
    subgraphs)."""
    return (
        edges.select(
            vertex_part(F.col("src"), num_parts).alias("src_part"),
            vertex_part(F.col("dst"), num_parts).alias("dst_part"),
        )
        .filter(F.col("src_part") != F.col("dst_part"))
        .distinct()
    )
