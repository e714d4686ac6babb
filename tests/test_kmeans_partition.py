"""KMeans graph partitioning (KMeans.java:66-614 semantics): full coverage,
determinism, rough balance, and crossings below the random-assignment
baseline."""

import pyspark.sql.functions as F

from goffish_v3_spark.operators.kmeans_partition import edge_crossings, kmeans_partition
from tests.graphs import barabasi_albert, disjoint_cliques, to_df


def test_covers_all_vertices_and_valid_clusters(spark):
    edges = barabasi_albert(150, m=3, seed=4)
    df = to_df(spark, edges)
    labels = kmeans_partition(spark, df, k=4)
    nv = (
        df.select(F.col("src").alias("v"))
        .unionByName(df.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    rows = labels.collect()
    assert len(rows) == nv
    assert len({r.vid for r in rows}) == nv
    assert all(0 <= r.cluster < 4 for r in rows)


def test_deterministic(spark):
    df = to_df(spark, barabasi_albert(100, m=2, seed=9))
    a = sorted((r.vid, r.cluster) for r in kmeans_partition(spark, df, k=3).collect())
    b = sorted((r.vid, r.cluster) for r in kmeans_partition(spark, df, k=3).collect())
    assert a == b


def test_clusters_respect_structure(spark):
    # 4 disjoint 8-cliques with k=4: zero crossings is achievable and the
    # BFS growth from per-stratum seeds should land well below random (~75%)
    edges = disjoint_cliques(4, 8)
    df = to_df(spark, edges)
    labels = kmeans_partition(spark, df, k=4)
    x = edge_crossings(df, labels)
    total = df.count()
    assert x / total < 0.5


def test_beats_random_on_scale_free(spark):
    edges = barabasi_albert(200, m=2, seed=7)
    df = to_df(spark, edges)
    labels = kmeans_partition(spark, df, k=4)
    x = edge_crossings(df, labels)
    random_labels = (
        df.select(F.col("src").alias("v"))
        .unionByName(df.select(F.col("dst").alias("v")))
        .distinct()
        .select(F.col("v").alias("vid"), F.pmod(F.xxhash64("v"), F.lit(4)).cast("int").alias("cluster"))
    )
    xr = edge_crossings(df, random_labels)
    assert x < xr


def test_self_loop_singleton_covered(spark):
    df = to_df(spark, [(1, 2), (5, 5)])
    labels = kmeans_partition(spark, df, k=2)
    vids = {r.vid for r in labels.collect()}
    assert vids == {1, 2, 5}
