"""Derive canonical graphs from the driver's TPC-H-ish testdata tables.

These give the graph operators a DuckDB-checkable substrate (the driver's
correctness gate runs Spark vs DuckDB on the same parquet): the derivations
below are simple joins/aggregations expressible identically in ANSI SQL.

- ``customer_supplier_edges``: directed bipartite graph customer → supplier,
  one edge per (custkey, suppkey) with weight = #lineitems; suppliers get
  vid = SUPPLIER_OFFSET + suppkey to disjointify the id spaces.
- ``copart_edges``: undirected part–part co-occurrence within an order
  (parts appearing in the same order are linked) — has triangles, used for
  triangle counting / k-core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPLIER_OFFSET = 2_000_000


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def customer_supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + SUPPLIER_OFFSET).alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("w"))
    )


CS_EDGES_SQL = f"""
SELECT o_custkey AS src,
       l_suppkey + {SUPPLIER_OFFSET} AS dst,
       CAST(count(*) AS DOUBLE) AS w
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


def copart_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.select(
        F.col("l_orderkey").alias("b_orderkey"), F.col("l_partkey").alias("b_partkey")
    ).alias("b")
    return (
        a.join(b, (F.col("a.l_orderkey") == F.col("b_orderkey")))
        .filter(F.col("a.l_partkey") < F.col("b_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b_partkey").alias("dst"))
        .distinct()
        .withColumn("w", F.lit(1.0))
    )


COPART_EDGES_SQL = """
SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst, 1.0 AS w
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""
