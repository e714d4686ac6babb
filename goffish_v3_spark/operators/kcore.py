"""k-core decomposition.

Semantics: sample-hama KCore.java:35-113 / KCoreFast.java / KCoreSort.java —
per-vertex core numbers à la Montresor et al. 2013 (cited at
sample-giraph KCore.java:16-19). The reference ships three Hama variants
differing only in local scheduling; we ship one distributed peeling
implementation (SURVEY.md §2.C C8-C10).

Two entry points:

- :func:`k_core` — the k-core *subgraph* for a given k: iterated degree-
  filter peeling (each round = one aggregation + one semi-join) until no
  vertex falls below k. Rounds are O(peeling depth).
- :func:`core_numbers` — full decomposition: peel k = 1, 2, … reusing the
  surviving edge set between levels, assigning core = k−1 to vertices
  removed at level k (matches the peeling oracle exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goffish_v3_spark.plans.superstep import no_aqe


def _undirected(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return e.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()


def _degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("u").alias("vid"))
        .unionAll(und.select(F.col("v").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("deg"))
    )


def _peel_to_k(spark, und: DataFrame, k: int, max_rounds: int = 1000):
    """Remove vertices with degree < k until fixpoint. Returns (edges, removed)
    where removed is the list of per-round removed-vertex DataFrames."""
    removed_all = None
    cur = und.localCheckpoint(eager=True)
    with no_aqe(spark):
        return _peel_loop(cur, k, max_rounds, removed_all)


def _peel_loop(cur, k, max_rounds, removed_all):
    for _ in range(max_rounds):
        deg = _degrees(cur)
        low = deg.filter(F.col("deg") < k).select("vid").persist()
        n_low = low.count()
        if n_low == 0:
            low.unpersist()
            break
        removed_all = low if removed_all is None else removed_all.unionByName(low)
        cur = (
            cur.join(low, cur.u == low.vid, "left_anti")
            .join(low, cur.v == low.vid, "left_anti")
            .localCheckpoint(eager=True)
        )
        removed_all = removed_all.localCheckpoint(eager=True)
        low.unpersist()
    return cur, removed_all


def k_core(spark: SparkSession, edges: DataFrame, k: int) -> DataFrame:
    """Vertices of the k-core: ``(vid long, deg long)`` with deg = degree
    inside the core subgraph."""
    und = _undirected(edges)
    cur, _ = _peel_to_k(spark, und, k)
    return _degrees(cur)


def core_numbers(spark: SparkSession, edges: DataFrame, max_k: int = 64) -> DataFrame:
    """``(vid long, core long)`` for every vertex with degree ≥ 1."""
    und = _undirected(edges)
    cur = und.localCheckpoint(eager=True)
    vertices = _degrees(cur).select("vid").persist()
    results: list[DataFrame] = []
    spark_ = spark
    for k in range(1, max_k + 2):
        nxt, removed = _peel_to_k(spark_, cur, k)
        survivors = _degrees(nxt).select("vid")
        gone = vertices.join(survivors, "vid", "left_anti").withColumn(
            "core", F.lit(k - 1).cast("long")
        )
        if not gone.isEmpty():
            results.append(gone.localCheckpoint(eager=True))
        vertices.unpersist()
        if nxt.isEmpty():
            break
        cur = nxt
        vertices = survivors.persist()
        vertices.count()
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
