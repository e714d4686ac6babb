"""Single-source shortest paths (unit and weighted).

Semantics: sample-hama SingleSourceShortestPath.java:65-576 (unit weights,
per-superstep local Dijkstra + boundary min-exchange; distances start at ∞,
source 0, parent pointers tracked) and the Giraph weighted variant
(giraph examples SubgraphSingleSourceShortestPathWithWeights.java:44-463).

Spark shape: frontier-driven Bellman-Ford supersteps —

    updates  = frontier ⋈ edges on src → (dst, dist+w, parent=src)
             → groupBy(dst).agg(min(struct(dist, parent)))   -- the reference's
               per-subgraph min-before-send (SSSP.java:256-300) is Spark's
               map-side partial min
    improved = updates ⋈ dist where new < old
    dist'    = dist outer-merge improved ; frontier' = improved

The loop touches only the frontier's out-edges each superstep (the analogue
of the reference's changed-roots re-run at :216-253), so total work is
O(Σ relaxations), not O(supersteps × |E|). Halts when no distance improves
(reference: no updates → voteToHalt).

Parent tie-break: smallest (dist, parent) pair — deterministic, so results
are partition-count invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from goffish_v3_spark.plans.superstep import no_aqe

INF = float("inf")


def sssp(
    spark: SparkSession,
    edges: DataFrame,
    source: int,
    weighted: bool = False,
    directed: bool = True,
    max_iter: int = 200,
) -> DataFrame:
    """Return ``(vid long, dist double, parent long)``; unreachable vertices
    keep dist = +inf and parent = -1 (the reference prints Short.MAX for
    these, SSSP.java:90; +inf is our canonical unreachable marker)."""
    e = edges.select("src", "dst", (F.col("w") if weighted else F.lit(1.0)).alias("w"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    e = e.groupBy("src", "dst").agg(F.min("w").alias("w")).persist()

    vertices = (
        e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    dist = vertices.select(
        "vid",
        F.when(F.col("vid") == source, 0.0).otherwise(F.lit(INF)).alias("dist"),
        F.lit(-1).cast("long").alias("parent"),
    ).localCheckpoint(eager=True)
    frontier = dist.filter(F.col("dist") == 0.0).select("vid", "dist")

    with no_aqe(spark):
        dist = _relax_loop(e, dist, frontier, max_iter)
    e.unpersist()
    return dist


def _relax_loop(e, dist, frontier, max_iter):
    for i in range(max_iter):
        candidates = (
            frontier.join(e, frontier.vid == e.src)
            .select(
                F.col("dst").alias("vid"),
                (F.col("dist") + F.col("w")).alias("nd"),
                F.col("src").alias("np"),
            )
            .groupBy("vid")
            .agg(F.min(F.struct("nd", "np")).alias("m"))
            .select("vid", F.col("m.nd").alias("nd"), F.col("m.np").alias("np"))
        )
        merged = dist.join(candidates, "vid", "left").select(
            "vid",
            F.when(
                F.coalesce(F.col("nd"), F.lit(INF)) < F.col("dist"), F.col("nd")
            ).otherwise(F.col("dist")).alias("dist"),
            F.when(
                F.coalesce(F.col("nd"), F.lit(INF)) < F.col("dist"), F.col("np")
            ).otherwise(F.col("parent")).alias("parent"),
            (F.coalesce(F.col("nd"), F.lit(INF)) < F.col("dist")).alias("_improved"),
        )
        # one job/superstep: improvement count observed during truncation
        obs = Observation(f"sssp_step_{i}")
        merged = merged.observe(
            obs, F.sum(F.col("_improved").cast("long")).alias("improved")
        ).localCheckpoint(eager=True)
        improved = int(obs.get["improved"] or 0)
        frontier = merged.filter(F.col("_improved")).select("vid", "dist")
        dist = merged.select("vid", "dist", "parent")
        if improved == 0:
            break

    return dist
