"""Triangle counting — ordered-orientation self-joins.

Semantics: sample-hama TriangleCount.java:74-392 and the Giraph variant
(giraph examples SubgraphTriangleCount.java:54-212): the graph is treated as
undirected, each triangle counted once via the ordered triple
``vid1 < vid2 < vid3`` (the reference's dedup predicate at :102-104).

The reference spends 3 supersteps of hand-packed messaging (wedge queueing →
wedge extension → closure probing, TriangleCount.java:88-249). In Spark the
same computation is two self-joins over the oriented edge set — Catalyst
plans them as shuffled hash/sort-merge joins with both sides partitioned on
the join key, which *is* the wedge routing, minus the custom byte packing
(ByteArrayHelper.java is subsumed by Tungsten/Arrow, SURVEY.md §4 P4):

    e   = undirected edges oriented src<dst (each pair once)
    wedge(u,v,w)   : e(u,v) ⋈ e(v,w)          -- u<v<w by construction
    triangle       : wedge semi-join e(u,w)

Per-vertex counts explode each triangle's three corners and aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def oriented_edges(edges: DataFrame, partition_into: int | None = None) -> DataFrame:
    """Undirected edge set, canonical orientation u<v, deduped.

    With ``partition_into`` the dedup rides a single repartition-by-u
    exchange (HashPartitioning(u) satisfies the (u,v) dedup's clustering —
    the one-exchange layout shared with the pagerank/sssp/lpa setups) and
    the output stays hash-partitioned on u for the caller to cache."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    o = e.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    )
    if partition_into is None:
        return o.distinct()
    return o.repartition(partition_into, "u").dropDuplicates(["u", "v"])


def triangles(edges: DataFrame) -> DataFrame:
    """All triangles as ``(u, v, w)`` with u<v<w, each exactly once.

    The oriented edge table is hash-partitioned on ``u``: the wedge
    join's e2 side (joined on its u, renamed v) and the closure join's
    edge side (keys (cu, cw) ⊇ {cu}) both reuse that partitioning, so of
    the five edge/wedge-table exchanges the naive plan pays (dedup, both
    wedge-join sides, both closure sides) only two remain — e1 into the
    wedge join and the wedges into the closure.

    No ``persist`` here: the three uses of ``e`` share one canonical
    repartition exchange, so exchange reuse serves them from a single
    shuffle write (measured: walls identical with/without persist at
    sf0.01). A persist inside a lazy-returning function leaked cached
    tables for the session lifetime (VERDICT r4 #2); callers wanting an
    explicit cache can pass a persisted ``oriented_edges`` result through
    their own plan."""
    n_shuffle = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    e = oriented_edges(edges, partition_into=n_shuffle)
    e1 = e.alias("e1")
    e2 = e.select(F.col("u").alias("v"), F.col("v").alias("w")).alias("e2")
    wedges = e1.join(e2, "v").select("u", "v", "w")
    closed = wedges.join(
        e.select(F.col("u").alias("cu"), F.col("v").alias("cw")),
        (F.col("u") == F.col("cu")) & (F.col("w") == F.col("cw")),
        "left_semi",
    )
    return closed


def triangle_count(edges: DataFrame) -> int:
    """Global triangle count (reference's aggregate subgraph value,
    TriangleCount.java:252)."""
    return triangles(edges).count()


def triangle_count_df(edges: DataFrame) -> DataFrame:
    """Global count as a 1-row DataFrame ``(triangles long)`` for oracles."""
    return triangles(edges).agg(F.count("*").alias("triangles"))


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """``(vid long, triangles long)`` — per-vertex incident triangle count."""
    t = triangles(edges)
    corners = (
        t.select(F.col("u").alias("vid"))
        .unionAll(t.select(F.col("v").alias("vid")))
        .unionAll(t.select(F.col("w").alias("vid")))
    )
    return corners.groupBy("vid").agg(F.count("*").alias("triangles"))
