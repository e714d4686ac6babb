"""Link prediction: common-neighbor candidate generation with top-k.

The classic link-prediction primitive (Liben-Nowell & Kleinberg 2003):
for every vertex, the non-neighbors sharing the most neighbors with it
are the best new-edge candidates — recommendation candidate generation
on the link graph. Score = |Γ(u) ∩ Γ(v)| for (u, v) not already an edge.

Scale shape: ONE wedge self-join of the symmetrized adjacency hashed on
the wedge center (the same join pattern as triangle counting — wedges
∝ Σ deg², so the optional ``max_center_degree`` guard drops hub centers
the way :mod:`.triangles`' orientation guard does; a hub's wedges score
pairs that overwhelmingly share many OTHER centers too, so capped recall
degrades gracefully and the cap is the knob a 100 TB run sets), one
groupBy count on the candidate pair, one LEFT ANTI join against the edge
set, and a per-vertex top-k window with a pinned total order. All-integer
output — hash-exact across engines (:func:`link_prediction_sql`).

Reference parity: the reference has no link-prediction surface; this is
part of the beyond-reference pipeline layer (SURVEY.md §2.D), reusing
its triangle machinery's wedge-join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def link_prediction_common_neighbors(
    edges: DataFrame,
    k: int = 3,
    max_center_degree: int | None = None,
    min_common: int = 1,
) -> DataFrame:
    """``(vid, rec_vid, common_neighbors, rank)`` — for every vertex, the
    top ``k`` non-adjacent vertices by shared-neighbor count (ties broken
    by ascending rec_vid; the total order is pinned so top-k is unique).
    ``edges(src, dst)`` is symmetrized and deduplicated internally;
    self-pairs and existing edges are excluded.

    ``min_common`` is the support threshold (keep pairs sharing ≥ that
    many neighbors) — the scale knob for DENSE graphs, where the wedge
    volume is Σ deg² regardless of hubs and the candidate-pair table is
    the downstream cost (sf0.1 copart: 101 M pairs at support 1, 8.9 M at
    support 3). It filters AFTER the count, so surviving rows are exact;
    a vertex whose every candidate is below support simply emits no rows
    (in recommendation terms: no candidate worth showing)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    if max_center_degree is not None and max_center_degree < 1:
        raise ValueError(
            f"max_center_degree must be >= 1, got {max_center_degree}"
        )
    e = edges.select(
        F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    und = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )
    centers = und.select(F.col("u").alias("c"), F.col("v").alias("a"))
    if max_center_degree is not None:
        deg = und.groupBy(F.col("u").alias("c")).agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") <= max_center_degree).select("c")
        centers = centers.join(F.broadcast(keep), "c", "left_semi")
    # canonical halving: common-neighbor counts are symmetric, so count
    # each unordered pair once (a < b) and mirror after the aggregate —
    # halves the wedge rows through the groupBy shuffle, exactly
    wedges = (
        centers.alias("x")
        .join(
            centers.select(F.col("c").alias("c2"), F.col("a").alias("b")).alias("y"),
            F.col("x.c") == F.col("y.c2"),
        )
        .filter(F.col("x.a") < F.col("y.b"))
        .select(F.col("x.a").alias("vid"), F.col("y.b").alias("rec_vid"))
    )
    half = wedges.groupBy("vid", "rec_vid").agg(
        F.count("*").alias("common_neighbors")
    )
    if min_common > 1:
        half = half.filter(F.col("common_neighbors") >= min_common)
    scored = half.unionByName(
        half.select(
            F.col("rec_vid").alias("vid"),
            F.col("vid").alias("rec_vid"),
            "common_neighbors",
        )
    )
    non_edges = scored.join(
        und.select(F.col("u").alias("vid"), F.col("v").alias("rec_vid")),
        ["vid", "rec_vid"],
        "left_anti",
    )
    w = Window.partitionBy("vid").orderBy(
        F.col("common_neighbors").desc(), F.col("rec_vid").asc()
    )
    return (
        non_edges.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vid", "rec_vid", "common_neighbors", F.col("rank").cast("long"))
    )


def link_prediction_sql(
    edges_sql: str,
    k: int = 3,
    max_center_degree: int | None = None,
    min_common: int = 1,
) -> str:
    """ANSI-SQL twin of :func:`link_prediction_common_neighbors`.
    ``edges_sql`` must yield columns ``src, dst``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    if max_center_degree is not None and max_center_degree < 1:
        raise ValueError(
            f"max_center_degree must be >= 1, got {max_center_degree}"
        )
    guard = ""
    if max_center_degree is not None:
        guard = (
            ", keep AS (SELECT u AS c FROM und GROUP BY u "
            f"HAVING count(*) <= {max_center_degree})"
        )
    centers = "SELECT u AS c, v AS a FROM und"
    if max_center_degree is not None:
        centers += " JOIN keep ON und.u = keep.c"
    return f"""
WITH e AS (SELECT CAST(src AS BIGINT) AS u, CAST(dst AS BIGINT) AS v
           FROM ({edges_sql}) WHERE src <> dst),
und AS (SELECT DISTINCT u, v FROM
        (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e)){guard},
centers AS ({centers}),
scored AS (
  SELECT x.a AS vid, y.a AS rec_vid, count(*) AS common_neighbors
  FROM centers x JOIN centers y ON x.c = y.c AND x.a <> y.a
  GROUP BY x.a, y.a
  HAVING count(*) >= {min_common}
),
non_edges AS (
  SELECT s.* FROM scored s
  LEFT JOIN und ON und.u = s.vid AND und.v = s.rec_vid
  WHERE und.u IS NULL
),
ranked AS (
  SELECT vid, rec_vid, common_neighbors,
         row_number() OVER (PARTITION BY vid
                            ORDER BY common_neighbors DESC, rec_vid ASC)
           AS rank
  FROM non_edges
)
SELECT CAST(vid AS BIGINT) AS vid, CAST(rec_vid AS BIGINT) AS rec_vid,
       CAST(common_neighbors AS BIGINT) AS common_neighbors,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""
