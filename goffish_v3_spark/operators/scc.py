"""Strongly connected components: FW-BW-Trim coloring on directed graphs.

The directed companion of :mod:`.wcc` (the reference ships only the
undirected ConnectedComponents, ConnectedComponents.java:45-122; SCC is
the north-star graph's missing cycle detector — a nontrivial SCC in a
file-dependency graph IS a circular-import group). Exact algorithm, the
standard distributed decomposition (Orzan's coloring / FW-BW with
trimming, as in e.g. Slota et al.):

repeat until no vertices remain:
  1. **Trim** to fixpoint: a vertex with no incoming or no outgoing
     active edge cannot sit on a cycle — it is its own SCC. This peels
     the DAG-ish bulk in cheap semi-join passes (most real dependency
     graphs are mostly acyclic).
  2. **Forward color** to fixpoint: ``color(u) = max id that reaches u``
     by max-propagation along edges. Roots are ``color(r) = r``.
  3. **Backward mark** within each color class: members that can reach
     their root using same-color vertices only. The marked set of color
     ``r`` is exactly SCC(r), labeled ``scc_id = r`` (= the max member:
     r reaches every member and every member's color is r, so r is the
     largest vertex mutually reachable with any of them).
  4. Remove the marked SCCs and iterate on the remainder.

Labels are therefore canonical (max member id) and the operator works
for any orderable id type — the repo graph's string keys included.

Scale shape: every step is equi-joins + groupBy-max + semi/anti-joins on
the active subgraph, with ``localCheckpoint`` lineage barriers per round
(the house iterative pattern) and driver-observed convergence counts.
Worst case is an anti-ordered path (O(V) outer rounds) — trimming
resolves exactly that shape in O(path/2) cheap passes instead, which is
why the trim loop runs first and to fixpoint. Honest round-count note:
forward coloring and backward marking each converge in DIAMETER rounds
of the remaining cyclic subgraph (max propagation moves one hop per
round — a single huge cycle of length L costs L rounds; there is no
pointer-jumping shortcut for directed reachability). That matches the
published FW-BW behavior; dependency graphs have short cycles, but a
pathological ring is latency-bound here exactly as it is in the
reference-class systems. ``max_outer``/``max_inner`` raise loudly
rather than silently truncate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def scc(
    spark: SparkSession,
    edges: DataFrame,
    max_outer: int = 30,
    max_inner: int = 200,
) -> DataFrame:
    """``(vid, scc_id)`` — one row per vertex of ``edges(src, dst)``,
    ``scc_id`` = the MAX member id of the vertex's strongly connected
    component (canonical, partition-invariant). Ids may be any orderable
    type (long vids, the repo graph's string keys, ...)."""
    e_all = _ckpt(
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # vertex universe from the UNFILTERED edges: a vertex whose only edge
    # is a self-loop is still a (singleton) SCC and must get a row
    rem_v = _ckpt(
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    rem_e = e_all
    done: list[DataFrame] = []

    for _outer in range(max_outer):
        if rem_v.count() == 0:
            break

        # ---- 1. trim to fixpoint ------------------------------------
        for _t in range(max_inner):
            has_out = rem_e.select(F.col("src").alias("vid")).distinct()
            has_in = rem_e.select(F.col("dst").alias("vid")).distinct()
            core = _ckpt(
                rem_v.join(has_out, "vid", "left_semi").join(
                    has_in, "vid", "left_semi"
                )
            )
            trimmed = rem_v.join(core, "vid", "left_anti")
            if trimmed.count() == 0:
                break
            done.append(
                _ckpt(trimmed.select("vid", F.col("vid").alias("scc_id")))
            )
            rem_v = core
            rem_e = _ckpt(
                rem_e.join(
                    rem_v.select(F.col("vid").alias("src")), "src", "left_semi"
                ).join(
                    rem_v.select(F.col("vid").alias("dst")), "dst", "left_semi"
                ).select("src", "dst")
            )
        else:
            raise RuntimeError(f"scc: trim did not converge in {max_inner} passes")
        if rem_v.count() == 0:
            break

        # ---- 2. forward max-color fixpoint ---------------------------
        color = _ckpt(rem_v.select("vid", F.col("vid").alias("color")))
        for _i in range(max_inner):
            msgs = rem_e.join(
                color.withColumnRenamed("vid", "src"), "src"
            ).select(F.col("dst").alias("vid"), "color")
            new_color = _ckpt(
                color.unionByName(msgs)
                .groupBy("vid")
                .agg(F.max("color").alias("color"))
            )
            changed = (
                new_color.alias("n")
                .join(color.alias("o"), "vid")
                .filter(F.col("n.color") != F.col("o.color"))
                .count()
            )
            color = new_color
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"scc: forward coloring did not converge in {max_inner} rounds"
            )

        # ---- 3. backward mark within the color class -----------------
        ce = _ckpt(
            rem_e.join(
                color.select(F.col("vid").alias("src"), F.col("color").alias("cs")),
                "src",
            )
            .join(
                color.select(F.col("vid").alias("dst"), F.col("color").alias("cd")),
                "dst",
            )
            .filter(F.col("cs") == F.col("cd"))
            .select("src", "dst")
        )
        mark = _ckpt(
            color.filter(F.col("vid") == F.col("color")).select("vid")
        )
        for _i in range(max_inner):
            new_marks = (
                ce.join(mark.withColumnRenamed("vid", "dst"), "dst")
                .select(F.col("src").alias("vid"))
                .distinct()
                .join(mark, "vid", "left_anti")
            )
            if new_marks.count() == 0:
                break
            mark = _ckpt(mark.unionByName(new_marks))
        else:
            raise RuntimeError(
                f"scc: backward marking did not converge in {max_inner} rounds"
            )

        done.append(
            _ckpt(mark.join(color, "vid").select("vid", F.col("color").alias("scc_id")))
        )
        rem_v = _ckpt(rem_v.join(mark, "vid", "left_anti"))
        rem_e = _ckpt(
            rem_e.join(
                rem_v.select(F.col("vid").alias("src")), "src", "left_semi"
            ).join(
                rem_v.select(F.col("vid").alias("dst")), "dst", "left_semi"
            ).select("src", "dst")
        )
    if rem_v.count() != 0:
        raise RuntimeError(f"scc: did not finish in {max_outer} outer rounds")

    if not done:  # no (non-self-loop) edges at all
        return e_all.select(
            F.col("src").alias("vid"), F.col("src").alias("scc_id")
        ).limit(0)
    out = done[0]
    for part in done[1:]:
        out = out.unionByName(part)
    return out


def scc_sql(edges_sql: str) -> str:
    """ANSI-SQL twin of :func:`scc` by DEFINITION rather than by replay:
    ``scc_id(u) = max({u} ∪ {v : u↔v mutually reachable})`` over the
    recursive-CTE transitive closure — algorithm-independent ground truth
    (the Spark side's FW-BW rounds need no SQL mirror; any correct SCC
    yields the same canonical labels). ``edges_sql`` must yield columns
    ``src, dst``; closure size is O(V²) so this is the small-scale oracle
    companion, same stance as the exact meta-diameter."""
    return f"""
WITH RECURSIVE e0 AS (
  SELECT DISTINCT src, dst FROM ({edges_sql})
),
e AS (SELECT src, dst FROM e0 WHERE src <> dst),
verts AS (SELECT src AS vid FROM e0 UNION SELECT dst FROM e0),
r(s, d) AS (
  SELECT src AS s, dst AS d FROM e
  UNION
  SELECT r.s, e.dst AS d FROM r JOIN e ON r.d = e.src
),
mut AS (
  SELECT a.s AS u, a.d AS v FROM r a JOIN r b ON a.s = b.d AND a.d = b.s
)
SELECT v.vid, greatest(v.vid, coalesce(max(m.v), v.vid)) AS scc_id
FROM verts v LEFT JOIN mut m ON m.u = v.vid
GROUP BY v.vid
"""


def condensation_edges(
    spark: SparkSession,
    edges: DataFrame,
    max_outer: int = 30,
    max_inner: int = 200,
) -> DataFrame:
    """``(src_scc, dst_scc)`` — the distinct edges of the condensation
    (the DAG obtained by contracting every SCC to one node, labeled by
    its max member). This is the meta-graph build-order view: a cycle-free
    dependency structure over the circular-import groups :func:`scc`
    found. One equi-join per endpoint against the label map plus a
    distinct — the same shape as the undirected meta-graph operator."""
    labels = scc(spark, edges, max_outer=max_outer, max_inner=max_inner)
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    return (
        e.join(
            labels.select(F.col("vid").alias("src"), F.col("scc_id").alias("src_scc")),
            "src",
        )
        .join(
            labels.select(F.col("vid").alias("dst"), F.col("scc_id").alias("dst_scc")),
            "dst",
        )
        .filter(F.col("src_scc") != F.col("dst_scc"))
        .select("src_scc", "dst_scc")
        .distinct()
    )


def condensation_sql(edges_sql: str) -> str:
    """ANSI-SQL twin of :func:`condensation_edges`, built on
    :func:`scc_sql`'s ground-truth labels over the same edge set."""
    return f"""
WITH labels AS (SELECT * FROM ({scc_sql(edges_sql)})),
ce0 AS (SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src <> dst)
SELECT DISTINCT la.scc_id AS src_scc, lb.scc_id AS dst_scc
FROM ce0 JOIN labels la ON ce0.src = la.vid JOIN labels lb ON ce0.dst = lb.vid
WHERE la.scc_id <> lb.scc_id
"""
