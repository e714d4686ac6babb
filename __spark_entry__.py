"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query (PageRank over the customer→supplier
link graph derived from sf0.001).
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (omitted for ops not
expressible in SQL; those get rows-only checks).

Column names are aligned 1:1 between each Spark query and its oracle; float
columns are rounded identically on both sides so value hashes agree.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goffish_v3_spark.sources.tpch_graph import (
    CS_EDGES_SQL,
    COPART_EDGES_SQL,
    customer_supplier_edges,
    copart_edges,
)

SF_DEFAULT = "/root/testdata/sf0.001"

PR_ITERS = 5
LPA_ITERS = 4
SSSP_CAP = 25  # > diameter of the cs graph at every sf


# --------------------------------------------------------------------------
# oracle SQL builders (unrolled iterations — ANSI, DuckDB-runnable)
# --------------------------------------------------------------------------

def _pagerank_sql(iters: int = PR_ITERS) -> str:
    ctes = [
        f"e AS ({CS_EDGES_SQL})",
        "verts AS (SELECT src AS vid FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY src)",
        "pr0 AS (SELECT vid, 1.0/(SELECT n FROM nn) AS rank FROM verts)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""pr{i} AS (
  SELECT v.vid, 0.85 * coalesce(s.s, 0.0) + 0.15/(SELECT n FROM nn) AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, sum(p.rank/d.deg) AS s
    FROM pr{i-1} p JOIN e ON p.vid = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON v.vid = s.vid
)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT vid, round(rank, 8) AS rank FROM pr{iters}"
    )


def _ppr_sql(iters: int = PR_ITERS) -> str:
    """Personalized PageRank unrolled: teleport mass concentrated on the
    min-src vertex (same source convention as the SSSP queries), walk
    initialized there."""
    ctes = [
        f"e AS ({CS_EDGES_SQL})",
        "verts AS (SELECT src AS vid FROM e UNION SELECT dst FROM e)",
        "sv AS (SELECT min(src) AS sv FROM e)",
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY src)",
        "pr0 AS (SELECT vid, CASE WHEN vid = (SELECT sv FROM sv) "
        "THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS rank FROM verts)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""pr{i} AS (
  SELECT v.vid, 0.85 * coalesce(s.s, 0.0)
         + CASE WHEN v.vid = (SELECT sv FROM sv)
                THEN 0.15 ELSE CAST(0 AS DOUBLE) END AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, sum(p.rank/d.deg) AS s
    FROM pr{i-1} p JOIN e ON p.vid = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON v.vid = s.vid
)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT vid, round(rank, 8) AS rank FROM pr{iters}"
    )


def _lpa_sql(iters: int = LPA_ITERS) -> str:
    ctes = [
        f"e AS ({CS_EDGES_SQL})",
        "und AS (SELECT src AS a, dst AS b FROM e WHERE src <> dst "
        "UNION SELECT dst, src FROM e WHERE src <> dst)",
        "verts AS (SELECT DISTINCT a AS vid FROM und)",
        "l0 AS (SELECT vid, vid AS label FROM verts)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""l{i} AS (
  SELECT w.vid, coalesce(p.plabel, w.label) AS label FROM l{i-1} w
  LEFT JOIN (
    SELECT vid, label AS plabel FROM (
      SELECT u.b AS vid, l.label AS label, count(*) AS cnt,
             row_number() OVER (PARTITION BY u.b ORDER BY count(*) DESC, l.label ASC) AS rn
      FROM l{i-1} l JOIN und u ON l.vid = u.a
      GROUP BY u.b, l.label
    ) x WHERE rn = 1
  ) p ON p.vid = w.vid
)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT vid, label FROM l{iters}"


WCC_SQL = f"""
WITH RECURSIVE e AS ({CS_EDGES_SQL}),
und AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
reach(vid, r) AS (
  SELECT a, a FROM und
  UNION
  SELECT u.b, reach.r FROM reach JOIN und u ON reach.vid = u.a
)
SELECT vid, min(r) AS label FROM reach GROUP BY vid
"""

SSSP_SQL = f"""
WITH RECURSIVE e AS ({CS_EDGES_SQL}),
und AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
s AS (SELECT min(src) AS sv FROM e),
walk(vid, d) AS (
  SELECT sv, 0 FROM s
  UNION
  SELECT u.b, walk.d + 1 FROM walk JOIN und u ON walk.vid = u.a
  WHERE walk.d < {SSSP_CAP}
)
SELECT vid, CAST(min(d) AS DOUBLE) AS dist FROM walk GROUP BY vid
"""

SSSP_WEIGHTED_ITERS = 20


def _sssp_weighted_sql(iters: int = SSSP_WEIGHTED_ITERS) -> str:
    """Bellman-Ford unrolled ``iters`` relaxation rounds (enough to converge
    on the cs graph, whose weighted shortest paths are hop-short); mirrors
    operators.sssp's per-superstep min-relaxation exactly, including the
    min-weight dedup per (src, dst) pair."""
    # MATERIALIZED: every d{i} is referenced twice by d{i+1} (own dist +
    # relaxation); DuckDB inlines plain CTEs, which would blow the plan up
    # 2^iters and reopen the parquet views exponentially often
    ctes = [
        f"e AS MATERIALIZED ({CS_EDGES_SQL})",
        "und0 AS (SELECT src AS a, dst AS b, w FROM e "
        "UNION ALL SELECT dst, src, w FROM e)",
        "und AS MATERIALIZED (SELECT a, b, min(w) AS w FROM und0 GROUP BY a, b)",
        "verts AS MATERIALIZED (SELECT DISTINCT a AS vid FROM und)",
        "s AS (SELECT min(src) AS sv FROM e)",
        "d0 AS MATERIALIZED (SELECT vid, CASE WHEN vid = (SELECT sv FROM s) THEN 0.0 "
        "ELSE CAST('infinity' AS DOUBLE) END AS dist FROM verts)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
  SELECT v.vid, least(p.dist, coalesce(r.nd, CAST('infinity' AS DOUBLE))) AS dist
  FROM verts v JOIN d{i-1} p ON p.vid = v.vid
  LEFT JOIN (
    SELECT u.b AS vid, min(p.dist + u.w) AS nd
    FROM d{i-1} p JOIN und u ON p.vid = u.a WHERE p.dist < CAST('infinity' AS DOUBLE)
    GROUP BY u.b
  ) r ON r.vid = v.vid
)"""
        )
    # fixpoint guard (ADVICE): if the unrolled rounds did not converge the
    # query returns 0 rows and the gate fails loudly instead of silently
    # comparing truncated distances
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT vid, round(dist, 6) AS dist FROM d{iters}"
        + f"\nWHERE (SELECT count(*) FROM d{iters} x JOIN d{iters-1} y"
        + " ON x.vid = y.vid AND x.dist <> y.dist) = 0"
    )


KCORE_ROUNDS = 30


def _kcore_hindex_ctes(rounds: int) -> list[str]:
    """Unrolled synchronous h-index iteration from degrees — converges to
    the exact core numbers (Montresor et al. 2013); the Spark kernel's
    partition-local chaotic iteration reaches the same unique fixpoint.
    19 rounds suffice at sf0.01; ``rounds`` adds margin and the callers
    append a fixpoint guard so truncation fails loudly, never silently."""
    ctes = [
        f"e AS MATERIALIZED ({COPART_EDGES_SQL})",
        "und AS MATERIALIZED (SELECT src AS a, dst AS b FROM e WHERE src<>dst "
        "UNION SELECT dst, src FROM e WHERE src<>dst)",
        "c0 AS MATERIALIZED (SELECT a AS vid, count(*) AS c FROM und GROUP BY a)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT p.vid, least(p.c, x.h) AS c
  FROM c{i-1} p JOIN (
    SELECT a AS vid, max(least(rn, nc)) AS h FROM (
      SELECT u.a, cc.c AS nc,
             row_number() OVER (PARTITION BY u.a ORDER BY cc.c DESC) AS rn
      FROM und u JOIN c{i-1} cc ON cc.vid = u.b
    ) GROUP BY a
  ) x ON x.vid = p.vid
)"""
        )
    ctes.append(
        f"fixpoint AS (SELECT count(*) AS n_diff FROM c{rounds} x "
        f"JOIN c{rounds-1} y ON x.vid = y.vid AND x.c <> y.c)"
    )
    return ctes


def _core_numbers_sql(rounds: int = KCORE_ROUNDS) -> str:
    ctes = _kcore_hindex_ctes(rounds)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT vid, CAST(c AS BIGINT) AS core FROM c{rounds}"
        "\nWHERE (SELECT n_diff FROM fixpoint) = 0"
    )


def _kcore3_sql(rounds: int = KCORE_ROUNDS, k: int = 3) -> str:
    ctes = _kcore_hindex_ctes(rounds)
    ctes.append(f"core AS (SELECT vid, c FROM c{rounds})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT vid, deg FROM (
  SELECT u.a AS vid, count(*) AS deg FROM und u
  JOIN core x ON x.vid = u.a AND x.c >= {k}
  JOIN core y ON y.vid = u.b AND y.c >= {k}
  GROUP BY u.a
) WHERE (SELECT n_diff FROM fixpoint) = 0"""
    )


KMEANS_K = 4
KMEANS_GROWTH_ROUNDS = 30
KMEANS_REFINE_ROUNDS = 3


def _kmeans_sql(
    k: int = KMEANS_K,
    growth_rounds: int = KMEANS_GROWTH_ROUNDS,
    refine_rounds: int = KMEANS_REFINE_ROUNDS,
) -> str:
    """Unrolled replay of operators.kmeans_partition(id_strata=True): mod-k
    seed strata (max-degree vertex per stratum, ties to the larger vid), BFS
    growth rounds adopting the smallest-then-lowest-id candidate cluster,
    mod-k fallback for unreached vertices, then majority-vote refine rounds
    (votes desc, size asc, cluster asc). Rounds past frontier exhaustion are
    no-ops, so unrolling the Spark side's max_rounds exactly is lossless."""
    ctes = [
        f"e AS MATERIALIZED ({CS_EDGES_SQL})",
        "und AS MATERIALIZED (SELECT src AS a, dst AS b FROM e WHERE src<>dst "
        "UNION SELECT dst, src FROM e WHERE src<>dst)",
        "allv AS MATERIALIZED (SELECT src AS vid FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT a AS vid, count(*) AS deg FROM und GROUP BY a)",
        f"""l0 AS MATERIALIZED (
  SELECT vid, CAST(vid % {k} AS INT) AS cluster FROM (
    SELECT vid, row_number() OVER (PARTITION BY vid % {k}
                                   ORDER BY deg DESC, vid DESC) AS rn
    FROM deg
  ) WHERE rn = 1
)""",
        "f0 AS (SELECT * FROM l0)",
    ]
    for i in range(1, growth_rounds + 1):
        ctes.append(
            f"""f{i} AS MATERIALIZED (
  SELECT vid, cluster FROM (
    SELECT c.vid, c.cluster,
           row_number() OVER (PARTITION BY c.vid
                              ORDER BY coalesce(s.n, 0) ASC, c.cluster ASC) AS rn
    FROM (
      SELECT u.b AS vid, f.cluster
      FROM f{i-1} f JOIN und u ON f.vid = u.a
      WHERE u.b NOT IN (SELECT vid FROM l{i-1})
    ) c
    LEFT JOIN (SELECT cluster, count(*) AS n FROM l{i-1} GROUP BY cluster) s
      ON s.cluster = c.cluster
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT * FROM l{i-1} UNION ALL SELECT * FROM f{i})"
        )
    ctes.append(
        f"rest AS (SELECT vid, CAST(vid % {k} AS INT) AS cluster FROM allv "
        f"WHERE vid NOT IN (SELECT vid FROM l{growth_rounds}))"
    )
    ctes.append(
        f"o0 AS MATERIALIZED (SELECT * FROM l{growth_rounds} UNION ALL SELECT * FROM rest)"
    )
    for j in range(1, refine_rounds + 1):
        ctes.append(
            f"""r{j} AS MATERIALIZED (
  SELECT vid, cluster FROM (
    SELECT g.vid, g.cluster,
           row_number() OVER (PARTITION BY g.vid
                              ORDER BY g.votes DESC, coalesce(s.n, 0) ASC,
                                       g.cluster ASC) AS rn
    FROM (
      SELECT u.b AS vid, o.cluster, count(*) AS votes
      FROM o{j-1} o JOIN und u ON o.vid = u.a
      GROUP BY u.b, o.cluster
    ) g
    LEFT JOIN (SELECT cluster, count(*) AS n FROM o{j-1} GROUP BY cluster) s
      ON s.cluster = g.cluster
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""o{j} AS MATERIALIZED (
  SELECT v.vid, CAST(coalesce(r.cluster, o.cluster) AS INT) AS cluster
  FROM allv v
  LEFT JOIN r{j} r ON r.vid = v.vid
  LEFT JOIN o{j-1} o ON o.vid = v.vid
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT vid, cluster FROM o{refine_rounds}"
    )


SPANNING_FOREST_STATS_SQL = f"""
WITH RECURSIVE e AS ({CS_EDGES_SQL}),
und AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
reach(vid, r) AS (
  SELECT a, a FROM und
  UNION
  SELECT u.b, reach.r FROM reach JOIN und u ON reach.vid = u.a
),
lab AS (SELECT vid, min(r) AS label FROM reach GROUP BY vid)
SELECT count(*) AS n_vertices,
       count(DISTINCT label) AS n_components,
       count(*) - count(DISTINCT label) AS n_tree_edges
FROM lab
"""

VERTEX_COUNT_SQL = f"""
WITH e AS ({CS_EDGES_SQL})
SELECT count(*) AS n_vertices
FROM (SELECT src AS vid FROM e UNION SELECT dst FROM e)
"""

EMB_NEAR_DUP_SQL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.e, b.e), 6) AS sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.45
"""

META_GRAPH_SQL = f"""
WITH e AS ({CS_EDGES_SQL})
SELECT DISTINCT CAST(src % 8 AS INT) AS src_part, CAST(dst % 8 AS INT) AS dst_part
FROM e WHERE src % 8 <> dst % 8
"""

META_DIAMETER_SQL = f"""
WITH RECURSIVE e AS ({CS_EDGES_SQL}),
me AS (SELECT DISTINCT src % 8 AS a, dst % 8 AS b FROM e WHERE src % 8 <> dst % 8),
und AS (SELECT a, b FROM me UNION SELECT b, a FROM me),
nodes AS (SELECT DISTINCT a AS v FROM und),
walk(s, v, d) AS (
  SELECT v, v, 0 FROM nodes
  UNION
  SELECT w.s, u.b, w.d + 1 FROM walk w JOIN und u ON w.v = u.a WHERE w.d < 64
),
dist AS (SELECT s, v, min(d) AS d FROM walk GROUP BY s, v)
SELECT (SELECT count(*) FROM nodes) AS n_meta_nodes,
       (SELECT count(*) FROM me) AS n_meta_edges,
       (SELECT max(d) FROM dist) AS diameter
"""

NGRAM_JACCARD_SQL = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(
           list_transform(
             range(1, greatest(len(toks) - 2, 1) + 1),
             i -> array_to_string(toks[i:i+2], ' ')
           )
         ) AS shset
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)
), inv AS (
  SELECT doc_id, len(shset) AS sz, unnest(shset) AS shingle FROM sh
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sa, b.sz AS sb,
         count(*) AS i
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, round(i / greatest(sa + sb - i, 1), 6) AS jaccard
FROM inter WHERE round(i / greatest(sa + sb - i, 1), 6) >= 0.5
"""


def _repo_edges_ctes() -> list[str]:
    """The repo-graph edge derivation (artifact scan → regexp reference
    extraction → resolution → distinct string-keyed ``edges0``) as a CTE
    prefix shared by every repo-graph oracle (PageRank, PPR, SCC)."""
    ext_case = (
        "CASE WHEN f.lang = 'python' THEN 'py' "
        "WHEN f.lang = 'java' THEN 'java' ELSE 'h' END"
    )
    pat_case = (
        r"CASE WHEN f.lang = 'python' THEN 'from pkg_\d+\.mod_(\d+) import' "
        r"WHEN f.lang = 'java' THEN 'import org\.pkg_\d+\.mod_(\d+);' "
        r"""ELSE '#include "pkg_\d+/mod_(\d+)\.h"' END"""
    )
    return [
        f"repos AS MATERIALIZED (SELECT * FROM read_parquet('{REPO_ARTIFACT}/*.parquet'))",
        "files AS MATERIALIZED (SELECT repo, path, lang, content, "
        "repo || chr(0) || path AS key FROM repos)",
        f"""imp AS (
  SELECT f.repo AS src_repo, f.path AS src_path, f.repo AS dst_repo,
         printf('src/pkg_%d/mod_%d.%s', CAST(t AS BIGINT) % 4, CAST(t AS BIGINT), {ext_case}) AS dst_path
  FROM files f, unnest(regexp_extract_all(f.content, {pat_case}, 1)) AS u(t)
)""",
        r"""dep AS (
  SELECT f.repo AS src_repo, f.path AS src_path,
         split_part(r, ' ', 1) AS dst_repo, split_part(r, ' ', 2) AS dst_path
  FROM files f, unnest(regexp_extract_all(f.content, '#dep (\S+ \S+)', 1)) AS u(r)
)""",
        """edges0 AS MATERIALIZED (
  SELECT DISTINCT src_repo || chr(0) || src_path AS src,
                  dst_repo || chr(0) || dst_path AS dst
  FROM (SELECT * FROM imp UNION ALL SELECT * FROM dep)
  WHERE src_repo || chr(0) || src_path <> dst_repo || chr(0) || dst_path
    AND dst_repo || chr(0) || dst_path IN (SELECT key FROM files)
)""",
    ]


def _repo_scc_sql() -> str:
    """Ground-truth SCC oracle on the artifact-derived repo edges: mutual
    reachability over a recursive-CTE closure (scc.scc_sql), keys split
    back into (repo, path) columns."""
    from goffish_v3_spark.operators.scc import scc_sql

    inner = "WITH " + ",\n".join(_repo_edges_ctes()) + "\nSELECT src, dst FROM edges0"
    return f"""
SELECT split_part(vid, chr(0), 1) AS repo,
       split_part(vid, chr(0), 2) AS path,
       split_part(scc_id, chr(0), 1) AS scc_repo,
       split_part(scc_id, chr(0), 2) AS scc_path
FROM ({scc_sql(inner)})
"""


def _scc_condensation_synth_sql() -> str:
    from goffish_v3_spark.operators.scc import condensation_sql

    return condensation_sql(
        "SELECT i AS src, (3 * i + 1) % 402 AS dst "
        "FROM (SELECT UNNEST(RANGE(0, 402)) AS i) WHERE i <> (3 * i + 1) % 402"
    )


def _repo_pagerank_sql(iters: int = PR_ITERS, personalized: bool = False) -> str:
    """String-keyed replay of the full flagship pipeline on the committed
    repos artifact: regexp reference extraction per language + #dep lines →
    resolution against the file dimension → distinct directed edges →
    unrolled PageRank → top 20 by (rank desc, repo, path).

    ``personalized``: all teleport mass on the min-key vertex (string min
    over the same ``repo || chr(0) || path`` keys the Spark side orders by)
    — the similar-file-discovery variant."""
    ctes = _repo_edges_ctes() + [
        "verts AS MATERIALIZED (SELECT src AS vid FROM edges0 UNION SELECT dst FROM edges0)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "deg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges0 GROUP BY src)",
        "sv AS (SELECT min(vid) AS sv FROM verts)",
        (
            "pr0 AS MATERIALIZED (SELECT vid, CASE WHEN vid = (SELECT sv FROM sv) "
            "THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS rank FROM verts)"
            if personalized
            else "pr0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT n FROM nn) AS rank FROM verts)"
        ),
    ]
    base_term = (
        "CASE WHEN v.vid = (SELECT sv FROM sv) THEN 0.15 ELSE CAST(0 AS DOUBLE) END"
        if personalized
        else "0.15/(SELECT n FROM nn)"
    )
    for i in range(1, iters + 1):
        ctes.append(
            f"""pr{i} AS MATERIALIZED (
  SELECT v.vid, 0.85 * coalesce(s.s, 0.0) + {base_term} AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, sum(p.rank/d.deg) AS s
    FROM pr{i-1} p JOIN edges0 e ON p.vid = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON v.vid = s.vid
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT f.repo, f.path, round(p.rank, 8) AS rank
FROM pr{iters} p JOIN files f ON f.key = p.vid
ORDER BY p.rank DESC, f.repo, f.path LIMIT 20"""
    )


TC_SQL = f"""
WITH e AS ({COPART_EDGES_SQL})
SELECT count(*) AS triangles
FROM e e1 JOIN e e2 ON e1.dst = e2.src JOIN e e3
  ON e3.src = e1.src AND e3.dst = e2.dst
"""

TC_VERTEX_SQL = f"""
WITH e AS ({COPART_EDGES_SQL}),
t AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM e e1 JOIN e e2 ON e1.dst = e2.src JOIN e e3
    ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT vid, count(*) AS triangles FROM (
  SELECT u AS vid FROM t UNION ALL SELECT v FROM t UNION ALL SELECT w FROM t
) GROUP BY vid
"""

LCC_COPART_SQL = f"""
WITH e AS ({COPART_EDGES_SQL}),
tr AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM e e1 JOIN e e2 ON e1.dst = e2.src JOIN e e3
    ON e3.src = e1.src AND e3.dst = e2.dst
),
t AS (
  SELECT vid, count(*) AS triangles FROM (
    SELECT u AS vid FROM tr UNION ALL SELECT v FROM tr UNION ALL SELECT w FROM tr
  ) GROUP BY vid
),
d AS (
  SELECT vid, count(*) AS deg FROM (
    SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e
  ) GROUP BY vid
)
SELECT d.vid, d.deg,
       CASE WHEN d.deg >= 2
            THEN CAST(2 AS DOUBLE) * coalesce(t.triangles, 0)
                 / (d.deg * (d.deg - 1))
            ELSE CAST(0 AS DOUBLE) END AS lcc
FROM d LEFT JOIN t USING (vid)
"""

from goffish_v3_spark.operators.linkpred import (  # noqa: E402
    link_prediction_sql as _link_pred_sql,
)

LINK_PRED_COPART_SQL = _link_pred_sql(COPART_EDGES_SQL, k=3)

# Common neighbors of an existing edge = triangles through it; Jaccard =
# cn / (deg(u) + deg(v) - cn) (networkx convention, denominator >= 2).
EDGE_JACCARD_SQL = f"""
WITH e AS ({COPART_EDGES_SQL}),
tr AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM e e1 JOIN e e2 ON e1.dst = e2.src JOIN e e3
    ON e3.src = e1.src AND e3.dst = e2.dst
),
te AS (
  SELECT u AS a, v AS b FROM tr
  UNION ALL SELECT u, w FROM tr
  UNION ALL SELECT v, w FROM tr
),
cn AS (SELECT a, b, count(*) AS cn FROM te GROUP BY a, b),
d AS (
  SELECT vid, count(*) AS deg FROM (
    SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e
  ) GROUP BY vid
)
SELECT e.src AS u, e.dst AS v,
       CAST(coalesce(cn.cn, 0) AS BIGINT) AS cn,
       CAST(coalesce(cn.cn, 0) AS DOUBLE)
       / (du.deg + dv.deg - coalesce(cn.cn, 0)) AS jaccard
FROM e LEFT JOIN cn ON e.src = cn.a AND e.dst = cn.b
JOIN d du ON e.src = du.vid JOIN d dv ON e.dst = dv.vid
"""

# Exact BIGINT moment sums, double math only in the closing expression —
# the same determinism discipline as the polynomial det-twins, so the hash
# compare is exact (no float-accumulation-order dependence on either side).
ASSORT_COPART_SQL = f"""
WITH e AS ({COPART_EDGES_SQL}),
d AS (
  SELECT x, count(*) AS deg FROM (
    SELECT src AS x FROM e UNION ALL SELECT dst AS x FROM e
  ) GROUP BY x
),
m AS (
  SELECT src AS u, dst AS v FROM e
  UNION ALL SELECT dst AS u, src AS v FROM e
),
j AS (
  SELECT du.deg AS ds, dv.deg AS dt
  FROM m JOIN d du ON m.u = du.x JOIN d dv ON m.v = dv.x
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ds) AS BIGINT) AS sx, CAST(sum(dt) AS BIGINT) AS sy,
         CAST(sum(ds * ds) AS BIGINT) AS sxx,
         CAST(sum(dt * dt) AS BIGINT) AS syy,
         CAST(sum(ds * dt) AS BIGINT) AS sxy
  FROM j
)
SELECT n AS n_directed_edges,
       CAST(n * sxy - sx * sy AS DOUBLE)
       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS assortativity
FROM s
"""

# Deterministic Zipf-skewed fixture (sources/synthetic.generate_skewed_edges
# at n_edges=100k, n_vertices=10k, seed=11), regenerated in pure SQL: src is
# Zipf via inverse CDF rank = floor((n+1)^u) - 1 with the heavy rank-0 vertex
# scattered to MID id-range (the id-orientation wedge adversary), dst uniform.
# Exercises the triangle wedge-count guard end-to-end: max per-key wedges >>
# edge count, so orientation='auto' must route through the degree-oriented
# (hub-proof) plan and still match the plain SQL triangle join.
SKEW_GEN_SQL = """
SELECT CAST((rank * 48271 + 5000) % 10000 AS BIGINT) AS src,
       CAST(((id % 2147483647) * 1866245627 + 78) % 10000 AS BIGINT) AS dst
FROM (
  SELECT id,
         least(CAST(floor(power(10001.0, u1)) AS BIGINT) - 1, 9999) AS rank
  FROM (
    SELECT range AS id,
           (((range % 2147483647) * 2654435761 + 11) % 2147483647)
             / 2147483647.0 AS u1
    FROM range(0, 100000)
  )
)
"""

SKEW_ORIENTED_SQL = f"""
SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
FROM ({SKEW_GEN_SQL}) WHERE src <> dst
"""

TC_SKEW_SQL = f"""
WITH e AS ({SKEW_ORIENTED_SQL})
SELECT count(*) AS triangles
FROM e e1 JOIN e e2 ON e1.dst = e2.src JOIN e e3
  ON e3.src = e1.src AND e3.dst = e2.dst
"""

WEDGE_STATS_SKEW_SQL = f"""
WITH e AS ({SKEW_ORIENTED_SQL}),
n1 AS (SELECT dst AS x, count(*) AS n1 FROM e GROUP BY dst),
n2 AS (SELECT src AS x, count(*) AS n2 FROM e GROUP BY src)
SELECT CAST(sum(n1 * n2) AS BIGINT) AS total_wedges,
       CAST(max(n1 * n2) AS BIGINT) AS max_key_wedges
FROM n1 JOIN n2 USING (x)
"""

DEGREE_HIST_SQL = f"""
WITH e AS ({CS_EDGES_SQL})
SELECT deg, count(*) AS n_vertices FROM (
  SELECT src, count(*) AS deg FROM e GROUP BY src
) GROUP BY deg
"""

GRAPH_STATS_SQL = f"""
WITH e AS ({CS_EDGES_SQL})
SELECT
  (SELECT count(*) FROM (SELECT src FROM e UNION SELECT dst FROM e)) AS n_vertices,
  (SELECT count(*) FROM e) AS n_edges,
  (SELECT max(c) FROM (SELECT count(*) AS c FROM e GROUP BY src)) AS max_out_degree,
  (SELECT max(c) FROM (SELECT count(*) AS c FROM e GROUP BY dst)) AS max_in_degree
"""

# k-th-order statistics with k in exact integer arithmetic on both sides
# ((pct*(n-1)) // 100 + 1, 1-based k-th smallest) — every column integral,
# so the hash compare is exact. The window runs over the value HISTOGRAM
# (|distinct lengths| rows), mirroring the Spark plan's scale shape.
DOC_LEN_PCTL_SQL = """
WITH n AS (SELECT count(*) AS n FROM documents),
ks AS (
  SELECT CAST(p AS BIGINT) AS pct,
         (CAST(p AS BIGINT) * (n.n - 1)) // 100 + 1 AS k
  FROM (VALUES (1), (25), (50), (75), (90), (99)) v(p), n
),
h AS (
  SELECT CAST(length(text) AS BIGINT) AS val, count(*) AS c
  FROM documents GROUP BY 1
),
cum AS (
  SELECT val,
         sum(c) OVER (ORDER BY val
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM h
)
SELECT ks.pct, ks.k, min(cum.val) AS value
FROM ks JOIN cum ON cum.cum >= ks.k
GROUP BY ks.pct, ks.k
"""

# Per-key volume z-scores from exact BIGINT moments; double math only in
# the closing per-row expression (z = (n*c - Σc) / sqrt(n*Σc² - Σc²_sum)).
USER_ZSCORE_SQL = """
WITH c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_events) AS BIGINT) AS sx,
         CAST(sum(n_events * n_events) AS BIGINT) AS sxx
  FROM c
)
SELECT c.user_id, c.n_events,
       CAST(m.n * c.n_events - m.sx AS DOUBLE)
       / sqrt(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)) AS z
FROM c, m
"""

DEGREE_PCTL_SQL = f"""
WITH e AS ({CS_EDGES_SQL}),
dv AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
n AS (SELECT count(*) AS n FROM dv),
ks AS (
  SELECT CAST(p AS BIGINT) AS pct,
         (CAST(p AS BIGINT) * (n.n - 1)) // 100 + 1 AS k
  FROM (VALUES (50), (90), (99), (100)) v(p), n
),
h AS (SELECT deg AS val, count(*) AS c FROM dv GROUP BY deg),
cum AS (
  SELECT val,
         sum(c) OVER (ORDER BY val
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM h
)
SELECT ks.pct, ks.k, min(cum.val) AS value
FROM ks JOIN cum ON cum.cum >= ks.k
GROUP BY ks.pct, ks.k
"""

DOC_TOKENS_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
       CAST(length(text) AS BIGINT) AS n_chars_calc
FROM documents
"""

DOC_QUALITY_SQL = r"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars_calc,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct
  FROM documents
), feat AS (
  SELECT doc_id, n_chars_calc, n_words,
         round((n_chars_calc - n_words + 1) / greatest(n_words, 1), 6) AS mean_word_len,
         round(n_punct / greatest(n_chars_calc, 1), 6) AS punct_ratio
  FROM base
)
SELECT doc_id, n_chars_calc, n_words, mean_word_len, punct_ratio,
       round(
         (CASE WHEN n_words >= 5 AND n_chars_calc >= 30 THEN 0.4 ELSE 0.0 END)
       + (CASE WHEN punct_ratio <= 0.2 THEN 0.3 ELSE 0.0 END)
       + (CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END), 6
       ) AS quality_score
FROM feat
"""

_LANG_MARKERS_SQL = {
    "en": "(the|and|of|to|is)",
    "es": "(el|la|de|que|los)",
    "de": "(der|die|und|das|nicht)",
    "fr": "(le|la|et|les|des)",
}

LANG_ID_SQL = (
    "WITH hits AS (\n"
    + " UNION ALL\n".join(
        f"  SELECT doc_id, '{lang}' AS lang, "
        f"CAST(len(regexp_extract_all(lower(text), '\\b{pat}\\b')) AS BIGINT) AS h "
        "FROM documents"
        for lang, pat in sorted(_LANG_MARKERS_SQL.items())
    )
    + "\n), best AS (\n"
    "  SELECT doc_id, lang, h,\n"
    "         row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang ASC) AS rn\n"
    "  FROM hits\n"
    ")\n"
    "SELECT doc_id, CASE WHEN h > 0 THEN lang ELSE 'und' END AS lang_pred\n"
    "FROM best WHERE rn = 1"
)

# Group-wise top-k over the two deterministic per-doc signals. LANG_ID_SQL
# and DOC_QUALITY_SQL each start with their own WITH — DuckDB scoping breaks
# when a WITH is nested directly inside a CTE body, so both are wrapped as
# derived tables (SELECT * FROM (...) _x).
TOP_DOCS_PER_LANG_SQL = f"""
WITH l AS (SELECT * FROM ({LANG_ID_SQL}) _l),
q AS (SELECT * FROM ({DOC_QUALITY_SQL}) _q),
j AS (
  SELECT l.doc_id, l.lang_pred, q.quality_score
  FROM l JOIN q ON l.doc_id = q.doc_id
),
r AS (
  SELECT lang_pred, doc_id, quality_score,
         CAST(row_number() OVER (
           PARTITION BY lang_pred
           ORDER BY quality_score DESC, doc_id ASC) AS BIGINT) AS rn
  FROM j
)
SELECT lang_pred, doc_id, quality_score, rn FROM r WHERE rn <= 3
"""

# Deterministic hash-sampling twins: thresholds and the bucket mixer come
# from goffish_v3_spark.operators.sampling so both engines replay the exact
# same 64-bit integer arithmetic (no floats in any keep/split decision).
from goffish_v3_spark.operators.sampling import (  # noqa: E402
    _threshold as _samp_threshold,
    bucket_sql as _samp_bucket_sql,
    split_thresholds as _samp_split_thresholds,
)

_STRAT_RATES = {"en": 0.3, "de": 0.6, "fr": 0.5}
_STRAT_DEFAULT = 0.1
_STRAT_SEED = 7

SAMPLE_STRATIFIED_SQL = (
    "SELECT doc_id, lang, source FROM documents\n"
    f"WHERE ({_samp_bucket_sql('doc_id', seed=_STRAT_SEED)}) < CASE lang\n"
    + "".join(
        f"  WHEN '{lang}' THEN {_samp_threshold(rate)}\n"
        for lang, rate in _STRAT_RATES.items()
    )
    + f"  ELSE {_samp_threshold(_STRAT_DEFAULT)} END"
)

_SPLIT_SEED = 3
_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}

def _split_case_sql() -> str:
    arms = "".join(
        f"  WHEN ({_samp_bucket_sql('doc_id', seed=_SPLIT_SEED)}) < {thr} THEN '{name}'\n"
        for name, thr in _samp_split_thresholds(_SPLIT_WEIGHTS)
    )
    last = list(_SPLIT_WEIGHTS)[-1]
    return f"CASE\n{arms}  ELSE '{last}'\nEND"

SPLIT_COUNTS_SQL = f"""
SELECT split, lang, count(*) AS n_docs FROM (
  SELECT {_split_case_sql()} AS split, lang FROM documents
) GROUP BY split, lang
"""

PURCHASE_ASOF_CLICK_SQL = """
SELECT l.event_id, l.user_id, l.ts, l.value,
       r.asof_ts, r.asof_event_id, r.asof_value
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') l
LEFT JOIN LATERAL (
  SELECT ts AS asof_ts, event_id AS asof_event_id, value AS asof_value
  FROM events r
  WHERE r.event_type = 'click' AND r.user_id = l.user_id AND r.ts <= l.ts
  ORDER BY r.ts DESC, r.event_id DESC
  LIMIT 1
) r ON TRUE
"""

CLICKS_IN_SIGNUP_HOUR_SQL = """
SELECT s.event_id, s.user_id, s.ts,
       CAST(count(c.event_id) AS BIGINT) AS n_clicks
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
  ON c.user_id = s.user_id AND c.ts >= s.ts AND c.ts <= s.ts + INTERVAL 1 HOUR
GROUP BY s.event_id, s.user_id, s.ts
"""

EVENTS_ROLLUP_SQL = """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY ROLLUP (day, event_type)
"""

from goffish_v3_spark.operators.sketch import kmv_sql as _kmv_sql  # noqa: E402
from goffish_v3_spark.operators.sketch import hll_sql as _hll_sql  # noqa: E402
from goffish_v3_spark.operators.sketch import hll_group_sql as _hll_group_sql  # noqa: E402

DISTINCT_USERS_KMV_SQL = _kmv_sql("events", "user_id", k=64, seed=0)
DISTINCT_EVENTS_HLL_SQL = _hll_sql("events", "event_id", m_bits=6, seed=0)
USERS_BY_TYPE_HLL_SQL = _hll_group_sql(
    "events", ["event_type"], "user_id", m_bits=6, seed=0
)

from goffish_v3_spark.operators.sketch import kmv_set_sql as _kmv_set_sql  # noqa: E402

PURCHASE_CLICK_KMV_SQL = _kmv_set_sql(
    "(SELECT user_id FROM events WHERE event_type = 'purchase')",
    "user_id",
    "(SELECT user_id FROM events WHERE event_type = 'click')",
    "user_id",
    k=64,
    seed=0,
)

# bloom_semi_join_orders: the oracle is the PLAIN join — hash equality is
# the end-to-end proof that the bloom prefilter drops no true row.
BLOOM_SEMI_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 4) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority
"""

from goffish_v3_spark.operators.bloom import bloom_bits_sql as _bloom_bits_sql  # noqa: E402
from goffish_v3_spark.operators.bloom import bloom_hashes_sql as _bloom_hashes_sql  # noqa: E402

_BLOOM_M, _BLOOM_K = 4096, 3
_BLOOM_HASH_CTES, _BLOOM_HASH_FIN = _bloom_hashes_sql("dk", "k0", seed=0, start=100)
_BLOOM_KS = ", ".join(str(j) for j in range(_BLOOM_K))

# bloom_filter_stats: full Kirsch–Mitzenmacher replay — bit table, per-key
# membership (all k positions set), candidate/matched/false-positive rows.
BLOOM_STATS_SQL = f"""
WITH bits AS ({_bloom_bits_sql("(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')", "c_custkey", m=_BLOOM_M, k=_BLOOM_K, seed=0)}),
seg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
dk AS (SELECT DISTINCT o_custkey AS k0 FROM orders),
{_BLOOM_HASH_CTES},
e AS (SELECT key, h1, h2, UNNEST([{_BLOOM_KS}]) AS i FROM {_BLOOM_HASH_FIN}),
p AS (SELECT key, i, (h1 + i * h2) % {_BLOOM_M} AS pos FROM e),
pass AS (SELECT key FROM p JOIN bits USING (pos)
         GROUP BY key HAVING count(DISTINCT i) = {_BLOOM_K}),
cand AS (SELECT o.o_custkey FROM orders o JOIN pass ON o.o_custkey = pass.key)
SELECT 'n_keys' AS stat, CAST(count(*) AS BIGINT) AS value FROM seg
UNION ALL SELECT 'n_bits_set', CAST(count(*) AS BIGINT) FROM bits
UNION ALL SELECT 'candidate_orders', CAST(count(*) AS BIGINT) FROM cand
UNION ALL SELECT 'matched_orders', CAST(count(*) AS BIGINT)
          FROM orders JOIN seg ON o_custkey = c_custkey
UNION ALL SELECT 'false_positive_orders',
          CAST((SELECT count(*) FROM cand) AS BIGINT)
          - CAST((SELECT count(*) FROM orders JOIN seg ON o_custkey = c_custkey) AS BIGINT)
"""

from goffish_v3_spark.operators.hyperball import hyperball_sql as _hyperball_sql  # noqa: E402

HYPERBALL_T2_SQL = _hyperball_sql(
    "WITH cs AS ({cs}) SELECT src, dst FROM cs "
    "UNION ALL SELECT dst AS src, src AS dst FROM cs".format(cs=CS_EDGES_SQL),
    t=2,
    m_bits=5,
    seed=0,
)

from goffish_v3_spark.operators.hyperball import (  # noqa: E402
    harmonic_centrality_sql as _harmonic_sql,
)

HARMONIC_T3_SQL = _harmonic_sql(
    "WITH cs AS ({cs}) SELECT src, dst FROM cs "
    "UNION ALL SELECT dst AS src, src AS dst FROM cs".format(cs=CS_EDGES_SQL),
    t=3,
    m_bits=4,
    seed=0,
)

from goffish_v3_spark.operators.hyperball import (  # noqa: E402
    neighborhood_function_sql as _nf_sql,
)

NEIGHBORHOOD_FN_SQL = _nf_sql(
    "WITH cs AS ({cs}) SELECT src, dst FROM cs "
    "UNION ALL SELECT dst AS src, src AS dst FROM cs".format(cs=CS_EDGES_SQL),
    t=3,
    m_bits=4,
    seed=0,
)

from goffish_v3_spark.operators.walks import random_walks_sql as _walks_sql  # noqa: E402

RANDOM_WALKS_SQL = _walks_sql(
    "WITH cs AS ({cs}) SELECT src, dst FROM cs "
    "UNION ALL SELECT dst AS src, src AS dst FROM cs".format(cs=CS_EDGES_SQL),
    length=4,
    num_walks=1,
)

DEDUP_EXACT_SQL = """
SELECT sha256(text) AS content_sha, count(*) AS n_docs, min(doc_id) AS first_doc_id
FROM documents
GROUP BY 1
"""

TOP_TOKENS_SQL = r"""
SELECT token, count(*) AS n FROM (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents
) WHERE length(token) > 0
GROUP BY token ORDER BY n DESC, token LIMIT 50
"""

def _cms_sql(d: int = 3, w: int = 512, seed: int = 0, k: int = 50) -> str:
    """Exact SQL replay of the count-min build + estimate: identical affine
    constants (imported from operators.sketch.cms_params — single source of
    truth), identical polynomial token hash (the doc_fingerprint_det
    pattern), counters built from per-token weighted sums (cell-wise equal
    to the occurrence-level Spark build by construction)."""
    from goffish_v3_spark.operators.sketch import CMS_P, cms_params

    rows = ", ".join(f"({i}, {a}, {b})" for i, a, b in cms_params(d, seed))
    poly = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_filter(list_transform(string_split_regex(token, ''), "
        "c -> CAST(unicode(c) AS BIGINT)), c -> c >= 1)), "
        "(a, c) -> (a * 31 + c) % 1000000007)"
    )
    return rf"""
WITH tok AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents
  ) WHERE length(token) > 0 GROUP BY token
),
keyed AS (SELECT token, n, {poly} AS x FROM tok),
params(i, a, b) AS (VALUES {rows}),
counters AS (
  SELECT p.i AS i, ((k.x * p.a + p.b) % {CMS_P}) % {w} AS bucket,
         CAST(sum(k.n) AS BIGINT) AS cnt
  FROM keyed k CROSS JOIN params p GROUP BY 1, 2
),
top AS (SELECT token, n, x FROM keyed ORDER BY n DESC, token LIMIT {k})
SELECT t.token, t.n AS n_true, CAST(min(c.cnt) AS BIGINT) AS n_est
FROM top t CROSS JOIN params p
JOIN counters c ON c.i = p.i AND c.bucket = ((t.x * p.a + p.b) % {CMS_P}) % {w}
GROUP BY t.token, t.n
"""


def _minhash_det_sql(
    num_hashes=32,
    bands=8,
    shingle=3,
    threshold=0.7,
    source_sql="SELECT doc_id AS id, sha256(text) AS sha, text FROM documents",
) -> str:
    """Exact SQL replay of minhash_lsh_pairs(hash_fn='poly'): same exact-dup
    collapse, polynomial shingle hashes, affine permutations (identical
    (a_i, b_i) constants, inlined as literals), signature-slice band
    buckets, shared-bucket candidates, exact hashed-shingle Jaccard ≥
    threshold, and identical-group expansion (operators/dedup.py:94-260).
    ``source_sql`` must yield columns ``(id, sha, text)`` — parameterized so
    the same replay runs over any table (documents, the repos artifact)."""
    MIX_A, MASK = 0x9E3779B97F4A7C15, (1 << 31) - 1
    params = ", ".join(
        f"({i}, {((MIX_A * (2 * i + 1)) % MASK) or 1}, {(MIX_A * (i + 7) ** 2 + 13) % MASK})"
        for i in range(num_hashes)
    )
    rpb = num_hashes // bands
    return rf"""
WITH keyed AS (
  {source_sql}
), grp AS (
  SELECT sha, min(id) AS rep FROM keyed GROUP BY sha
), members AS (
  SELECT k.id, g.rep FROM keyed k JOIN grp g USING (sha)
), reps AS (
  SELECT k.id, k.text FROM keyed k JOIN grp g ON k.id = g.rep
), toks AS (
  SELECT id, regexp_split_to_array(trim(text), '\s+') AS t FROM reps
), sh AS (
  SELECT id, list_transform(
           generate_series(0, greatest(len(t) - {shingle}, 0)),
           i -> list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_filter(
                      list_transform(
                        string_split_regex(array_to_string(list_slice(t, i + 1, i + {shingle}), ' '), ''),
                        c -> CAST(unicode(c) AS BIGINT)),
                      c -> c >= 1)),
                  (a, c) -> (a * 31 + c) % 1000000007)
         ) AS hs
  FROM toks
), shset AS (
  SELECT id, list_distinct(hs) AS hset FROM sh
), params(pi, a, b) AS (VALUES {params}),
sigs AS (
  SELECT s.id, p.pi, min((p.a * s.h + p.b) % {MASK}) AS mh
  FROM (SELECT id, unnest(hs) AS h FROM sh) s CROSS JOIN params p
  GROUP BY s.id, p.pi
), sigarr AS (
  SELECT id, list(mh ORDER BY pi) AS sig FROM sigs GROUP BY id
), bands AS (
  SELECT id, bn.band,
         array_to_string(
           list_transform(list_slice(sig, band * {rpb} + 1, band * {rpb} + {rpb}),
                          x -> CAST(x AS VARCHAR)), ',') AS bucket
  FROM sigarr CROSS JOIN (SELECT unnest(generate_series(0, {bands - 1})) AS band) bn
), cand AS (
  SELECT DISTINCT x.id AS ra, y.id AS rb
  FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id
), rep_pairs AS (
  SELECT c.ra, c.rb,
         round(CAST(len(list_intersect(sa.hset, sb.hset)) AS DOUBLE)
               / greatest(len(list_distinct(list_concat(sa.hset, sb.hset))), 1), 6) AS jaccard
  FROM cand c JOIN shset sa ON sa.id = c.ra JOIN shset sb ON sb.id = c.rb
), cross_pairs AS (
  SELECT least(ma.id, mb.id) AS id_a, greatest(ma.id, mb.id) AS id_b, r.jaccard
  FROM rep_pairs r JOIN members ma ON ma.rep = r.ra JOIN members mb ON mb.rep = r.rb
  WHERE r.jaccard >= {threshold}
), intra AS (
  SELECT m1.id AS id_a, m2.id AS id_b, CAST(1.0 AS DOUBLE) AS jaccard
  FROM members m1 JOIN members m2 ON m1.rep = m2.rep AND m1.id < m2.id
)
SELECT id_a, id_b, jaccard FROM cross_pairs
UNION ALL SELECT id_a, id_b, jaccard FROM intra
"""


MINHASH_DET_SQL = _minhash_det_sql(threshold=0.5)

# repo_file_near_dups: the SAME replay over the committed repos artifact,
# string-keyed like the flagship repo queries (REPO_ARTIFACT is defined
# below; the f-string resolves at module import, after both exist).
_REPO_DEDUP_SOURCE = (
    "SELECT repo || chr(0) || path AS id, sha256(content) AS sha, "
    "content AS text FROM read_parquet('{art}/*.parquet')"
)

# near-dup CLUSTERS: transitive closure over the det LSH pair graph
# (WITH RECURSIVE hash-min reachability), canonical = min doc id per
# component, singletons map to themselves — the SQL twin of
# dedup.near_dup_clusters (which routes the pair graph through the
# engine's own wcc operator).
NEAR_DUP_CLUSTERS_SQL = rf"""
WITH RECURSIVE pairs AS (
  SELECT * FROM (
{MINHASH_DET_SQL}
  ) _p
), e AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
), canon AS (
  SELECT d.doc_id,
         LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS canonical_id
  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
  GROUP BY d.doc_id
)
SELECT doc_id, canonical_id,
       COUNT(*) OVER (PARTITION BY canonical_id) AS cluster_size
FROM canon
"""


def _lsh_ann_sql(k=3, dim=64, n_planes=8, n_tables=4, seed=42) -> str:
    """Exact SQL replay of similarity.lsh_topk: the SAME seeded-numpy
    hyperplanes inlined as literals (the operator is fully deterministic —
    seed 42 — so 'approximate by design' only means approximate vs exact
    ANN, not irreproducible), sign-pattern buckets computed with the same
    sequential left-to-right double fold as the Spark ``dot`` (bit-identical
    IEEE ops, so bucket signs match exactly), candidate union over tables,
    exact cosine rescoring at 6dp + row_number."""
    import numpy as np

    rows = []
    for t in range(n_tables):
        planes = np.random.default_rng(seed + 1000 * t).standard_normal(
            (n_planes, dim)
        )
        for p in range(n_planes):
            vec = ", ".join(repr(float(x)) for x in planes[p])
            rows.append(f"({t}, {p}, [{vec}]::DOUBLE[])")
    values = ",\n".join(rows)
    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), i -> v[i] * p.vec[i])), "
        "(a, x) -> a + x)"
    )
    return f"""
WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes(tbl, pl, vec) AS (VALUES
{values}
),
qb AS (
  SELECT q.vec_id, p.tbl,
         sum(CASE WHEN {dot} >= 0 THEN CAST(1 AS BIGINT) << p.pl ELSE 0 END) AS bucket
  FROM q CROSS JOIN planes p GROUP BY q.vec_id, p.tbl
),
cb AS (
  SELECT c.vec_id, p.tbl,
         sum(CASE WHEN {dot} >= 0 THEN CAST(1 AS BIGINT) << p.pl ELSE 0 END) AS bucket
  FROM c CROSS JOIN planes p GROUP BY c.vec_id, p.tbl
),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
  FROM qb JOIN cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
  WHERE qb.vec_id <> cb.vec_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         round(list_cosine_similarity(q.v, c.v), 6) AS sim
  FROM cand JOIN q ON q.vec_id = cand.query_id JOIN c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, sim, rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rk
  FROM scored
) WHERE rk <= {k}
"""


LSH_ANN_SQL = _lsh_ann_sql()

# 60-bit two-family polynomial simhash replay (operators/dedup.py
# simhash_poly: base 31 → bits 0-29, base 131 → bits 30-59;
# simhash_near_duplicates(hash_fn='poly') with lossless 4-block Charikar
# banding: 15-bit blocks, any Hamming≤3 pair agrees exactly on ≥1 block)
SIMHASH_DET_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS t
  FROM documents
), th AS (
  SELECT doc_id,
         list_transform(t, tok -> list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_filter(
               list_transform(string_split_regex(tok, ''),
                              c -> CAST(unicode(c) AS BIGINT)),
               c -> c >= 1)),
           (a, c) -> (a * 31 + c) % 1000000007)) AS hs1,
         list_transform(t, tok -> list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_filter(
               list_transform(string_split_regex(tok, ''),
                              c -> CAST(unicode(c) AS BIGINT)),
               c -> c >= 1)),
           (a, c) -> (a * 131 + c) % 1000000007)) AS hs2
  FROM toks
), fams AS (
  SELECT doc_id, 0 AS fam, unnest(hs1) AS h FROM th
  UNION ALL
  SELECT doc_id, 1 AS fam, unnest(hs2) AS h FROM th
), votes AS (
  SELECT doc_id, j, sum(CASE WHEN (h >> (j % 30)) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM fams
  CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS j)
  WHERE fam = CASE WHEN j < 30 THEN 0 ELSE 1 END
  GROUP BY doc_id, j
), sims AS (
  SELECT doc_id, sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS simhash
  FROM votes GROUP BY doc_id
), bands AS (
  SELECT doc_id, simhash, j AS band, (simhash >> (j * 15)) & 32767 AS key
  FROM sims CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j)
)
SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
FROM bands x JOIN bands y
  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
"""

DOC_FINGERPRINT_DET_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_transform(
           generate_series(0, greatest(len(t) - 8, 0)),
           i -> array_to_string(list_slice(t, i + 1, i + 8), ' ')
         ) AS shingles
  FROM toks
)
SELECT doc_id,
       list_min(list_transform(shingles, s ->
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_filter(
               list_transform(string_split_regex(s, ''),
                              c -> CAST(unicode(c) AS BIGINT)),
               c -> c >= 1)),
           (a, c) -> (a * 31 + c) % 1000000007))) AS fingerprint
FROM sh
"""

DEDUP_KEEP_ONE_SQL = """
SELECT doc_id FROM documents
WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY sha256(text))
"""

ANN_TOPK_SQL = """
WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.v, c.v), 6) AS sim
  FROM q JOIN c ON q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, sim, rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS INT) AS rk
  FROM scored
) WHERE rk <= 3
"""

FIRST_TOUCH_SQL = """
SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id,
       value AS first_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
"""

EVENTS_WINDOW_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 6) AS total_value
FROM events
GROUP BY 1, 2
"""

SESSIONS_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM sess GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# Spark-side queries
# --------------------------------------------------------------------------

def _q_edges_cs(spark: SparkSession, sf: str) -> DataFrame:
    return customer_supplier_edges(spark, sf)


def _q_pagerank_cs(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.pagerank import pagerank

    e = customer_supplier_edges(spark, sf)
    pr = pagerank(spark, e, fixed_iterations=PR_ITERS)
    return pr.select("vid", F.round("rank", 8).alias("rank"))


def _q_ppr_cs(spark: SparkSession, sf: str) -> DataFrame:
    """Personalized PageRank from the min-src vertex — same superstep plan
    as pagerank_cs, teleport term as a per-vertex expression."""
    from goffish_v3_spark.operators.pagerank import pagerank

    e = customer_supplier_edges(spark, sf)
    source = e.agg(F.min("src")).collect()[0][0]
    pr = pagerank(spark, e, fixed_iterations=PR_ITERS, teleport_vid=source)
    return pr.select("vid", F.round("rank", 8).alias("rank"))


def _q_wcc_cs(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.wcc import wcc

    e = customer_supplier_edges(spark, sf)
    und = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    return wcc(spark, und, num_parts=8)


def _q_lpa_cs(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.lpa import lpa

    e = customer_supplier_edges(spark, sf)
    return lpa(spark, e, fixed_iterations=LPA_ITERS)


def _q_sssp_cs(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.sssp import sssp

    e = customer_supplier_edges(spark, sf)
    source = e.agg(F.min("src")).collect()[0][0]
    d = sssp(spark, e, source=source, weighted=False, directed=False)
    return d.select("vid", "dist")


def _q_sssp_csr_cs(spark: SparkSession, sf: str) -> DataFrame:
    """Subgraph-centric SSSP kernel (P3 local-convergence engine) — same
    distances as the DataFrame path, checked against the same oracle."""
    from goffish_v3_spark.operators.sssp import sssp_csr

    e = customer_supplier_edges(spark, sf)
    source = e.agg(F.min("src")).collect()[0][0]
    d = sssp_csr(spark, e, source=source, weighted=False, directed=False, num_parts=8)
    return d.select("vid", "dist")


def _q_tc_copart(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.triangles import triangle_count_df

    return triangle_count_df(copart_edges(spark, sf))


def _q_tc_vertex_copart(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.triangles import triangles_per_vertex

    return triangles_per_vertex(copart_edges(spark, sf))


def _q_lcc_copart(spark: SparkSession, sf: str) -> DataFrame:
    """Per-vertex local clustering coefficient: exact integer triangle count
    and degree, one IEEE-deterministic double division — hash-checked."""
    from goffish_v3_spark.operators.triangles import local_clustering_coefficient

    return local_clustering_coefficient(copart_edges(spark, sf))


def _q_assortativity_copart(spark: SparkSession, sf: str) -> DataFrame:
    """Newman degree assortativity from exact BIGINT moment sums with a
    single closing double expression (det-twin discipline)."""
    from goffish_v3_spark.operators.stats import degree_assortativity

    return degree_assortativity(copart_edges(spark, sf))


def _q_edge_jaccard_copart(spark: SparkSession, sf: str) -> DataFrame:
    """Per-edge common neighbors + neighborhood Jaccard (link-prediction
    primitive) over the hub-guarded triangle enumeration."""
    from goffish_v3_spark.operators.triangles import edge_jaccard

    return edge_jaccard(copart_edges(spark, sf))


def _q_repo_scc(spark: SparkSession, sf: str) -> DataFrame:
    """Strongly connected components of the repo file-dependency graph —
    the cycle detector: a nontrivial SCC IS a circular-import group, the
    lint a 10^12-file monorepo runs on every commit. FW-BW-Trim coloring
    (operators/scc.py) over the string-keyed edges; labels = max member
    key. The oracle is algorithm-independent ground truth: mutual
    reachability over a recursive-CTE transitive closure on the identical
    artifact-derived edges."""
    from goffish_v3_spark.operators.scc import scc
    from goffish_v3_spark.sources.ingest import ingest
    from goffish_v3_spark.sources.synthetic import generate_repos

    repos = generate_repos(spark, n_repos=5, files_per_repo=40, seed=42)
    _ensure_repo_artifact(repos)
    repos = spark.read.parquet(REPO_ARTIFACT)
    graph = ingest(repos)
    vk = graph.vertices.select(
        "vid", F.concat_ws("\x00", F.col("repo"), F.col("path")).alias("key")
    )
    e = (
        graph.edges.join(
            vk.select(F.col("vid").alias("src"), F.col("key").alias("src_key")),
            "src",
        )
        .join(
            vk.select(F.col("vid").alias("dst"), F.col("key").alias("dst_key")),
            "dst",
        )
        .select(F.col("src_key").alias("src"), F.col("dst_key").alias("dst"))
    )
    labels = scc(spark, e)
    z = "\x00"
    return labels.select(
        F.substring_index(F.col("vid"), z, 1).alias("repo"),
        F.substring_index(F.col("vid"), z, -1).alias("path"),
        F.substring_index(F.col("scc_id"), z, 1).alias("scc_repo"),
        F.substring_index(F.col("scc_id"), z, -1).alias("scc_path"),
    )


def _q_scc_condensation_synth(spark: SparkSession, sf: str) -> DataFrame:
    """Condensation (SCC-contracted DAG) of the deterministic functional
    graph i → (3i+1) mod 402 (3 | 402, so the map is non-injective:
    cycles WITH tails hanging in), so
    unlike `repo_scc` (one giant SCC) this exercises trim, multi-SCC
    coloring, AND the contraction through the driver gate. Oracle =
    ground-truth labels over the recursive closure, contracted in SQL."""
    from goffish_v3_spark.operators.scc import condensation_edges

    n = 402
    e = (
        spark.range(0, n)
        .select(
            F.col("id").alias("src"), ((F.col("id") * 3 + 1) % n).alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
    )
    return condensation_edges(spark, e)


def _q_link_pred_copart(spark: SparkSession, sf: str) -> DataFrame:
    """Link-prediction candidate generation on the copart graph: for every
    part, the top-3 non-adjacent parts by shared co-order neighbors
    (Liben-Nowell–Kleinberg common neighbors) — one wedge self-join hashed
    on the center, LEFT ANTI against the edge set, pinned-order top-k.
    All-integer output; full SQL replay."""
    from goffish_v3_spark.operators.linkpred import (
        link_prediction_common_neighbors,
    )

    return link_prediction_common_neighbors(copart_edges(spark, sf), k=3)


def _q_tc_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle count over the Zipf mid-id-hub fixture: the auto wedge
    guard trips (max per-key wedges >> edges) and routes through the
    degree-oriented plan — hash-checked against the plain SQL join."""
    from goffish_v3_spark.operators.triangles import triangle_count_df
    from goffish_v3_spark.sources.synthetic import generate_skewed_edges

    return triangle_count_df(
        generate_skewed_edges(spark, n_edges=100_000, n_vertices=10_000)
    )


def _q_wedge_stats_skew(spark: SparkSession, sf: str) -> DataFrame:
    """The guard's probe itself: id-oriented wedge total and per-key max,
    computed by aggregation without materializing wedges."""
    from goffish_v3_spark.operators.triangles import oriented_edges
    from goffish_v3_spark.sources.synthetic import generate_skewed_edges

    o = oriented_edges(
        generate_skewed_edges(spark, n_edges=100_000, n_vertices=10_000)
    )
    as_v = o.groupBy(F.col("v").alias("x")).agg(F.count("*").alias("n1"))
    as_u = o.groupBy(F.col("u").alias("x")).agg(F.count("*").alias("n2"))
    return as_v.join(as_u, "x").agg(
        F.sum(F.col("n1") * F.col("n2")).alias("total_wedges"),
        F.max(F.col("n1") * F.col("n2")).alias("max_key_wedges"),
    )


def _q_degree_hist_cs(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.stats import degree_histogram

    return degree_histogram(customer_supplier_edges(spark, sf))


def _q_graph_stats_cs(spark: SparkSession, sf: str) -> DataFrame:
    e = customer_supplier_edges(spark, sf).persist()
    nv = (
        e.select(F.col("src").alias("v")).unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    ne = e.count()
    mo = e.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    mi = e.groupBy("dst").count().agg(F.max("count")).collect()[0][0]
    e.unpersist()
    return spark.createDataFrame(
        [(nv, ne, mo, mi)],
        "n_vertices long, n_edges long, max_out_degree long, max_in_degree long",
    )


def _q_kcore_copart(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.kcore import k_core

    return k_core(spark, copart_edges(spark, sf), k=3, num_parts=8)


def _q_core_numbers_copart(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.kcore import core_numbers

    return core_numbers(spark, copart_edges(spark, sf), num_parts=8)


def _q_sssp_weighted_cs(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.sssp import sssp

    e = customer_supplier_edges(spark, sf)
    source = e.agg(F.min("src")).collect()[0][0]
    d = sssp(spark, e, source=source, weighted=True, directed=False)
    return d.select("vid", F.round("dist", 6).alias("dist"))


def _q_vertex_count_cs(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.stats import vertex_count

    n = vertex_count(customer_supplier_edges(spark, sf))
    return spark.createDataFrame([(n,)], "n_vertices long")


def _mod8(c):
    return F.pmod(c, F.lit(8)).cast("int")


def _q_meta_graph_cs(spark: SparkSession, sf: str) -> DataFrame:
    """Partition communication topology (MetaGraph.java:30-46) under the
    deterministic mod-8 partitioner (the default xxhash64 ownership has no
    DuckDB twin; the operator is identical either way)."""
    from goffish_v3_spark.operators.stats import meta_graph

    return meta_graph(customer_supplier_edges(spark, sf), num_parts=8, part_expr=_mod8)


def _q_meta_diameter_cs(spark: SparkSession, sf: str) -> DataFrame:
    """Meta-graph diameter flood (GraphStats.java:118-210) under mod-8
    partitioning."""
    from goffish_v3_spark.operators.stats import meta_diameter

    return meta_diameter(
        spark, customer_supplier_edges(spark, sf), num_parts=8, part_expr=_mod8
    )


def _q_spanning_forest_stats_cs(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.spanning_forest import spanning_forest

    e = customer_supplier_edges(spark, sf)
    tree, labels = spanning_forest(spark, e, num_parts=8)
    nv = labels.count()
    nc = labels.select("label").distinct().count()
    nt = tree.count()
    return spark.createDataFrame(
        [(nv, nc, nt)], "n_vertices long, n_components long, n_tree_edges long"
    )


def _q_kmeans_partition_cs(spark: SparkSession, sf: str) -> DataFrame:
    """Balanced k-way partitioning minimizing edge crossings (KMeans.java
    semantics), deterministic mod-k strata mode — every seed-selection,
    growth, and refine round is replayed by the unrolled SQL oracle."""
    from goffish_v3_spark.operators.kmeans_partition import kmeans_partition

    e = customer_supplier_edges(spark, sf)
    return kmeans_partition(
        spark, e, k=KMEANS_K, max_rounds=KMEANS_GROWTH_ROUNDS,
        refine_rounds=KMEANS_REFINE_ROUNDS, id_strata=True,
    )


def _q_subgraph_pagerank_cs(spark: SparkSession, sf: str) -> DataFrame:
    """Block PageRank over partition-local CSR kernels, fixed-iteration
    global mode — bit-compatible (at 8dp) with the unrolled SQL oracle. The
    SubgraphRank local-convergence warm start (local_init=True) is covered
    by pytest allclose tests; this gate checks the kernel's global phase."""
    from goffish_v3_spark.operators.subgraph_pagerank import csr_pagerank

    e = customer_supplier_edges(spark, sf)
    return csr_pagerank(spark, e, num_parts=8, fixed_iterations=PR_ITERS).select(
        "vid", F.round("rank", 8).alias("rank")
    )


REPO_ARTIFACT = "/root/repo/.artifacts/repos_oracle_parquet"

REPO_MINHASH_SQL = _minhash_det_sql(
    threshold=0.4, source_sql=_REPO_DEDUP_SOURCE.format(art=REPO_ARTIFACT)
)
MEDIA_ARTIFACT = "/root/repo/.artifacts/media_oracle_parquet"


def _media_digest(pdf) -> str:
    import hashlib

    h = hashlib.sha256()
    cols = ["media_id", "kind", "payload", "width", "height", "duration_ms", "codec"]
    for row in pdf[cols].itertuples(index=False):
        vals = [v.hex() if isinstance(v, (bytes, bytearray)) else str(v) for v in row]
        h.update(("\x1f".join(vals) + "\n").encode())
    return h.hexdigest()


def _ensure_media_artifact(spark: SparkSession) -> None:
    """Write the synthesized real-format media table (PPM images / WAV audio
    / opaque video) ONCE as a committed parquet artifact, so DuckDB can read
    the identical payload bytes and replay the feature extraction — the
    ``repos_oracle_parquet`` pattern. Validates instead of rewriting when the
    artifact exists (a drifted ``synthesize_media`` raises loudly)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from goffish_v3_spark.operators.multimodal import synthesize_media

    gen = (
        synthesize_media(spark, n=96, seed=7, real_formats=True)
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    fixed = os.path.join(MEDIA_ARTIFACT, "media.parquet")
    if os.path.exists(fixed):
        cur = pq.read_table(fixed).to_pandas().sort_values("media_id").reset_index(drop=True)
        if _media_digest(cur) != _media_digest(gen):
            raise RuntimeError(
                "synthesize_media output drifted from the committed oracle "
                f"artifact at {fixed}; regenerate the artifact deliberately "
                "instead of overwriting it as a side effect"
            )
        return
    os.makedirs(MEDIA_ARTIFACT, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(gen, preserve_index=False), fixed)


def _media_features_sql() -> str:
    """DuckDB replay of ``extract_features(decode='real')[0]`` straight from
    the artifact's raw payload bytes — the decode itself is oracled:

    - PPM image: skip the 'P6\\n{w} {h}\\n255\\n' header, mean of the red
      channel bytes / 255 (multimodal._image_features vec[0]);
    - WAV audio: skip the fixed 44-byte RIFF/PCM16 header, RMS of the first
      ``n_samples // 16`` little-endian int16 samples / 32768
      (multimodal._audio_features vec[0]);
    - opaque video (raw/v0): first little-endian uint32 of
      sha256(payload) / 2^32 (multimodal._fake_decode vec[0]).

    Byte extraction: hex(payload) + a strpos('0123456789ABCDEF') nibble
    lookup — byte k = 16·hi + lo where each digit is strpos(...) − 1."""
    b = (
        "(strpos('0123456789ABCDEF', substr(hx, 2*({k}) + 1, 1)) * 16"
        " + strpos('0123456789ABCDEF', substr(hx, 2*({k}) + 2, 1)) - 17)"
    )
    sb = (
        "(strpos('0123456789abcdef', substr(sh, 2*({k}) + 1, 1)) * 16"
        " + strpos('0123456789abcdef', substr(sh, 2*({k}) + 2, 1)) - 17)"
    )
    img_byte = b.format(k="skip + 3*k")
    lo = b.format(k="44 + 2*i")
    hi = b.format(k="45 + 2*i")
    return f"""
WITH m AS (
  SELECT media_id, kind, codec, width, height,
         hex(payload) AS hx, octet_length(payload) AS plen,
         sha256(lower(hex(payload))) AS sh,
         9 + length(CAST(width AS VARCHAR)) + length(CAST(height AS VARCHAR)) AS skip
  FROM read_parquet('{MEDIA_ARTIFACT}/media.parquet')
),
img AS (
  SELECT media_id, kind,
         round(list_sum(list_transform(generate_series(0, width*height - 1),
               k -> {img_byte})) / (width * height * 255.0), 6) AS f0
  FROM m WHERE codec = 'ppm'
),
wav AS (
  SELECT media_id, kind,
         round(sqrt(list_sum(list_transform(generate_series(0, win - 1),
               i -> pow(({lo} + 256*{hi}
                         - CASE WHEN {hi} >= 128 THEN 65536 ELSE 0 END)
                        / 32768.0, 2))) / win), 6) AS f0
  FROM (SELECT *, ((plen - 44) // 2) // 16 AS win FROM m WHERE codec = 'wav')
),
vid AS (
  SELECT media_id, kind,
         round(({sb.format(k="0")} + 256.0*{sb.format(k="1")}
                + 65536.0*{sb.format(k="2")} + 16777216.0*{sb.format(k="3")})
               / 4294967296.0, 6) AS f0
  FROM m WHERE codec = 'raw/v0'
)
SELECT media_id, kind, f0 FROM img
UNION ALL SELECT media_id, kind, f0 FROM wav
UNION ALL SELECT media_id, kind, f0 FROM vid
"""


def _artifact_digest(pdf) -> str:
    """Row-content sha256 over the (repo, path)-sorted frame — column-order
    and file-layout independent."""
    import hashlib

    h = hashlib.sha256()
    cols = ["repo", "path", "commit", "lang", "content"]
    for row in pdf[cols].itertuples(index=False):
        h.update(("\x1f".join(str(v) for v in row) + "\n").encode())
    return h.hexdigest()


def _ensure_repo_artifact(repos: DataFrame) -> None:
    """Validate the committed oracle artifact against the freshly generated
    repos table; write it ONCE (fixed-name pyarrow file) only if absent.

    Never rewrites in place: a changed ``generate_repos`` raises instead of
    silently redefining the oracle input, and repeated driver runs leave the
    git tree clean (no random Spark part filenames)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    gen = repos.toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    fixed = os.path.join(REPO_ARTIFACT, "repos.parquet")
    if os.path.exists(fixed):
        cur = (
            pq.read_table(fixed)
            .to_pandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )
        if _artifact_digest(cur) != _artifact_digest(gen):
            raise RuntimeError(
                "generate_repos output drifted from the committed oracle "
                f"artifact at {fixed}; regenerate the artifact deliberately "
                "instead of overwriting it as a side effect"
            )
        return
    os.makedirs(REPO_ARTIFACT, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(gen, preserve_index=False), fixed)


def _q_repo_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Flagship (north_rule): synthetic repos → ingest → PageRank → top files.

    The generated repos table is validated against ``REPO_ARTIFACT`` (a
    committed, deterministic parquet) so the DuckDB oracle can replay the
    whole derivation — regexp edge extraction, resolution semi-join, unrolled
    PageRank — on the identical input, string-keyed (vids never surface in
    the output, so the xxhash64 id assignment needs no SQL twin)."""
    from goffish_v3_spark.operators.pagerank import pagerank
    from goffish_v3_spark.sources.ingest import ingest
    from goffish_v3_spark.sources.synthetic import generate_repos

    repos = generate_repos(spark, n_repos=5, files_per_repo=40, seed=42)
    _ensure_repo_artifact(repos)
    repos = spark.read.parquet(REPO_ARTIFACT)
    graph = ingest(repos)
    pr = pagerank(spark, graph.edges, fixed_iterations=PR_ITERS)
    return (
        pr.join(graph.vertices, pr.vid == graph.vertices.vid)
        .select("repo", "path", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"), "repo", "path")
        .limit(20)
    )


def _q_repo_ppr(spark: SparkSession, sf: str) -> DataFrame:
    """Similar-file discovery on the repo dependency graph: personalized
    PageRank from the lexicographically-first file key — same ingest
    pipeline as the uniform flagship, teleport concentrated on one file."""
    from goffish_v3_spark.operators.pagerank import pagerank
    from goffish_v3_spark.sources.ingest import ingest
    from goffish_v3_spark.sources.synthetic import generate_repos

    repos = generate_repos(spark, n_repos=5, files_per_repo=40, seed=42)
    _ensure_repo_artifact(repos)
    repos = spark.read.parquet(REPO_ARTIFACT)
    graph = ingest(repos)
    pr_verts = (
        graph.edges.select(F.col("src").alias("vid"))
        .unionByName(graph.edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    key = F.concat(F.col("repo"), F.lit("\x00"), F.col("path"))
    source_vid = (
        pr_verts.join(graph.vertices, "vid")
        .select("vid", key.alias("k"))
        .orderBy("k")
        .limit(1)
        .collect()[0]
        .vid
    )
    pr = pagerank(
        spark, graph.edges, fixed_iterations=PR_ITERS, teleport_vid=source_vid
    )
    return (
        pr.join(graph.vertices, pr.vid == graph.vertices.vid)
        .select("repo", "path", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"), "repo", "path")
        .limit(20)
    )


def _q_user_event_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Volume-anomaly surface: per-user event-count z-score from exact
    BIGINT moments, double math only in the closing expression."""
    from goffish_v3_spark.operators.anomaly import count_zscores

    events = spark.read.parquet(f"{sf}/events.parquet")
    return count_zscores(events, ["user_id"])


def _q_degree_percentiles_cs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact out-degree order statistics on the cs graph — the quantile
    operator composed onto the graph-side degree view (the skew diagnostic
    that sizes salting/AQE decisions)."""
    from goffish_v3_spark.operators.quantiles import exact_quantiles

    deg = (
        customer_supplier_edges(spark, sf)
        .groupBy("src")
        .agg(F.count("*").alias("deg"))
    )
    return exact_quantiles(deg, "deg", [50, 90, 99, 100])


def _q_doc_len_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact document-length order statistics from the value histogram —
    no global row_number sort (single-partition at scale); integer-exact k
    so the oracle hash-matches with no interpolation semantics to align."""
    from goffish_v3_spark.operators.quantiles import exact_quantiles

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return exact_quantiles(
        docs, F.length("text").cast("long"), [1, 25, 50, 75, 90, 99]
    )


def _q_doc_tokens(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.text import token_count

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return docs.select(
        "doc_id",
        token_count("text").cast("long").alias("n_words"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


def _q_doc_quality(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.text import quality_features

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return quality_features(docs).select(
        "doc_id", "n_chars_calc", "n_words", "mean_word_len", "punct_ratio", "quality_score"
    )


def _q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.text import language_id

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return language_id(docs).select("doc_id", "lang_pred")


def _q_top_docs_per_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Best-3 documents per predicted language by quality score — the
    group-partitioned window (per-group top-k state, no global sort),
    tie-broken by doc_id for a total order."""
    from goffish_v3_spark.operators.text import language_id, quality_features
    from goffish_v3_spark.operators.topk import top_k_per_group

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    l = language_id(docs).select("doc_id", "lang_pred")
    q = quality_features(docs).select("doc_id", "quality_score")
    return top_k_per_group(
        l.join(q, "doc_id"),
        group_cols=["lang_pred"],
        order_cols=[F.col("quality_score").desc(), F.col("doc_id").asc()],
        k=3,
    ).select("lang_pred", "doc_id", "quality_score", "rn")


def _q_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-language hash sampling over ``documents`` — pure
    codegen'd filter (no shuffle, no RNG), exact integer-arithmetic twin in
    SAMPLE_STRATIFIED_SQL."""
    from goffish_v3_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return stratified_sample(
        docs, "lang", _STRAT_RATES, key_col="doc_id",
        seed=_STRAT_SEED, default_rate=_STRAT_DEFAULT,
    ).select("doc_id", "lang", "source")


def _q_split_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test assignment (cumulative hash thresholds)
    aggregated per (split, lang) — reproducible dataset splits with no
    shuffle on the assignment itself."""
    from goffish_v3_spark.operators.sampling import assign_splits

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return (
        assign_splits(docs, "doc_id", weights=_SPLIT_WEIGHTS, seed=_SPLIT_SEED)
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


def _q_purchase_asof_click(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent prior
    click (inclusive, max-event_id tiebreak) — union + ordered-window
    encoding, ONE shuffle on user_id; oracle is DuckDB LATERAL top-1."""
    from goffish_v3_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{sf}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(
        purchases, clicks, ["user_id"],
        tiebreak="event_id", right_cols=["event_id", "value"],
    )


def _q_clicks_in_signup_hour(spark: SparkSession, sf: str) -> DataFrame:
    """Interval join: clicks landing within one hour of each signup (same
    user), counted per signup — bucketed equi-join (one shuffle per side,
    no nested-loop plan), zero-count signups preserved. Oracle is the plain
    BETWEEN inequality join DuckDB can afford at sf0.01."""
    from goffish_v3_spark.operators.rangejoin import interval_join

    ev = spark.read.parquet(f"{sf}/events.parquet")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    intervals = signups.withColumn("end_ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    pairs = interval_join(
        clicks, intervals, "ts", "ts", "end_ts",
        on=["user_id"], bucket_width_sec=3600,
    )
    counts = pairs.groupBy(F.col("i_event_id").alias("event_id")).agg(
        F.count("*").alias("n_hits")
    )
    return signups.join(counts, "event_id", "left").select(
        "event_id", "user_id", "ts",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_clicks"),
    )


def _q_events_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: (day, type), per-day, and
    grand-total aggregates in ONE pass (partial aggregation per grouping
    set, no re-scan per granularity)."""
    ev = spark.read.parquet(f"{sf}/events.parquet")
    return (
        ev.withColumn("day", F.to_date(F.col("ts")))
        .rollup("day", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select("day", "event_type", "n_events", "sum_value")
    )


def _q_distinct_users_kmv(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic KMV cardinality sketch over events.user_id — the
    auditable alternative to HLL: every byte of sketch state replays in
    the DuckDB oracle."""
    from goffish_v3_spark.operators.sketch import kmv_distinct_estimate

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return kmv_distinct_estimate(ev, "user_id", k=64, seed=0)


def _q_distinct_events_hll(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic HyperLogLog over events.event_id — the register-maxima
    cardinality sketch completing the KMV/CMS/HLL trio. State is m=64 small
    ints merged by cell-wise MAX (retry/union-safe); the full register table
    AND the transcendental-free estimate replay in the DuckDB oracle
    (nonlinear 31-bit mixer — sketch.py's mixer note explains why the
    affine sampling mixer can't serve HLL)."""
    from goffish_v3_spark.operators.sketch import hll_distinct_estimate

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return hll_distinct_estimate(ev, "event_id", m_bits=6, seed=0)


def _q_users_by_type_hll(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped HLL: one distinct-user estimate per event_type in a single
    ``groupBy(type, bucket).max`` pass — the per-key cardinality shape a
    100 TB pipeline actually runs (distinct users per day/partition/
    language) where exact count(distinct) per group would shuffle every
    key. State is m=64 small ints PER GROUP, merged map-side; registers
    and estimate replay exactly in the DuckDB oracle."""
    from goffish_v3_spark.operators.sketch import hll_group_distinct

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return hll_group_distinct(ev, ["event_type"], "user_id", m_bits=6, seed=0)


def _q_neighborhood_fn_cs(spark: SparkSession, sf: str) -> DataFrame:
    """Neighborhood function N(radius) and 90% effective diameter on the
    symmetrized customer–supplier graph — the ANF application HyperBall
    exists for (Boldi & Vigna 2013): how many pairs are within i hops, and
    at what radius reachability saturates. Cross-vertex aggregation happens
    on EXACT integers (per-vertex estimates rounded+scaled first), so the
    whole table — not just per-vertex rows — replays hash-identically in
    the DuckDB oracle's unrolled CTEs."""
    from goffish_v3_spark.operators.hyperball import neighborhood_function

    e = customer_supplier_edges(spark, sf).select("src", "dst")
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return neighborhood_function(und, t=3, m_bits=4, seed=0)


def _q_random_walks_cs(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic random walks on the symmetrized customer–supplier
    graph — the DeepWalk/node2vec corpus generator: 4-hop walks from every
    vertex, neighbor choice hashed from (current, step, walk) so reruns,
    retries, and shards emit byte-identical corpora. All-integer output;
    the DuckDB twin replays the indexed adjacency and every hop."""
    from goffish_v3_spark.operators.walks import random_walks

    e = customer_supplier_edges(spark, sf).select("src", "dst")
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return random_walks(und, length=4, num_walks=1)


def _q_purchase_click_overlap_kmv(spark: SparkSession, sf: str) -> DataFrame:
    """KMV set algebra over events: estimated |A ∪ B|, |A ∩ B| and Jaccard
    between the purchasing and clicking user sets, from ONE merged k=64
    order-statistic sketch (Beyer et al. 2007) — the set-overlap question
    every funnel/cohort analysis asks, answered with k longs of state per
    side instead of a distinct-shuffle of every user id. Integer order
    statistics end-to-end; the DuckDB twin replays the sketch exactly."""
    from goffish_v3_spark.operators.sketch import kmv_set_relations

    ev = spark.read.parquet(f"{sf}/events.parquet")
    a = ev.filter(F.col("event_type") == "purchase")
    b = ev.filter(F.col("event_type") == "click")
    return kmv_set_relations(a, "user_id", b, "user_id", k=64, seed=0)


def _q_bloom_semi_join_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter semi-join reduction — the canonical 100 TB join shape:
    distill the selective dim side (BUILDING customers) into a ≤4096-row
    bit table, broadcast it, prefilter orders with k=3 chained broadcast
    LEFT SEMI joins (zero fact shuffle), THEN run the real join. The
    oracle is the PLAIN join SQL: hash equality proves the bloom path
    drops no true row (false negatives impossible; false positives are
    removed by the real join)."""
    from goffish_v3_spark.operators.bloom import bloom_bits, bloom_prefilter

    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    seg = cust.filter(F.col("c_mktsegment") == "BUILDING")
    bits = bloom_bits(seg, "c_custkey", m=4096, k=3, seed=0)
    cand = bloom_prefilter(orders, "o_custkey", bits, m=4096, k=3, seed=0)
    return (
        cand.join(
            F.broadcast(seg.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
    )


def _q_bloom_filter_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter internals, long-format ``(stat, value)`` — key count,
    set-bit count, candidate rows, matched rows, and the false-positive
    surplus the real join removes. The DuckDB twin replays the full
    Kirsch–Mitzenmacher double-hash construction over the same nonlinear
    31-bit mixer, so every row is hash-checked — the auditability proof
    behind `bloom_semi_join_orders`'s plain-SQL oracle."""
    from goffish_v3_spark.operators.bloom import bloom_bits, bloom_prefilter

    m, k = 4096, 3
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet").select("o_custkey")
    seg = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bits = bloom_bits(seg, "c_custkey", m=m, k=k, seed=0)
    cand = bloom_prefilter(orders, "o_custkey", bits, m=m, k=k, seed=0)
    marked = cand.join(
        F.broadcast(
            seg.select(F.col("c_custkey").alias("o_custkey")).withColumn(
                "is_m", F.lit(1)
            )
        ),
        "o_custkey",
        "left",
    )
    counts = marked.agg(
        F.count("*").alias("cand_n"), F.count("is_m").alias("match_n")
    )
    rows = counts.selectExpr(
        "stack(3, 'candidate_orders', cand_n, 'matched_orders', match_n, "
        "'false_positive_orders', cand_n - match_n) AS (stat, value)"
    )
    n_keys = seg.agg(F.count("*").alias("value")).select(
        F.lit("n_keys").alias("stat"), "value"
    )
    n_bits = bits.agg(F.count("*").alias("value")).select(
        F.lit("n_bits_set").alias("stat"), "value"
    )
    return n_keys.unionByName(n_bits).unionByName(rows)


def _q_hyperball_t2_cs(spark: SparkSession, sf: str) -> DataFrame:
    """HyperBall over the symmetrized customer–supplier graph: per-vertex
    approximate 2-hop ball sizes from t=2 supersteps of cell-wise-MAX HLL
    register propagation (Boldi & Vigna 2013). The full integer register
    iteration replays in the DuckDB oracle as unrolled CTEs — the same
    auditability stance as the KMV/CMS/HLL sketches it builds on."""
    from goffish_v3_spark.operators.hyperball import hyperball_ball_sizes

    e = customer_supplier_edges(spark, sf).select("src", "dst")
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return hyperball_ball_sizes(und, t=2, m_bits=5, seed=0)


def _q_harmonic_centrality_t3_cs(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate harmonic centrality H(v) = Σ 1/d(v,u) truncated at 3
    hops on the symmetrized customer–supplier graph — the HyperBall
    telescope Σ (|B(v,i)|−|B(v,i−1)|)/i with the accumulation expression
    shared VERBATIM (one string) between the Spark plan and the DuckDB
    twin, so the doubles are hash-identical."""
    from goffish_v3_spark.operators.hyperball import harmonic_centrality

    e = customer_supplier_edges(spark, sf).select("src", "dst")
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return harmonic_centrality(und, t=3, m_bits=4, seed=0)


def _q_purchase_asof_click_sliced(spark: SparkSession, sf: str) -> DataFrame:
    """The skew-resilient sliced mode of the same as-of join — slicing is
    semantics-preserving, so it hash-checks against the identical LATERAL
    oracle (1-day slices over the 90-day event range)."""
    from goffish_v3_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{sf}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(
        purchases, clicks, ["user_id"],
        tiebreak="event_id", right_cols=["event_id", "value"],
        slice_width=86_400,
    )


def _q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return docs.groupBy(F.sha2("text", 256).alias("content_sha")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc_id")
    )


def _q_minhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (rows-only: xxhash64 has no DuckDB twin)."""
    from goffish_v3_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return minhash_lsh_pairs(docs, jaccard_threshold=0.5)


def _q_simhash_near_dups_det(spark: SparkSession, sf: str) -> DataFrame:
    """30-bit polynomial simhash (dedup.simhash_poly) — the SQL-replayable
    twin of simhash_near_dups."""
    from goffish_v3_spark.operators.dedup import simhash_near_duplicates

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return simhash_near_duplicates(docs, hash_fn="poly")


def _q_minhash_pairs_det(spark: SparkSession, sf: str) -> DataFrame:
    """The same LSH pipeline in hash_fn='poly' mode — every stage (shingle
    hash, permutations, band buckets) SQL-reproducible, so the driver
    hash-checks the full MinHash-LSH output against MINHASH_DET_SQL."""
    from goffish_v3_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return minhash_lsh_pairs(
        docs, jaccard_threshold=0.5, hash_fn="poly", max_bucket_width=None
    )


def _q_repo_file_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    """The det MinHash-LSH dedup pipeline applied to the NORTH-STAR input
    shape: source files of the committed repos artifact, keyed by the same
    ``repo || chr(0) || path`` string key the flagship PageRank orders by.
    This is the 100 TB pre-training dedup pass run on the code corpus the
    link graph is derived from — near-duplicate source files (shared import
    blocks and boilerplate, distinct content hashes) surface as pairs. Full
    pipeline replay in the DuckDB twin over the identical artifact."""
    from goffish_v3_spark.operators.dedup import minhash_lsh_pairs
    from goffish_v3_spark.sources.synthetic import generate_repos

    repos = generate_repos(spark, n_repos=5, files_per_repo=40, seed=42)
    _ensure_repo_artifact(repos)
    files = spark.read.parquet(REPO_ARTIFACT).select(
        F.concat_ws("\x00", F.col("repo"), F.col("path")).alias("doc_id"),
        F.col("content").alias("text"),
    )
    return minhash_lsh_pairs(
        files, jaccard_threshold=0.4, hash_fn="poly", max_bucket_width=None
    )


def _q_near_dup_clusters_det(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup clusters over the det LSH pair graph: the pair generator is
    minhash_lsh_pairs(hash_fn='poly') (hash-checked above as
    minhash_lsh_pairs_det) and the component step is the engine's own wcc
    operator — so this row hash-checks pair-generation AND clustering
    end-to-end against a WITH RECURSIVE reachability oracle."""
    from goffish_v3_spark.operators.dedup import minhash_lsh_pairs, near_dup_clusters

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = minhash_lsh_pairs(
        docs, jaccard_threshold=0.5, hash_fn="poly", max_bucket_width=None
    )
    return near_dup_clusters(spark, docs, pairs=pairs)


def _q_doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.text import fingerprint

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return fingerprint(docs).select("doc_id", "fingerprint")


def _q_doc_fingerprint_det(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprint with the SQL-expressible polynomial shingle
    hash (operators/text.py fingerprint_rolling) — the hash-checkable twin
    of doc_fingerprint."""
    from goffish_v3_spark.operators.text import fingerprint_rolling

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return fingerprint_rolling(docs).select("doc_id", "fingerprint")


def _q_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return cosine_topk(emb.filter(F.col("vec_id") < 10), emb, k=3)


def _q_ivf_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN with n_probe == n_lists (exhaustive probing): exercises the
    full train→assign→probe→join→rescore machinery while remaining exactly
    brute force, so the standard ANN SQL oracle hash-checks it. The
    approximate (n_probe < n_lists) configuration is recall-asserted in
    tests/test_similarity.py."""
    from goffish_v3_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return ivf_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=3, n_lists=8, n_probe=8
    )


def _q_lsh_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed ANN (rows-only: approximate by design; pytest asserts
    recall vs the exact oracle)."""
    from goffish_v3_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return lsh_topk(emb.filter(F.col("vec_id") < 10), emb, k=3, dim=64)


def _q_emb_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.operators.similarity import embedding_near_duplicates

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return embedding_near_duplicates(emb, threshold=0.45)


def _q_simhash_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    """Rows-only: simhash is xxhash64-based (deterministic across runs) but
    xxhash64 has no DuckDB twin."""
    from goffish_v3_spark.operators.dedup import simhash_near_duplicates

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return simhash_near_duplicates(docs)


def _q_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard ≥ 0.5 via the inverted-index (shared-shingle)
    similarity join — candidate pairs come from the index, never a cross
    product, and the result is exact (oracle-checked)."""
    from goffish_v3_spark.operators.dedup import jaccard_similarity_join

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return jaccard_similarity_join(docs, threshold=0.5)


def _q_media_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal pipeline with REAL decoding: synthesized PPM images / WAV
    audio → pure-numpy decode → feature vectors. The media table is pinned
    as a committed parquet artifact (validated against synthesize_media on
    every run), so the DuckDB oracle reads the IDENTICAL payload bytes and
    replays the decode + feature math from the raw bytes — hash-checked,
    closing round 3's last no-oracle query (VERDICT r3 #6)."""
    from goffish_v3_spark.operators.multimodal import extract_features

    _ensure_media_artifact(spark)
    media = spark.read.parquet(MEDIA_ARTIFACT)
    return extract_features(media, out_dim=16, decode="real").select(
        "media_id", "kind", F.round(F.element_at("features", 1), 6).alias("f0")
    )


def _q_cms_token_estimates(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the top-50 tokens next to
    their true counts — deterministic affine rows over the polynomial key
    hash, so sketch state AND estimates replay exactly in SQL. The CMS
    guarantee (est ≥ true, overcount bounded by collisions at d=3, w=512)
    is thereby hash-checked, not just asserted."""
    from goffish_v3_spark.operators.sketch import cms_counters, cms_estimate
    from goffish_v3_spark.operators.text import polyhash, tokens

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    toks = docs.select(F.explode(tokens("text")).alias("token")).filter(
        F.length("token") > 0
    )
    counters = cms_counters(toks, polyhash(F.col("token")), d=3, w=512)
    top = (
        toks.groupBy("token")
        .agg(F.count("*").alias("n_true"))
        .orderBy(F.desc("n_true"), "token")
        .limit(50)
    )
    return cms_estimate(
        counters, top, polyhash(F.col("token")), d=3, w=512
    )


def _q_top_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus token frequency top-50 (token-counting surface over the
    documents table; deterministic total order)."""
    from goffish_v3_spark.operators.text import tokens

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(50)
    )


def _q_dedup_keep_one(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-dedup keep-one-representative (min doc_id per content group) —
    the write-side counterpart of dedup_exact_groups."""
    from goffish_v3_spark.operators.dedup import dedup_exact

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return dedup_exact(docs).select("doc_id")


def _q_events_window(spark: SparkSession, sf: str) -> DataFrame:
    """True Structured Streaming query drained into a memory sink."""
    from goffish_v3_spark.streaming.events import windowed_counts_stream

    return windowed_counts_stream(spark, f"{sf}/events.parquet")


def _q_sessions(spark: SparkSession, sf: str) -> DataFrame:
    from goffish_v3_spark.streaming.events import sessionize_batch

    events = spark.read.parquet(f"{sf}/events.parquet")
    return sessionize_batch(events, gap_minutes=30)


def _q_first_touch(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful streaming operator: applyInPandasWithState first-touch
    dedup (per-user seen-set state across micro-batches), run as a true
    streaming query and drained from the memory sink."""
    from goffish_v3_spark.streaming.stateful import first_touch_stream

    return first_touch_stream(spark, f"{sf}/events.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q_pagerank_cs(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "edges_cs": _q_edges_cs,
        "pagerank_cs": _q_pagerank_cs,
        "ppr_cs": _q_ppr_cs,
        "wcc_cs": _q_wcc_cs,
        "lpa_cs": _q_lpa_cs,
        "sssp_cs": _q_sssp_cs,
        "sssp_weighted_cs": _q_sssp_weighted_cs,
        "sssp_csr_cs": _q_sssp_csr_cs,
        "triangle_count_copart": _q_tc_copart,
        "triangles_per_vertex_copart": _q_tc_vertex_copart,
        "triangle_count_skew": _q_tc_skew,
        "wedge_stats_skew": _q_wedge_stats_skew,
        "clustering_coeff_copart": _q_lcc_copart,
        "assortativity_copart": _q_assortativity_copart,
        "edge_jaccard_copart": _q_edge_jaccard_copart,
        "degree_histogram_cs": _q_degree_hist_cs,
        "degree_percentiles_cs": _q_degree_percentiles_cs,
        "user_event_zscore": _q_user_event_zscore,
        "graph_stats_cs": _q_graph_stats_cs,
        "kcore3_copart": _q_kcore_copart,
        "core_numbers_copart": _q_core_numbers_copart,
        "vertex_count_cs": _q_vertex_count_cs,
        "meta_graph_cs": _q_meta_graph_cs,
        "meta_diameter_cs": _q_meta_diameter_cs,
        "spanning_forest_stats_cs": _q_spanning_forest_stats_cs,
        "subgraph_pagerank_cs": _q_subgraph_pagerank_cs,
        "kmeans_partition_cs": _q_kmeans_partition_cs,
        "repo_pagerank_top20": _q_repo_pagerank,
        "repo_ppr_top20": _q_repo_ppr,
        "repo_scc": _q_repo_scc,
        "scc_condensation_synth": _q_scc_condensation_synth,
        "doc_len_percentiles": _q_doc_len_percentiles,
        "doc_tokens": _q_doc_tokens,
        "doc_quality": _q_doc_quality,
        "lang_id": _q_lang_id,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "sample_stratified_det": _q_sample_stratified,
        "split_counts_det": _q_split_counts,
        "purchase_asof_click": _q_purchase_asof_click,
        "purchase_asof_click_sliced": _q_purchase_asof_click_sliced,
        "clicks_in_signup_hour": _q_clicks_in_signup_hour,
        "events_rollup_day_type": _q_events_rollup,
        "distinct_users_kmv": _q_distinct_users_kmv,
        "distinct_events_hll": _q_distinct_events_hll,
        "users_by_type_hll": _q_users_by_type_hll,
        "purchase_click_overlap_kmv": _q_purchase_click_overlap_kmv,
        "bloom_semi_join_orders": _q_bloom_semi_join_orders,
        "bloom_filter_stats": _q_bloom_filter_stats,
        "hyperball_t2_cs": _q_hyperball_t2_cs,
        "harmonic_centrality_t3_cs": _q_harmonic_centrality_t3_cs,
        "neighborhood_fn_cs": _q_neighborhood_fn_cs,
        "random_walks_cs": _q_random_walks_cs,
        "link_pred_copart": _q_link_pred_copart,
        "dedup_exact_groups": _q_dedup_exact,
        "dedup_keep_one": _q_dedup_keep_one,
        "top_tokens": _q_top_tokens,
        "cms_token_estimates": _q_cms_token_estimates,
        "minhash_lsh_pairs": _q_minhash_pairs,
        "minhash_lsh_pairs_det": _q_minhash_pairs_det,
        "repo_file_near_dups": _q_repo_file_near_dups,
        "near_dup_clusters_det": _q_near_dup_clusters_det,
        "doc_fingerprint": _q_doc_fingerprint,
        "doc_fingerprint_det": _q_doc_fingerprint_det,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "simhash_near_dups": _q_simhash_near_dups,
        "simhash_near_dups_det": _q_simhash_near_dups_det,
        "ann_cosine_top3": _q_ann_topk,
        "ivf_ann_exhaustive_top3": _q_ivf_ann_topk,
        "lsh_ann_top3": _q_lsh_ann_topk,
        "embedding_near_dups": _q_emb_near_dups,
        "media_features": _q_media_features,
        "events_hourly_window_stream": _q_events_window,
        "events_sessionize": _q_sessions,
        "events_first_touch_stream": _q_first_touch,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "edges_cs": CS_EDGES_SQL,
        "pagerank_cs": _pagerank_sql(),
        "ppr_cs": _ppr_sql(),
        "wcc_cs": WCC_SQL,
        "lpa_cs": _lpa_sql(),
        "sssp_cs": SSSP_SQL,
        "sssp_weighted_cs": _sssp_weighted_sql(),
        "sssp_csr_cs": SSSP_SQL,
        "triangle_count_copart": TC_SQL,
        "triangles_per_vertex_copart": TC_VERTEX_SQL,
        "triangle_count_skew": TC_SKEW_SQL,
        "wedge_stats_skew": WEDGE_STATS_SKEW_SQL,
        "clustering_coeff_copart": LCC_COPART_SQL,
        "assortativity_copart": ASSORT_COPART_SQL,
        "edge_jaccard_copart": EDGE_JACCARD_SQL,
        "degree_histogram_cs": DEGREE_HIST_SQL,
        "degree_percentiles_cs": DEGREE_PCTL_SQL,
        "user_event_zscore": USER_ZSCORE_SQL,
        "graph_stats_cs": GRAPH_STATS_SQL,
        "kcore3_copart": _kcore3_sql(),
        "core_numbers_copart": _core_numbers_sql(),
        "vertex_count_cs": VERTEX_COUNT_SQL,
        "spanning_forest_stats_cs": SPANNING_FOREST_STATS_SQL,
        "kmeans_partition_cs": _kmeans_sql(),
        "meta_graph_cs": META_GRAPH_SQL,
        "meta_diameter_cs": META_DIAMETER_SQL,
        "subgraph_pagerank_cs": _pagerank_sql(),
        "repo_pagerank_top20": _repo_pagerank_sql(),
        "repo_ppr_top20": _repo_pagerank_sql(personalized=True),
        "repo_scc": _repo_scc_sql(),
        "scc_condensation_synth": _scc_condensation_synth_sql(),
        "doc_len_percentiles": DOC_LEN_PCTL_SQL,
        "doc_tokens": DOC_TOKENS_SQL,
        "doc_quality": DOC_QUALITY_SQL,
        "lang_id": LANG_ID_SQL,
        "top_docs_per_lang": TOP_DOCS_PER_LANG_SQL,
        "sample_stratified_det": SAMPLE_STRATIFIED_SQL,
        "split_counts_det": SPLIT_COUNTS_SQL,
        "purchase_asof_click": PURCHASE_ASOF_CLICK_SQL,
        "purchase_asof_click_sliced": PURCHASE_ASOF_CLICK_SQL,
        "clicks_in_signup_hour": CLICKS_IN_SIGNUP_HOUR_SQL,
        "events_rollup_day_type": EVENTS_ROLLUP_SQL,
        "distinct_users_kmv": DISTINCT_USERS_KMV_SQL,
        "distinct_events_hll": DISTINCT_EVENTS_HLL_SQL,
        "users_by_type_hll": USERS_BY_TYPE_HLL_SQL,
        "purchase_click_overlap_kmv": PURCHASE_CLICK_KMV_SQL,
        "bloom_semi_join_orders": BLOOM_SEMI_JOIN_SQL,
        "bloom_filter_stats": BLOOM_STATS_SQL,
        "hyperball_t2_cs": HYPERBALL_T2_SQL,
        "harmonic_centrality_t3_cs": HARMONIC_T3_SQL,
        "neighborhood_fn_cs": NEIGHBORHOOD_FN_SQL,
        "random_walks_cs": RANDOM_WALKS_SQL,
        "link_pred_copart": LINK_PRED_COPART_SQL,
        "dedup_exact_groups": DEDUP_EXACT_SQL,
        "dedup_keep_one": DEDUP_KEEP_ONE_SQL,
        "top_tokens": TOP_TOKENS_SQL,
        "cms_token_estimates": _cms_sql(),
        "ngram_jaccard_pairs": NGRAM_JACCARD_SQL,
        # minhash_lsh_pairs / doc_fingerprint / simhash_near_dups:
        # xxhash64-based (no DuckDB twin); rows-only. doc_fingerprint_det
        # is the oracle-checkable polynomial-hash twin of doc_fingerprint,
        # minhash_lsh_pairs_det of the full LSH pipeline.
        "doc_fingerprint_det": DOC_FINGERPRINT_DET_SQL,
        "minhash_lsh_pairs_det": MINHASH_DET_SQL,
        "repo_file_near_dups": REPO_MINHASH_SQL,
        "near_dup_clusters_det": NEAR_DUP_CLUSTERS_SQL,
        "simhash_near_dups_det": SIMHASH_DET_SQL,
        "ann_cosine_top3": ANN_TOPK_SQL,
        "ivf_ann_exhaustive_top3": ANN_TOPK_SQL,
        # lsh_ann_top3: approximate vs exact ANN but fully deterministic
        # (seed 42) — replayed exactly with the same plane literals
        "lsh_ann_top3": LSH_ANN_SQL,
        "embedding_near_dups": EMB_NEAR_DUP_SQL,
        # media_features: payloads pinned as a committed artifact; DuckDB
        # replays the PPM/WAV/sha256 decode + feature math from raw bytes
        "media_features": _media_features_sql(),
        "events_hourly_window_stream": EVENTS_WINDOW_SQL,
        "events_sessionize": SESSIONS_SQL,
        "events_first_touch_stream": FIRST_TOUCH_SQL,
    }
