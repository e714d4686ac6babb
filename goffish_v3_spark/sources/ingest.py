"""Ingest: repos table → (vertices, edges) link graph.

Replaces the reference's offline SNAP→METIS→Hadoop-MR ingest pipeline
(Input-generator/README.md:1-41, snapToMetisInput.py) with a single
declarative Spark job: regexp extraction of import/include references,
exploded into a directed edge table, ids assigned coordination-free via
``xxhash64`` (cf. the reference's packed-id arithmetic,
hama LongTextAdjacencyListReader.java:98,294).

Everything stays JVM-side (regexp_extract_all / explode / joins) — the
``content`` column is read once here and never materialized downstream
(column pruning, SURVEY.md §4 P13). The per-row invariant
``sha256(content)`` is computed at scan time and carried on the vertices
dimension so tests can prove content was never rewritten.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goffish_v3_spark.functions.ids import content_sha256, file_vid

# import-reference patterns per language (FIXTURES.md §1 edge contract):
# each captures the target module index; the target path is reconstructed
# from the index (pkg = idx % 4 by the repo layout convention).
_IMPORT_PATTERNS = {
    "python": (r"from pkg_\d+\.mod_(\d+) import", "py"),
    "java": (r"import org\.pkg_\d+\.mod_(\d+);", "java"),
    "c": (r"#include \"pkg_\d+/mod_(\d+)\.h\"", "h"),
}
# cross-repo dependency marker: "#dep <repo> <path>"
_DEP_PATTERN = r"#dep (\S+ \S+)"

_N_PKGS = 4


@dataclass
class LinkGraph:
    """vertices(vid, repo, path, lang, sha256) + edges(src, dst, w)."""

    vertices: DataFrame
    edges: DataFrame


def build_vertices(repos: DataFrame) -> DataFrame:
    return repos.select(
        file_vid("repo", "path").alias("vid"),
        "repo",
        "path",
        "lang",
        content_sha256("content").alias("sha256"),
    )


def extract_references(repos: DataFrame) -> DataFrame:
    """repos → unresolved references ``(src_repo, src_path, dst_repo, dst_path)``.

    Same-repo references come from language import lines; cross-repo from
    ``#dep`` lines. Pure column expressions; one pass over content.
    """
    lang_pat = (
        F.when(F.col("lang") == "python", F.lit(_IMPORT_PATTERNS["python"][0]))
        .when(F.col("lang") == "java", F.lit(_IMPORT_PATTERNS["java"][0]))
        .otherwise(F.lit(_IMPORT_PATTERNS["c"][0]))
    )
    ext = (
        F.when(F.col("lang") == "python", F.lit("py"))
        .when(F.col("lang") == "java", F.lit("java"))
        .otherwise(F.lit("h"))
    )

    base = repos.select(
        "repo",
        "path",
        ext.alias("ext"),
        F.regexp_extract_all("content", lang_pat, 1).alias("import_idx"),
        F.regexp_extract_all("content", F.lit(_DEP_PATTERN), 1).alias("dep_refs"),
    )

    same_repo = base.select(
        F.col("repo").alias("src_repo"),
        F.col("path").alias("src_path"),
        F.col("repo").alias("dst_repo"),
        F.explode("import_idx").alias("t"),
        "ext",
    ).select(
        "src_repo",
        "src_path",
        "dst_repo",
        F.format_string(
            "src/pkg_%d/mod_%d.%s",
            F.pmod(F.col("t").cast("long"), F.lit(_N_PKGS)),
            F.col("t").cast("long"),
            F.col("ext"),
        ).alias("dst_path"),
    )

    cross_repo = base.select(
        F.col("repo").alias("src_repo"),
        F.col("path").alias("src_path"),
        F.explode("dep_refs").alias("ref"),
    ).select(
        "src_repo",
        "src_path",
        F.split("ref", " ").getItem(0).alias("dst_repo"),
        F.split("ref", " ").getItem(1).alias("dst_path"),
    )

    return same_repo.unionByName(cross_repo)


def ingest(repos: DataFrame, weighted: bool = False) -> LinkGraph:
    """Derive the link graph. ``w`` = 1.0 (or #occurrences if weighted).

    References to files that don't exist in the corpus are dropped via a
    semi-join against the vertex dimension (realistic: unresolved imports).
    The dimension side is small relative to content (two string columns) —
    at 10^12 files it is still a shuffle join on (repo, path), which Spark
    plans as sort-merge with both sides hash-partitioned; at test scale AQE
    turns it into a broadcast join automatically.
    """
    vertices = build_vertices(repos)
    refs = extract_references(repos)

    # the vertex dimension is referenced twice below and its parent plan (the
    # repos scan/generator) can be expensive — cache the 3-column projection
    vdim = vertices.select("vid", "repo", "path").persist()
    src_side = refs.join(
        vdim.withColumnRenamed("vid", "src"),
        (refs.src_repo == vdim.repo) & (refs.src_path == vdim.path),
    ).select("src", "dst_repo", "dst_path")
    resolved = src_side.join(
        vdim.withColumnRenamed("vid", "dst"),
        (src_side.dst_repo == vdim.repo) & (src_side.dst_path == vdim.path),
    ).select("src", "dst")

    resolved = resolved.filter(F.col("src") != F.col("dst"))
    if weighted:
        edges = resolved.groupBy("src", "dst").agg(F.count("*").cast("double").alias("w"))
    else:
        edges = resolved.distinct().withColumn("w", F.lit(1.0))
    return LinkGraph(vertices=vertices, edges=edges)
