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

    Vertex ids are a pure function of (repo, path) — ``xxhash64`` — so both
    endpoint ids are *computed* on the reference rows, never joined for.
    The only join is one left-semi on the 8-byte dst vid against the vertex
    dimension, dropping references to files that don't exist in the corpus
    (realistic: unresolved imports). At 10^12 files that is a single
    long-keyed semi-join (AQE broadcasts it at test scale) versus the naive
    two sort-merge joins on string pairs — the same trick as the reference's
    coordination-free packed ids (LongTextAdjacencyListReader.java:98,294).
    """
    vertices = build_vertices(repos)
    refs = extract_references(repos)

    resolved = refs.select(
        file_vid("src_repo", "src_path").alias("src"),
        file_vid("dst_repo", "dst_path").alias("dst"),
    ).join(
        vertices.select(F.col("vid").alias("dst")), "dst", "left_semi"
    )

    resolved = resolved.filter(F.col("src") != F.col("dst"))
    if weighted:
        edges = resolved.groupBy("src", "dst").agg(F.count("*").cast("double").alias("w"))
    else:
        edges = resolved.distinct().withColumn("w", F.lit(1.0))
    return LinkGraph(vertices=vertices, edges=edges)
