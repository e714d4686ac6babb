"""Ingest-layer tests: determinism, sha256 invariant, edge derivation."""

import pyspark.sql.functions as F

from goffish_v3_spark.sources.ingest import build_vertices, extract_references, ingest
from goffish_v3_spark.sources.synthetic import generate_repos


def test_generator_deterministic(spark, repos60):
    b = generate_repos(spark, n_repos=3, files_per_repo=20, seed=42)
    a_rows = [r.asDict() for r in repos60.orderBy("repo", "path").collect()]
    b_rows = [r.asDict() for r in b.orderBy("repo", "path").collect()]
    assert a_rows == b_rows
    assert len(a_rows) == 60


def test_generator_schema_and_uniqueness(spark, repos60):
    assert repos60.columns == ["repo", "path", "commit", "lang", "content"]
    assert repos60.select("repo", "path").distinct().count() == 60
    langs = {r.lang for r in repos60.select("lang").distinct().collect()}
    assert langs == {"python", "java", "c"}
    assert repos60.filter(F.length("commit") != 40).count() == 0


def test_sha256_invariant_through_ingest(spark, repos60, graph60):
    """BASELINE.json input_hint: sha256(content) per row is preserved by the
    ingest transform — vertices carry exactly the source content hash."""
    src_sha = repos60.select("repo", "path", F.sha2("content", 256).alias("expected"))
    joined = graph60.vertices.join(src_sha, ["repo", "path"])
    assert joined.count() == 60
    assert joined.filter(F.col("sha256") != F.col("expected")).count() == 0


def test_edges_resolve_and_no_self_loops(spark, graph60):
    e = graph60.edges
    assert e.count() > 60  # several imports per file
    assert e.filter(F.col("src") == F.col("dst")).count() == 0
    # every endpoint is a known vertex
    vids = graph60.vertices.select("vid")
    assert e.join(vids, e.src == vids.vid, "left_anti").count() == 0
    assert e.join(vids, e.dst == vids.vid, "left_anti").count() == 0


def test_cross_repo_edges_exist(spark, repos60):
    refs = extract_references(repos60)
    cross = refs.filter(F.col("src_repo") != F.col("dst_repo"))
    assert cross.count() > 0


def test_hub_skew_present(spark, graph60):
    """mod_0 of each repo is a hub (FIXTURES.md star_hub analogue)."""
    indeg = graph60.edges.groupBy("dst").count()
    top = indeg.agg(F.max("count")).collect()[0][0]
    med = indeg.approxQuantile("count", [0.5], 0.01)[0]
    assert top >= 5 * med


def test_ingest_weighted_counts_occurrences(spark, repos60):
    g = ingest(repos60, weighted=True)
    assert g.edges.filter(F.col("w") < 1.0).count() == 0


def test_vertices_ids_unique(spark, repos60):
    v = build_vertices(repos60)
    assert v.select("vid").distinct().count() == v.count()
