"""Resume-equivalence at bench scale (north_rule resumability gate beyond
toy fixtures): PageRank interrupted at superstep k on a multi-million-edge
graph, resumed from the parquet checkpoint, must reproduce the uninterrupted
run's scores.

Nightly-gated: set ``GOFFISH_NIGHTLY=1`` (and optionally
``NIGHTLY_N_REPOS`` / ``NIGHTLY_FILES_PER_REPO``) to run. An evidence run at
2000×500 repos (~5.6M edges) is recorded in BENCH/BASELINE.md.

The small-scale twin of this test (same code path, toy graph) runs in every
CI pass below.
"""

import os

import pytest
from pyspark.sql import functions as F


def _resume_equivalence(spark, edges, tmp_path, iters=8, cut=3):
    from goffish_v3_spark.operators.pagerank import pagerank_with_info

    full, _ = pagerank_with_info(spark, edges, fixed_iterations=iters)

    # "kill" at superstep `cut`: run only that many supersteps, committed
    # to the checkpoint store every superstep
    pagerank_with_info(
        spark,
        edges,
        fixed_iterations=cut,
        checkpoint_dir=str(tmp_path),
        run_id="killed",
        checkpoint_every=1,
    )
    resumed, info = pagerank_with_info(
        spark,
        edges,
        fixed_iterations=iters,
        checkpoint_dir=str(tmp_path),
        run_id="killed",
        resume=True,
        checkpoint_every=1,
    )
    assert info.supersteps == iters - cut  # continued, not restarted

    j = full.withColumnRenamed("rank", "r1").join(
        resumed.withColumnRenamed("rank", "r2"), "vid"
    )
    assert j.count() == full.count()
    mx = j.select(F.max(F.abs(F.col("r1") - F.col("r2")))).collect()[0][0]
    assert mx <= 1e-12, f"max |Δ| = {mx}"
    return mx


def test_resume_equivalence_small(spark, tmp_path):
    from tests import graphs

    edges = graphs.to_df(spark, graphs.barabasi_albert(300, m=3, seed=2))
    _resume_equivalence(spark, edges, tmp_path, iters=7, cut=3)


@pytest.mark.skipif(
    not os.environ.get("GOFFISH_NIGHTLY"),
    reason="bench-scale resume equivalence; set GOFFISH_NIGHTLY=1",
)
def test_resume_equivalence_bench_scale(spark, tmp_path):
    from goffish_v3_spark.sources.ingest import ingest
    from goffish_v3_spark.sources.synthetic import generate_repos

    n_repos = int(os.environ.get("NIGHTLY_N_REPOS", "2000"))
    fpr = int(os.environ.get("NIGHTLY_FILES_PER_REPO", "500"))
    repos = generate_repos(spark, n_repos=n_repos, files_per_repo=fpr, seed=42)
    edges = ingest(repos).edges.persist()
    n = edges.count()
    assert n > 1_000_000, "not bench scale"
    _resume_equivalence(spark, edges, tmp_path, iters=8, cut=3)
    edges.unpersist()
