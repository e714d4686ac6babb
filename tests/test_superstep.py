"""Superstep loop: checkpoint/resume + metrics table (north_rule gates)."""

import pyspark.sql.functions as F

from goffish_v3_spark.plans.superstep import StepResult, SuperstepLoop


def _inc_step(spark):
    def step(state, i):
        new = state.withColumn("x", F.col("x") + 1)
        return StepResult(new, converged=False, delta=1.0, messages=0)

    return step


def test_runs_max_iter_and_counts(spark):
    init = spark.range(10).select(F.col("id").alias("vid"), F.lit(0).alias("x"))
    loop = SuperstepLoop(spark, max_iter=5)
    info = loop.run(init, _inc_step(spark))
    assert info.supersteps == 5
    assert not info.converged
    assert all(r.x == 5 for r in info.state.collect())


def test_checkpoint_resume_continues(spark, tmp_path):
    ckpt = str(tmp_path)
    init = spark.range(4).select(F.col("id").alias("vid"), F.lit(0).alias("x"))
    loop = SuperstepLoop(spark, checkpoint_dir=ckpt, run_id="r", max_iter=3)
    loop.run(init, _inc_step(spark))
    assert loop.last_committed_superstep() == 2

    loop2 = SuperstepLoop(spark, checkpoint_dir=ckpt, run_id="r", max_iter=7)
    info = loop2.run(init, _inc_step(spark), resume=True)
    # resumed from superstep 3, ran 4 more
    assert info.supersteps == 4
    assert all(r.x == 7 for r in info.state.collect())


def test_metrics_rows_written(spark, tmp_path):
    ckpt = str(tmp_path)
    init = spark.range(4).select(F.col("id").alias("vid"), F.lit(0).alias("x"))
    loop = SuperstepLoop(spark, checkpoint_dir=ckpt, run_id="m", max_iter=3)
    loop.run(init, _inc_step(spark))
    m = loop.metrics()
    rows = m.filter(F.col("part") == -1).collect()
    assert {r.superstep for r in rows} == {0, 1, 2}
    assert all(r.run_id == "m" for r in rows)
    assert set(m.columns) >= {"run_id", "superstep", "part", "rows", "msgs", "wall_ms", "delta", "extra"}


def test_convergence_stops_early(spark):
    init = spark.range(4).select(F.col("id").alias("vid"), F.lit(0).alias("x"))

    def step(state, i):
        new = state.withColumn("x", F.col("x") + 1)
        return StepResult(new, converged=(i == 2), delta=0.0)

    info = SuperstepLoop(spark, max_iter=10).run(init, step)
    assert info.converged
    assert info.supersteps == 3


def test_pagerank_partition_metrics_persisted(spark, tmp_path):
    """north_rule: per-partition lineage + metrics — a checkpointed PageRank
    run with partition_metrics=True persists per-(superstep, part) row
    counts next to the state store, readable back as parquet (VERDICT r3 #9)."""
    from pyspark.sql import functions as F

    from goffish_v3_spark.operators.pagerank import pagerank_with_info
    from tests import graphs

    df = graphs.to_df(spark, graphs.barabasi_albert(120, m=2, seed=3))
    scores, info = pagerank_with_info(
        spark,
        df,
        fixed_iterations=3,
        checkpoint_dir=str(tmp_path),
        checkpoint_every=1,
        partition_metrics=True,
    )
    n_vertices = scores.count()
    m = spark.read.parquet(f"{tmp_path}/{info.run_id}/metrics")
    # one global row (part=-1) per committed superstep
    assert m.filter(F.col("part") == -1).count() == 3
    # per-partition rows cover every vertex exactly once per superstep
    per_part = (
        m.filter(F.col("part") >= 0)
        .groupBy("superstep")
        .agg(F.sum("rows").alias("total"))
        .collect()
    )
    assert len(per_part) == 3
    assert all(r.total == n_vertices for r in per_part)


def test_partition_first_dedup_is_single_exchange(spark):
    """The one-exchange setup layout (pagerank/sssp/lpa/csr builders) rests
    on Spark's subset-clustering rule: HashPartitioning(src) must satisfy
    the ClusteredDistribution of a (src,dst) dedup, a groupBy(src) and a
    src-join without further exchanges. Guard it against Spark upgrades by
    counting Exchange nodes in the optimized plan."""
    from pyspark.sql import functions as F

    e = spark.range(1000).select(
        (F.col("id") % 50).alias("src"), ((F.col("id") * 13 + 7) % 50).alias("dst")
    )
    # planner-inserted shuffles print ENSURE_REQUIREMENTS; the one
    # deliberate user repartition prints REPARTITION_BY_NUM — the dedup,
    # groupBy and join must add ZERO of the former
    deduped = e.repartition(8, "src").dropDuplicates(["src", "dst"])
    dplan = deduped._jdf.queryExecution().executedPlan().toString()
    assert "ENSURE_REQUIREMENTS" not in dplan, dplan
    assert dplan.count("REPARTITION_BY_NUM") == 1, dplan
    # cached (as the operators do), the out-degree groupBy and the src-join
    # add NO shuffle exchange on top of the cached partitioning
    deduped = deduped.persist()
    try:
        deduped.count()
        outdeg = deduped.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        adj = deduped.join(outdeg.hint("merge"), "src")
        plan = adj._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "ENSURE_REQUIREMENTS" not in plan, (
            "planner inserted a shuffle over the cached src-partitioned "
            f"table:\n{plan}"
        )
    finally:
        deduped.unpersist()
