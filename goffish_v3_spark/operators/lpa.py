"""Label-propagation community detection (synchronous, deterministic).

The reference's ConnectedComponents (sample-hama ConnectedComponents.java:45)
*is* min-label propagation; LPA is its natural generalization required by
north_rule — per round every vertex adopts the most frequent label among its
neighbours. Reference has no standalone LPA program (SURVEY.md §2.C C5), so
semantics are pinned here:

- undirected view of the edge table (symmetrized, deduped);
- synchronous rounds (all updates computed from the previous round's labels);
- tie-break: the smallest label among the equally-most-frequent;
- isolated vertices keep their own vid as label;
- stop when no label changed or ``max_iter`` reached.

Deterministic by construction (total-ordered tie-break, no RNG), so results
are invariant across partition counts and resumes (SURVEY.md §7.3.6).

Shape per round: one join (labels ⋈ edges) + one count aggregation + one
argmax via ``max(struct(cnt, -label))`` — all JVM-side, partial-agg friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from goffish_v3_spark.plans.superstep import StepResult, SuperstepLoop


def _symmetrize(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst")
    return (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def lpa(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 20,
    fixed_iterations: int | None = None,
    checkpoint_dir: str | None = None,
    run_id: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """Return ``(vid long, label long)`` communities."""
    # persist the symmetrized adjacency pre-shuffled + pre-sorted on the join
    # key — every round's state⋈und sort-merge join then skips exchange+sort
    # on the (large) edge side (same pattern as operators.pagerank)
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    und = (
        _symmetrize(edges)
        .repartition(n_shuffle, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    vertices = und.select(F.col("src").alias("vid")).distinct()
    isolated_fallback = None  # vertices always appear in both directions after symmetrize

    init = vertices.withColumn("label", F.col("vid")).localCheckpoint(eager=True)

    def step(state: DataFrame, i: int) -> StepResult:
        # each neighbour votes with its current label
        votes = (
            state.join(und, state.vid == und.src)
            .groupBy(F.col("dst").alias("vid"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        picked = (
            votes.groupBy("vid")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias("m"))
            .select("vid", (-F.col("m.nl")).alias("new_label"))
        )
        new_state = (
            state.join(picked, "vid", "left")
            .select(
                "vid",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
                F.col("label").alias("_old"),
            )
        )
        if fixed_iterations is not None:
            done = i + 1 >= fixed_iterations
            return StepResult(
                new_state.select("vid", "label").localCheckpoint(eager=True),
                done,
                truncated=True,
            )
        # one job: changed-count observed during the lineage-truncating
        # materialization (same pattern as pagerank)
        obs = Observation(f"lpa_step_{i}")
        observed = new_state.observe(
            obs,
            F.sum(F.when(F.col("label") != F.col("_old"), 1).otherwise(0)).alias("changed"),
        )
        out = observed.localCheckpoint(eager=True)
        changed = int(obs.get["changed"] or 0)
        return StepResult(
            out.select("vid", "label"), changed == 0, delta=float(changed), truncated=True
        )

    loop = SuperstepLoop(
        spark,
        checkpoint_dir=checkpoint_dir,
        run_id=run_id,
        max_iter=(fixed_iterations if fixed_iterations is not None else max_iter),
    )
    info = loop.run(init, step, resume=resume)
    und.unpersist()
    return info.state
