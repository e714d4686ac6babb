"""Single-source shortest paths (unit and weighted).

Semantics: sample-hama SingleSourceShortestPath.java:65-576 (unit weights,
per-superstep local Dijkstra + boundary min-exchange; distances start at ∞,
source 0, parent pointers tracked) and the Giraph weighted variant
(giraph examples SubgraphSingleSourceShortestPathWithWeights.java:44-463).

Spark shape: frontier-driven Bellman-Ford supersteps —

    updates  = frontier ⋈ edges on src → (dst, dist+w, parent=src)
             → groupBy(dst).agg(min(struct(dist, parent)))   -- the reference's
               per-subgraph min-before-send (SSSP.java:256-300) is Spark's
               map-side partial min
    improved = updates ⋈ dist where new < old
    dist'    = dist outer-merge improved ; frontier' = improved

The loop touches only the frontier's out-edges each superstep (the analogue
of the reference's changed-roots re-run at :216-253), so total work is
O(Σ relaxations), not O(supersteps × |E|). Halts when no distance improves
(reference: no updates → voteToHalt).

Parent tie-break: smallest (dist, parent) pair — deterministic, so results
are partition-count invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from goffish_v3_spark.plans.csr import CsrBlock, build_csr_blocks
from goffish_v3_spark.plans.superstep import no_aqe

INF = float("inf")

SSSP_SCHEMA = "part int, kind int, vid long, d double, p long"


def sssp(
    spark: SparkSession,
    edges: DataFrame,
    source: int,
    weighted: bool = False,
    directed: bool = True,
    max_iter: int = 200,
) -> DataFrame:
    """Return ``(vid long, dist double, parent long)``; unreachable vertices
    keep dist = +inf and parent = -1 (the reference prints Short.MAX for
    these, SSSP.java:90; +inf is our canonical unreachable marker)."""
    e = edges.select("src", "dst", (F.col("w") if weighted else F.lit(1.0)).alias("w"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    # persist pre-shuffled AND pre-sorted on the per-superstep join key, so
    # frontier ⋈ e reuses the cached outputPartitioning/outputOrdering and
    # only the (small) frontier side exchanges each superstep — same layout
    # trick as operators.pagerank. ONE edge exchange: partition by src
    # first, then the (src,dst) min-w dedup is partition-local
    # (HashPartitioning(src) satisfies the grouping's clustering) and the
    # local sort rides the same layout.
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = (
        e.repartition(n_shuffle, "src")
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .sortWithinPartitions("src")
        .persist()
    )

    vertices = (
        e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    dist = vertices.select(
        "vid",
        F.when(F.col("vid") == source, 0.0).otherwise(F.lit(INF)).alias("dist"),
        F.lit(-1).cast("long").alias("parent"),
    ).localCheckpoint(eager=True)
    frontier = dist.filter(F.col("dist") == 0.0).select("vid", "dist")

    with no_aqe(spark):
        dist = _relax_loop(e, dist, frontier, max_iter)
    e.unpersist()
    return dist


_SSSP_EMPTY = {"part": "int32", "kind": "int32", "vid": "int64", "d": "f8", "p": "int64"}


def _make_sssp_kernel(superstep: int, source: int, blocks_path: str | None = None):
    """One superstep of subgraph-centric SSSP: apply inbound boundary
    candidates, relax the partition-local subgraph **to convergence**
    (vectorized frontier Bellman-Ford sweeps over the local CSR — the
    reference's per-superstep full local search, SingleSourceShortestPath.
    java:407-536 ``aStar``), then emit min-combined boundary candidates from
    changed vertices only (:350-376's changed-roots bundling).

    ``blocks_path`` switches to the worker-local block cache
    (plans.block_cache): the kernel becomes a plain grouped map over
    state+messages and fetches its CSR block locally — the reference's
    load-once-compute-many shape (GraphJobRunner.java:105-126)."""

    def body(blk: CsrBlock, sm_pdf: pd.DataFrame) -> pd.DataFrame:
        n = blk.n_local

        if superstep == 0:
            dist = np.full(n, np.inf)
            parent = np.full(n, -1, dtype=np.int64)
        else:
            state_rows = sm_pdf[sm_pdf["kind"] == 0]
            idx = blk.align(state_rows["vid"].to_numpy(dtype=np.int64))
            dist = np.empty(n)
            parent = np.empty(n, dtype=np.int64)
            dist[idx] = state_rows["d"].to_numpy(dtype=np.float64)
            parent[idx] = state_rows["p"].to_numpy(dtype=np.int64)

        changed = np.zeros(n, dtype=bool)
        if superstep == 0 and n:
            pos = np.searchsorted(blk.local_vids, source)
            if pos < n and blk.local_vids[pos] == source:
                dist[pos] = 0.0
                changed[pos] = True

        # deliver inbound candidates: min (d, p) per vid, strict improvement
        msg_rows = sm_pdf[sm_pdf["kind"] == 1]
        if len(msg_rows):
            mvid = msg_rows["vid"].to_numpy(dtype=np.int64)
            md = msg_rows["d"].to_numpy(dtype=np.float64)
            mp = msg_rows["p"].to_numpy(dtype=np.int64)
            order = np.lexsort((mp, md, mvid))
            mvid, md, mp = mvid[order], md[order], mp[order]
            first = np.concatenate(([True], mvid[1:] != mvid[:-1]))
            mvid, md, mp = mvid[first], md[first], mp[first]
            idx = blk.align(mvid)
            imp = md < dist[idx]
            dist[idx[imp]] = md[imp]
            parent[idx[imp]] = mp[imp]
            changed[idx[imp]] = True

        # local relaxation to fixpoint (P3): frontier sweeps over local edges
        seg = np.repeat(np.arange(n, dtype=np.int64), blk.out_degrees)
        local_e = blk.edge_dst_local >= 0
        l_seg = seg[local_e]
        l_dst = blk.edge_dst_local[local_e]
        l_w = blk.edge_w[local_e]
        l_pvid = blk.local_vids[l_seg]
        frontier = changed.copy()
        while frontier.any() and len(l_seg):
            act = frontier[l_seg]
            if not act.any():
                break
            s, dsts = l_seg[act], l_dst[act]
            nd = dist[s] + l_w[act]
            np_ = l_pvid[act]
            ok = nd < dist[dsts]
            dsts, nd, np_ = dsts[ok], nd[ok], np_[ok]
            frontier = np.zeros(n, dtype=bool)
            if len(dsts) == 0:
                break
            order = np.lexsort((np_, nd, dsts))
            dsts, nd, np_ = dsts[order], nd[order], np_[order]
            first = np.concatenate(([True], dsts[1:] != dsts[:-1]))
            dsts, nd, np_ = dsts[first], nd[first], np_[first]
            imp = nd < dist[dsts]
            dist[dsts[imp]] = nd[imp]
            parent[dsts[imp]] = np_[imp]
            frontier[dsts[imp]] = True
            changed |= frontier

        # boundary candidates from changed vertices, min-combined per target
        out_part = np.empty(0, dtype=np.int32)
        out_vid = np.empty(0, dtype=np.int64)
        out_d = np.empty(0, dtype=np.float64)
        out_p = np.empty(0, dtype=np.int64)
        remote_e = ~local_e
        if changed.any() and remote_e.any():
            act = remote_e & changed[seg]
            if act.any():
                r_seg = seg[act]
                r_vid = blk.edge_dst_vid[act]
                r_part = blk.edge_dst_part[act]
                r_d = dist[r_seg] + blk.edge_w[act]
                r_p = blk.local_vids[r_seg]
                order = np.lexsort((r_p, r_d, r_vid, r_part))
                r_part, r_vid, r_d, r_p = (
                    r_part[order], r_vid[order], r_d[order], r_p[order]
                )
                first = np.concatenate(
                    ([True], (r_vid[1:] != r_vid[:-1]) | (r_part[1:] != r_part[:-1]))
                )
                out_part, out_vid, out_d, out_p = (
                    r_part[first], r_vid[first], r_d[first], r_p[first]
                )

        n_msg = len(out_vid)
        n_changed = int(changed.sum())
        return pd.DataFrame(
            {
                "part": np.concatenate(
                    [
                        np.full(n, blk.part, dtype=np.int32),
                        out_part,
                        np.array([blk.part], dtype=np.int32),
                    ]
                ),
                "kind": np.concatenate(
                    [
                        np.zeros(n, dtype=np.int32),
                        np.ones(n_msg, dtype=np.int32),
                        np.array([2], dtype=np.int32),
                    ]
                ),
                "vid": np.concatenate(
                    [blk.local_vids, out_vid, np.array([-1], dtype=np.int64)]
                ),
                "d": np.concatenate([dist, out_d, np.array([0.0])]),
                "p": np.concatenate(
                    [parent, out_p, np.array([n_changed], dtype=np.int64)]
                ),
            }
        )

    if blocks_path is None:

        def kernel(keys, csr_pdf: pd.DataFrame, sm_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(csr_pdf) == 0:
                return pd.DataFrame(
                    {"part": [], "kind": [], "vid": [], "d": [], "p": []}
                ).astype(_SSSP_EMPTY)
            return body(CsrBlock(csr_pdf.iloc[0]), sm_pdf)

        return kernel

    def cached_kernel(key, sm_pdf: pd.DataFrame) -> pd.DataFrame:
        from goffish_v3_spark.plans.block_cache import load_block

        blk = load_block(blocks_path, int(key[0]))
        if blk is None:
            # state/seed rows imply the block was written; a silent empty
            # return would end the loop with a WRONG (partial) result on any
            # cluster whose executors can't see blocks_path
            raise RuntimeError(
                f"CSR block for part {int(key[0])} not found under "
                f"{blocks_path}; on a multi-executor cluster pass blocks_dir= "
                "on storage visible to every executor"
            )
        return body(blk, sm_pdf)

    return cached_kernel


def sssp_csr(
    spark: SparkSession,
    edges: DataFrame,
    source: int,
    weighted: bool = False,
    directed: bool = True,
    num_parts: int | None = None,
    max_iter: int = 10_000,
    part_expr=None,
    cache_blocks: bool = False,
    blocks_dir: str | None = None,
) -> DataFrame:
    """Subgraph-centric SSSP over partition-local CSR blocks — the P3
    superstep-collapsing engine. Returns ``(vid, dist, parent)`` with the
    same distances as :func:`sssp`.

    Supersteps scale with the number of cross-partition hops on shortest
    paths, not the hop diameter: with a locality-aware ``part_expr`` (range
    buckets, k-means growth — the METIS analogue) a diameter-10³ road
    network needs O(meta-diameter) rounds where the DataFrame Bellman-Ford
    needs 10³ (reference rationale: SingleSourceShortestPath.java:407-536).

    ``cache_blocks`` serves CSR blocks from the worker-local cache
    (plans.block_cache, the load-once-compute-many shape) instead of
    re-shipping them through Arrow every superstep; ``blocks_dir`` points the
    block store at executor-visible storage — REQUIRED on a multi-executor
    cluster (enforced by resolve_blocks_dir).
    """
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select("src", "dst", (F.col("w") if weighted else F.lit(1.0)).alias("w"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    blocks = build_csr_blocks(spark, e, num_parts, part_expr=part_expr)

    blocks_path, owned, seed = None, False, None
    if cache_blocks:
        from goffish_v3_spark.plans.block_cache import resolve_blocks_dir, write_blocks

        blocks_path, owned = resolve_blocks_dir(spark, blocks_dir, prefix="goffish_sssp_")
        write_blocks(blocks, blocks_path)
        parts = [r.part for r in blocks.select("part").collect()]
        blocks.unpersist()
        # kind=-1 seed rows bootstrap every partition at superstep 0 (no
        # state exists yet and grouped-map has no block side to enumerate)
        seed = spark.createDataFrame(
            [(int(p), -1, -1, 0.0, 0) for p in parts], SSSP_SCHEMA
        )

    state = spark.createDataFrame([], SSSP_SCHEMA)
    msgs = spark.createDataFrame([], SSSP_SCHEMA)
    supersteps = 0
    try:
        with no_aqe(spark):
            for i in range(max_iter):
                kernel = _make_sssp_kernel(i, source, blocks_path=blocks_path)
                mixed = state.unionByName(msgs)
                if blocks_path is not None:
                    if i == 0:
                        mixed = mixed.unionByName(seed)
                    out = mixed.groupby("part").applyInPandas(kernel, schema=SSSP_SCHEMA)
                else:
                    out = (
                        blocks.groupby("part")
                        .cogroup(mixed.groupby("part"))
                        .applyInPandas(kernel, schema=SSSP_SCHEMA)
                    )
                obs = Observation(f"sssp_csr_step_{i}")
                out = out.observe(
                    obs, F.sum(F.when(F.col("kind") == 2, F.col("p"))).alias("improved")
                ).localCheckpoint(eager=True)
                state = out.filter(F.col("kind") == 0)
                msgs = out.filter(F.col("kind") == 1)
                supersteps = i + 1
                if int(obs.get["improved"] or 0) == 0:
                    break

        result = (
            state.select("vid", F.col("d").alias("dist"), F.col("p").alias("parent"))
            .localCheckpoint(eager=True)
        )
    finally:
        if owned:
            import shutil

            shutil.rmtree(blocks_path, ignore_errors=True)
    result.sssp_supersteps = supersteps  # introspection for tests/bench
    if not cache_blocks:
        blocks.unpersist()
    return result


def _relax_loop(e, dist, frontier, max_iter):
    for i in range(max_iter):
        candidates = (
            frontier.join(e, frontier.vid == e.src)
            .select(
                F.col("dst").alias("vid"),
                (F.col("dist") + F.col("w")).alias("nd"),
                F.col("src").alias("np"),
            )
            .groupBy("vid")
            .agg(F.min(F.struct("nd", "np")).alias("m"))
            .select("vid", F.col("m.nd").alias("nd"), F.col("m.np").alias("np"))
        )
        merged = dist.join(candidates, "vid", "left").select(
            "vid",
            F.when(
                F.coalesce(F.col("nd"), F.lit(INF)) < F.col("dist"), F.col("nd")
            ).otherwise(F.col("dist")).alias("dist"),
            F.when(
                F.coalesce(F.col("nd"), F.lit(INF)) < F.col("dist"), F.col("np")
            ).otherwise(F.col("parent")).alias("parent"),
            (F.coalesce(F.col("nd"), F.lit(INF)) < F.col("dist")).alias("_improved"),
        )
        # one job/superstep: improvement count observed during truncation
        obs = Observation(f"sssp_step_{i}")
        merged = merged.observe(
            obs, F.sum(F.col("_improved").cast("long")).alias("improved")
        ).localCheckpoint(eager=True)
        improved = int(obs.get["improved"] or 0)
        frontier = merged.filter(F.col("_improved")).select("vid", "dist")
        dist = merged.select("vid", "dist", "parent")
        if improved == 0:
            break

    return dist
