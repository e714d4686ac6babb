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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from goffish_v3_spark.plans.csr import CsrBlock, build_csr_blocks_sym
from goffish_v3_spark.plans.superstep import StepResult, SuperstepLoop, no_aqe


def _symmetrize(edges: DataFrame, partition_into: int | None = None) -> DataFrame:
    """Both edge directions, self-loops dropped, (src,dst)-deduped.

    With ``partition_into`` the dedup rides a single repartition-by-src
    exchange (HashPartitioning(src) satisfies the dedup's clustering — the
    same one-exchange layout as operators.pagerank's setup) and the output
    is left hash-partitioned on src for the caller to cache."""
    e = edges.select("src", "dst")
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).filter(F.col("src") != F.col("dst"))
    if partition_into is None:
        return sym.distinct()
    return sym.repartition(partition_into, "src").dropDuplicates(["src", "dst"])


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
        _symmetrize(edges, partition_into=n_shuffle)
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


# ---------------------------------------------------------------------------
# Subgraph-centric LPA over CSR blocks (engine-shape parity, SURVEY §4 P3)
# ---------------------------------------------------------------------------

LPA_SCHEMA = "part int, kind int, vid long, a long"


def _local_mode_fixpoint(
    blk: CsrBlock,
    label: np.ndarray,
    remote_label: np.ndarray,
    max_sweeps: int,
) -> np.ndarray:
    """Synchronous mode-propagation sweeps over one block to local fixpoint,
    with remote neighbours pinned at ``remote_label`` (per-edge values, only
    read where ``edge_dst_local < 0``).

    Each sweep is the DataFrame variant's round restricted to the block:
    every local vertex adopts the most frequent neighbour label, tie → the
    smallest. Fully vectorized (one lexsort + run-length mode per sweep).

    Synchronous LPA can 2-cycle (bipartite flip); on detecting ``new ==
    state-two-sweeps-ago`` the sweep loop stops at the lexicographically
    smaller of the two cycle states — deterministic and independent of the
    phase at which the cycle was entered."""
    indptr = blk.indptr
    n = blk.n_local
    n_edges = len(blk.edge_dst_vid)
    if n == 0 or n_edges == 0:
        return label
    deg = np.diff(indptr)
    seg = np.repeat(np.arange(n, dtype=np.int64), deg)
    local_idx = blk.edge_dst_local
    is_local = local_idx >= 0
    nv = np.empty(n_edges, dtype=np.int64)
    nv[~is_local] = remote_label[~is_local]
    prev = None
    for _ in range(max_sweeps):
        nv[is_local] = label[local_idx[is_local]]
        order = np.lexsort((nv, seg))
        seg_s, nv_s = seg[order], nv[order]
        new_run = np.empty(n_edges, dtype=bool)
        new_run[0] = True
        new_run[1:] = (seg_s[1:] != seg_s[:-1]) | (nv_s[1:] != nv_s[:-1])
        run_id = np.cumsum(new_run) - 1
        cnt = np.bincount(run_id)
        starts = np.flatnonzero(new_run)
        run_seg, run_label = seg_s[starts], nv_s[starts]
        # per segment: max count wins; runs are label-ascending within a
        # segment and lexsort is stable, so first-per-segment after a
        # -cnt sort is (max count, min label)
        o2 = np.lexsort((-cnt, run_seg))
        first = np.empty(len(o2), dtype=bool)
        first[0] = True
        first[1:] = run_seg[o2][1:] != run_seg[o2][:-1]
        new_label = label.copy()
        new_label[run_seg[o2][first]] = run_label[o2][first]
        if np.array_equal(new_label, label):
            break
        if prev is not None and np.array_equal(new_label, prev):
            # 2-cycle {label, new_label}: keep the lexicographically smaller
            cmp = label != new_label
            i0 = np.flatnonzero(cmp)[0]
            label = label if label[i0] < new_label[i0] else new_label
            break
        prev = label
        label = new_label
    return label


_LPA_EMPTY = {"part": "int32", "kind": "int32", "vid": "int64", "a": "int64"}


def _make_lpa_kernel(
    superstep: int, max_local_sweeps: int, blocks_path: str | None = None
):
    """One superstep: merge shadows+messages, run the block to local mode
    fixpoint, emit state (kind=0), changed-only boundary labels (kind=1),
    refreshed shadows (kind=3, routed to self), the superstep-start labels
    (kind=4, routed to self — next superstep's prev-prev state for the
    cross-block cycle damper), and a changed count (kind=2).

    Initial labels are ``label(v) = v`` (lpa() semantics), so a remote
    neighbour with no shadow entry is KNOWN to still hold its own vid —
    changed-only messaging therefore needs no full first exchange (unlike
    kcore, whose degree seeds are not computable receiver-side).

    Cycle damper: the in-sweep 2-cycle breaker only sees oscillation INSIDE
    a block; a cross-block 2-cycle (e.g. a bridge edge whose endpoints swap
    labels every superstep) oscillates at superstep granularity. When a
    vertex's end-of-superstep label equals its label two supersteps ago and
    differs from last superstep's, the pair {prev, current} is a 2-cycle:
    take the elementwise min — deterministic, phase-independent, and a
    no-op on monotone trajectories.

    ``blocks_path`` switches to the worker-local block cache
    (plans.block_cache): plain grouped map over state+messages, block
    fetched locally — the load-once-compute-many shape shared with
    kcore/sssp_csr/csr_pagerank."""

    def quiescent(sm_pdf: pd.DataFrame) -> bool:
        """Partition-level wake-on-message (the reference's voteToHalt
        shape, mirroring kcore's passthrough): skip the block fetch and the
        mode-fixpoint when (a) no fresh boundary labels arrived AND (b) the
        partition's own previous superstep reported changed == 0 — its
        kind-2 row rides the carry back to itself. (b) is required here,
        unlike kcore: the cross-block cycle damper can rewrite labels AFTER
        the local fixpoint, so a no-message partition with changed > 0 may
        not be at a re-runnable fixpoint yet. With changed == 0 the damper
        provably did not fire (it requires label != prev) and the persisted
        state is a verified mode fixpoint, so a re-run would emit exactly
        these rows."""
        if superstep == 0 or (sm_pdf["kind"] == 1).any():
            return False
        pc = sm_pdf[sm_pdf["kind"] == 2]
        return len(pc) > 0 and int(pc["a"].iloc[0]) == 0

    def passthrough(sm_pdf: pd.DataFrame) -> pd.DataFrame:
        out = sm_pdf[sm_pdf["kind"].isin((0, 3, 4))]
        if len(out) == 0:  # defensive: a group always carries kind-0 state
            return pd.DataFrame(columns=list(_LPA_EMPTY)).astype(_LPA_EMPTY)
        part = np.int32(out["part"].iloc[0])
        marker = pd.DataFrame(
            {
                "part": np.array([part], dtype=np.int32),
                "kind": np.array([2], dtype=np.int32),
                "vid": np.array([-1], dtype=np.int64),
                "a": np.array([0], dtype=np.int64),
            }
        )
        return pd.concat(
            [out[["part", "kind", "vid", "a"]], marker], ignore_index=True
        )

    def body(blk: CsrBlock, sm_pdf: pd.DataFrame) -> pd.DataFrame:
        n = blk.n_local
        seg = np.repeat(np.arange(n, dtype=np.int64), blk.out_degrees)
        remote_mask = blk.edge_dst_local < 0
        shadow_vid = np.empty(0, dtype=np.int64)
        shadow_val = np.empty(0, dtype=np.int64)
        prevprev = None

        if superstep == 0:
            label = blk.local_vids.copy()
        else:
            state_rows = sm_pdf[sm_pdf["kind"] == 0]
            label = np.empty(n, dtype=np.int64)
            idx = blk.align(state_rows["vid"].to_numpy(dtype=np.int64))
            label[idx] = state_rows["a"].to_numpy(dtype=np.int64)
            pp_rows = sm_pdf[sm_pdf["kind"] == 4]
            if len(pp_rows):
                prevprev = np.empty(n, dtype=np.int64)
                pidx = blk.align(pp_rows["vid"].to_numpy(dtype=np.int64))
                prevprev[pidx] = pp_rows["a"].to_numpy(dtype=np.int64)
            msg_rows = sm_pdf[sm_pdf["kind"] == 1]
            sh_rows = sm_pdf[sm_pdf["kind"] == 3]
            # fresh messages override shadows (stable sort keeps them last)
            svid = np.concatenate(
                [
                    sh_rows["vid"].to_numpy(dtype=np.int64),
                    msg_rows["vid"].to_numpy(dtype=np.int64),
                ]
            )
            sval = np.concatenate(
                [
                    sh_rows["a"].to_numpy(dtype=np.int64),
                    msg_rows["a"].to_numpy(dtype=np.int64),
                ]
            )
            order = np.argsort(svid, kind="stable")
            svid, sval = svid[order], sval[order]
            if len(svid):
                keep = np.concatenate((svid[1:] != svid[:-1], [True]))
                shadow_vid, shadow_val = svid[keep], sval[keep]
        prev = label.copy()

        # per-edge remote labels: shadow value, else the neighbour's own vid
        # (its initial label — exact for never-changed vertices)
        remote_label = np.zeros(len(blk.edge_dst_vid), dtype=np.int64)
        if remote_mask.any():
            want = blk.edge_dst_vid[remote_mask]
            vals = want.copy()
            if len(shadow_vid):
                pos = np.minimum(np.searchsorted(shadow_vid, want), len(shadow_vid) - 1)
                hit = shadow_vid[pos] == want
                vals[hit] = shadow_val[pos[hit]]
            remote_label[remote_mask] = vals

        label = _local_mode_fixpoint(blk, label, remote_label, max_local_sweeps)
        if prevprev is not None:
            cyc = (label == prevprev) & (label != prev)
            if cyc.any():
                label = np.where(cyc, np.minimum(label, prev), label)
        changed_mask = label != prev
        changed = np.int64(np.count_nonzero(changed_mask))

        send_edge_mask = remote_mask & changed_mask[seg]
        if send_edge_mask.any():
            pairs = np.stack(
                [blk.edge_dst_part[send_edge_mask].astype(np.int64), seg[send_edge_mask]],
                axis=1,
            )
            uniq = np.unique(pairs, axis=0)
            msg_part = uniq[:, 0].astype(np.int32)
            msg_vidx = uniq[:, 1]
        else:
            msg_part = np.empty(0, dtype=np.int32)
            msg_vidx = np.empty(0, dtype=np.int64)

        n_msg = len(msg_part)
        n_sh = len(shadow_vid)
        return pd.DataFrame(
            {
                "part": np.concatenate(
                    [
                        np.full(n, blk.part, dtype=np.int32),
                        msg_part,
                        np.full(n_sh, blk.part, dtype=np.int32),
                        np.full(n, blk.part, dtype=np.int32),
                        np.array([blk.part], dtype=np.int32),
                    ]
                ),
                "kind": np.concatenate(
                    [
                        np.zeros(n, dtype=np.int32),
                        np.ones(n_msg, dtype=np.int32),
                        np.full(n_sh, 3, dtype=np.int32),
                        np.full(n, 4, dtype=np.int32),
                        np.array([2], dtype=np.int32),
                    ]
                ),
                "vid": np.concatenate(
                    [
                        blk.local_vids,
                        blk.local_vids[msg_vidx],
                        shadow_vid,
                        blk.local_vids,
                        np.array([-1], dtype=np.int64),
                    ]
                ),
                "a": np.concatenate(
                    [
                        label,
                        label[msg_vidx],
                        shadow_val,
                        prev,
                        np.array([changed], dtype=np.int64),
                    ]
                ),
            }
        )

    if blocks_path is None:

        def kernel(keys, csr_pdf: pd.DataFrame, sm_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(csr_pdf) == 0:
                return pd.DataFrame(
                    {"part": [], "kind": [], "vid": [], "a": []}
                ).astype(_LPA_EMPTY)
            if quiescent(sm_pdf):
                return passthrough(sm_pdf)
            return body(CsrBlock(csr_pdf.iloc[0]), sm_pdf)

        return kernel

    def cached_kernel(key, sm_pdf: pd.DataFrame) -> pd.DataFrame:
        from goffish_v3_spark.plans.block_cache import load_block

        if quiescent(sm_pdf):
            # nothing needed from the CSR block — skip the cache fetch
            return passthrough(sm_pdf)
        blk = load_block(blocks_path, int(key[0]))
        if blk is None:
            raise RuntimeError(
                f"CSR block for part {int(key[0])} not found under "
                f"{blocks_path}; on a multi-executor cluster pass blocks_dir= "
                "on storage visible to every executor"
            )
        return body(blk, sm_pdf)

    return cached_kernel


def lpa_csr(
    spark: SparkSession,
    edges: DataFrame,
    num_parts: int | None = None,
    max_iter: int = 30,
    max_local_sweeps: int = 10_000,
    part_expr=None,
    cache_blocks: bool = False,
    blocks_dir: str | None = None,
) -> DataFrame:
    """Subgraph-centric LPA: each superstep runs mode-propagation to local
    fixpoint inside every CSR block (remote labels pinned at their
    last-received values), then exchanges only the boundary labels that
    changed — the engine shape of the reference's per-partition
    local-compute-to-convergence programs (e.g. KCore.java:91-99,
    SingleSourceShortestPath.java:407-536), applied to LPA.

    Returns ``(vid long, label long)``. Labels are an LPA labeling but
    (like any asynchronous-schedule LPA) NOT bit-identical to :func:`lpa`'s
    synchronous rounds for a given partitioning other than 1 block; with
    ``num_parts=1`` the local fixpoint IS full synchronous LPA and results
    coincide on graphs that converge without 2-cycling (the cycle-breaker
    picks the lexicographically smaller cycle state, where :func:`lpa` stops
    wherever ``max_iter`` lands). Superstep-level 2-cycles across blocks are
    damped to their elementwise-min state (see _make_lpa_kernel); longer
    oscillations — inherent to synchronous LPA, :func:`lpa` included — exit
    at ``max_iter`` mid-cycle. Deterministic for a fixed partitioning.

    Supersteps scale with how many blocks a label wave must cross, not the
    round count of the wave itself: with a locality-aware ``part_expr`` a
    depth-R propagation inside one block costs one superstep (asserted ≪
    DataFrame rounds in tests/test_lpa.py). The result exposes
    ``lpa_supersteps`` for introspection."""
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    blocks = build_csr_blocks_sym(spark, edges, num_parts, part_expr=part_expr)

    blocks_path, owned, seed = None, False, None
    if cache_blocks:
        from goffish_v3_spark.plans.block_cache import resolve_blocks_dir, write_blocks

        blocks_path, owned = resolve_blocks_dir(spark, blocks_dir, prefix="goffish_lpa_")
        write_blocks(blocks, blocks_path)
        parts = [r.part for r in blocks.select("part").collect()]
        blocks.unpersist()
        seed = spark.createDataFrame(
            [(int(p), -1, -1, 0) for p in parts], LPA_SCHEMA
        )

    carry = spark.createDataFrame([], LPA_SCHEMA)
    supersteps = 0
    try:
        with no_aqe(spark):
            for i in range(max_iter):
                kernel = _make_lpa_kernel(i, max_local_sweeps, blocks_path=blocks_path)
                if blocks_path is not None:
                    mixed = carry.unionByName(seed) if i == 0 else carry
                    out = mixed.groupby("part").applyInPandas(kernel, schema=LPA_SCHEMA)
                else:
                    out = (
                        blocks.groupby("part")
                        .cogroup(carry.groupby("part"))
                        .applyInPandas(kernel, schema=LPA_SCHEMA)
                    )
                obs = Observation(f"lpa_csr_step_{i}")
                out = out.observe(
                    obs, F.sum(F.when(F.col("kind") == 2, F.col("a"))).alias("changed")
                ).localCheckpoint(eager=True)
                # kind-2 rows stay in the carry: each partition's changed
                # count rides back to itself so the kernel's quiescent check
                # can prove its state is a re-runnable fixpoint (1 row/part)
                carry = out
                supersteps = i + 1
                if int(obs.get["changed"] or 0) == 0:
                    break

        result = (
            carry.filter(F.col("kind") == 0)
            .select("vid", F.col("a").alias("label"))
            .localCheckpoint(eager=True)
        )
    finally:
        if owned:
            import shutil

            shutil.rmtree(blocks_path, ignore_errors=True)
    result.lpa_supersteps = supersteps
    if not cache_blocks:
        blocks.unpersist()
    return result
