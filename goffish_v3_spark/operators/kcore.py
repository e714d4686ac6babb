"""k-core decomposition — distributed h-index kernel over CSR blocks.

Semantics: sample-hama KCore.java:35-113 / KCoreFast.java / KCoreSort.java —
per-vertex core numbers à la Montresor et al. 2013 (cited at
sample-giraph KCore.java:16-19). The reference ships three Hama variants
differing only in local scheduling; we ship one distributed implementation
(SURVEY.md §2.C C8-C10) with the reference's defining execution shape:

- every vertex keeps a core *estimate*, initialised to its degree
  (KCore.java:46-55);
- one superstep = each partition re-runs the h-index update over its local
  block **to local fixpoint** (the local-computation-to-convergence trick,
  KCore.java:91-99 ``localEstimate`` — SURVEY §4 P3) with remote neighbours'
  estimates pinned at their last received values;
- boundary estimates are exchanged once per superstep, pre-deduplicated per
  (neighbour partition, vertex) before the shuffle (the reference's
  changed-core message bundling, KCore.java:101-109);
- global halt when no estimate changed anywhere (driver-side gate).

The h-index operator (new_est = min(est, H(neighbour estimates)) where H is
the largest h with ≥ h neighbours ≥ h) is monotone non-increasing from the
degree initialisation and converges to the exact coreness for *any* update
order (Montresor et al., thm 1) — which is why the partition-local chaotic
iteration, the synchronous Jacobi oracle in SQL, and classic peeling all
agree on the final numbers.

Scale shape: per superstep ONE cogrouped ``applyInPandas`` over the persisted
CSR blocks + O(cut) message rows. Job count is O(global rounds) — a few,
bounded by how far core changes must propagate across partitions — instead of
the O(max_core × peeling depth) driver loop this replaces.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Observation

from goffish_v3_spark.plans.csr import CsrBlock, build_csr_blocks_sym
from goffish_v3_spark.plans.superstep import no_aqe

OUT_SCHEMA = "part int, kind int, vid long, a long"


def _local_hindex_fixpoint(
    blk: CsrBlock, est: np.ndarray, remote_est: np.ndarray, max_sweeps: int = 10_000
) -> np.ndarray:
    """Iterate new_est = min(est, h_index(neighbour ests)) to fixpoint inside
    one partition block. Fully vectorized: one lexsort + segment max per sweep.
    """
    indptr = blk.indptr
    n = blk.n_local
    n_edges = len(blk.edge_dst_vid)
    if n == 0 or n_edges == 0:
        return est
    deg = np.diff(indptr)
    seg = np.repeat(np.arange(n, dtype=np.int64), deg)
    local_idx = blk.edge_dst_local
    is_local = local_idx >= 0
    nv = np.empty(n_edges, dtype=np.int64)
    nv[~is_local] = remote_est[~is_local]
    rank1 = np.arange(n_edges, dtype=np.int64)
    for _ in range(max_sweeps):
        nv[is_local] = est[local_idx[is_local]]
        # sort neighbour values descending within each CSR segment
        order = np.lexsort((-nv, seg))
        nv_sorted = nv[order]
        # within-segment rank (CSR rows are contiguous, lexsort keeps seg order)
        rank = rank1 - indptr[seg]
        h_cand = np.minimum(rank + 1, nv_sorted)
        h = np.zeros(n, dtype=np.int64)
        np.maximum.at(h, seg, h_cand)
        new_est = np.minimum(est, h)
        if np.array_equal(new_est, est):
            break
        est = new_est
    return est


_EMPTY_OUT = {"part": "int32", "kind": "int32", "vid": "int64", "a": "int64"}


def _make_kernel(
    superstep: int, cap: int | None = None, blocks_path: str | None = None
):
    """``cap`` caps estimates at k: the capped iteration converges to
    min(core, k) — distributed peeling for a fixed k. Cascades stop as soon
    as values saturate at the cap, so the k-core query needs only a handful
    of global rounds instead of the full decomposition's propagation depth.

    ``blocks_path`` switches from cogrouped block shipping to the
    worker-local block cache (plans.block_cache): the kernel becomes a plain
    grouped map over state+messages and fetches its CSR block locally —
    the reference's load-once-compute-many shape."""

    def body(blk: CsrBlock, sm_pdf: pd.DataFrame) -> pd.DataFrame:
        n = blk.n_local
        deg = blk.out_degrees.astype(np.int64)
        if cap is not None:
            deg = np.minimum(deg, cap)

        if superstep == 0:
            # seed: est = degree (KCore.java:46-55); no update yet — remote
            # estimates are unknown until the first exchange lands
            est = deg
            changed = np.int64(n)  # force ≥1 more round
        else:
            state_rows = sm_pdf[sm_pdf["kind"] == 0]
            msg_rows = sm_pdf[sm_pdf["kind"] == 1]
            est = np.empty(n, dtype=np.int64)
            idx = blk.align(state_rows["vid"].to_numpy(dtype=np.int64))
            est[idx] = state_rows["a"].to_numpy(dtype=np.int64)
            prev = est.copy()
            # remote estimate per edge: every neighbour partition re-sends its
            # full boundary estimates each superstep, so lookup is total
            remote_est = np.zeros(len(blk.edge_dst_vid), dtype=np.int64)
            remote_mask = blk.edge_dst_local < 0
            if remote_mask.any() and len(msg_rows):
                mvid = msg_rows["vid"].to_numpy(dtype=np.int64)
                mval = msg_rows["a"].to_numpy(dtype=np.int64)
                morder = np.argsort(mvid, kind="stable")
                mvid, mval = mvid[morder], mval[morder]
                want = blk.edge_dst_vid[remote_mask]
                pos = np.searchsorted(mvid, want)
                pos = np.minimum(pos, len(mvid) - 1)
                if not np.array_equal(mvid[pos], want):
                    raise RuntimeError(
                        f"kcore part {blk.part}: missing boundary estimate rows"
                    )
                remote_est[remote_mask] = mval[pos]
            est = _local_hindex_fixpoint(blk, est, remote_est)
            changed = np.int64(np.count_nonzero(est != prev))

        # boundary exchange: send each boundary vertex's estimate to every
        # partition that references it (its remote neighbours' owners) —
        # dedup'd per (dst_part, vid) before the shuffle
        seg = np.repeat(np.arange(n, dtype=np.int64), blk.out_degrees)
        remote_mask = blk.edge_dst_local < 0
        if remote_mask.any():
            pairs = np.stack(
                [blk.edge_dst_part[remote_mask].astype(np.int64), seg[remote_mask]],
                axis=1,
            )
            uniq = np.unique(pairs, axis=0)
            msg_part = uniq[:, 0].astype(np.int32)
            msg_vidx = uniq[:, 1]
        else:
            msg_part = np.empty(0, dtype=np.int32)
            msg_vidx = np.empty(0, dtype=np.int64)

        n_msg = len(msg_part)
        return pd.DataFrame(
            {
                "part": np.concatenate(
                    [
                        np.full(n, blk.part, dtype=np.int32),
                        msg_part,
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
                    [blk.local_vids, blk.local_vids[msg_vidx], np.array([-1], dtype=np.int64)]
                ),
                "a": np.concatenate([est, est[msg_vidx], np.array([changed], dtype=np.int64)]),
            }
        )

    if blocks_path is None:

        def kernel(keys, csr_pdf: pd.DataFrame, sm_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(csr_pdf) == 0:
                return pd.DataFrame(
                    {"part": [], "kind": [], "vid": [], "a": []}
                ).astype(_EMPTY_OUT)
            return body(CsrBlock(csr_pdf.iloc[0]), sm_pdf)

        return kernel

    def cached_kernel(key, sm_pdf: pd.DataFrame) -> pd.DataFrame:
        from goffish_v3_spark.plans.block_cache import load_block

        blk = load_block(blocks_path, int(key[0]))
        if blk is None:
            return pd.DataFrame({"part": [], "kind": [], "vid": [], "a": []}).astype(
                _EMPTY_OUT
            )
        return body(blk, sm_pdf)

    return cached_kernel


def _hindex_loop(
    spark: SparkSession,
    blocks: DataFrame,
    cap: int | None,
    max_iter: int,
    blocks_path: str | None = None,
    parts: list[int] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Drive the kernel to global fixpoint; returns (final kind-0 state,
    final kind-1 messages — fixpoint boundary estimates).

    With ``blocks_path`` the loop runs in block-cache mode: supersteps are a
    grouped map over state+messages only (kind=-1 seed rows bootstrap every
    partition at superstep 0); blocks never re-enter the shuffle/Arrow
    channel after the one-time write."""
    state = spark.createDataFrame([], OUT_SCHEMA)
    msgs = spark.createDataFrame([], OUT_SCHEMA)
    if blocks_path is not None:
        seed = spark.createDataFrame(
            [(int(p), -1, -1, 0) for p in parts], OUT_SCHEMA
        )
    with no_aqe(spark):
        for i in range(max_iter):
            kernel = _make_kernel(i, cap=cap, blocks_path=blocks_path)
            mixed = state.unionByName(msgs)
            if blocks_path is None:
                out = (
                    blocks.groupby("part")
                    .cogroup(mixed.groupby("part"))
                    .applyInPandas(kernel, schema=OUT_SCHEMA)
                )
            else:
                if i == 0:
                    mixed = mixed.unionByName(seed)
                out = mixed.groupby("part").applyInPandas(kernel, schema=OUT_SCHEMA)
            # changed-count rides the checkpoint materialization — one job
            # per superstep, like the PageRank ε-gate
            obs = Observation(f"kcore_step_{i}")
            out = out.observe(
                obs, F.sum(F.when(F.col("kind") == 2, F.col("a"))).alias("changed")
            ).localCheckpoint(eager=True)
            state = out.filter(F.col("kind") == 0)
            msgs = out.filter(F.col("kind") == 1)
            changed = obs.get["changed"]
            if i >= 1 and (changed or 0) == 0:
                break
    return state, msgs


def core_numbers(
    spark: SparkSession,
    edges: DataFrame,
    num_parts: int | None = None,
    max_iter: int = 1000,
    cache_blocks: bool = True,
) -> DataFrame:
    """``(vid long, core long)`` for every vertex of the undirected simple
    graph induced by ``edges`` (self-loops ignored).

    ``cache_blocks`` (default) writes the CSR blocks once and serves them
    from the worker-local cache across the (many) global rounds of the full
    decomposition, instead of re-shipping every block through Arrow each
    superstep."""
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    blocks = build_csr_blocks_sym(spark, edges, num_parts)
    if cache_blocks:
        import shutil
        import tempfile

        from goffish_v3_spark.plans.block_cache import write_blocks

        path = tempfile.mkdtemp(prefix="goffish_csr_")
        try:
            write_blocks(blocks, path)
            parts = [r.part for r in blocks.select("part").collect()]
            blocks.unpersist()
            state, _ = _hindex_loop(
                spark, blocks, cap=None, max_iter=max_iter,
                blocks_path=path, parts=parts,
            )
            result = state.select("vid", F.col("a").alias("core")).localCheckpoint(
                eager=True
            )
        finally:
            shutil.rmtree(path, ignore_errors=True)
        return result
    state, _ = _hindex_loop(spark, blocks, cap=None, max_iter=max_iter)
    result = state.select("vid", F.col("a").alias("core")).localCheckpoint(eager=True)
    blocks.unpersist()
    return result


def _make_finalize_kernel(cap: int):
    """At fixpoint, est = min(core, cap): membership is est == cap. Induced
    degree = #neighbours with est == cap, computable in one pass because the
    final exchange delivered every remote boundary estimate."""

    def kernel(keys, csr_pdf: pd.DataFrame, sm_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(csr_pdf) == 0:
            return pd.DataFrame({"part": [], "kind": [], "vid": [], "a": []}).astype(
                {"part": "int32", "kind": "int32", "vid": "int64", "a": "int64"}
            )
        blk = CsrBlock(csr_pdf.iloc[0])
        n = blk.n_local
        state_rows = sm_pdf[sm_pdf["kind"] == 0]
        msg_rows = sm_pdf[sm_pdf["kind"] == 1]
        est = np.empty(n, dtype=np.int64)
        est[blk.align(state_rows["vid"].to_numpy(dtype=np.int64))] = state_rows[
            "a"
        ].to_numpy(dtype=np.int64)

        n_edges = len(blk.edge_dst_vid)
        nb_in = np.zeros(n_edges, dtype=bool)
        local_mask = blk.edge_dst_local >= 0
        nb_in[local_mask] = est[blk.edge_dst_local[local_mask]] >= cap
        if (~local_mask).any() and len(msg_rows):
            mvid = msg_rows["vid"].to_numpy(dtype=np.int64)
            mval = msg_rows["a"].to_numpy(dtype=np.int64)
            morder = np.argsort(mvid, kind="stable")
            mvid, mval = mvid[morder], mval[morder]
            want = blk.edge_dst_vid[~local_mask]
            pos = np.minimum(np.searchsorted(mvid, want), len(mvid) - 1)
            if not np.array_equal(mvid[pos], want):
                raise RuntimeError(
                    f"kcore part {blk.part}: missing boundary estimate rows"
                )
            nb_in[~local_mask] = mval[pos] >= cap

        seg = np.repeat(np.arange(n, dtype=np.int64), blk.out_degrees)
        deg_in = np.bincount(seg[nb_in], minlength=n).astype(np.int64)
        member = est >= cap
        return pd.DataFrame(
            {
                "part": np.full(int(member.sum()), blk.part, dtype=np.int32),
                "kind": np.zeros(int(member.sum()), dtype=np.int32),
                "vid": blk.local_vids[member],
                "a": deg_in[member],
            }
        )

    return kernel


def k_core(
    spark: SparkSession, edges: DataFrame, k: int, num_parts: int | None = None
) -> DataFrame:
    """Vertices of the k-core: ``(vid long, deg long)`` with deg = degree
    inside the core subgraph (= #neighbours in the k-core, since the k-core
    is the induced subgraph on {v : core(v) ≥ k}).

    Runs the kernel with estimates capped at k, which converges to
    min(core, k) — distributed peeling. The cap kills cascade depth: a
    handful of global rounds vs the full decomposition's tens. A finalize
    kernel pass computes induced degrees from the fixpoint exchange, so no
    edge-table re-join is needed."""
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    blocks = build_csr_blocks_sym(spark, edges, num_parts)
    state, msgs = _hindex_loop(spark, blocks, cap=k, max_iter=1000)
    fin = _make_finalize_kernel(k)
    out = (
        blocks.groupby("part")
        .cogroup(state.unionByName(msgs).groupby("part"))
        .applyInPandas(fin, schema=OUT_SCHEMA)
        .select("vid", F.col("a").alias("deg"))
        .localCheckpoint(eager=True)
    )
    blocks.unpersist()
    return out
