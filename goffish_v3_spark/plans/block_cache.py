"""Worker-local CSR block cache — keep partition blocks resident across
supersteps.

The reference holds each partition's object graph in JVM heap for the whole
job (hama GraphJobRunner.java:105-126 loads once, computes many supersteps).
The cogrouped-``applyInPandas`` pattern re-ships every CSR block through the
Arrow channel every superstep — at 2.4M edges that is ~70 MB per round of
pure re-transfer. This module restores the reference's load-once shape:

- blocks are written ONCE to a parquet directory partitioned by ``part``;
- superstep kernels run as plain ``state.groupby(part).applyInPandas`` (no
  cogroup, no block shuffle) and fetch their block via :func:`load_block`,
  which reads the 1-row parquet file on first use and caches the
  deserialized :class:`CsrBlock` in the (reused) Python worker process;
- the cache is LRU-capped so a worker that serves many partitions holds at
  most ``MAX_BLOCKS`` blocks (~per-partition CSR size each).

Cluster shape: each executor's python workers cache only the partitions
scheduled onto them; with stable partitioning the scheduler tends to
re-offer the same partitions, so steady-state supersteps read no block data
at all. A task landing on a cold worker pays one local parquet read of its
own block — O(|E|/P), not O(|E|).
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame

from goffish_v3_spark.plans.csr import CsrBlock

MAX_BLOCKS = 64

_CACHE: "OrderedDict[tuple[str, int], CsrBlock]" = OrderedDict()

_FIELDS = (
    "n_local",
    "n_edges",
    "local_vids",
    "indptr",
    "edge_dst_vid",
    "edge_dst_part",
    "edge_dst_local",
    "edge_w",
)


def write_blocks(blocks: DataFrame, path: str) -> None:
    """Persist CSR blocks partitioned by ``part`` (one 1-row file each).

    ``path`` must be visible to every executor — local disk in local mode,
    DFS/object storage on a cluster (where it doubles as the block
    checkpoint for resume)."""
    blocks.write.mode("overwrite").partitionBy("part").parquet(path)


def load_block(path: str, part: int) -> CsrBlock | None:
    """Fetch the block for ``part`` — worker-process-local LRU cache over
    the parquet store. Returns None if the partition has no block."""
    key = (path, int(part))
    blk = _CACHE.get(key)
    if blk is not None:
        _CACHE.move_to_end(key)
        return blk

    import glob
    import os

    import pyarrow.parquet as pq

    d = os.path.join(path, f"part={int(part)}")
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        return None
    tbl = pq.read_table(files[0])
    row = {name: tbl.column(name)[0].as_py() for name in _FIELDS}
    row["part"] = int(part)
    blk = CsrBlock(row)
    _CACHE[key] = blk
    while len(_CACHE) > MAX_BLOCKS:
        _CACHE.popitem(last=False)
    return blk


def clear_cache() -> None:
    _CACHE.clear()
