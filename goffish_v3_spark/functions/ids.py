"""Identifier functions — deterministic, coordination-free, JVM-side.

The reference synthesizes globally-unique 64-bit ids by packing the partition
id into the high 32 bits of a local counter
(hama LongTextAdjacencyListReader.java:98 for edge ids, :294 for subgraph
ids). We reproduce the same packing arithmetic with built-in column
expressions, and derive file/vertex ids with ``xxhash64`` so that id
assignment needs no global coordination at 10^12-file scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def file_vid(repo: Column | str, path: Column | str) -> Column:
    """Vertex id for a source file: xxhash64(repo || '\\0' || path).

    Deterministic and partition-count independent; collision probability at
    10^12 keys is ~2.7e-8 per pair over a 64-bit space (birthday bound
    ~ n^2 / 2^65 ≈ 3% aggregate at 1e12 — acceptable for analytics; an exact
    dense-id remap via a dimension table is provided by ingest for runs that
    need zero collisions).
    """
    repo = F.col(repo) if isinstance(repo, str) else repo
    path = F.col(path) if isinstance(path, str) else path
    return F.xxhash64(F.concat_ws("\0", repo, path))


def pack_id(part: Column, local: Column) -> Column:
    """``local | (part << 32)`` — the reference's packed-id arithmetic
    (LongTextAdjacencyListReader.java:98,294), as a codegen'd expression."""
    return F.shiftleft(part.cast("long"), 32).bitwiseOR(local.cast("long"))


def unpack_part(packed: Column) -> Column:
    return F.shiftrightunsigned(packed, 32).cast("int")


def unpack_local(packed: Column) -> Column:
    return packed.bitwiseAND(F.lit((1 << 32) - 1))


def content_sha256(content: Column | str) -> Column:
    """Per-row ingest invariant (BASELINE.json input_hint): sha256 of the
    raw content string, lowercase hex — carried through every transform."""
    content = F.col(content) if isinstance(content, str) else content
    return F.sha2(content, 256)
