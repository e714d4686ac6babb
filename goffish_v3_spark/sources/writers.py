"""Writers (sinks) for the reference's graph text wire formats.

The reference reads these formats (SURVEY.md §2.B) but writes results
through per-job ``wrapup`` printlns; real pipelines need the inverse of the
readers so a graph can round-trip through the engine. Each writer is the
exact inverse of its sources.readers parser — asserted by round-trip tests
(tests/test_writers.py):

- :func:`write_adjacency_list`     ↔ readers.read_adjacency_list
  (``VID Sink1 Sink2 …``, hama LongTextAdjacencyListReader.java:51-53)
- :func:`write_partitioned_adjacency_list` ↔ readers.read_partitioned_adjacency_list
  (``VID PID Sink1 …``, hama PartitionsLongTextAdjacencyListReader.java:57-59)
- :func:`write_json_lines`         ↔ readers.read_json_lines
  (``[srcid, pid, value, [[sink,eid,eval]…]]``, hama LongTextJSONReader.java:62-64)

All writers are single-shuffle distributed text writes: one
``groupBy(src)`` with ``sort_array(collect_list(...))`` (deterministic line
content), then ``df.write.text`` — line order across part files is
partition-dependent, content per vertex is canonical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goffish_v3_spark.plans.partitioner import vertex_part


def _vertex_sinks(edges: DataFrame) -> DataFrame:
    """(vid, sinks sorted-array) covering EVERY vertex — sink-less vertices
    (appearing only as a dst) get an empty array, matching the reference's
    sink-less Vertex materialization."""
    srcs = edges.groupBy(F.col("src").alias("vid")).agg(
        F.sort_array(F.collect_list("dst")).alias("sinks")
    )
    lonely = (
        edges.select(F.col("dst").alias("vid"))
        .distinct()
        .join(edges.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti")
        .withColumn("sinks", F.array().cast("array<long>"))
    )
    return srcs.unionByName(lonely)


def write_adjacency_list(edges: DataFrame, path: str) -> None:
    """``VID Sink1 Sink2 …`` one line per vertex (sink-less → bare VID)."""
    lines = _vertex_sinks(edges).select(
        F.concat_ws(
            " ", F.col("vid").cast("string"), F.concat_ws(" ", F.col("sinks"))
        ).alias("value")
    )
    lines.select(F.rtrim(F.col("value")).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def write_partitioned_adjacency_list(
    edges: DataFrame, path: str, num_parts: int
) -> None:
    """``VID PID Sink1 …`` with PID from the engine's hash partitioner (the
    format the reference's pre-partitioned loader consumes)."""
    lines = _vertex_sinks(edges).select(
        F.rtrim(
            F.concat_ws(
                " ",
                F.col("vid").cast("string"),
                vertex_part(F.col("vid"), num_parts).cast("string"),
                F.concat_ws(" ", F.col("sinks")),
            )
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)


def write_json_lines(edges: DataFrame, path: str, num_parts: int) -> None:
    """``[srcid, pid, value, [[sink, eid, eval]…]]`` JSON lines — the RAW
    nested-array wire format (hama LongTextJSONReader.java:62-64 feeds each
    line to org.json JSONArray, so element 3 must be a real nested array,
    not an escaped string). Built by string assembly because to_json cannot
    emit a heterogeneous positional array. Vertex value is 0 (the reference
    seeds compute-time values); edge id = sink id; edge value = ``w``
    (1.0 when absent)."""
    e = edges
    if "w" not in e.columns:
        e = e.withColumn("w", F.lit(1.0))
    per_src = e.groupBy(F.col("src").alias("vid")).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("dst").alias("sink"), F.col("w")))
        ).alias("es")
    )
    lonely = (
        e.select(F.col("dst").alias("vid"))
        .distinct()
        .join(e.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti")
        .withColumn("es", F.array().cast("array<struct<sink:long,w:double>>"))
    )
    # [[sink,eid,eval],…] with integer sink/eid (a "3.0" literal would cast
    # to NULL in the reader) and w as-is
    inner = F.concat_ws(
        ",",
        F.transform(
            F.col("es"),
            lambda s: F.concat(
                F.lit("["),
                s.sink.cast("string"),
                F.lit(","),
                s.sink.cast("string"),
                F.lit(","),
                s.w.cast("string"),
                F.lit("]"),
            ),
        ),
    )
    rows = per_src.unionByName(lonely).select(
        F.concat(
            F.lit("["),
            F.col("vid").cast("string"),
            F.lit(","),
            vertex_part(F.col("vid"), num_parts).cast("string"),
            F.lit(",0,["),
            inner,
            F.lit("]]"),
        ).alias("value")
    )
    rows.write.mode("overwrite").text(path)
