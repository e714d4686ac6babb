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
- :func:`write_full_info`          ↔ readers.read_full_info
  (``PID SGID VID sink1 sgid1 pid1 …``, hama FullInfoSplitReader.java:55-66 —
  sgids are computed as partition-local weak components, the reference's
  pre-discovered subgraphs)

All writers are single-shuffle distributed text writes: one
``groupBy(src)`` with ``sort_array(collect_list(...))`` (deterministic line
content), then ``df.write.text`` — line order across part files is
partition-dependent, content per vertex is canonical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goffish_v3_spark.plans.partitioner import vertex_part


def _sinkless(edges: DataFrame, empty_type: str) -> DataFrame:
    """(vid, sinks=empty) for vertices that only ever appear as a dst —
    the reference materializes these as sink-less Vertex objects, so every
    writer must emit a line for them. ``empty_type`` is the array type of
    the writer's sinks column."""
    return (
        edges.select(F.col("dst").alias("vid"))
        .distinct()
        .join(edges.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti")
        .withColumn("sinks", F.array().cast(empty_type))
    )


def _vertex_sinks(edges: DataFrame) -> DataFrame:
    """(vid, sinks sorted-array) covering EVERY vertex — sink-less vertices
    (appearing only as a dst) get an empty array, matching the reference's
    sink-less Vertex materialization."""
    srcs = edges.groupBy(F.col("src").alias("vid")).agg(
        F.sort_array(F.collect_list("dst")).alias("sinks")
    )
    return srcs.unionByName(_sinkless(edges, "array<long>"))


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


def subgraph_ids(edges: DataFrame, num_parts: int) -> DataFrame:
    """(vid, sgid): each vertex's subgraph id = min vid of its weakly
    connected component within the subgraph induced on its own partition
    (intra-partition edges only) — the quantity the reference's readers
    pre-discover (LongTextAdjacencyListReader.java:249-315) and the
    full-info format carries explicitly. Vertices with no intra-partition
    edge are singleton subgraphs (sgid = own vid), handled by the caller's
    coalesce."""
    from goffish_v3_spark.operators.wcc import local_component_labels

    intra = edges.select("src", "dst").filter(
        vertex_part(F.col("src"), num_parts) == vertex_part(F.col("dst"), num_parts)
    )
    return local_component_labels(intra, num_parts).select(
        "vid", F.col("label").alias("sgid")
    )


def write_full_info(edges: DataFrame, path: str, num_parts: int) -> None:
    """``PID SGID VID sink1 sgid1 pid1 sink2 sgid2 pid2 …`` — the
    pre-computed-subgraphs format. One shuffle to compute sgids, one
    broadcast-ish join to annotate sinks, one groupBy(src) to assemble
    lines."""
    # materialize once: sg feeds both the sink-annotation join and the final
    # per-vertex join — unmaterialized, the applyInPandas local-WCC pass
    # (the expensive stage) would execute twice
    sg = subgraph_ids(edges, num_parts).localCheckpoint(eager=True)
    e = edges.select("src", "dst")
    annotated = (
        e.join(sg.select(F.col("vid").alias("dst"), F.col("sgid").alias("dst_sgid")),
               "dst", "left")
        .select(
            "src",
            F.struct(
                "dst",
                F.coalesce("dst_sgid", F.col("dst")).alias("dst_sgid"),
                vertex_part(F.col("dst"), num_parts).alias("dst_part"),
            ).alias("s"),
        )
    )
    per_src = annotated.groupBy(F.col("src").alias("vid")).agg(
        F.sort_array(F.collect_list("s")).alias("sinks")
    )
    lonely = _sinkless(e, "array<struct<dst:long,dst_sgid:long,dst_part:int>>")
    lines = (
        per_src.unionByName(lonely)
        .join(sg, "vid", "left")
        .select(
            F.rtrim(
                F.concat_ws(
                    " ",
                    vertex_part(F.col("vid"), num_parts).cast("string"),
                    F.coalesce("sgid", F.col("vid")).cast("string"),
                    F.col("vid").cast("string"),
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.col("sinks"),
                            lambda s: F.concat_ws(
                                " ",
                                s.dst.cast("string"),
                                s.dst_sgid.cast("string"),
                                s.dst_part.cast("string"),
                            ),
                        ),
                    ),
                )
            ).alias("value")
        )
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
    lonely = _sinkless(e, "array<struct<sink:long,w:double>>").withColumnRenamed(
        "sinks", "es"
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
