"""Parsers for the reference's graph input text formats.

One DataFrame transform per reader family (SURVEY.md §2.B); all parse with
built-in split/explode expressions over ``spark.read.text`` — splittable,
pushdown-friendly, no custom InputFormat needed.

| reader | line format | reference |
|---|---|---|
| adjacency            | ``VID Sink1 Sink2 …``                      | hama LongTextAdjacencyListReader.java:51-53 |
| partitioned adjacency| ``VID PID Sink1 Sink2 …``                  | hama PartitionsLongTextAdjacencyListReader.java:57-59 |
| full info            | ``PID SGID VID sink1 sgid1 pid1 …``        | hama FullInfoSplitReader.java:55-66 |
| JSON lines           | ``[srcid, pid, value, [[sink,eid,eval]…]]`` | hama LongTextJSONReader.java:62-64 |
| giraph subgraph      | ``VID SGID PID sink1 sink2 …`` (tab)       | giraph AdjacencyListTextSubgraphInputFormat.java:155-165 |

The reference's post-read machinery (3-superstep remote-vertex resolution,
broadcast routing tables) is unnecessary here: ownership is computable from
the hash partitioner (plans.partitioner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _tokens(colname: str = "value"):
    return F.split(F.trim(F.col(colname)), r"\s+")


def read_adjacency_list(spark: SparkSession, path: str) -> DataFrame:
    """``VID Sink1 Sink2 …`` → edges(src, dst, w=1.0). Vertices with no
    sinks contribute no rows here; use :func:`read_adjacency_vertices` for
    the full vertex set (the reference materializes those as sink-less
    Vertex objects)."""
    toks = _tokens()
    return (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(
            toks.getItem(0).cast("long").alias("src"),
            F.explode(F.slice(toks, 2, F.size(toks) - 1)).alias("d"),
        )
        .select("src", F.col("d").cast("long").alias("dst"), F.lit(1.0).alias("w"))
    )


def read_adjacency_vertices(spark: SparkSession, path: str) -> DataFrame:
    toks = _tokens()
    return (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(toks.getItem(0).cast("long").alias("vid"))
    )


def read_full_info_nonsplit(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file / bucketed-locality mode (B6): one FILE ≡ one partition,
    no shuffle at all — the analogue of the reference's unsplittable
    ``NonSplitTextInputFormat`` (hama NonSplitTextInputFormat.java:26-31,
    FullInfoNonSplitReader.java:47-186; Giraph's whole-file splits,
    GiraphSubgraphTextInputFormat.java:31-45).

    Reads each file atomically (``wholetext``) so every line of a partition
    file stays in the Spark partition that read it; the ``part`` column from
    the file's own rows is trusted (the format guarantees one pid per file)
    and validated against being single-valued per file. Same row schema as
    :func:`read_full_info`."""
    files = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), "value"
    )
    lines = files.select(
        "file", F.explode(F.split("value", r"\r?\n")).alias("value")
    ).filter(F.length(F.trim("value")) > 0)
    toks = _tokens()
    base = lines.select(
        "file",
        toks.getItem(0).cast("int").alias("part"),
        toks.getItem(1).cast("long").alias("sgid"),
        toks.getItem(2).cast("long").alias("src"),
        F.slice(toks, 4, F.size(toks) - 3).alias("rest"),
    ).filter(
        F.assert_true(
            F.pmod(F.size("rest"), F.lit(3)) == 0,
            F.concat(
                F.lit("malformed full-info line for vid "),
                F.col("src").cast("string"),
            ),
        ).isNull()
    )
    # locality invariant: a non-split file carries exactly one partition id
    one_pid = (
        base.groupBy("file")
        .agg(F.count_distinct("part").alias("npid"))
        .filter(
            F.assert_true(
                F.col("npid") == 1,
                F.concat(F.lit("non-split file with mixed pids: "), F.col("file")),
            ).isNull()
        )
    )
    base = base.join(one_pid.select("file"), "file", "left_semi").drop("file")
    triples = base.select(
        "part",
        "sgid",
        "src",
        F.explode(
            F.when(
                F.size("rest") >= 3,
                F.transform(
                    F.sequence(F.lit(0), (F.size("rest") / 3 - 1).cast("int")),
                    lambda i: F.struct(
                        F.element_at("rest", (i * 3 + 1).cast("int")).cast("long").alias("dst"),
                        F.element_at("rest", (i * 3 + 2).cast("int")).cast("long").alias("dst_sgid"),
                        F.element_at("rest", (i * 3 + 3).cast("int")).cast("int").alias("dst_part"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<dst:bigint,dst_sgid:bigint,dst_part:int>>")
            )
        ).alias("e"),
    )
    return triples.select(
        "src",
        F.col("e.dst").alias("dst"),
        F.lit(1.0).alias("w"),
        "part",
        "sgid",
        F.col("e.dst_sgid").alias("dst_sgid"),
        F.col("e.dst_part").alias("dst_part"),
    )


def read_partitioned_adjacency_list(spark: SparkSession, path: str) -> DataFrame:
    """``VID PID Sink1 Sink2 …`` → edges(src, dst, w, part). The reference
    re-mails misplaced vertices peer-to-peer (:94-137); here the ``part``
    column + one ``repartition`` is the same shuffle, declaratively."""
    toks = _tokens()
    return (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(
            toks.getItem(0).cast("long").alias("src"),
            toks.getItem(1).cast("int").alias("part"),
            F.explode(F.slice(toks, 3, F.size(toks) - 2)).alias("d"),
        )
        .select(
            "src", F.col("d").cast("long").alias("dst"), F.lit(1.0).alias("w"), "part"
        )
    )


def read_full_info(spark: SparkSession, path: str) -> DataFrame:
    """``PID SGID VID sink1 sgid1 pid1 sink2 sgid2 pid2 …`` →
    (src, dst, w, part, sgid, dst_sgid, dst_part) — pre-computed subgraphs,
    no WCC pass needed (FullInfoSplitReader.java:55-66)."""
    toks = _tokens()
    base = (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(
            toks.getItem(0).cast("int").alias("part"),
            toks.getItem(1).cast("long").alias("sgid"),
            toks.getItem(2).cast("long").alias("src"),
            F.slice(toks, 4, F.size(toks) - 3).alias("rest"),
        )
        # malformed-line guard (ADVICE): a rest array that is not a whole
        # number of (sink, sgid, pid) triples means a corrupt file — fail
        # loudly instead of silently truncating/dropping edges. The assert
        # lives in a predicate (assert_true returns NULL, isNull() is True)
        # so column pruning cannot eliminate it.
        .filter(
            F.assert_true(
                F.pmod(F.size("rest"), F.lit(3)) == 0,
                F.concat(
                    F.lit("malformed full-info line for vid "),
                    F.col("src").cast("string"),
                    F.lit(": rest size not a multiple of 3"),
                ),
            ).isNull()
        )
    )
    triples = base.select(
        "part",
        "sgid",
        "src",
        F.explode(
            # guard: a vertex line with no sinks has an empty rest array, and
            # sequence(0, -1) would descend instead of being empty
            F.when(
                F.size("rest") >= 3,
                F.transform(
                    F.sequence(F.lit(0), (F.size("rest") / 3 - 1).cast("int")),
                    lambda i: F.struct(
                        F.element_at("rest", (i * 3 + 1).cast("int")).cast("long").alias("dst"),
                        F.element_at("rest", (i * 3 + 2).cast("int")).cast("long").alias("dst_sgid"),
                        F.element_at("rest", (i * 3 + 3).cast("int")).cast("int").alias("dst_part"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<dst:bigint,dst_sgid:bigint,dst_part:int>>")
            )
        ).alias("e"),
    )
    return triples.select(
        "src",
        F.col("e.dst").alias("dst"),
        F.lit(1.0).alias("w"),
        "part",
        "sgid",
        F.col("e.dst_sgid").alias("dst_sgid"),
        F.col("e.dst_part").alias("dst_part"),
    )


_JSON_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType()),
        T.StructField("part", T.IntegerType()),
        T.StructField("value", T.StringType()),
        T.StructField(
            "edges",
            T.ArrayType(T.ArrayType(T.StringType())),
        ),
    ]
)


def read_json_lines(spark: SparkSession, path: str) -> DataFrame:
    """``[srcid, pid, value, [[sink, edgeid, edgeval], …]]`` per line
    (LongTextJSONReader.java:62-64) → (src, dst, w, part, edge_id)."""
    # the wire format is a positional JSON array; parse as array<string> then cast
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parsed = raw.select(
        F.from_json(
            "value",
            "array<string>",
        ).alias("a")
    ).select(
        F.col("a").getItem(0).cast("long").alias("src"),
        F.col("a").getItem(1).cast("int").alias("part"),
        F.col("a").getItem(2).alias("vvalue"),
        F.from_json(F.col("a").getItem(3), "array<array<string>>").alias("edges"),
    )
    return parsed.select(
        "src",
        "part",
        F.explode("edges").alias("e"),
    ).select(
        "src",
        F.col("e").getItem(0).cast("long").alias("dst"),
        F.coalesce(F.col("e").getItem(2).cast("double"), F.lit(1.0)).alias("w"),
        "part",
        F.col("e").getItem(1).cast("long").alias("edge_id"),
    )


def read_giraph_subgraph(spark: SparkSession, path: str) -> DataFrame:
    """``VID SGID PID sink1 sink2 …`` (tab/space separated, one sink per
    token — AdjacencyListTextSubgraphInputFormat.java:155-165) →
    (src, dst, w, part, sgid)."""
    toks = _tokens()
    return (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(
            toks.getItem(0).cast("long").alias("src"),
            toks.getItem(1).cast("long").alias("sgid"),
            toks.getItem(2).cast("int").alias("part"),
            F.slice(toks, 4, F.greatest(F.size(toks) - 3, F.lit(0))).alias("sinks"),
        )
        .select("src", "sgid", "part", F.explode("sinks").alias("d"))
        .select(
            "src", F.col("d").cast("long").alias("dst"), F.lit(1.0).alias("w"), "part", "sgid"
        )
    )


FB_REFERENCE_PATH = (
    "/root/reference/Docker/Hama/Goffish_Hama_Base/graphs/fb-input/fb_single"
)


def read_fb_reference(spark: SparkSession, path: str = FB_REFERENCE_PATH) -> DataFrame:
    """The reference's shipped Facebook ego-net fixture (FIXTURES.md §3)."""
    return read_adjacency_list(spark, path)
