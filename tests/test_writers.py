"""Writers are exact inverses of the wire-format readers (round-trip)."""

from pyspark.sql import functions as F

from goffish_v3_spark.sources.readers import (
    read_adjacency_list,
    read_adjacency_vertices,
    read_json_lines,
    read_partitioned_adjacency_list,
)
from goffish_v3_spark.sources.writers import (
    write_adjacency_list,
    write_json_lines,
    write_partitioned_adjacency_list,
)
from tests import graphs


def _edges(spark):
    # directed, includes a sink-less vertex (only ever a dst): 99
    e = graphs.barabasi_albert(60, m=2) + [(3, 99)]
    return (
        graphs.to_df(spark, e),
        {(u, v) for u, v in e},
    )


def test_adjacency_roundtrip(spark, tmp_path):
    df, want = _edges(spark)
    path = str(tmp_path / "adj")
    write_adjacency_list(df, path)
    back = {(r.src, r.dst) for r in read_adjacency_list(spark, path).collect()}
    assert back == want
    # sink-less vertex survives as a bare-VID line
    vids = {r.vid for r in read_adjacency_vertices(spark, path).collect()}
    assert 99 in vids
    assert vids == {u for u, _ in want} | {v for _, v in want}


def test_partitioned_adjacency_roundtrip(spark, tmp_path):
    from goffish_v3_spark.plans.partitioner import vertex_part

    df, want = _edges(spark)
    path = str(tmp_path / "padj")
    write_partitioned_adjacency_list(df, path, num_parts=4)
    got = read_partitioned_adjacency_list(spark, path)
    back = {(r.src, r.dst) for r in got.collect()}
    assert back == want
    # pids match the engine's hash partitioner
    chk = got.select(
        "src", "part", vertex_part(F.col("src"), 4).alias("expect")
    ).collect()
    assert all(r.part == r.expect for r in chk)


def test_full_info_roundtrip(spark, tmp_path):
    from goffish_v3_spark.plans.partitioner import vertex_part
    from goffish_v3_spark.sources.readers import read_full_info
    from goffish_v3_spark.sources.writers import subgraph_ids, write_full_info

    df, want = _edges(spark)
    path = str(tmp_path / "finfo")
    write_full_info(df, path, num_parts=4)
    got = read_full_info(spark, path)
    back = {(r.src, r.dst) for r in got.collect()}
    assert back == want
    # pids on both endpoints match the engine's hash partitioner
    chk = got.select(
        "part",
        vertex_part(F.col("src"), 4).alias("p_src"),
        "dst_part",
        vertex_part(F.col("dst"), 4).alias("p_dst"),
    ).collect()
    assert all(r.part == r.p_src and r.dst_part == r.p_dst for r in chk)
    # sgids are consistent: the sgid a line claims for a sink equals the
    # sgid that sink's own line claims for itself (the invariant the
    # reference's FullInfoSplitReader relies on to skip subgraph discovery)
    own = {r.vid: r.sgid for r in subgraph_ids(df, 4).collect()}
    rows = got.select("src", "sgid", "dst", "dst_sgid", "part").collect()
    assert all(r.sgid == own.get(r.src, r.src) for r in rows)
    assert all(r.dst_sgid == own.get(r.dst, r.dst) for r in rows)
    # sgid really is partition-local: two vertices sharing an sgid share a pid
    by_sg = {}
    for r in rows:
        by_sg.setdefault(r.sgid, set()).add(r.part)
    assert all(len(parts) == 1 for parts in by_sg.values())


def test_json_lines_roundtrip(spark, tmp_path):
    df, want = _edges(spark)
    df = df.withColumn("w", (F.col("src") % 3 + 1).cast("double"))
    path = str(tmp_path / "jsonl")
    write_json_lines(df, path, num_parts=4)
    back = read_json_lines(spark, path)
    got = {(r.src, r.dst, r.w) for r in back.collect()}
    expect = {(r.src, r.dst, r.w) for r in df.select("src", "dst", "w").collect()}
    assert got == expect
