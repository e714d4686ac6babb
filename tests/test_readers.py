"""Reference input-format readers, incl. the shipped Facebook fixture."""

import os

import pyspark.sql.functions as F
import pytest

from goffish_v3_spark.sources.readers import (
    FB_REFERENCE_PATH,
    read_adjacency_list,
    read_full_info,
    read_giraph_subgraph,
    read_json_lines,
    read_partitioned_adjacency_list,
)


def test_adjacency_list(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("0 1 2 3\n1 2\n2\n")
    e = read_adjacency_list(spark, str(p))
    rows = {(r.src, r.dst) for r in e.collect()}
    assert rows == {(0, 1), (0, 2), (0, 3), (1, 2)}


def test_partitioned_adjacency_list(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("0 0 1 2\n1 1 0\n")
    e = read_partitioned_adjacency_list(spark, str(p))
    rows = {(r.src, r.dst, r.part) for r in e.collect()}
    assert rows == {(0, 1, 0), (0, 2, 0), (1, 0, 1)}


def test_full_info(spark, tmp_path):
    p = tmp_path / "g.txt"
    # PID SGID VID sink sgid pid ...
    p.write_text("0 10 1 2 11 1 3 10 0\n1 11 2\n")
    e = read_full_info(spark, str(p))
    rows = {(r.src, r.dst, r.part, r.sgid, r.dst_sgid, r.dst_part) for r in e.collect()}
    assert rows == {(1, 2, 0, 10, 11, 1), (1, 3, 0, 10, 10, 0)}


def test_json_lines(spark, tmp_path):
    p = tmp_path / "g.json"
    p.write_text('[0, 0, "v", [[1, 100, 2.5], [2, 101, 1.0]]]\n[1, 1, "w", []]\n')
    e = read_json_lines(spark, str(p))
    rows = {(r.src, r.dst, r.w, r.part, r.edge_id) for r in e.collect()}
    assert rows == {(0, 1, 2.5, 0, 100), (0, 2, 1.0, 0, 101)}


def test_giraph_subgraph(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("5\t20\t0\t6\t7\n6\t20\t0\t5\n")
    e = read_giraph_subgraph(spark, str(p))
    rows = {(r.src, r.dst, r.sgid, r.part) for r in e.collect()}
    assert rows == {(5, 6, 20, 0), (5, 7, 20, 0), (6, 5, 20, 0)}


@pytest.mark.skipif(
    not os.path.exists(FB_REFERENCE_PATH), reason="reference fixture not present"
)
def test_fb_reference_graph(spark):
    """Parse the reference's shipped fb graph and sanity-check its shape;
    also asserts partition-file equivalence (fb-multiple = same edge set)."""
    e = read_adjacency_list(spark, FB_REFERENCE_PATH).persist()
    n_edges = e.count()
    assert n_edges > 10_000
    multi_dir = os.path.join(
        os.path.dirname(os.path.dirname(FB_REFERENCE_PATH)), "fb-multiple"
    )
    if os.path.exists(multi_dir):
        e4 = read_adjacency_list(spark, multi_dir)
        assert e4.count() == n_edges
        assert (
            e.exceptAll(e4).count() == 0 and e4.exceptAll(e).count() == 0
        ), "4-partition split must contain exactly the same edges"
    e.unpersist()


def test_full_info_malformed_line_fails_loudly(spark, tmp_path):
    """A rest array that is not a whole number of (sink, sgid, pid) triples
    must raise, not silently drop edges (ADVICE guard)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from goffish_v3_spark.sources.readers import read_full_info

    p = tmp_path / "bad.txt"
    p.write_text("0 1 100 200 2 0 300 3\n")  # 5 tokens after vid: 5 % 3 != 0
    with pytest.raises(Exception) as ei:
        read_full_info(spark, str(p)).collect()
    assert "malformed" in str(ei.value) or "ASSERT" in str(ei.value).upper()


def test_full_info_nonsplit_file_per_partition(spark, tmp_path):
    """B6 whole-file locality: each file is one partition; rows parse like
    read_full_info and the file→partition invariant holds."""
    from goffish_v3_spark.sources.readers import read_full_info, read_full_info_nonsplit

    d = tmp_path / "parts"
    d.mkdir()
    (d / "partition0.txt").write_text("0 10 1 2 11 1 3 10 0\n0 10 3 1 10 0\n")
    (d / "partition1.txt").write_text("1 11 2 1 10 0\n")
    got = sorted(
        (r.src, r.dst, r.part, r.sgid, r.dst_sgid, r.dst_part)
        for r in read_full_info_nonsplit(spark, str(d)).collect()
    )
    want = sorted(
        (r.src, r.dst, r.part, r.sgid, r.dst_sgid, r.dst_part)
        for r in read_full_info(spark, str(d)).collect()
    )
    assert got == want
    assert len(got) == 4


def test_full_info_nonsplit_rejects_mixed_pids(spark, tmp_path):
    import pytest

    from goffish_v3_spark.sources.readers import read_full_info_nonsplit

    d = tmp_path / "bad"
    d.mkdir()
    (d / "p0.txt").write_text("0 10 1 2 11 1\n1 11 2 1 10 0\n")  # two pids, one file
    with pytest.raises(Exception):
        read_full_info_nonsplit(spark, str(d)).collect()
