"""SSSP vs Dijkstra oracle (unit + weighted, directed + undirected)."""

import math

from pyspark.sql import functions as F

from goffish_v3_spark.operators.sssp import sssp, sssp_csr
from tests import graphs
from tests.oracles import sssp_oracle


def _check(spark, edges3, source, weighted, directed):
    df = graphs.to_df(spark, edges3, weighted=True)
    got = {
        r.vid: r.dist
        for r in sssp(
            spark, df, source=source, weighted=weighted, directed=directed
        ).collect()
    }
    used = edges3 if weighted else [(u, v, 1.0) for u, v, _ in edges3]
    want = sssp_oracle(used, source, directed=directed)
    for v, d in got.items():
        if math.isinf(d):
            assert v not in want
        else:
            assert want[v] == d, f"vertex {v}: {want[v]} != {d}"


def test_chain_unit(spark):
    edges = [(u, v, 1.0) for u, v in graphs.chain(20)]
    _check(spark, edges, source=0, weighted=False, directed=True)


def test_chain_unreachable_when_directed(spark):
    edges = [(u, v, 1.0) for u, v in graphs.chain(10)]
    df = graphs.to_df(spark, edges, weighted=True)
    got = {r.vid: r.dist for r in sssp(spark, df, source=5, directed=True).collect()}
    assert got[9] == 4.0
    assert math.isinf(got[0])


def test_weighted(spark):
    edges = [(0, 1, 5.0), (0, 2, 1.0), (2, 1, 1.0), (1, 3, 1.0), (2, 3, 10.0)]
    _check(spark, edges, source=0, weighted=True, directed=True)


def test_ba_undirected(spark):
    edges = [(u, v, 1.0) for u, v in graphs.barabasi_albert(120, m=2)]
    _check(spark, edges, source=0, weighted=False, directed=False)


def _check_csr(spark, edges3, source, weighted, directed, **kw):
    df = graphs.to_df(spark, edges3, weighted=True)
    res = sssp_csr(
        spark, df, source=source, weighted=weighted, directed=directed, **kw
    )
    got = {r.vid: r.dist for r in res.collect()}
    used = edges3 if weighted else [(u, v, 1.0) for u, v, _ in edges3]
    want = sssp_oracle(used, source, directed=directed)
    for v, d in got.items():
        if math.isinf(d):
            assert v not in want
        else:
            assert want[v] == d, f"vertex {v}: {want[v]} != {d}"
    return res


def test_csr_weighted_directed(spark):
    edges = [(0, 1, 5.0), (0, 2, 1.0), (2, 1, 1.0), (1, 3, 1.0), (2, 3, 10.0)]
    _check_csr(spark, edges, source=0, weighted=True, directed=True, num_parts=2)


def test_csr_ba_undirected(spark):
    edges = [(u, v, 1.0) for u, v in graphs.barabasi_albert(120, m=2)]
    _check_csr(spark, edges, source=0, weighted=False, directed=False, num_parts=4)


def test_csr_matches_df_engine(spark):
    """Kernel and DataFrame paths agree on distances vertex-for-vertex."""
    edges = [(u, v, 1.0 + ((u * 7 + v) % 5)) for u, v in graphs.barabasi_albert(150, m=3)]
    df = graphs.to_df(spark, edges, weighted=True)
    a = {
        r.vid: r.dist
        for r in sssp(spark, df, source=0, weighted=True, directed=False).collect()
    }
    b = {
        r.vid: r.dist
        for r in sssp_csr(
            spark, df, source=0, weighted=True, directed=False, num_parts=4
        ).collect()
    }
    assert a == b


def test_csr_superstep_collapse_on_chain(spark):
    """The P3 payoff: on a 400-hop chain range-partitioned into 8 blocks,
    the kernel converges in O(#partitions) supersteps — the DataFrame
    Bellman-Ford needs O(diameter) = 400 (reference rationale:
    SingleSourceShortestPath.java:407-536 local-Dijkstra-per-superstep)."""
    n = 400
    edges = [(u, v, 1.0) for u, v in graphs.chain(n)]
    df = graphs.to_df(spark, edges, weighted=True)
    parts = 8
    span = (n + parts - 1) // parts
    res = _check_csr(
        spark,
        edges,
        source=0,
        weighted=False,
        directed=True,
        num_parts=parts,
        part_expr=lambda c: F.floor(c / span).cast("int"),
    )
    assert res.sssp_supersteps <= parts + 2, res.sssp_supersteps


def test_parent_pointers_valid(spark):
    edges = [(u, v, 1.0) for u, v in graphs.two_islands_bridge()]
    df = graphs.to_df(spark, edges, weighted=True)
    rows = sssp(spark, df, source=0, directed=False).collect()
    dist = {r.vid: r.dist for r in rows}
    parent = {r.vid: r.parent for r in rows}
    for v, p in parent.items():
        if p != -1:
            assert dist[v] == dist[p] + 1.0


def test_csr_block_cache_mode_matches(spark, tmp_path):
    """Worker-local block-cache execution returns identical distances, both
    with an explicit blocks_dir and with the local-mode tempdir default."""
    edges = [(u, v, w) for (u, v), w in zip(graphs.barabasi_albert(120, m=2), 
             [1.0 + (i % 5) for i in range(10_000)])]
    df = graphs.to_df(spark, edges, weighted=True)
    base = {
        (r.vid): (r.dist, r.parent)
        for r in sssp_csr(spark, df, source=0, weighted=True, num_parts=4).collect()
    }
    cached = {
        (r.vid): (r.dist, r.parent)
        for r in sssp_csr(
            spark, df, source=0, weighted=True, num_parts=4,
            cache_blocks=True, blocks_dir=str(tmp_path / "sssp_blocks"),
        ).collect()
    }
    tmpdirred = {
        (r.vid): (r.dist, r.parent)
        for r in sssp_csr(
            spark, df, source=0, weighted=True, num_parts=4, cache_blocks=True
        ).collect()
    }
    assert base == cached == tmpdirred
