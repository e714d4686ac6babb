"""SSSP vs Dijkstra oracle (unit + weighted, directed + undirected)."""

import math

from goffish_v3_spark.operators.sssp import sssp
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


def test_parent_pointers_valid(spark):
    edges = [(u, v, 1.0) for u, v in graphs.two_islands_bridge()]
    df = graphs.to_df(spark, edges, weighted=True)
    rows = sssp(spark, df, source=0, directed=False).collect()
    dist = {r.vid: r.dist for r in rows}
    parent = {r.vid: r.parent for r in rows}
    for v, p in parent.items():
        if p != -1:
            assert dist[v] == dist[p] + 1.0
