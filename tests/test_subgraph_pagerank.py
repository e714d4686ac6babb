"""CSR-block subgraph-centric PageRank: equals the oracle AND the DataFrame
implementation; partition-count invariant."""

import pytest

from goffish_v3_spark.operators.subgraph_pagerank import csr_pagerank
from tests import graphs
from tests.oracles import pagerank_oracle


def _check(spark, edges, num_parts=4):
    df = graphs.to_df(spark, edges)
    got = {r.vid: r.rank for r in csr_pagerank(spark, df, num_parts=num_parts).collect()}
    want = pagerank_oracle(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6), f"vertex {v}"


def test_chain(spark):
    _check(spark, graphs.chain(10))


def test_star_hub(spark):
    _check(spark, graphs.star_hub(50))


def test_two_islands(spark):
    _check(spark, graphs.two_islands_bridge())


def test_ba(spark):
    _check(spark, graphs.barabasi_albert(150, m=3))


def test_partition_invariance(spark):
    edges = graphs.barabasi_albert(100, m=2)
    df = graphs.to_df(spark, edges)
    results = []
    for p in (1, 3, 8):
        r = {x.vid: x.rank for x in csr_pagerank(spark, df, num_parts=p).collect()}
        results.append(r)
    for v in results[0]:
        assert results[0][v] == pytest.approx(results[1][v], abs=1e-9)
        assert results[0][v] == pytest.approx(results[2][v], abs=1e-9)
