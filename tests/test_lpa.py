"""LPA: exact label match vs the synchronous deterministic oracle."""

from goffish_v3_spark.operators.lpa import lpa
from tests import graphs
from tests.oracles import lpa_oracle


def _check(spark, edges, **kw):
    df = graphs.to_df(spark, edges)
    got = {r.vid: r.label for r in lpa(spark, df, **kw).collect()}
    want = lpa_oracle(edges, **kw)
    assert got == want


def test_two_islands_communities(spark):
    edges = graphs.two_islands_bridge()
    _check(spark, edges)
    # LPA should find (at least) the two island communities
    df = graphs.to_df(spark, edges)
    labels = {r.vid: r.label for r in lpa(spark, df).collect()}
    island_a = {labels[v] for v in labels if v < 1000}
    island_b = {labels[v] for v in labels if v >= 1000}
    assert len(island_a) <= 3 and len(island_b) <= 3


def test_clique_single_community(spark):
    _check(spark, graphs.clique(10))


def test_chain_fixed_iterations(spark):
    _check(spark, graphs.chain(20), fixed_iterations=4)


def test_ba_fixed_iterations(spark):
    _check(spark, graphs.barabasi_albert(120, m=2), fixed_iterations=4)
