"""k-core vs closed forms and the peeling oracle."""

from goffish_v3_spark.operators.kcore import core_numbers, k_core
from tests import graphs
from tests.oracles import kcore_oracle


def test_clique_core(spark):
    df = graphs.to_df(spark, graphs.clique(6))
    got = {r.vid: r.core for r in core_numbers(spark, df).collect()}
    assert got == {v: 5 for v in range(6)}


def test_chain_core_is_one(spark):
    df = graphs.to_df(spark, graphs.chain(15))
    got = {r.vid: r.core for r in core_numbers(spark, df).collect()}
    assert set(got.values()) == {1}


def test_k_core_subgraph(spark):
    # K5 + a pendant vertex: 4-core keeps the clique only
    edges = graphs.clique(5) + [(4, 99)]
    df = graphs.to_df(spark, edges)
    members = {r.vid for r in k_core(spark, df, k=4).collect()}
    assert members == {0, 1, 2, 3, 4}


def test_ba_vs_oracle(spark):
    edges = graphs.barabasi_albert(80, m=2)
    df = graphs.to_df(spark, edges)
    got = {r.vid: r.core for r in core_numbers(spark, df).collect()}
    assert got == kcore_oracle(edges)


def test_core_numbers_block_cache_mode_matches(spark):
    """Worker-local block-cache execution (load-once-compute-many) returns
    the same core numbers as cogrouped block shipping."""
    from goffish_v3_spark.operators.kcore import core_numbers
    from tests import graphs

    df = graphs.to_df(spark, graphs.barabasi_albert(250, m=4, seed=13))
    a = {r.vid: r.core for r in core_numbers(spark, df, num_parts=4, cache_blocks=False).collect()}
    b = {r.vid: r.core for r in core_numbers(spark, df, num_parts=4, cache_blocks=True).collect()}
    assert a == b
