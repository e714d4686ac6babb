"""Explicit skew-salting layer (plans.partitioner:76-131) — unit coverage
plus the PageRank wiring on the global-hub fixture (north_rule's explicit
hub-salting requirement; skew case from SURVEY.md §7.3)."""

import pytest
from pyspark.sql import functions as F

from goffish_v3_spark.plans.partitioner import (
    heavy_keys,
    salted_agg_sum,
    salted_join_on_hot_keys,
)
from tests import graphs


def test_heavy_keys_finds_hub(spark):
    df = graphs.to_df(spark, graphs.star_hub(50))  # 50 spokes -> hub vid 0
    hot = [r.dst for r in heavy_keys(df, "dst", threshold=10).collect()]
    assert hot == [0]


def test_salted_agg_sum_equals_plain_sum(spark):
    rows = [(i % 7, float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, v double")
    plain = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r.k: r.s for r in salted_agg_sum(df, "k", "v", "s", num_salts=8).collect()}
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k] == pytest.approx(plain[k], rel=1e-12)


def test_salted_agg_sum_deterministic_salt_source(spark):
    rows = [(1, i, float(i)) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, src long, v double")
    a = salted_agg_sum(df, "k", "v", "s", num_salts=16, salt_from="src").collect()
    b = salted_agg_sum(df, "k", "v", "s", num_salts=16, salt_from="src").collect()
    assert a == b
    assert a[0].s == pytest.approx(sum(float(i) for i in range(500)), rel=1e-12)


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [(k, i) for k in (1, 2, 3) for i in range(200 if k == 1 else 5)],
        "k long, payload long",
    )
    small = spark.createDataFrame([(1, "hub"), (2, "a"), (3, "b")], "k long, name string")
    hot = spark.createDataFrame([(1,)], "k long")
    got = sorted(
        (r.k, r.payload, r.name)
        for r in salted_join_on_hot_keys(big, small, "k", hot, num_salts=4).collect()
    )
    want = sorted((r.k, r.payload, r.name) for r in big.join(small, "k").collect())
    assert got == want


def test_pagerank_salted_equals_unsalted_on_global_hub(spark):
    """The wiring test: contribution sums through the salted two-stage path
    must reproduce the plain path bit-for-bit-ish on a hub-heavy graph."""
    from goffish_v3_spark.operators.pagerank import pagerank

    # star hub + a ring so the graph has non-trivial structure
    n = 200
    edges = [(i, 0) for i in range(1, n)] + [(i, (i + 1) % n) for i in range(n)]
    df = graphs.to_df(spark, edges)
    a = {r.vid: r.rank for r in pagerank(spark, df, fixed_iterations=6).collect()}
    b = {
        r.vid: r.rank
        for r in pagerank(
            spark, df, fixed_iterations=6, salt_threshold=50, num_salts=8
        ).collect()
    }
    assert set(a) == set(b)
    for v in a:
        assert b[v] == pytest.approx(a[v], abs=1e-13), f"vertex {v}"


def test_pagerank_salted_equals_unsalted_on_out_degree_hub(spark):
    """The join-salt axis: a source whose out-degree dwarfs everyone else's
    exercises the replicated-state (src, jsalt) join; scores must match the
    plain path. Chained fixed-iteration mode on purpose — the salted step
    references state once, so chaining must stay legal (VERDICT r2 #5)."""
    from goffish_v3_spark.operators.pagerank import pagerank

    n = 150
    # hub vid n fans out to every ring vertex; ring keeps structure non-trivial
    edges = [(n, i) for i in range(n)] + [(i, (i + 1) % n) for i in range(n)]
    df = graphs.to_df(spark, edges)
    a = {r.vid: r.rank for r in pagerank(spark, df, fixed_iterations=7).collect()}
    b = {
        r.vid: r.rank
        for r in pagerank(
            spark, df, fixed_iterations=7, salt_threshold=50, num_salts=8
        ).collect()
    }
    assert set(a) == set(b)
    for v in a:
        assert b[v] == pytest.approx(a[v], abs=1e-13), f"vertex {v}"


def test_pagerank_salted_epsilon_mode(spark):
    from goffish_v3_spark.operators.pagerank import pagerank

    df = graphs.to_df(spark, graphs.star_hub(80))
    a = {r.vid: r.rank for r in pagerank(spark, df).collect()}
    b = {r.vid: r.rank for r in pagerank(spark, df, salt_threshold=10).collect()}
    for v in a:
        assert b[v] == pytest.approx(a[v], abs=1e-12)
