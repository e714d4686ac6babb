"""KMV distinct sketch: estimate accuracy, exhaustive-exact path, cross-
engine twin, duplicate-insensitivity, and top-k (not global-sort) plan."""

import duckdb
import pytest
from pyspark.sql import functions as F

from goffish_v3_spark.operators.sketch import kmv_distinct_estimate, kmv_sql


def test_estimate_within_kmv_error_bounds(spark):
    # 10k distinct keys, k=256 -> relative standard error ~ 1/sqrt(k-2) ≈ 6%
    df = spark.range(0, 10_000).withColumnRenamed("id", "u")
    row = kmv_distinct_estimate(df, "u", k=256).first()
    assert row.n_hashes == 256
    assert abs(row.est_distinct - 10_000) / 10_000 < 0.2


def test_exact_when_under_k(spark):
    df = spark.range(0, 40).withColumnRenamed("id", "u")
    row = kmv_distinct_estimate(df, "u", k=64).first()
    assert row.n_hashes == 40
    assert row.est_distinct == 40.0  # exhaustive sketch -> exact count


def test_duplicates_do_not_move_the_estimate(spark):
    base = spark.range(0, 5_000).withColumnRenamed("id", "u")
    dup = base.union(base).union(base)
    a = kmv_distinct_estimate(base, "u", k=128).first()
    b = kmv_distinct_estimate(dup, "u", k=128).first()
    assert (a.kth_hash, a.est_distinct) == (b.kth_hash, b.est_distinct)


def test_matches_duckdb_twin(spark):
    df = spark.range(0, 3_000).withColumnRenamed("id", "u")
    got = kmv_distinct_estimate(df, "u", k=32, seed=5).first()
    exp = duckdb.connect().execute(
        kmv_sql("(SELECT UNNEST(RANGE(0, 3000)) AS u)", "u", k=32, seed=5)
    ).fetchone()
    assert (got.k, got.n_hashes, got.kth_hash, got.est_distinct) == exp


def test_rejects_degenerate_k(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "u")
    with pytest.raises(ValueError):
        kmv_distinct_estimate(df, "u", k=1)


def test_plan_uses_topk_not_global_sort(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "u")
    plan = (
        kmv_distinct_estimate(df, "u", k=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
