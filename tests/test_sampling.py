"""Deterministic hash-based sampling: rate accuracy, nesting, split
disjointness, cross-engine twin, and plan shape (no shuffle, no Python)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from goffish_v3_spark.operators.sampling import (
    MOD,
    assign_splits,
    bucket_sql,
    hash_bucket,
    hash_sample,
    split_thresholds,
    stratified_sample,
)


@pytest.fixture(scope="module")
def keys(spark):
    df = spark.range(0, 20_000).withColumnRenamed("id", "k").persist()
    df.count()
    yield df
    df.unpersist()


def test_bucket_matches_duckdb_twin(spark):
    df = spark.range(-50, 2_000).select(
        F.col("id").alias("k"), hash_bucket(F.col("id"), seed=7).alias("b")
    )
    got = {r.k: r.b for r in df.collect()}
    rows = duckdb.connect().execute(
        f"SELECT k, {bucket_sql('k', seed=7)} FROM "
        "(SELECT UNNEST(RANGE(-50, 2000)) AS k)"
    ).fetchall()
    assert {k: b for k, b in rows} == got


def test_rate_accuracy_and_determinism(keys):
    n = keys.count()
    kept = hash_sample(keys, "k", rate=0.25, seed=1)
    frac = kept.count() / n
    assert abs(frac - 0.25) < 0.02
    # same (key, seed) -> identical sample on a second evaluation
    assert kept.agg(F.sum("k")).first()[0] == hash_sample(
        keys, "k", rate=0.25, seed=1
    ).agg(F.sum("k")).first()[0]
    # different seed -> different sample (overlap ~rate^2, not 1)
    other = hash_sample(keys, "k", rate=0.25, seed=2)
    overlap = kept.join(other, "k").count()
    assert overlap < 0.5 * kept.count()


def test_samples_nest_as_rate_grows(keys):
    small = {r.k for r in hash_sample(keys, "k", 0.1, seed=5).collect()}
    large = {r.k for r in hash_sample(keys, "k", 0.3, seed=5).collect()}
    assert small <= large and len(small) < len(large)


def test_rate_validation():
    with pytest.raises(ValueError):
        split_thresholds({})
    with pytest.raises(ValueError):
        split_thresholds({"a": -1.0, "b": 0.0})


def test_hash_sample_rejects_bad_rate(keys):
    with pytest.raises(ValueError):
        hash_sample(keys, "k", rate=1.5)


def test_stratified_per_stratum_rates(spark):
    df = spark.range(0, 30_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "a").when(F.col("id") % 3 == 1, "b")
        .otherwise("c").alias("s"),
    )
    out = stratified_sample(
        df, "s", {"a": 0.5, "b": 0.1}, key_col="k", seed=0, default_rate=0.0
    )
    counts = {r.s: r.n for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["a"] / 10_000 - 0.5) < 0.03
    assert abs(counts["b"] / 10_000 - 0.1) < 0.03
    assert "c" not in counts  # default_rate=0 drops unlisted strata


def test_splits_disjoint_exhaustive_and_sized(keys):
    out = assign_splits(keys, "k", seed=9)
    n = keys.count()
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # exhaustive, one label per row
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["val"] / n - 0.1) < 0.02
    assert abs(counts["test"] / n - 0.1) < 0.02


def test_split_weights_normalized(keys):
    # weights need not sum to 1 — {2, 1, 1} == {0.5, 0.25, 0.25}
    out = assign_splits(keys, "k", weights={"x": 2.0, "y": 1.0, "z": 1.0}, seed=4)
    n = keys.count()
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["x"] / n - 0.5) < 0.02


def test_plan_is_pure_codegen_filter(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = stratified_sample(
        docs, "lang", {"en": 0.3}, key_col="doc_id", default_rate=0.1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_threshold_uses_integer_comparison(spark):
    # rate=1.0 keeps everything; rate=0.0 keeps nothing — exact boundaries
    df = spark.range(0, 1_000).withColumnRenamed("id", "k")
    assert hash_sample(df, "k", 1.0).count() == 1_000
    assert hash_sample(df, "k", 0.0).count() == 0
    assert MOD == 1_000_000_007
