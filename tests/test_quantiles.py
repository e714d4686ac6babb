"""Exact histogram-based quantiles vs closed forms."""

import pytest

from goffish_v3_spark.operators.quantiles import exact_quantiles


def test_exact_quantiles_closed_form(spark):
    """1..10: k = (pct*(n-1))//100 + 1, value = k-th smallest."""
    df = spark.createDataFrame([(i,) for i in range(1, 11)], "v long")
    got = {
        r.pct: (r.k, r.value)
        for r in exact_quantiles(df, "v", [0, 25, 50, 75, 100]).collect()
    }
    assert got == {0: (1, 1), 25: (3, 3), 50: (5, 5), 75: (7, 7), 100: (10, 10)}


def test_exact_quantiles_duplicates(spark):
    """Heavy ties: the histogram path still lands on the k-th order stat."""
    vals = [1] * 5 + [2] * 90 + [3] * 5  # n=100
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.pct: r.value for r in exact_quantiles(df, "v", [1, 50, 99]).collect()
    }
    # k(1)=1 -> 1st smallest = 1; k(50)=50 -> 2; k(99)=99 -> 3
    assert got == {1: 1, 50: 2, 99: 3}


def test_exact_quantiles_validation(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="percentile"):
        exact_quantiles(df, "v", [101])
    with pytest.raises(ValueError, match="non-empty"):
        exact_quantiles(df, "v", [])
    empty = df.filter("v > 1")
    with pytest.raises(ValueError, match="empty"):
        exact_quantiles(empty, "v", [50])
