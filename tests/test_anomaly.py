"""Per-key count z-scores vs closed forms."""

import math

import pytest

from goffish_v3_spark.operators.anomaly import count_zscores


def test_count_zscores_closed_form(spark):
    """Keys a(3 rows), b(1 row): n=2, sx=4, sxx=10 -> den=2, z=+1/-1."""
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",)], "k string"
    )
    got = {r.k: (r.n_events, r.z) for r in count_zscores(df, ["k"]).collect()}
    assert got == {"a": (3, 1.0), "b": (1, -1.0)}


def test_count_zscores_single_key_is_null(spark):
    """One key -> zero variance -> NULL/NaN, never an ANSI crash."""
    df = spark.createDataFrame([("a",), ("a",)], "k string")
    v = count_zscores(df, ["k"]).collect()[0].z
    assert v is None or math.isnan(v)


def test_count_zscores_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="key_cols"):
        count_zscores(df, [])
