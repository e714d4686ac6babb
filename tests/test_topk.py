"""Group-wise top-k window selection."""

import pytest
from pyspark.sql import functions as F

from goffish_v3_spark.operators.topk import top_k_per_group


def test_top_k_per_group_basic(spark):
    rows = [("a", 1, 0.9), ("a", 2, 0.9), ("a", 3, 0.1), ("b", 4, 0.5)]
    df = spark.createDataFrame(rows, "g string, id long, s double")
    out = top_k_per_group(
        df, ["g"], [F.col("s").desc(), F.col("id").asc()], k=2
    )
    got = sorted((r.g, r.id, r.rn) for r in out.collect())
    # ties on s break by id, so ranking is a total order
    assert got == [("a", 1, 1), ("a", 2, 2), ("b", 4, 1)]


def test_top_k_rank_is_long_and_dense_from_one(spark):
    df = spark.createDataFrame([("g", i) for i in range(5)], "g string, id long")
    out = top_k_per_group(df, ["g"], [F.col("id").asc()], k=3)
    assert dict(out.dtypes)["rn"] == "bigint"
    assert [r.rn for r in out.orderBy("rn").collect()] == [1, 2, 3]


def test_top_k_validation(spark):
    df = spark.createDataFrame([("g", 1)], "g string, id long")
    with pytest.raises(ValueError, match="k must be"):
        top_k_per_group(df, ["g"], [F.col("id")], k=0)
    with pytest.raises(ValueError, match="group_cols"):
        top_k_per_group(df, [], [F.col("id")], k=1)
