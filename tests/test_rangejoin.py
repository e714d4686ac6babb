"""Interval join: brute-force equivalence (keyed timestamp + unkeyed
numeric axes), boundary inclusivity, explosion guard, type validation, and
plan shape (equi-join only, never a nested loop)."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from goffish_v3_spark.operators.rangejoin import interval_join

BASE = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def frames(spark):
    rng = random.Random(3)
    P = [
        (i, rng.randint(0, 3), BASE + dt.timedelta(seconds=rng.randint(0, 50_000)))
        for i in range(400)
    ]
    I = []
    for j in range(120):
        s = rng.randint(0, 50_000)
        I.append(
            (j, rng.randint(0, 3), BASE + dt.timedelta(seconds=s),
             BASE + dt.timedelta(seconds=s + rng.randint(0, 8_000)))
        )
    pdf = spark.createDataFrame(P, "pid long, k long, ts timestamp").persist()
    idf = spark.createDataFrame(I, "iid long, k long, start timestamp, end timestamp").persist()
    pdf.count(), idf.count()
    yield P, I, pdf, idf
    pdf.unpersist(), idf.unpersist()


def test_matches_brute_force_keyed(frames):
    P, I, pdf, idf = frames
    got = {
        (r.p_pid, r.i_iid)
        for r in interval_join(
            pdf, idf, "ts", "start", "end", on=["k"], bucket_width_sec=3600
        ).collect()
    }
    exp = {
        (pid, iid)
        for pid, pk, pts in P
        for iid, ik, s, e in I
        if pk == ik and s <= pts <= e
    }
    assert got == exp and len(got) > 100


def test_bucket_width_does_not_change_results(frames):
    P, I, pdf, idf = frames
    a = interval_join(pdf, idf, "ts", "start", "end", on=["k"], bucket_width_sec=100)
    b = interval_join(pdf, idf, "ts", "start", "end", on=["k"], bucket_width_sec=20_000)
    assert {(r.p_pid, r.i_iid) for r in a.collect()} == {
        (r.p_pid, r.i_iid) for r in b.collect()
    }


def test_boundaries_inclusive(spark):
    pdf = spark.createDataFrame(
        [(0, 0, BASE), (1, 0, BASE + dt.timedelta(seconds=100)),
         (2, 0, BASE + dt.timedelta(seconds=101))],
        "pid long, k long, ts timestamp",
    )
    idf = spark.createDataFrame(
        [(0, 0, BASE, BASE + dt.timedelta(seconds=100))],
        "iid long, k long, start timestamp, end timestamp",
    )
    got = {
        (r.p_pid, r.i_iid)
        for r in interval_join(pdf, idf, "ts", "start", "end", on=["k"], bucket_width_sec=30).collect()
    }
    assert got == {(0, 0), (1, 0)}  # both ends in, one-past-end out


def test_numeric_axis_unkeyed(spark):
    P = [(i, i % 7 * 13) for i in range(100)]
    I = [(j, j * 5, j * 5 + 20) for j in range(30)]
    got = {
        (r.p_pid, r.i_iid)
        for r in interval_join(
            spark.createDataFrame(P, "pid long, x long"),
            spark.createDataFrame(I, "iid long, s long, e long"),
            "x", "s", "e", bucket_width_sec=16,
        ).collect()
    }
    exp = {(pid, iid) for pid, x in P for iid, s, e in I if s <= x <= e}
    assert got == exp


def test_explosion_guard_raises(frames):
    _, _, pdf, idf = frames
    with pytest.raises(Exception, match="interval_join"):
        interval_join(
            pdf, idf, "ts", "start", "end", on=["k"],
            bucket_width_sec=1, max_buckets_per_interval=10,
        ).count()


def test_type_and_width_validation(frames, spark):
    _, _, pdf, idf = frames
    with pytest.raises(ValueError):
        interval_join(pdf, idf, "ts", "start", "end", bucket_width_sec=0)
    sdf = spark.createDataFrame([(1, "x")], "pid long, ts string")
    with pytest.raises(TypeError):
        interval_join(sdf, idf, "ts", "start", "end")


def test_plan_is_equi_join_only(frames):
    _, _, pdf, idf = frames
    plan = (
        interval_join(pdf, idf, "ts", "start", "end", on=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
