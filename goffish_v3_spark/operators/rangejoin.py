"""Interval (range) join: points matched to the intervals containing them.

Spark's optimizer turns ``p.ts BETWEEN i.start AND i.end`` into a
broadcast-nested-loop or cartesian plan — O(|P|·|I|) per key, dead at
scale. The scalable encoding is **time bucketing**: assign each point to
the single bucket ``floor(axis / width)``, explode each interval into the
buckets it covers, equi-join on ``(key..., bucket)``, then re-check the
exact predicate. Because a point lives in exactly ONE bucket, every
qualifying (point, interval) pair meets exactly once — no dedup pass.
Cost: one hash shuffle per side on ``(key, bucket)`` plus an interval
replication factor of ``span/width + 1`` (pick ``bucket_width`` near the
typical interval span; the replication is loudly guarded, never silent).

This is the standard big-data range-join strategy (Databricks' range-join
binning hint, Flink's interval join, and the banded joins in this repo's
dedup operators are all the same idea).

Match semantics are closed on both ends (``start <= point <= end``) so the
DuckDB oracle is a plain BETWEEN inequality join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

_TS_TYPES = (TimestampType, TimestampNTZType)


def _axis(df: DataFrame, col: str) -> Column:
    """Bucketable long axis for a timestamp or integral column."""
    t = df.schema[col].dataType
    if isinstance(t, _TS_TYPES):
        # NTZ goes through the same session-tz cast on every axis column, so
        # bucket assignment stays mutually consistent regardless of zone
        return F.unix_micros(F.col(col).cast("timestamp"))
    if t.simpleString() in ("bigint", "int", "smallint", "tinyint"):
        return F.col(col).cast("long")
    raise TypeError(f"interval_join axis column {col!r} must be timestamp or integral, got {t.simpleString()}")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: Sequence[str] = (),
    bucket_width_sec: float = 3600.0,
    max_buckets_per_interval: int = 1024,
    point_prefix: str = "p_",
    interval_prefix: str = "i_",
) -> DataFrame:
    """Inner join of ``points`` to every interval with
    ``start <= point <= end`` (and equal ``on`` keys), via bucketed
    equi-join — one shuffle per side, no nested-loop plan.

    ``bucket_width_sec`` is the bucket size in seconds for timestamp axes
    (for integral axes it is taken in the column's own units). Intervals
    spanning more than ``max_buckets_per_interval`` buckets raise loudly
    JVM-side (`raise_error`) instead of silently exploding the join —
    widen the bucket or split the offending intervals.

    Output columns: the ``on`` keys, then every point column as
    ``{point_prefix}{col}`` and every interval column as
    ``{interval_prefix}{col}`` (key columns are not duplicated).
    """
    on = list(on)
    if points.schema[point_col].dataType != intervals.schema[start_col].dataType:
        raise TypeError("point and interval bound columns must share a type")
    is_ts = isinstance(points.schema[point_col].dataType, _TS_TYPES)
    width = int(round(bucket_width_sec * 1_000_000)) if is_ts else int(bucket_width_sec)
    if width <= 0:
        raise ValueError(f"bucket width must be positive, got {bucket_width_sec!r}")

    p_bucket = F.floor(_axis(points, point_col) / F.lit(width))
    lo = F.floor(_axis(intervals, start_col) / F.lit(width))
    hi = F.floor(_axis(intervals, end_col) / F.lit(width))
    n_buckets = hi - lo + 1
    covered = F.when(
        n_buckets > F.lit(int(max_buckets_per_interval)),
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval_join: an interval spans > {max_buckets_per_interval} "
                    f"buckets of width {bucket_width_sec} — widen bucket_width_sec "
                    "or split long intervals (span="
                ),
                n_buckets.cast("string"),
                F.lit(" buckets)"),
            )
        ).cast("array<bigint>"),
    ).otherwise(F.sequence(lo, hi))

    p = points.select(
        *[F.col(c) for c in on],
        p_bucket.alias("__bucket"),
        *[F.col(c).alias(f"{point_prefix}{c}") for c in points.columns if c not in on],
    )
    i = intervals.select(
        *[F.col(c) for c in on],
        F.explode(covered).alias("__bucket"),
        *[F.col(c).alias(f"{interval_prefix}{c}") for c in intervals.columns if c not in on],
    )
    joined = p.join(i, on + ["__bucket"])
    exact = (F.col(f"{point_prefix}{point_col}") >= F.col(f"{interval_prefix}{start_col}")) & (
        F.col(f"{point_prefix}{point_col}") <= F.col(f"{interval_prefix}{end_col}")
    )
    return joined.filter(exact).drop("__bucket")
