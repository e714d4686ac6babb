"""As-of join: match each left row to the nearest right row in time.

Spark has no native as-of join (Pandas' ``merge_asof``, DuckDB's
``ASOF JOIN``, kdb's ``aj``). The naive encodings both die at scale:

- an inequality join ``l.ts >= r.ts`` is a range join → O(|L|·|R|) per key
  with a broadcast-nested-loop plan;
- "join then row_number then filter rank=1" materializes every candidate
  pair before discarding all but one — same blow-up, one stage later.

The scalable encoding is the **union + ordered window** trick: tag right
rows with their payload and left rows with a null payload, union them,
and take ``last(payload, ignorenulls=True)`` over a window partitioned by
the join key and ordered by ``(ts, side, tiebreak)``. Each left row then
sees exactly the latest right row at-or-before it. ONE hash shuffle on the
key, one sort — the same cost as a groupBy, regardless of how many right
rows precede each left row. This is the standard large-scale pattern
(Flink's temporal join and Trino's ASOF rewrite do the moral equivalent).

Tie semantics are pinned so the result is deterministic and replayable in
ANSI SQL (the DuckDB oracle uses a LATERAL ``ORDER BY ts DESC, tie DESC
LIMIT 1``): a right row at exactly ``left.ts`` matches (inclusive), and
among equal-timestamp right rows the one with the greatest ``tiebreak``
wins (backward) / smallest wins (forward).

**Skew**: the plain encoding serializes each key's full history through
one window task — fine for most keys, a straggler for a hub key with
hundreds of millions of rows. ``slice_width`` switches to a two-pass
sliced mode that bounds per-task work by rows-per-(key, slice): pass A
runs the same window per ``(key, slice)``; a per-(key, slice) carry table
(one summary row per slice with right rows — tiny) resolves matches that
cross slice boundaries via the same union-window trick at slice
granularity, then joins back. Results are bit-identical to the plain path
(property-tested), at the cost of one extra small shuffle + join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .rangejoin import _TS_TYPES


def _slice_expr(ts: Column, ts_dtype, width: float) -> Column:
    """Bucket a timestamp/integral axis column into slices of ``width``
    (seconds for timestamp axes, native units for integral ones)."""
    if isinstance(ts_dtype, _TS_TYPES):
        w = int(round(width * 1_000_000))
        axis = F.unix_micros(ts.cast("timestamp"))
    else:
        w = int(width)
        axis = ts.cast("long")
    if w <= 0:
        raise ValueError(f"slice_width must be positive, got {width!r}")
    return F.floor(axis / F.lit(w))


def _slice_carry(l, r, on: list, backward: bool, payload_t) -> DataFrame:
    """Cross-boundary matches for the sliced mode: per left ``(key,
    slice)``, the latest (backward) / earliest (forward) right payload from
    any STRICTLY earlier / later slice. Built from one summary row per
    (key, slice) that has right rows, so this union-window runs at slice
    granularity — tiny and skew-free by construction."""
    order_key = F.struct(F.col("__ts"), F.col("__tie"))
    best = F.max_by("__payload", order_key) if backward else F.min_by("__payload", order_key)
    summary = r.groupBy(*on, "__slice").agg(best.alias("__payload"))
    # Strict-boundary side ordering: a left marker must NOT see its own
    # slice's right summary (in-slice matches come from pass A, and for
    # forward the slice's earliest right row may precede the left row).
    # backward: left(0) < right(1) -> preceding stops at slice-1;
    # forward:  right(0) < left(1) -> following starts at slice+1.
    ls, rs = (0, 1) if backward else (1, 0)
    sm = summary.select(*on, "__slice", F.lit(rs).alias("__cside"), F.col("__payload"))
    lm = (
        l.select(*on, "__slice")
        .distinct()
        .select(
            *on, "__slice", F.lit(ls).alias("__cside"),
            F.lit(None).cast(payload_t).alias("__payload"),
        )
    )
    cu = sm.unionByName(lm)
    w = Window.partitionBy(*on).orderBy(F.col("__slice").asc(), F.col("__cside").asc())
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = F.last("__payload", ignorenulls=True).over(w)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = F.first("__payload", ignorenulls=True).over(w)
    return (
        cu.withColumn("__carry", carry)
        .filter(F.col("__cside") == ls)
        .select(*on, "__slice", "__carry")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
    right_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
    slice_width: float | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload of the nearest
    ``right`` row with the same ``on`` key at-or-before (``backward``) /
    at-or-after (``forward``) its timestamp; nulls where no right row
    qualifies.

    ``tiebreak`` names a right column that totally orders equal-timestamp
    right rows (e.g. an event id) — required for a deterministic result
    when right timestamps can collide. ``tolerance`` is an SQL interval
    body (e.g. ``"1 HOUR"``): matches further away than the tolerance are
    nulled out (the join itself stays one window pass; the tolerance is a
    post-filter on the matched timestamp, not a range predicate).
    ``right_cols`` selects which right columns to attach (default: all but
    the key and timestamp); each lands as ``{prefix}{col}``, plus
    ``{prefix}{right_ts}`` for the matched timestamp itself.

    ``slice_width`` (seconds for timestamp axes, native units for integral
    ones) enables the skew-resilient sliced mode — identical results,
    per-task work bounded by rows-per-(key, slice) instead of rows-per-key
    (see module docstring). Pick a width so a typical slice holds
    thousands, not millions, of rows of the hottest key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(on) | {right_ts}]
    backward = direction == "backward"

    # side ordering puts eligible right rows on the "seen" side of each left
    # row at equal timestamps (inclusive match): right before left when
    # scanning backward, left before right when scanning forward.
    r_side, l_side = (0, 1) if backward else (1, 0)
    tie = F.col(tiebreak) if tiebreak is not None else F.lit(0)
    payload = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    lrow = F.struct(*[F.col(c).alias(c) for c in left.columns])
    # resolve the two struct dtypes once so each side can carry a typed null
    # for the other side's slot (unionByName needs identical schemas)
    payload_t = right.select(payload.alias("x")).schema["x"].dataType
    lrow_t = left.select(lrow.alias("x")).schema["x"].dataType
    slice_of = (
        (lambda df_col, dtype: _slice_expr(df_col, dtype, slice_width))
        if slice_width is not None
        else (lambda df_col, dtype: F.lit(0).cast("long"))
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        slice_of(F.col(right_ts), right.schema[right_ts].dataType).alias("__slice"),
        F.lit(r_side).alias("__side"),
        tie.cast("long").alias("__tie"),
        payload.alias("__payload"),
        F.lit(None).cast(lrow_t).alias("__lrow"),
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        slice_of(F.col(left_ts), left.schema[left_ts].dataType).alias("__slice"),
        F.lit(l_side).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(payload_t).alias("__payload"),
        lrow.alias("__lrow"),
    )
    u = r.unionByName(l)

    order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc()]
    part_keys = on if slice_width is None else on + ["__slice"]
    w = Window.partitionBy(*part_keys).orderBy(*order)
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        matched = F.last("__payload", ignorenulls=True).over(w)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        matched = F.first("__payload", ignorenulls=True).over(w)

    out = u.withColumn("__m", matched).filter(F.col("__side") == l_side)
    if slice_width is not None:
        carry = _slice_carry(l, r, on, backward, payload_t)
        out = out.join(carry, on + ["__slice"], "left").withColumn(
            "__m", F.coalesce(F.col("__m"), F.col("__carry"))
        )
    if tolerance is not None:
        far = (
            F.col("__m.__rts") < F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
            if backward
            else F.col("__m.__rts") > F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
        )
        out = out.withColumn(
            "__m", F.when(far, F.lit(None).cast(out.schema["__m"].dataType)).otherwise(F.col("__m"))
        )
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        F.col("__m.__rts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
