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
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        tie.cast("long").alias("__tie"),
        payload.alias("__payload"),
        F.lit(None).cast(lrow_t).alias("__lrow"),
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(payload_t).alias("__payload"),
        lrow.alias("__lrow"),
    )
    u = r.unionByName(l)

    base = Window.partitionBy(*on)
    if backward:
        w = base.orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc())
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        matched = F.last("__payload", ignorenulls=True).over(w)
    else:
        w = base.orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc())
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        matched = F.first("__payload", ignorenulls=True).over(w)

    out = u.withColumn("__m", matched).filter(F.col("__side") == l_side)
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
