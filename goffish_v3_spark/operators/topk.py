"""Group-wise top-k selection — the per-group filter primitive.

Training-data pipelines constantly keep "the best k rows per group" (top
documents per language/domain, freshest snapshot per key, k nearest
candidates per query). The scale-correct plan is a window partitioned BY THE
GROUP: each group's rank state lives inside its own partition, Spark pushes
a per-partition top-k sort (no global ordering, no single-task funnel), and
a ``rn <= k`` filter prunes early. This module pins that shape — callers
never hand-roll an unpartitioned window by accident.

Skew note: one giant group degrades to that group's size, not the dataset's
— acceptable for k-selection since the window sort is local and spillable.
For pathological single-group skew, pre-aggregate with ``F.max_by``/
``F.min_by`` when k == 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Rows ranked 1..k within each group. ``order_cols`` carry their own
    asc/desc and MUST be a total order within every group (add a unique
    tie-break column — nondeterministic ranking is a silent-wrong-answer
    under retries otherwise). The rank is appended as ``rank_col`` (long)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty (for a global top-k "
                         "use orderBy().limit(k), which Spark plans as "
                         "TakeOrderedAndProject)")
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
