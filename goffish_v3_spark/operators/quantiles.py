"""Exact distributed order statistics (quantiles) without a global sort.

The naive exact-quantile plan — ``row_number() OVER (ORDER BY val)`` — is a
single-partition global sort: one task receives every row, which is exactly
the shape that dies at 100 TB. This operator computes the same k-th-order
statistics from the *value histogram* instead:

1. ``groupBy(val).count()`` — fully distributed, map-side partial aggregation,
   output size = |distinct values|, not |rows|;
2. one cumulative sum over the histogram (a window over |distinct| rows —
   bounded by value cardinality, NOT data volume);
3. the p-quantile is the smallest value whose cumulative count reaches
   ``k = (pct·(n−1)) // 100 + 1`` (1-based k-th smallest), found by a
   broadcast inequality join of the tiny percentile table against the
   cumulative histogram.

Scale contract: step 2's window is proportional to the column's distinct
cardinality. For low-cardinality columns (lengths, counts, scores on a grid)
this is thousands of rows at any data scale. For high-cardinality continuous
columns, pre-bucket (e.g. ``F.round(col, 3)``) first — the operator raises
no silent cap.

Determinism: k is computed in exact INTEGER arithmetic on the driver
(``(pct·(n−1)) // 100 + 1``) and every emitted column is integral, so the
DuckDB oracle (same integer formula via ``//``) matches hash-exactly — no
float percentile-interpolation semantics to align across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(df: DataFrame, col, pcts: list[int]) -> DataFrame:
    """``(pct long, k long, value long)`` — for each integer percentile in
    ``pcts``, the exact k-th smallest value of ``col`` (k as above; pct 0 is
    the minimum, pct 100 the maximum). ``col`` may be a column name or a
    Column expression; ties/duplicates are handled by construction (the
    histogram is per distinct value)."""
    if not pcts:
        raise ValueError("pcts must be non-empty")
    for p in pcts:
        if not (0 <= int(p) <= 100):
            raise ValueError(f"percentile out of range [0, 100]: {p!r}")
    c = F.col(col) if isinstance(col, str) else col
    vals = df.select(c.alias("val"))
    n = vals.count()
    if n == 0:
        raise ValueError("exact_quantiles over an empty input")
    ks = [(int(p), (int(p) * (n - 1)) // 100 + 1) for p in pcts]
    kdf = df.sparkSession.createDataFrame(ks, "pct long, k long")
    hist = vals.groupBy("val").agg(F.count("*").alias("c"))
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("val", F.sum("c").over(w).alias("cum"))
    return (
        F.broadcast(kdf)
        .join(cum, F.col("cum") >= F.col("k"))
        .groupBy("pct", "k")
        .agg(F.min("val").alias("value"))
    )
