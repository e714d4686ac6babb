"""Per-key activity z-scores — the volume-anomaly primitive.

"Which keys (users, repos, IPs) have anomalously high/low event volume?"
is the first filter a large-scale pipeline runs before rate-limiting,
abuse triage, or bot removal. The scale-correct plan is two aggregations:

1. ``groupBy(key).count()`` — distributed, map-side partial;
2. ONE global moment row (n, Σc, Σc²) over the per-key counts;
3. a broadcast of that single row onto the counts, closing with
   ``z = (n·c − Σc) / sqrt(n·Σc² − (Σc)²)`` — algebraically
   ``(c − mean) / std_pop`` but with every accumulated quantity an exact
   BIGINT and double math ONLY in the final per-row expression, the same
   determinism discipline as the det-twin fingerprints: no
   float-accumulation order dependence, so a SQL oracle reproduces every
   z bit-for-bit.

A single-key input has zero variance; ``try_divide`` yields NULL rather
than tripping ANSI divide-by-zero. Long-sum headroom: n·Σc² stays inside
int64 up to ~10⁹ keys × avg count 10³ — beyond that, pre-scale by
decomposing per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_zscores(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """``(*key_cols, n_events long, z double)`` — population z-score of
    each key's row count against the distribution over all keys."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n_events"))
    moments = counts.agg(
        F.count("*").alias("n"),
        F.sum("n_events").alias("sx"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("sxx"),
    )
    num = F.col("n") * F.col("n_events") - F.col("sx")
    den = F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return counts.crossJoin(F.broadcast(moments)).select(
        *key_cols, "n_events", F.try_divide(num, den).alias("z")
    )
