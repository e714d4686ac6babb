"""Deterministic cardinality sketch: k-minimum-values (KMV).

``approx_count_distinct`` (HyperLogLog++) is the usual tool, but its
register layout is engine-private — no other system can verify or merge
its state. KMV (Bar-Yossef et al. 2002) is the auditable alternative: hash
every key with a deterministic mixer, keep the ``k`` smallest distinct
hashes, estimate ``n ≈ (k-1) · M / h_k`` where ``h_k`` is the k-th
smallest hash and ``M`` the hash range. Same O(k) state and mergeability
(union the sets, re-take k smallest), but every byte of it replays in
ANSI SQL — the DuckDB oracle recomputes the identical sketch.

Scale shape: one ``distinct`` shuffle on the hash, then a distributed
top-k (``ORDER BY h LIMIT k`` → TakeOrderedAndProject, per-partition heaps
+ a k-row driver merge — never a global sort). State is k longs no matter
how many billions of keys stream through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import MOD, bucket_sql, hash_bucket


def kmv_distinct_estimate(
    df: DataFrame, key_col: str, k: int = 64, seed: int = 0
) -> DataFrame:
    """One-row DataFrame ``(k, n_hashes, kth_hash, est_distinct)`` — the KMV
    estimate of ``count(distinct key_col)``.

    When fewer than ``k`` distinct hashes exist the sketch is exhaustive
    and the estimate is the exact count; otherwise ``(k-1)·MOD/h_k``. The
    mixer is :func:`..sampling.hash_bucket`, so the whole sketch — hashes,
    top-k, estimate — is bit-reproducible across engines (see
    :func:`kmv_sql` for the oracle twin).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashes = (
        df.select(hash_bucket(key_col, seed).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    agg = hashes.agg(F.count("*").alias("n"), F.max("h").alias("kth"))
    return agg.select(
        F.lit(k).cast("long").alias("k"),
        F.col("n").cast("long").alias("n_hashes"),
        F.col("kth").cast("long").alias("kth_hash"),
        F.round(
            F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
                F.lit(float(k - 1)) * F.lit(float(MOD)) / F.col("kth")
            ),
            4,
        ).alias("est_distinct"),
    )


def kmv_sql(table: str, key_expr: str, k: int = 64, seed: int = 0) -> str:
    """ANSI-SQL twin of :func:`kmv_distinct_estimate` — same mixer, same
    top-k, same estimator, for the DuckDB oracle gate."""
    return f"""
WITH b AS (SELECT DISTINCT {bucket_sql(key_expr, seed=seed)} AS h FROM {table}),
t AS (SELECT h FROM b ORDER BY h LIMIT {k})
SELECT CAST({k} AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_hashes,
       CAST(max(h) AS BIGINT) AS kth_hash,
       round(CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
             ELSE {float(k - 1)} * {float(MOD)} / max(h) END, 4) AS est_distinct
FROM t
"""
