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


# ---------------------------------------------------------------------------
# Deterministic count-min sketch (Cormode & Muthukrishnan 2005): heavy-hitter
# frequency estimation with d·w bounded state. Same auditability stance as
# KMV — the d pairwise hash rows are affine maps with published constants
# over a polynomial key hash, so the ENTIRE counter table and every estimate
# replay in ANSI SQL. Guarantees: est ≥ true always (counters only ever
# overcount); est ≤ true + εN with prob 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
# Scale shape: one explode(d) + groupBy(row, bucket) with map-side combine —
# state is d·w longs no matter how many billions of occurrences stream
# through, and counter tables merge by cell-wise addition.

CMS_P = 1_000_000_007  # matches text.polyhash's modulus (key range)
_CMS_MIX = 0x9E3779B97F4A7C15
_MASK31 = (1 << 31) - 1


def cms_params(d: int, seed: int = 0) -> list[tuple[int, int, int]]:
    """``[(row, a, b), …]`` — the d affine hash rows, deterministic in
    (d, seed) so Spark and the SQL twin inline identical constants."""
    out = []
    for i in range(d):
        a = (_CMS_MIX * (2 * (i + seed) + 1)) % _MASK31 or 1
        b = (_CMS_MIX * (i + seed + 3) + 17) % _MASK31
        out.append((i, a, b))
    return out


def _cms_bucket(x, a_arr, b_arr, w: int):
    """bucket_row(x) = ((x·a_row + b_row) mod P) mod w — x < P < 2^30 and
    a < 2^31 keep the product inside long range."""
    a = F.element_at(a_arr, F.col("row") + 1)
    b = F.element_at(b_arr, F.col("row") + 1)
    return ((x * a + b) % CMS_P) % w


def cms_counters(
    df: DataFrame, key_expr, d: int = 3, w: int = 512, seed: int = 0
) -> DataFrame:
    """``(row int, bucket long, cnt long)`` — count-min counters over every
    input row. ``key_expr``: a long Column in [0, CMS_P), e.g.
    ``text.polyhash(F.col("token"))``. One scan: each occurrence explodes
    into its d (row, bucket) cells, then a map-side-combined groupBy."""
    if d < 1 or w < 1:
        raise ValueError(f"d and w must be >= 1, got d={d}, w={w}")
    params = cms_params(d, seed)
    a_arr = F.array(*[F.lit(a) for _, a, _ in params])
    b_arr = F.array(*[F.lit(b) for _, _, b in params])
    return (
        df.select(key_expr.alias("x"))
        .withColumn("row", F.explode(F.array(*[F.lit(i) for i in range(d)])))
        .withColumn("bucket", _cms_bucket(F.col("x"), a_arr, b_arr, w))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    queries: DataFrame,
    key_expr,
    d: int = 3,
    w: int = 512,
    seed: int = 0,
) -> DataFrame:
    """Append ``n_est = min over rows of counter[row][bucket_row(key)]`` to
    ``queries`` (all its columns pass through). (d, w, seed) must match the
    ``cms_counters`` build; a key that was inserted at least once hits a
    populated cell in every row, so the inner join is lossless for real
    heavy-hitter queries."""
    params = cms_params(d, seed)
    a_arr = F.array(*[F.lit(a) for _, a, _ in params])
    b_arr = F.array(*[F.lit(b) for _, _, b in params])
    out_cols = list(queries.columns)
    q = (
        queries.withColumn("x", key_expr)
        .withColumn("row", F.explode(F.array(*[F.lit(i) for i in range(d)])))
        .withColumn("bucket", _cms_bucket(F.col("x"), a_arr, b_arr, w))
    )
    return (
        q.join(F.broadcast(counters) if d * w <= 1 << 20 else counters,
               ["row", "bucket"])
        .groupBy(*out_cols)
        .agg(F.min("cnt").alias("n_est"))
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
