"""Deterministic hash-based sampling for training-data pipelines.

At 100 TB, `rand()`-based sampling is the wrong tool: it is not reproducible
across retries (a recomputed task resamples differently, corrupting exactly-
once sinks), not joinable (you cannot re-derive "was this row sampled?"),
and not auditable outside Spark. The scalable idiom is a *keyed hash
threshold*: mix the row's stable key through a deterministic integer hash,
compare against ``rate * MOD``, done. No shuffle, no state, no RNG — a pure
map over the scan that Catalyst pushes into whole-stage codegen, and the
same row is kept or dropped on every engine that reproduces the arithmetic.

Everything here is exact 64-bit integer arithmetic (no floats) with an ANSI-
SQL twin, so every operator is hash-checkable against DuckDB — the same
det-twin pattern as :func:`..text.polyhash`.

Operators:

- :func:`hash_bucket` — the mixer: key -> uniform value in ``[0, MOD)``.
- :func:`hash_sample` — keep rows whose bucket falls below ``rate``.
- :func:`stratified_sample` — per-stratum rates via a literal map lookup
  (broadcast-free: the map is a codegen'd expression, not a join).
- :func:`assign_splits` — disjoint, exhaustive train/val/test labels from
  cumulative thresholds; reproducible dataset splits without a shuffle.

These are engine features beyond the reference (which has no sampling
layer); they exercise scan/filter pushdown at the scale where reading 10%
of 100 TB must not cost 100 TB of CPU downstream.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Modulus and multipliers for the two-round LCG-style mixer. MOD is the
# classic 1e9+7 prime; both multiplier*MOD products stay far below 2^63 so
# the arithmetic never overflows int64 on either engine (Spark longs and
# DuckDB BIGINTs both wrap identically only past 2^63 — we never get there).
MOD = 1_000_000_007
_A1 = 1_103_515_245  # glibc rand() multiplier
_C1 = 12_345
_A2 = 1_588_635_695  # Lehmer-style second-round multiplier (< 2^31)
_C2 = 1_117_695_901


def hash_bucket(key: Column | str, seed: int = 0) -> Column:
    """Deterministic mix of an integer ``key`` into a uniform bucket in
    ``[0, MOD)`` — two LCG rounds mod 1e9+7, pure JVM expressions.

    The exact SQL twin (DuckDB / ANSI) is produced by :func:`bucket_sql`;
    negative keys are folded non-negative first (``pmod`` here,
    ``((k % m) + m) % m`` there) so both engines agree on the
    representative. One bucket value drives sampling, splits,
    and stratification — compare against ``int(rate * MOD)`` thresholds so
    no floating point ever enters the decision.
    """
    k = F.pmod(F.col(key).cast("long") if isinstance(key, str) else key.cast("long"), F.lit(MOD))
    h1 = F.pmod(k * F.lit(_A1) + F.lit(_C1 + int(seed)), F.lit(MOD))
    return F.pmod(h1 * F.lit(_A2) + F.lit(_C2), F.lit(MOD))


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sampling rate must be in [0, 1], got {rate!r}")
    return int(round(rate * MOD))


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 0
) -> DataFrame:
    """Keep rows whose :func:`hash_bucket` falls below ``rate``.

    A pure filter over the scan — no shuffle, no UDF, reproducible across
    retries and engines. At 100 TB this is the only sampling that survives
    speculative re-execution with exactly-once semantics.
    """
    return df.filter(hash_bucket(key_col, seed) < F.lit(_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    key_col: str,
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum hash sampling: each stratum gets its own keep rate.

    The rate table is compiled into a literal ``map`` expression (codegen'd
    per-row lookup), NOT a join — at 1000 executors there is nothing to
    broadcast and nothing to shuffle. Strata absent from ``rates`` fall back
    to ``default_rate``. The per-row keep decision depends only on
    ``(key, seed)``, so enlarging a stratum's rate strictly grows its sample
    (nested samples — raise en from 10% to 20% and the old 10% is a subset).
    """
    pairs: list[Column] = []
    for stratum, rate in rates.items():
        pairs.append(F.lit(stratum))
        pairs.append(F.lit(_threshold(rate)))
    rate_map = F.create_map(*pairs) if pairs else F.create_map()
    thresh = F.coalesce(
        rate_map[F.col(strata_col)], F.lit(_threshold(default_rate))
    )
    return df.filter(hash_bucket(key_col, seed) < thresh)


def split_thresholds(weights: Mapping[str, float]) -> list[tuple[str, int]]:
    """Cumulative integer thresholds for :func:`assign_splits` — the single
    source of truth shared with the SQL oracle builder, so the float
    accumulation (and its rounding) is bit-identical on both sides. Returns
    ``(name, upper_threshold)`` for every split but the last; the last split
    absorbs the remainder ``[threshold[-1], MOD)``."""
    names = list(weights)
    if len(names) < 1:
        raise ValueError("assign_splits needs at least one split")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    out: list[tuple[str, int]] = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        out.append((name, _threshold(min(cum, 1.0))))
    return out


def assign_splits(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float] | None = None,
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Label every row with a split name (default train/val/test 0.8/0.1/0.1).

    Splits are disjoint and exhaustive by construction: the bucket is
    compared against cumulative integer thresholds, the last split absorbs
    the rounding remainder. Deterministic in ``(key, seed)`` — the same
    document lands in the same split on every run, every engine, every
    re-shard of the input, which is the property dataset splits must have
    and ``rand()`` splits do not.
    """
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = hash_bucket(key_col, seed)
    expr: Column | None = None
    for name, thr in split_thresholds(weights):
        cond = bucket < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(list(weights)[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def bucket_sql(key_expr: str, seed: int = 0) -> str:
    """The ANSI-SQL twin of :func:`hash_bucket` over ``key_expr`` — used by
    the DuckDB oracles so the gate replays the identical arithmetic."""
    folded = f"((({key_expr}) % {MOD} + {MOD}) % {MOD})"  # pmod: fold negatives
    return (
        f"((({folded} * {_A1} + {_C1 + int(seed)}) % {MOD})"
        f" * {_A2} + {_C2}) % {MOD}"
    )
