"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — exact brute-force top-k neighbours via a crossish
  join; the dot product is a built-in ``aggregate``/``zip_with`` expression
  (JVM-side), the top-k a window row_number. Baseline / ground truth.
- :func:`lsh_topk` — the scale path: random-hyperplane LSH buckets shrink the
  candidate set; same exact scoring within buckets, probing multiple tables.
  At 100 TB the bucket id is the shuffle key and each bucket's candidate
  join is local to its partition.

Deterministic: hyperplanes derive from a seeded numpy RNG broadcast as
literal arrays; ordering ties break on neighbour id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a) -> "F.Column":
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> "F.Column":
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: ``(query_id, neighbor_id, sim, rk)``; excludes self-match.

    Broadcast the query side when it is small (the common case); Spark's AQE
    handles the corpus scan in parallel — each corpus partition scores all
    queries locally, then one top-k shuffle per query id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]) -> "F.Column":
    """Sign-pattern bucket id over random hyperplanes — a long with one bit
    per plane, computed with built-in array expressions."""
    bits = [
        F.when(dot(vec_col, F.array(*[F.lit(float(x)) for x in p])) >= 0, 1).otherwise(0)
        for p in planes
    ]
    out = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        out = out + (b.cast("long") * F.lit(1 << i))
    return out


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of
    ``n_tables`` tables; exact cosine rescoring + row_number inside the
    candidate set."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    cands = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        qb = q.withColumn("bucket", lsh_bucket(F.col("qv"), planes))
        cb = c.withColumn("bucket", lsh_bucket(F.col("cv"), planes))
        pair = qb.join(cb, "bucket").filter(
            F.col("query_id") != F.col("neighbor_id")
        ).select("query_id", "qv", "neighbor_id", "cv")
        cands = pair if cands is None else cands.unionByName(pair)
    cands = cands.dropDuplicates(["query_id", "neighbor_id"])
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 4096,
    n_iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Spherical k-means coarse quantizer for IVF: Lloyd iterations over a
    bounded deterministic sample (the ``sample_n`` smallest ids), driver-side
    numpy. Returns unit-norm centroids ``(n_lists, dim)``.

    At 100 TB the sample stays bounded (collect ≤ sample_n × dim doubles,
    a few MB) and the centroid matrix broadcasts to every task through the
    UDF closure — the standard IVF-flat training split: train small,
    assign distributed."""
    rows = (
        corpus.select(F.col(id_col).alias("i"), _as_double(F.col(vec_col)).alias("v"))
        .orderBy("i")
        .limit(sample_n)
        .collect()
    )
    X = np.array([r.v for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)].copy()
    for _ in range(n_iters):
        sims = X @ C.T
        assign = np.argmax(sims, axis=1)
        newC = np.zeros_like(C)
        np.add.at(newC, assign, X)
        counts = np.bincount(assign, minlength=len(C))
        empty = counts == 0
        if empty.any():
            # deterministic reseed: farthest points from their centroid,
            # skipping points coincident with a surviving centroid or an
            # already-picked reseed — otherwise two lists can end up with
            # identical centroids (wasted list, argmax tie by index;
            # ADVICE r3)
            need = int(empty.sum())
            far_order = np.argsort(sims[np.arange(len(X)), assign])
            surv = newC[~empty]
            surv_u = surv / np.maximum(
                np.linalg.norm(surv, axis=1, keepdims=True), 1e-12
            )
            picked: list[np.ndarray] = []
            for idx in far_order:
                x = X[idx]
                if len(surv_u) and float((surv_u @ x).max()) > 1 - 1e-9:
                    continue
                if any(float(p @ x) > 1 - 1e-9 for p in picked):
                    continue
                picked.append(x)
                if len(picked) == need:
                    break
            # fewer distinct directions than lists: fill the remainder with
            # the farthest points regardless (duplicates unavoidable then)
            i = 0
            while len(picked) < need:
                picked.append(X[far_order[i % len(far_order)]])
                i += 1
            newC[empty] = np.array(picked)
        newC /= np.maximum(np.linalg.norm(newC, axis=1, keepdims=True), 1e-12)
        if np.allclose(newC, C):
            break
        C = newC
    return C


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    sample_n: int = 4096,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF(-flat) approximate top-k: ``(query_id, neighbor_id, sim, rk)``.

    The scale path complementary to :func:`lsh_topk` (data-adaptive lists vs
    data-oblivious hyperplanes):

    - corpus vectors are assigned to their nearest of ``n_lists`` centroids
      in ONE narrow Arrow-vectorized pass (pandas UDF: a single matrix
      multiply per batch — argmax over centroids is inexpressible with
      built-in array functions without n_lists codegen'd aggregates);
    - each query probes its ``n_probe`` closest lists; candidates come from
      an equi-join on ``list_id`` (the IVF shuffle key — never a cross
      product), then exact cosine rescoring + window top-k;
    - ``n_probe == n_lists`` probes everything: exact brute force through
      the same plumbing (oracle-checked in the driver contract), while
      ``n_probe < n_lists`` trades recall for a ~n_probe/n_lists candidate
      fraction (recall pytest-asserted).
    """
    from pyspark.sql.functions import pandas_udf

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_lists, id_col, vec_col, sample_n=sample_n, seed=seed
        )
    C = np.asarray(centroids, dtype=np.float64)
    n_probe = min(n_probe, len(C))

    def _matrix(v) -> np.ndarray:
        X = np.array(v.tolist(), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return X @ C.T

    @pandas_udf("int")
    def assign_list(v):
        import pandas as pd

        return pd.Series(np.argmax(_matrix(v), axis=1).astype(np.int32))

    @pandas_udf("array<int>")
    def probe_lists(v):
        import pandas as pd

        top = np.argsort(-_matrix(v), axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(top.astype(np.int32)))

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("list_id", F.explode(probe_lists(F.col("qv"))))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("list_id", assign_list(F.col("cv")))

    cands = q.join(c, "list_id").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    small_n: int = 4096,
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine ≥ threshold, id_a < id_b (embedding-space near-dup
    detection for dedup pipelines).

    Plan selection by corpus size (one count):
    - n ≤ ``small_n``: exact all-pairs comparison — complete, and cheap at
      this size.
    - n > ``small_n``: random-hyperplane LSH candidate generation over
      ``n_tables`` independent tables (equi-join on the bucket id — never a
      cross product) + exact cosine rescoring within candidates. Recall is
      probabilistic: a qualifying pair is missed only if it splits in every
      table (P ≈ (1−(1−θ/π)^planes)^tables for angle θ); raise n_tables /
      lower n_planes to trade cost for recall."""
    a = df.select(F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va"))
    n = a.count()
    if n <= small_n:
        b = df.select(
            F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb")
        )
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim")
            )
            .filter(F.col("sim") >= threshold)
        )

    dim = len(df.select(vec_col).first()[0])
    cands = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        ab = a.withColumn("bucket", lsh_bucket(F.col("va"), planes))
        bb = ab.select(
            F.col("id_a").alias("id_b"), F.col("va").alias("vb"), "bucket"
        )
        pair = (
            ab.join(bb, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "va", "id_b", "vb")
        )
        cands = pair if cands is None else cands.unionByName(pair)
    cands = cands.dropDuplicates(["id_a", "id_b"])
    return (
        cands.select(
            "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )
