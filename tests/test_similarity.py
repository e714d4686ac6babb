"""Similarity search: exact brute-force top-k + LSH approximate variant."""

import math

import numpy as np
import pyspark.sql.functions as F

from goffish_v3_spark.operators.similarity import cosine_topk, lsh_topk


def _emb(spark, n=40, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype("float32")
    rows = [(i, vecs[i].tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs.astype("float64"),
    )


def _oracle_topk(vecs, qids, k):
    out = {}
    norms = np.linalg.norm(vecs, axis=1)
    for q in qids:
        sims = vecs @ vecs[q] / (norms * norms[q])
        sims_rounded = np.round(sims, 6)
        order = sorted(
            (i for i in range(len(vecs)) if i != q),
            key=lambda i: (-sims_rounded[i], i),
        )
        out[q] = [(i, sims_rounded[i]) for i in order[:k]]
    return out


def test_cosine_topk_matches_numpy(spark):
    df, vecs = _emb(spark)
    got = cosine_topk(df.filter(F.col("vec_id") < 5), df, k=3).collect()
    want = _oracle_topk(vecs, range(5), 3)
    for r in got:
        w_id, w_sim = want[r.query_id][r.rk - 1]
        assert r.neighbor_id == w_id
        assert math.isclose(r.sim, w_sim, abs_tol=2e-6)


def test_lsh_topk_high_recall(spark):
    df, vecs = _emb(spark, n=60)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(df.filter(F.col("vec_id") < 10), df, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(
            df.filter(F.col("vec_id") < 10), df, k=3, dim=8, n_planes=4, n_tables=6
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_embedding_near_dups_lsh_path_no_cross_product(spark):
    """Above the small-n guard the operator must never plan a cross/nested-
    loop product; planted identical vectors are still found (same bucket in
    every table)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from goffish_v3_spark.operators.similarity import embedding_near_duplicates

    rng = np.random.default_rng(17)
    n, dim = 10_000, 16
    vecs = rng.standard_normal((n, dim)).astype("float32")
    vecs[5001] = vecs[1]  # planted exact dup
    vecs[7007] = vecs[42]
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": list(map(list, vecs))})
    df = spark.createDataFrame(pdf)

    out = embedding_near_duplicates(
        df, threshold=0.99, small_n=1000, n_planes=10, n_tables=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 5001) in pairs
    assert (42, 7007) in pairs


def test_embedding_near_dups_small_n_exact_unchanged(spark):
    """Below the guard the exact all-pairs result is identical to before."""
    import numpy as np
    import pandas as pd

    from goffish_v3_spark.operators.similarity import embedding_near_duplicates

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((60, 8)).astype("float32")
    vecs[10] = vecs[3] + 0.01 * rng.standard_normal(8).astype("float32")
    pdf = pd.DataFrame({"vec_id": range(60), "embedding": list(map(list, vecs))})
    df = spark.createDataFrame(pdf)
    got = {
        (r.id_a, r.id_b): r.sim
        for r in embedding_near_duplicates(df, threshold=0.9).collect()
    }
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    want = {
        (i, j): round(float(np.dot(vecs[i].astype("f8"), vecs[j].astype("f8"))
                 / (np.linalg.norm(vecs[i].astype("f8")) * np.linalg.norm(vecs[j].astype("f8")))), 6)
        for i in range(60) for j in range(i + 1, 60) if sims[i, j] >= 0.9
    }
    want = {k: v for k, v in want.items() if v >= 0.9}
    assert got == want


def test_ivf_exhaustive_equals_exact(spark):
    """n_probe == n_lists probes every list: the IVF plumbing must reproduce
    brute force exactly (ids, ranks, rounded sims)."""
    from goffish_v3_spark.operators.similarity import ivf_topk

    df, _ = _emb(spark, n=60)
    q = df.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.rk, r.neighbor_id, r.sim)
        for r in cosine_topk(q, df, k=3).collect()
    }
    ivf = {
        (r.query_id, r.rk, r.neighbor_id, r.sim)
        for r in ivf_topk(q, df, k=3, n_lists=8, n_probe=8).collect()
    }
    assert ivf == exact


def test_ivf_probe_recall(spark):
    """Partial probing keeps useful recall on clustered data (planted
    clusters so nearest neighbours share a list)."""
    from goffish_v3_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((6, 8)) * 4
    vecs = np.concatenate(
        [c + 0.3 * rng.standard_normal((15, 8)) for c in centers]
    ).astype("float32")
    rows = [(i, vecs[i].tolist()) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(q, df, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(q, df, k=3, n_lists=6, n_probe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"IVF recall too low: {recall}"


def test_ivf_deterministic(spark):
    from goffish_v3_spark.operators.similarity import ivf_topk

    df, _ = _emb(spark, n=50)
    q = df.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_topk(q, df, k=3, n_lists=4, n_probe=2).collect()))
    b = sorted(map(tuple, ivf_topk(q, df, k=3, n_lists=4, n_probe=2).collect()))
    assert a == b
