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
