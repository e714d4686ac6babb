"""Dedup operators: exact, minhash-LSH, simhash, embedding near-dup."""

import pyspark.sql.functions as F

from goffish_v3_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from goffish_v3_spark.operators.similarity import embedding_near_duplicates

BASE = (
    "spark is a unified analytics engine for large scale data processing "
    "it provides high level apis in java scala python and r plus an optimized "
    "engine that supports general execution graphs for queries"
)


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact duplicate of 1
        (3, BASE.replace("queries", "workloads")),  # near dup of 1
        (4, "completely unrelated text about cooking pasta with tomatoes and basil and olive oil in a big pot"),
        (5, "another unrelated document mentioning mountains rivers hiking trails and the weather forecast for tomorrow"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    groups = exact_duplicates(_docs(spark)).collect()
    assert len(groups) == 1
    assert groups[0].n_docs == 2
    assert groups[0].first_doc_id == 1


def test_dedup_exact_keeps_one(spark):
    kept = {r.doc_id for r in dedup_exact(_docs(spark)).collect()}
    assert kept == {1, 3, 4, 5}


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.8
    assert all(a in (1, 2, 3) and b in (1, 2, 3) for a, b in pairs)


def test_minhash_poly_mode_matches_xxhash_semantics(spark):
    """hash_fn='poly' (the SQL-reproducible mode) finds the same pairs with
    the same exact-Jaccard values on the fixture — only the hash family
    differs, not the candidate/verify semantics."""
    base = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.5).collect()
    }
    poly = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            _docs(spark), jaccard_threshold=0.5, hash_fn="poly"
        ).collect()
    }
    assert poly == base
    # determinism across invocations (no RNG anywhere in the poly path)
    again = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            _docs(spark), jaccard_threshold=0.5, hash_fn="poly"
        ).collect()
    }
    assert again == poly


def test_ngram_jaccard_exact_values(spark):
    pairs = spark.createDataFrame([(1, 2), (1, 4)], "id_a long, id_b long")
    out = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(_docs(spark), pairs).collect()}
    assert out[(1, 2)] == 1.0
    assert out[(1, 4)] == 0.0


def test_simhash_near_duplicates(spark):
    got = {
        (r.id_a, r.id_b)
        for r in simhash_near_duplicates(_docs(spark)).collect()
    }
    assert (1, 2) in got  # identical text → identical simhash
    assert all({a, b} <= {1, 2, 3} for a, b in got)


def test_simhash_banding_lossless_inside_old_prefix(spark):
    """A pair differing ONLY in the top bits (inside what used to be the
    single 16-bit prefix bucket, which could never pair them — VERDICT r3
    #4) is found by the multi-block banding, and a pair matched by several
    blocks is emitted exactly once."""
    from goffish_v3_spark.operators.dedup import _banded_pairs

    rows = [
        (1, -1),               # all 64 bits set
        (2, (1 << 63) - 1),    # top bit clear → hamming(1,2) = 1, in band 3
        (3, -1),               # identical to 1 → matches in ALL 4 bands
        (4, 0),                # hamming 64/63 from the others → never a pair
    ]
    s = spark.createDataFrame(rows, "_id long, simhash long")
    got = sorted(
        (r.id_a, r.id_b, r.hamming) for r in _banded_pairs(s, 64, 3).collect()
    )
    assert got == [(1, 2, 1), (1, 3, 0), (2, 3, 1)]


def test_simhash_poly_mode_near_duplicates(spark):
    """hash_fn='poly' (60-bit two-family SQL-reproducible simhash) finds
    the fixture's near-dups with the same selectivity shape as xxhash64,
    and is deterministic across invocations."""
    got = {
        (r.id_a, r.id_b)
        for r in simhash_near_duplicates(_docs(spark), hash_fn="poly").collect()
    }
    assert (1, 2) in got  # identical text → identical simhash
    assert all({a, b} <= {1, 2, 3} for a, b in got)
    again = {
        (r.id_a, r.id_b)
        for r in simhash_near_duplicates(_docs(spark), hash_fn="poly").collect()
    }
    assert again == got


def test_embedding_near_duplicates(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.id_a, r.id_b) for r in embedding_near_duplicates(df, 0.95).collect()}
    assert got == {(1, 2)}


def test_jaccard_similarity_join_exact(spark):
    """Inverted-index join reproduces brute-force n-gram Jaccard exactly."""
    from itertools import combinations

    from goffish_v3_spark.operators.dedup import jaccard_similarity_join

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy cat",
        3: "a completely different sentence with other words here",
        4: "the quick brown fox jumps over the lazy dog",
        5: "quick brown fox jumps over the lazy dog today",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_similarity_join(df, threshold=0.3).collect()
    }

    def shingles(t):
        w = t.split()
        return set(" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1)))

    want = {}
    for a, b in combinations(sorted(texts), 2):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        j = round(len(sa & sb) / max(len(sa | sb), 1), 6)
        if j >= 0.3:
            want[(a, b)] = j
    assert got == want


def test_jaccard_join_max_df_drops_stop_shingles(spark):
    """The scale guard: a shingle shared by every doc is excluded from
    candidate generation when max_df is set."""
    from goffish_v3_spark.operators.dedup import jaccard_similarity_join

    common = "alpha beta gamma"
    rows = [(i, f"{common} unique{i} token{i} word{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # every pair shares only the shingles containing the common prefix;
    # with max_df=5 those shingles are stop-listed -> no candidates at all
    assert jaccard_similarity_join(df, threshold=0.01, max_df=5).count() == 0
    assert jaccard_similarity_join(df, threshold=0.01).count() > 0


def test_simhash_deterministic_across_runs(spark):
    """xxhash64-based simhash is a pure function of the text — pinned
    literals guard against any per-process salt sneaking back in."""
    from goffish_v3_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, ""),
            (3, "alpha beta gamma"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert got == {
        1: -7573889167326994222,
        2: -7444071767201028348,
        3: -8970745664593772831,
    }
    # identical texts -> identical simhash (hamming 0), different -> different
    assert got[1] != got[3]


def test_minhash_identical_group_collapses_before_banding(spark):
    """500 byte-identical docs: banding sees ONE representative (linear
    candidate work); star mode keeps the output linear too."""
    from goffish_v3_spark.operators.dedup import minhash_lsh_pairs

    rows = [(i, "exactly the same document body repeated many times") for i in range(500)]
    rows.append((1000, "a genuinely different document about other things entirely"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    stars = minhash_lsh_pairs(df, jaccard_threshold=0.5, expand_identical=False)
    got = stars.collect()
    # linear: 499 star rows (rep 0 -> members 1..499), no quadratic blowup
    assert len(got) == 499
    assert all(r.id_a == 0 and r.jaccard == 1.0 for r in got)

    # full expansion remains available and quadratic by contract
    full = minhash_lsh_pairs(df, jaccard_threshold=0.5)
    assert full.count() == 499 * 500 // 2


def test_minhash_expansion_preserves_cross_group_pairs(spark):
    """Near-dup pairs across exact-dup groups inherit the representative
    pair's jaccard for every member combination."""
    from goffish_v3_spark.operators.dedup import minhash_lsh_pairs

    a = "the quick brown fox jumps over the lazy dog and then rests a while"
    b = "the quick brown fox jumps over the lazy dog and then rests a bit"
    rows = [(1, a), (2, a), (3, b), (4, b), (10, "something else entirely unrelated words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.3).collect()
    }
    # intra-group
    assert pairs[(1, 2)] == 1.0 and pairs[(3, 4)] == 1.0
    # cross-group: all 4 member combos share one verified jaccard
    cross = {k: v for k, v in pairs.items() if k in {(1, 3), (1, 4), (2, 3), (2, 4)}}
    assert len(cross) == 4
    assert len(set(cross.values())) == 1
    assert 0.3 <= next(iter(cross.values())) < 1.0


def test_simhash_null_text(spark):
    """NULL text hashes like the empty string instead of failing the stage
    (ADVICE: tokens(NULL) is a NULL array reaching the Arrow kernel)."""
    from goffish_v3_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(1, None), (2, "hello world"), (3, "")], "doc_id long, text string"
    )
    got = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert got[1] == got[3]  # NULL hashes like the empty string
    assert got[2] != got[1]


def test_jaccard_max_df_sizes_use_filtered_universe(spark):
    """With max_df, set sizes are computed over the SURVIVING shingles, so
    numerator and denominator agree (ADVICE: full-set sizes systematically
    underestimated Jaccard for docs containing stop-shingles)."""
    from goffish_v3_spark.operators.dedup import jaccard_similarity_join

    rows = [(100, "s1 s2 s3 c1 c2 c3 a1"), (101, "s1 s2 s3 c1 c2 c3 b1")]
    rows += [(i, f"s1 s2 s3 f{i}a f{i}b f{i}c") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_similarity_join(df, threshold=0.5, max_df=5).collect()
    }
    # surviving sets: 4 shingles each, 3 shared -> 3/5; the old full-set
    # denominator gave 3/7 ≈ 0.43 and silently dropped the pair at 0.5
    assert got == {(100, 101): 0.6}


def test_banded_pairs_degenerate_params(spark):
    """max_hamming=0 at width=64 must plan (single full-width block — the
    (1<<64)-1 mask would overflow LongType), and max_hamming+1 > width must
    raise instead of degenerating zero-width bands toward a cross product
    (ADVICE r4)."""
    import pytest

    from goffish_v3_spark.operators.dedup import _banded_pairs

    rows = [(1, -1), (2, -1), (3, 0)]
    s = spark.createDataFrame(rows, "_id long, simhash long")
    got = sorted((r.id_a, r.id_b, r.hamming) for r in _banded_pairs(s, 64, 0).collect())
    assert got == [(1, 2, 0)]
    with pytest.raises(ValueError, match="max_hamming"):
        _banded_pairs(s, 4, 4)
    with pytest.raises(ValueError, match="max_hamming"):
        _banded_pairs(s, 64, -1)


def test_near_dup_clusters_transitive_chain(spark):
    """a~b and b~c pairs must land in ONE cluster with canonical = min id,
    even though a~c was never emitted; singletons map to themselves."""
    from goffish_v3_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame(
        [(10, "x"), (20, "x"), (30, "x"), (40, "y"), (50, "z")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(10, 20, 0.9), (20, 30, 0.8)], "id_a long, id_b long, jaccard double"
    )
    out = {
        r.doc_id: (r.canonical_id, r.cluster_size)
        for r in near_dup_clusters(spark, docs, pairs=pairs).collect()
    }
    assert out == {
        10: (10, 3),
        20: (10, 3),
        30: (10, 3),
        40: (40, 1),
        50: (50, 1),
    }


def test_near_dup_clusters_default_lsh(spark):
    """Default pair generator (minhash LSH) groups the exact-dup pair and the
    near-dup with it; unrelated docs stay singletons."""
    from goffish_v3_spark.operators.dedup import near_dup_clusters

    out = {
        r.doc_id: r.canonical_id
        for r in near_dup_clusters(
            spark, _docs(spark), jaccard_threshold=0.5
        ).collect()
    }
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == 4 and out[5] == 5


def test_dedup_keep_canonical(spark):
    from goffish_v3_spark.operators.dedup import dedup_keep_canonical

    kept = {
        r.doc_id
        for r in dedup_keep_canonical(
            spark, _docs(spark), jaccard_threshold=0.5
        ).collect()
    }
    assert kept == {1, 4, 5}
