"""Text-analysis operators: token counts, quality, language-ID, fingerprints."""

import pyspark.sql.functions as F

from goffish_v3_spark.operators.text import (
    fingerprint,
    language_id,
    quality_features,
    token_count,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and the cat", "en"),
        (2, "el gato de la casa es muy bonito y los perros tambien", "es"),
        (3, "der hund und die katze sind nicht im haus", "de"),
        (4, "le chat et les chiens mangent des croquettes", "fr"),
        (5, "zzz qqq xxx", "und"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, want string")


def test_language_id(spark):
    got = {r.doc_id: r.lang_pred for r in language_id(_docs(spark)).collect()}
    want = {r.doc_id: r.want for r in _docs(spark).collect()}
    assert got == want


def test_token_count(spark):
    df = spark.createDataFrame([(1, "a b  c\nd")], "id long, text string")
    assert df.select(token_count("text")).collect()[0][0] == 4


def test_token_count_bpe_splits_more(spark):
    df = spark.createDataFrame([(1, "fooBar baz2qux, hello")], "id long, text string")
    ws = df.select(token_count("text")).collect()[0][0]
    bpe = df.select(token_count("text", bpe=True)).collect()[0][0]
    assert bpe > ws


def test_quality_features_ranges(spark):
    out = quality_features(_docs(spark)).collect()
    for r in out:
        assert 0.0 <= r.quality_score <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0
        assert r.n_words > 0
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].quality_score == 1.0  # long clean english text
    assert by_id[5].quality_score < 1.0  # too short


def test_fingerprint_rolling_matches_python_reference(spark):
    from goffish_v3_spark.operators.text import fingerprint_rolling

    MOD, BASE, W = 1_000_000_007, 31, 8

    def ref(text):
        toks = text.strip().split() or [""]
        shingles = [
            " ".join(toks[i : i + W]) for i in range(max(len(toks) - W, 0) + 1)
        ]

        def ph(s):
            h = 0
            for ch in s:
                h = (h * BASE + ord(ch)) % MOD
            return h

        return min(ph(s) for s in shingles)

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again ok"),
        (2, "short"),
        (3, ""),
        (4, "   "),
        (5, "héllo wörld ünïcode façade"),
        (6, "a b c d e f g h i j k l m n o p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.fingerprint for r in fingerprint_rolling(df).collect()}
    assert got == {i: ref(t) for i, t in rows}


def test_fingerprint_deterministic_and_similar_for_near_dups(spark):
    a = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [(1, a), (2, a), (3, "completely different content here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
