"""Text-analysis operators for training-data pipelines over ``documents``.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd): tokenization via regexp split, language-ID via
stopword-hit counting, quality scoring via length/punctuation/stopword
ratios, fingerprinting via content hashing. No per-row Python anywhere.

These are engine features beyond the reference (which has no text layer);
they exercise the same scan/project/aggregate machinery at 100 TB document
scale where predicate pushdown and column pruning decide the cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"

# tiny per-language stopword marker lists for the n-gram/stopword heuristic;
# deterministic and cheap — real pipelines would swap in fastText et al.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (BPE-ish regexp splitting available via
    ``token_count(bpe=True)``)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(text), _WS)


def token_count(text: Column | str, bpe: bool = False) -> Column:
    """#tokens; ``bpe=True`` approximates subword counts by splitting on
    whitespace + punctuation + camelCase-ish digit/letter boundaries."""
    text = F.col(text) if isinstance(text, str) else text
    if not bpe:
        return F.size(tokens(text))
    return F.size(
        F.filter(
            F.split(text, r"[\s\.,;:!?\(\)\[\]{}\"']+|(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=\d)"),
            lambda t: F.length(t) > 0,
        )
    )


def word_hits(text: Column, words: list[str]) -> Column:
    """Total occurrences of any of ``words`` as whole words."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def language_scores(text: Column | str) -> dict[str, Column]:
    text = F.col(text) if isinstance(text, str) else text
    return {lang: word_hits(text, ws) for lang, ws in LANG_MARKERS.items()}


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``lang_pred`` = argmax stopword-hit language ('und' if no hits);
    ties break alphabetically (deterministic)."""
    scores = language_scores(F.col(text_col))
    # max(struct(hits, -idx)) picks highest hits; ties → lowest idx, i.e. the
    # alphabetically-first language (deterministic)
    pairs = F.array(
        *[
            F.struct(
                s.alias("hits"),
                F.lit(-i).alias("ni"),
                F.lit(l).alias("lang"),
            )
            for i, (l, s) in enumerate(sorted(scores.items()))
        ]
    )
    best = F.array_max(pairs)
    return df.withColumn(
        "lang_pred", F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append deterministic quality features used by filter pipelines:
    n_chars, n_words, mean_word_len, punct_ratio, stopword_ratio, upper_ratio
    and a composite ``quality_score`` in [0,1]."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = token_count(t)
    n_punct = F.length(F.regexp_replace(t, r"[^\.,;:!?]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    n_stop = word_hits(t, LANG_MARKERS["en"])
    out = (
        df.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("n_words", n_words.cast("long"))
        .withColumn(
            "mean_word_len",
            F.round((n_chars - n_words + 1) / F.greatest(n_words, F.lit(1)), 6),
        )
        .withColumn("punct_ratio", F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("upper_ratio", F.round(n_upper / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn(
            "stopword_ratio", F.round(n_stop / F.greatest(n_words, F.lit(1)), 6)
        )
    )
    score = (
        F.when((F.col("n_words") >= 5) & (F.col("n_chars_calc") >= 30), 0.4).otherwise(0.0)
        + F.when(F.col("punct_ratio") <= 0.2, 0.3).otherwise(0.0)
        + F.when(F.col("mean_word_len").between(2.0, 12.0), 0.3).otherwise(0.0)
    )
    return out.withColumn("quality_score", F.round(score, 6))


def shingles(text: Column | str, window: int) -> Column:
    """All ``window``-token shingles as strings (a doc shorter than the
    window yields its single whole-doc shingle). THE canonical shingle
    builder — fingerprinting and the dedup operators all share it, and the
    DuckDB oracle twins replicate exactly this expression; keep any change
    mirrored there."""
    toks = tokens(text)
    n = F.size(toks)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n - window, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, window)),
    )


def fingerprint(df: DataFrame, text_col: str = "text", window: int = 8) -> DataFrame:
    """Append a 64-bit document fingerprint: min of xxhash64 over the
    document's ``window``-token shingles (a winnowing-style rolling-hash
    sketch, computed fully JVM-side)."""
    return df.withColumn(
        "fingerprint",
        F.array_min(
            F.transform(shingles(F.col(text_col), window), lambda s: F.xxhash64(s))
        ),
    )


def polyhash(s: Column, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Base-``base`` polynomial hash of a string's Unicode codepoints mod
    ``mod`` — the classic rolling hash, fully JVM-side. Unlike xxhash64 it
    has an exact ANSI-SQL twin (DuckDB ``list_reduce`` over
    ``unicode(char)``), so fingerprints built from it are oracle-checkable.
    The ``c != 0`` filter drops the empty-string artifact of char-splitting
    (``ascii('') = 0``) so ``polyhash('') = 0`` on both engines; mod < 2^31
    keeps ``acc*base + c`` within long range."""
    cps = F.filter(F.transform(F.split(s, ""), F.ascii), lambda c: c != 0)
    return F.aggregate(
        cps, F.lit(0).cast("long"), lambda acc, c: (acc * base + c) % mod
    )


def fingerprint_rolling(
    df: DataFrame, text_col: str = "text", window: int = 8, mod: int = 1_000_000_007
) -> DataFrame:
    """Deterministic twin of :func:`fingerprint`: the same winnowing shape
    (min over ``window``-token shingles) with :func:`polyhash` as the
    shingle hash instead of xxhash64. Slightly weaker as a hash (mod-p
    polynomial vs 64-bit avalanche) but bit-reproducible across engines —
    use where the fingerprint must be auditable outside Spark."""
    return df.withColumn(
        "fingerprint",
        F.array_min(
            F.transform(shingles(F.col(text_col), window), lambda s: polyhash(s, mod))
        ),
    )
