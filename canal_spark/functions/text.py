"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All expressions are built-in pyspark.sql.functions (JVM-side, codegen'd) —
no Python in the hot path. Integer-valued features are preferred so results
are bit-stable across engines (the DuckDB oracle hashes values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
}

# a BPE-ish tokenizer regex: words, numbers, or single non-space symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(col) -> F.Column:
    """Whitespace word split with empty-token removal (deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != "")


def _count_word(text_col, word: str) -> F.Column:
    """# of occurrences of ' word ' in ' lower(text) ' — pure length math,
    identical semantics in any SQL engine (oracle-stable)."""
    padded = F.concat(F.lit(" "), F.lower(text_col), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def stopword_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language stopword hit counts (integer features)."""
    t = F.col(text_col)
    out = df
    for lang, sw in STOPWORDS.items():
        expr = None
        for w in sw:
            c = _count_word(t, w)
            expr = c if expr is None else expr + c
        out = out.withColumn(f"sw_{lang}", expr)
    return out


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram-heuristic language ID: argmax of per-language stopword counts
    (ties → 'und' when all zero, else lexicographic first of the max).

    Total over the whole input domain: NULL text → 'und' (counts are NULL in
    every engine, so best IS NULL) — the oracle SQL has the identical branch,
    keeping engine/oracle parity even on data outside today's fixtures
    (ADVICE r01: a dangling ELSE classified NULL text as 'fr' in DuckDB
    while Spark returned NULL)."""
    out = stopword_counts(df, text_col)
    best = F.greatest(*[F.col(f"sw_{lang}") for lang in STOPWORDS])
    guess = F.when(best.isNull() | (best == 0), F.lit("und"))
    for lang in sorted(STOPWORDS):
        guess = guess.when(F.col(f"sw_{lang}") == best, F.lit(lang))
    return out.withColumn("lang_guess", guess.otherwise(F.lit("fr")))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features: lengths, word/punct/digit counts,
    ratios in basis points (integers)."""
    t = F.col(text_col)
    w = words(t)
    n_chars = F.length(t)
    n_words = F.size(w)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    return (
        df.withColumn("n_chars_c", n_chars.cast("long"))
        .withColumn("n_words", n_words.cast("long"))
        .withColumn("n_punct", n_punct.cast("long"))
        .withColumn("n_digit", n_digit.cast("long"))
        .withColumn("n_spaces", n_spaces.cast("long"))
        .withColumn(
            "punct_bp",
            F.when(n_chars > 0, F.floor(n_punct * 10000 / n_chars).cast("long"))
            .otherwise(F.lit(0)),
        )
        .withColumn(
            "avg_word_len_e2",
            F.when(n_words > 0, F.floor((n_chars - n_spaces) * 100 / n_words).cast("long"))
            .otherwise(F.lit(0)),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0, 100] from integer features — the
    heuristic filter a pretraining pipeline runs before tokenization."""
    out = quality_features(stopword_counts(df, text_col), text_col)
    sw_total = sum(F.col(f"sw_{lang}") for lang in STOPWORDS)
    score = (
        F.lit(50)
        + F.least(F.lit(20), F.col("n_words") / 10)
        + F.least(F.lit(20), sw_total * 2)
        - F.least(F.lit(30), F.col("punct_bp") / 100)
        - F.when(F.col("n_words") < 5, F.lit(20)).otherwise(F.lit(0))
    )
    return out.withColumn(
        "quality", F.greatest(F.lit(0).cast("long"), F.least(F.lit(100).cast("long"), F.floor(score).cast("long")))
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counts: whitespace tokens + BPE-ish regex tokens (JVM regex)."""
    t = F.col(text_col)
    return df.withColumn("ws_tokens", F.size(words(t)).cast("long")).withColumn(
        "bpe_tokens", F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0)).cast("long")
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 over the whitespace-normalized,
    lower-cased text (the exact-dedup key), plus a 64-bit rolling hash
    (xxhash64) for compact storage."""
    canon = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fp_md5", F.md5(canon)).withColumn(
        "fp64", F.xxhash64(canon)
    )
