"""Text analysis for training-data pipelines — language ID, quality
scoring, token counting, document fingerprinting.  All native column
expressions (whole-stage codegen; no UDFs), each reproducible in ANSI
SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# Function-word list for the n-gram/stopword language heuristic.  A real
# pipeline ships per-language tables; the mechanism (token-set overlap
# ratio against a broadcast lexicon) is what matters at scale.
EN_STOPWORDS = (
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "an", "be", "or", "this", "are",
)

TOKEN_REGEX = r"[a-z0-9]+"  # BPE-ish lowercase alnum runs


def words(text) -> F.Column:
    return F.split(text, " ")


def n_tokens(text) -> F.Column:
    """Whitespace token count."""
    return F.size(words(text))


def n_regex_tokens(text) -> F.Column:
    """Regex token count (lowercase alnum runs)."""
    return F.regexp_count(F.lower(text), F.lit(TOKEN_REGEX))


def stopword_count(text) -> F.Column:
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    return F.size(F.filter(words(F.lower(text)), lambda w: F.array_contains(sw, w)))


def quality_features(text) -> dict[str, F.Column]:
    """Length / punctuation / stopword-ratio features (integer-valued or
    exactly-representable ratios where possible)."""
    nt = n_tokens(text)
    return {
        "n_chars": F.length(text),
        "n_tokens": nt,
        "n_stopwords": stopword_count(text),
        "n_punct": F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", "")),
        "mean_token_len": F.round(
            (F.length(text) - nt + 1).cast("double") / nt.cast("double"), 4
        ),
    }


def lang_id(text, threshold_num: int = 1, threshold_den: int = 20) -> F.Column:
    """Heuristic language ID: 'en' iff stopword fraction >= num/den.

    Integer cross-multiplication keeps the decision reproducible:
    stopwords/tokens >= num/den  <=>  den*stopwords >= num*tokens.
    """
    return F.when(
        F.lit(threshold_den) * stopword_count(text) >= F.lit(threshold_num) * n_tokens(text),
        F.lit("en"),
    ).otherwise(F.lit("other"))


def fingerprint64(text) -> F.Column:
    """Order-invariant-normalized content fingerprint: md5-derived 63-bit
    hash of the lowercased, whitespace-collapsed text (the exact-dup
    key; reference analogue sha224 content hash,
    /root/reference/src/RessourceFactory.py:29)."""
    norm = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")
