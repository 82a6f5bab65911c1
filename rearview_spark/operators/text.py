"""Text-analysis operators for large-scale training-data pipelines.

Not part of rearview parity (the reference has no text processing); these
are the BASELINE.json north-star extensions, built JVM-side wherever
possible: tokenization, counting, quality scoring and fingerprinting are
pure ``pyspark.sql.functions`` expressions (whole-stage codegen, no Python
in the hot path), so they scale linearly over a 100 TB documents table with
zero shuffle — every operator here is a narrow map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny embedded English stopword list (public, universal). Kept short so the
# SQL oracle can inline the same list.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are",
)


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse whitespace, trim — the canonical form every
    dedup/fingerprint operator keys on."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokenization of normalized text -> array<string>."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Rough BPE-style token estimate: word-piece regex split — words,
    numbers, and individual punctuation count separately (a common
    public heuristic: ~1 token per word-piece)."""
    pieces = F.regexp_extract_all(F.lower(col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    return F.size(pieces)


def _stopword_array_sql() -> str:
    return "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


def stopword_ratio(col: Column) -> Column:
    """Fraction of tokens that are stopwords (occurrence-weighted)."""
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits.cast("double") / F.size(toks)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor space."""
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.length(stripped).cast("double") / F.length(col)


def mean_token_length(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x)
    return total.cast("double") / F.size(toks)


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0, 1]:
    0.4 * length factor (saturates at 200 tokens)
    + 0.3 * stopword presence (saturates at ratio 0.2 — natural prose)
    + 0.3 * (1 - punctuation excess beyond 10% of chars).
    Deterministic closed-form arithmetic so the oracle reproduces it."""
    n = token_count(col).cast("double")
    len_factor = F.least(n / 200.0, F.lit(1.0))
    stop_factor = F.least(stopword_ratio(col) / 0.2, F.lit(1.0))
    punct_factor = F.lit(1.0) - F.least(punct_ratio(col) / 0.1, F.lit(1.0))
    return 0.4 * len_factor + 0.3 * stop_factor + 0.3 * punct_factor


def fingerprint_md5(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (The rolling/Karp-Rabin variant is `rolling_fingerprint` below.)"""
    return F.md5(normalize_text(col))


def rolling_fingerprint(col: Column, window: int = 8) -> Column:
    """Winnowing-style fingerprint: the minimum 60-bit hash over all
    ``window``-token shingles of the document — robust to local edits
    (public winnowing/MOSS scheme, simplified to global-min).

    Pure JVM expression: shingle via transform/slice, hash via md5-prefix.
    """
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1)))
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, window)))
    hashes = F.transform(
        shingles, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    )
    return F.array_min(hashes)


def lang_id(col: Column, threshold: float = 0.08) -> Column:
    """Heuristic language ID: if the occurrence-weighted English-stopword
    ratio exceeds ``threshold`` the text is tagged 'en', else 'unk'.
    (A real model is out of scope; the Spark plumbing — pure column
    expression, no UDF — is the point.)"""
    return F.when(stopword_ratio(col) > threshold, F.lit("en")).otherwise(F.lit("unk"))


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full feature set as columns (single projection)."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        F.round(stopword_ratio(c) + F.lit(5e-10), 6).alias("stop_ratio"),
        F.round(punct_ratio(c) + F.lit(5e-10), 6).alias("punct_ratio"),
        F.round(mean_token_length(c) + F.lit(5e-10), 6).alias("mean_tok_len"),
        F.round(quality_score(c) + F.lit(5e-10), 6).alias("quality"),
        fingerprint_md5(c).alias("fp_md5"),
        lang_id(c).alias("lang_pred"),
    )
