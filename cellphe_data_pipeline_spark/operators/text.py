"""Text-analysis operators (training-data-pipeline extensions).

Language-ID (stopword-hit heuristic), quality scoring, token counting,
and document fingerprinting — all pure Column expressions (regexp +
arithmetic inside whole-stage codegen; zero Python per row, so the hot
path scans 100 TB at parquet-read speed with full column pruning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "und", "die", "das", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "une"],
}

TOKEN_RE = "[a-zA-Z0-9]+"


def _hit_count(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("bigint")


def token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)).cast("bigint")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: token count, punctuation ratio,
    stopword ratio, average token length, and a bounded linear quality
    score (deliberately exp-free: libm vs JVM transcendentals differ in
    the last ulp, which would break oracle hash equality)."""
    text = F.col(text_col)
    n_tok = token_count(text)
    n_chars = F.length(text).cast("bigint")
    stripped = F.regexp_replace(text, "[^a-zA-Z0-9 ]", "")
    punct_ratio = (n_chars - F.length(stripped)).cast("double") / n_chars
    stop_ratio = _hit_count(text, STOPWORDS["en"]).cast("double") / n_tok
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "n_chars_calc": n_chars,
            "punct_ratio": F.round(punct_ratio, 6),
            "stopword_ratio": F.round(stop_ratio, 6),
            "avg_token_len": F.round(n_chars.cast("double") / n_tok, 6),
            "quality_score": F.round(
                F.least(F.lit(1.0), n_tok.cast("double") / 400.0) * (1.0 - punct_ratio), 6
            ),
        }
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic n-gram/stopword language ID: hit counts per language
    wordlist, argmax with fixed tie-break order (en > de > fr)."""
    text = F.col(text_col)
    en, de, fr = (_hit_count(text, STOPWORDS[lang]) for lang in ("en", "de", "fr"))
    pred = (
        F.when((en >= de) & (en >= fr), F.lit("en"))
        .when(de >= fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return df.withColumns({"en_hits": en, "de_hits": de, "fr_hits": fr, "lang_pred": pred})


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical-form content fingerprint: lowercase, strip non-alnum,
    md5. `fp_band` (first 4 hex chars) gives 65k shard buckets for
    distributing fingerprint joins without skew."""
    canon = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    return df.withColumns(
        {
            "fp": F.md5(canon),
            "fp_band": F.substring(F.md5(canon), 1, 4),
        }
    )
