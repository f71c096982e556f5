"""Text analysis operators — quality scoring, token counting, language
ID, document fingerprinting. All JVM-side column expressions (no Python)
so they run at full codegen speed over a 100 TB corpus; each operator
has an ANSI-SQL twin used by the DuckDB correctness oracle where the
dialects agree (see __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "in", "zu", "den", "mit", "von", "ist"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "une", "est"],
}


def _words(text_col: str) -> Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def token_count_col(text_col: str) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    t = F.trim(F.col(text_col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics: char/token counts, average token
    length, punctuation ratio, stopword ratio (en), a composite score."""
    words = _words(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = token_count_col(text_col)
    n_punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[.,;:!?]", "")
    )
    sw = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    avg_tok = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        avg_tok.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID: argmax over per-language stopword hit
    counts, 'und' when no list scores > 0. Pure column expressions —
    a greatest/when cascade over the fixed language set."""
    words = _words(text_col)

    def hit_counter(arr):
        # single-arg lambda: a 2-arg lambda would be read as (element, index)
        return lambda w: F.array_contains(arr, w)

    scores = {}
    for lang, sws in _STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in sws])
        scores[lang] = F.size(F.filter(words, hit_counter(arr)))
    langs = sorted(_STOPWORDS)  # deterministic tie order: alphabetical wins
    best = F.greatest(*[scores[l] for l in langs])
    pred: Column = F.lit("und")
    for lang in reversed(langs):
        pred = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(pred)
    out = df.select(F.col(id_col), pred.alias("pred_lang"))
    return out


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling polynomial fingerprint:
    acc = (acc * 31 + xxhash64(word) mod P) mod P with P a prime near
    2^40 — modular so ANSI int64 arithmetic never overflows.
    Distinguishes permuted documents a bag-of-words hash conflates."""
    P = 1099511627689  # prime < 2^40; acc*31 + h stays < 2^46
    words = _words(text_col)
    fp = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(acc * F.lit(31) + F.pmod(F.xxhash64(w), F.lit(P)), F.lit(P)),
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))
