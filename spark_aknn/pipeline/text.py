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


# rolling-fingerprint modulus: prime < 2^40, so acc*31 + h < 2^46 and
# ANSI int64 arithmetic never overflows in either engine
_FP_P = 1099511627689
# BPE-ish tokenizer: letter runs, digit runs, punctuation runs, each
# with an optional leading space (a simplified GPT-2-style pattern kept
# to constructs Java regex and RE2/DuckDB interpret identically)
_BPE_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def _word_hash48(w) -> Column:
    """48-bit word hash both engines compute identically: first 12 hex
    chars of md5 read as a (positive) integer — Spark conv vs DuckDB
    '0x' cast; positivity keeps % / pmod semantics aligned."""
    return F.conv(F.substring(F.md5(w), 1, 12), 16, 10).cast("long")


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling polynomial fingerprint:
    acc = (acc * 31 + h48(word) mod P) mod P, P prime < 2^40.
    Distinguishes permuted documents a bag-of-words hash conflates;
    SQL-expressible (DuckDB twin: fingerprint_duckdb_cte) so the driver
    oracle checks it value-exactly."""
    words = _words(text_col)
    fp = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(acc * F.lit(31) + F.pmod(_word_hash48(w), F.lit(_FP_P)), F.lit(_FP_P)),
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def fingerprint_duckdb_sql(table: str = "documents") -> str:
    """DuckDB twin of doc_fingerprint (list_reduce fold seeded by a
    prepended 0, matching Spark's aggregate initial accumulator)."""
    h = "(('0x' || substr(md5(w), 1, 12))::BIGINT % 1099511627689)"
    return f"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(string_split_regex(lower(trim(text)), '\\s+'),
                          w -> {h})),
         (acc, h) -> (acc * 31 + h) % 1099511627689
       ) AS fingerprint
FROM {table}
"""


def token_count_bpe(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Sub-word-ish token count via the BPE-style regex — the closer
    proxy for LLM token budgets than whitespace splitting. Pure JVM
    regexp_extract_all; identical DuckDB twin."""
    n = F.size(F.regexp_extract_all(F.col(text_col), F.lit(_BPE_PATTERN), F.lit(0)))
    return df.select(F.col(id_col), n.cast("int").alias("n_bpe_tokens"))


def token_bpe_duckdb_sql(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+')) AS INTEGER)
         AS n_bpe_tokens
FROM {table}
"""


def language_id_duckdb_sql(table: str = "documents") -> str:
    """DuckDB twin of language_id — the same greatest/CASE cascade with
    the same alphabetical tie order."""
    langs = sorted(_STOPWORDS)
    scores = {
        lang: (
            "len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
            f"w -> list_contains({_STOPWORDS[lang]!r}, w)))"
        )
        for lang in langs
    }
    best = "greatest(" + ", ".join(scores[l] for l in langs) + ")"
    case = "CASE "
    for lang in langs:  # first match wins = alphabetical tie order
        case += f"WHEN {best} > 0 AND {scores[lang]} = {best} THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"SELECT doc_id, {case} AS pred_lang FROM {table}"
