"""Text-analysis column expressions for large-scale corpus processing.

All functions return Spark ``Column``s built from native functions
(split / filter / transform / xxhash64 …) so they run inside
whole-stage codegen — no Python in the row loop. Designed for the
``documents(doc_id, text, lang, source, n_chars)`` corpus shape but
applicable to any string column.

The deterministic formulas here are mirrored 1:1 in the DuckDB oracle
SQL of ``queries/textops.py`` — change one, change both.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Language-marker stopword lists for the n-gram/stopword-ratio
# heuristic language detector. Deliberately tiny and deterministic.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr": ("le", "la", "et", "les", "des", "en", "un", "du", "que", "pour"),
    "de": ("der", "die", "und", "das", "den", "von", "zu", "mit", "ist", "des"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (single split, reused by everything)."""
    return F.split(text, r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer, restricted to the syntax subset that Java
# regex (Spark) and RE2 (DuckDB) interpret identically: contractions,
# space-prefixed letter runs, digit runs, punctuation runs. No
# lookahead, no unicode property classes — and no bare \s: Python's \s
# is Unicode (NBSP, \x85, ideographic space) while Java/RE2 default to
# ASCII-ish sets, so the same document would pre-tokenize differently
# in the Arrow encode kernel (Python) vs the fit (JVM) vs the oracle
# (RE2). The explicit hex class below is byte-identical in all three
# engines (ADVICE r08).
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f\x0B]+"


def bpe_token_count(text: Column | str) -> Column:
    """Subword-ish token count via the BPE pre-tokenizer regex — the
    cheap corpus-size estimator used to budget LLM training tokens
    (counts pre-merge word pieces; real BPE merges only reduce it)."""
    return F.regexp_count(F.col(text) if isinstance(text, str) else text, F.lit(BPE_ISH_PATTERN))


def stopword_count(text: Column | str, lang: str = "en") -> Column:
    """Count of tokens in the language's stopword list — a JVM-side
    lambda filter over the token array, no UDF."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(words, t)))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/whitespace."""
    col = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.nullif(F.length(col), F.lit(0))


def quality_score(text: Column | str) -> Column:
    """Deterministic document-quality logistic score in [0, 1]:
    rewards length and stopword density, penalizes punctuation noise
    (the classic Gopher/C4-style heuristic family, simplified)."""
    n_tok = token_count(text).cast("double")
    sw_ratio = stopword_count(text, "en").cast("double") / F.nullif(n_tok, F.lit(0.0))
    p_ratio = punct_ratio(text)
    z = 0.01 * n_tok + 2.0 * sw_ratio - 5.0 * p_ratio - 1.0
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit ratio — the detector's evidence."""
    n_tok = token_count(text).cast("double")
    return {
        lang: stopword_count(text, lang).cast("double") / F.nullif(n_tok, F.lit(0.0))
        for lang in STOPWORDS
    }


def detect_lang(text: Column | str, min_ratio: float = 0.02) -> Column:
    """argmax over language stopword ratios; 'und' if no language
    exceeds ``min_ratio``. Deterministic tie-break: listing order in
    STOPWORDS (en beats es beats fr beats de on equal scores) — an
    explicit CASE cascade mirrored verbatim in the DuckDB oracle."""
    scores = lang_scores(text)
    langs = list(scores)
    result = None
    for i, lang in enumerate(langs):
        cond = scores[lang] > min_ratio
        for later in langs[i + 1 :]:
            cond = cond & (scores[lang] >= scores[later])
        result = (result.when if result is not None else F.when)(cond, F.lit(lang))
    return result.otherwise(F.lit("und"))


def normalized_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse
    whitespace, strip non-alphanumerics."""
    col = F.col(text) if isinstance(text, str) else text
    cleaned = F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Content fingerprint = md5 of the normalized text (exact-dup key
    robust to case/whitespace/punctuation noise)."""
    return F.md5(normalized_text(text))


# PII redaction patterns, restricted to the syntax subset Java regex
# (Spark) and RE2 (DuckDB) interpret identically: character classes,
# bounded repetition, word boundaries — no lookaround, no unicode
# property classes, no backreferences. Order matters and is part of
# the contract: EMAIL first (emails contain digit runs and dots that
# the later patterns could nibble), then the longest digit shapes
# (CARD) before the shorter ones (SSN, PHONE), IP last (dotted quads
# are disjoint from the dashed shapes). The same (pattern, token)
# sequence is applied verbatim in the DuckDB oracle of
# ``queries/corpusops.py::doc_pii_redaction`` — change one, change
# both.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("cards", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    ("ssns", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phones", r"\+\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(text: Column | str) -> Column:
    """Sequentially replace every PII_PATTERNS match with its typed
    token — chained native ``regexp_replace``, whole-stage codegen,
    no Python in the row loop. Sequential order means an earlier
    pattern's token is never re-matched by a later pattern (the
    tokens contain no digits or '@')."""
    col = F.col(text) if isinstance(text, str) else text
    for _, pattern, token in PII_PATTERNS:
        col = F.regexp_replace(col, pattern, token)
    return col


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-type match counts on the RAW text. Counts are independent
    per pattern: a span can contribute to two counters when one shape
    nests inside another (a dotted quad inside an email's domain
    counts as both an email and an ip even though redaction consumes
    it as the email) — the counters audit raw exposure, the redacted
    text is the authority on what was removed."""
    col = F.col(text) if isinstance(text, str) else text
    return {
        name: F.regexp_count(col, F.lit(pattern)).cast("long")
        for name, pattern, _ in PII_PATTERNS
    }
