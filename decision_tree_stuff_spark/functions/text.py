"""Text-analysis expressions for the ``documents`` table (SURVEY.md
§2.5 E-4; training-data-pipeline text ops).

All built-in string/array functions — tokenization, counting, ratio
math and fingerprinting stay inside codegen. Every helper documents
its exact DuckDB-SQL twin so `__spark_entry__.oracle_sql` can assert
value parity. Regex patterns are restricted to the ASCII subset where
Java regex (Spark) and RE2-ish (DuckDB) agree.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists for the language-ID heuristic.
# Order of LANGS is the tie-break (first wins on equal scores).
LANG_STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"],
    "es": ["el", "la", "y", "de", "un", "una", "es", "que", "por", "para"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "zu", "von", "mit"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"],
}
LANGS = list(LANG_STOPWORDS)

# English stopwords double as the generic quality-scoring list.
QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def normalize_text(text: Column) -> Column:
    """lower + whitespace collapse + trim.

    DuckDB: ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``.
    """
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokens(text: Column) -> Column:
    """Whitespace tokens of the normalized text.

    DuckDB: ``string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')``.
    """
    return F.split(normalize_text(text), " ")


def tokens_from_norm(norm: Column) -> Column:
    """Tokens of an ALREADY-normalized column. Use when several
    expressions share one normalization: Catalyst does not eliminate
    common subexpressions across lambda boundaries, so inlining
    ``normalize_text`` into each consumer re-runs the regex per
    consumer (and per array element inside ``transform`` lambdas —
    measured 6× on document_stats)."""
    return F.split(norm, " ")


def stop_hits(toks: Column, stopwords: List[str]) -> Column:
    """Count of tokens present in the stopword list."""
    return F.size(F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in stopwords])))


def shingle_fingerprint_from_norm(norm: Column, k: int = 8) -> Column:
    """Min-md5 k-shingle fingerprint over a pre-normalized column —
    see ``shingle_fingerprint``."""
    return F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - k + 1, F.lit(1))),
            lambda i: F.md5(F.substring(norm, i, k)),
        )
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style tokenization approximated in the regex subset Java and
# RE2 share (no lookaheads): letter runs | digit runs | single
# non-alnum-non-space chars, over the normalized text.
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish subword-boundary tokens.

    DuckDB: ``regexp_extract_all(<norm>, '[a-z]+|[0-9]+|[^a-z0-9 ]')``
    (group 0 is DuckDB's default; Spark must pass idx=0 explicitly).
    """
    return F.regexp_extract_all(normalize_text(text), F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(bpe_ish_tokens(text))


def shingle_fingerprint(text: Column, k: int = 8) -> Column:
    """Rolling-hash document fingerprint: minimum md5 over all
    character k-shingles of the normalized text (the min-hash member
    of a winnowing scheme; md5 because it is the one hash Spark and
    DuckDB share byte-for-byte).

    DuckDB: ``list_min(list_transform(range(1, greatest(length(t)-k+2, 2)),
    i -> md5(substr(t, CAST(i AS INT), k))))`` over the same
    normalized text.
    """
    # sequence() is upper-INCLUSIVE (DuckDB's range() is exclusive):
    # last start index is len-k+1, else a truncated trailing shingle
    # sneaks into the min. NOTE: inlines the normalization into every
    # lambda iteration — for bulk use, project the norm column once
    # and call shingle_fingerprint_from_norm.
    return shingle_fingerprint_from_norm(normalize_text(text), k)


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of the normalized text — md5 is
    byte-identical across Spark and DuckDB (unlike xxhash64/hash()).

    DuckDB: ``md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))``.
    """
    return F.md5(normalize_text(text))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII punctuation.

    DuckDB: ``(length(text) - length(regexp_replace(text,
    '[!-/:-@\\[-`{-~]', '', 'g'))) / greatest(length(text), 1)``.
    """
    stripped = F.regexp_replace(text, r"[!-/:-@\[-`{-~]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(
        F.length(text), F.lit(1)
    ).cast("double")


def stopword_ratio(text: Column, stopwords: List[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords.

    DuckDB: ``len(list_filter(<tokens>, t -> list_contains(<list>, t)))
    / greatest(len(<tokens>), 1)``.
    """
    stops = stopwords if stopwords is not None else QUALITY_STOPWORDS
    toks = tokens(text)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in stops]))
    )
    return hits / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0, 1]:
    0.4·stopword_ratio + 0.3·min(1, tokens/100) + 0.3·(1 − punct_ratio).
    """
    length_score = F.least(F.lit(1.0), token_count(text) / F.lit(100.0))
    return (
        0.4 * stopword_ratio(text)
        + 0.3 * length_score
        + 0.3 * (1.0 - punct_ratio(text))
    )


def lang_scores(text: Column) -> Dict[str, Column]:
    """Per-language stopword hit counts over the token set."""
    toks = tokens(text)
    return {
        lang: F.size(
            F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in stops]))
        )
        for lang, stops in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """N-gram/stopword language-ID heuristic: argmax of per-language
    stopword hits; ties resolve to the earlier language in LANGS;
    all-zero scores → 'und' (undetermined).

    DuckDB twin: ``CASE WHEN greatest(...) = 0 THEN 'und' WHEN s_en =
    greatest(...) THEN 'en' WHEN s_fr = ... END`` — a first-match CASE
    chain over the max score.
    """
    scores = lang_scores(text)
    m = F.greatest(*[scores[lang] for lang in LANGS])
    result = F.when(m == 0, F.lit("und"))
    for lang in LANGS:
        result = result.when(scores[lang] == m, F.lit(lang))
    return result


# PII patterns in the regex subset Java (Spark) and RE2 (DuckDB)
# share — no lookarounds, no backreferences; \b and bounded repeats
# work identically in both. Order matters: IPv4 before any future
# phone-like pattern so digit runs are claimed by the more specific
# rule first. (name, pattern, replacement) triples; extend by passing
# a custom tuple to scrub_pii/pii_counts.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
)


def scrub_pii(text: Column, patterns=PII_PATTERNS) -> Column:
    """Redact PII spans with typed placeholder tokens — the standard
    pre-release scrubbing stage (BigScience/ROOTS ran exactly this
    shape of regex pipeline at corpus scale). Sequential
    ``regexp_replace`` chain: one narrow projection, no shuffle, no
    UDF.

    DuckDB twin: the same chain with ``regexp_replace(..., 'g')``
    (DuckDB replaces only the first match without the flag; Spark
    always replaces all).
    """
    out = text
    for _, pat, repl in patterns:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column, patterns=PII_PATTERNS):
    """Dict of per-category match-count Columns (bigint).

    DuckDB twin: ``len(regexp_extract_all(text, pattern))`` — group 0
    is DuckDB's default; Spark passes idx=0 explicitly."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("bigint")
        for name, pat, _ in patterns
    }
