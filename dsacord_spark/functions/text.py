"""Text-analysis column builders over the `documents` table: tokenization,
token counts, quality scoring, language ID, shingling, fingerprinting.

All pure Column expressions (JVM-side, codegen'd) — no Python in the hot
path. Each has a matching ANSI-SQL rendering for the DuckDB oracle; the
regexes are restricted to syntax Java regex and RE2 interpret identically.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from dsacord_spark.functions.hashing import md5_long

# Word-ish tokens: letter runs, digit runs, or single punctuation — a
# BPE-style pre-tokenizer split (letters/digits/other classes).
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "dans", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "en", "que", "por"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace-split tokens of trimmed text (empty text -> empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), "\\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def regex_tokens(col: Column | str) -> Column:
    """BPE-ish regex tokenization (letter runs / digit runs / punctuation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(TOKEN_RE), 0)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are punctuation-ish (non-alnum, non-space)."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, "[^A-Za-z0-9\\s]", "")
    return (F.length(c) - F.length(stripped)).cast("double") / F.length(c)


def stopword_hits(col: Column | str, words: list[str]) -> Column:
    """Number of stopword occurrences (word-boundary matches, lowercase)."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = "\\b(" + "|".join(words) + ")\\b"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pattern), 0))


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Stopword-hit count per candidate language."""
    return {lang: stopword_hits(col, ws) for lang, ws in LANG_MARKERS.items()}


def lang_id(col: Column | str) -> Column:
    """Argmax language by stopword hits; ties and zero hits -> 'und'
    (undetermined). Deterministic tie-break: languages in LANG_MARKERS
    order, first max wins — the oracle SQL mirrors the same CASE chain."""
    scores = lang_scores(col)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("und")
    # Build reversed so earlier languages take precedence on ties.
    for lang in reversed(langs):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(col: Column | str) -> Column:
    """Heuristic quality in [0,1]: length band + low punctuation + stopword
    presence. Mirrors common LLM-data quality filters (length, symbol
    ratio, stopword ratio) — each term is SQL-expressible."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    len_term = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_term = F.when(punct_ratio(c) < 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    stop_term = F.when(
        stopword_hits(c, LANG_MARKERS["en"]).cast("double") / F.greatest(n_tok, F.lit(1.0)) > 0.01,
        F.lit(0.3),
    ).otherwise(F.lit(0.0))
    return len_term + punct_term + stop_term


def quality_score10(col: Column | str) -> Column:
    """quality_score rendered in integer tenths (4+3+3 instead of
    .4+.3+.3): the SAME double-valued conditions (length band, punct
    ratio, stopword ratio), but integer terms, so threshold grids over
    the score never sit on float-sum grid points (0.4+0.3 is
    0.7000000000000001 in IEEE — identical in both engines, but an
    integer grid removes the hazard class entirely). Kept in lockstep
    with quality_score by tests/test_text_functions.py (score10 ==
    round(quality*10) over the corpus)."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    len_term = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(4)).otherwise(F.lit(0))
    punct_term = F.when(punct_ratio(c) < 0.2, F.lit(3)).otherwise(F.lit(0))
    stop_term = F.when(
        stopword_hits(c, LANG_MARKERS["en"]).cast("double") / F.greatest(n_tok, F.lit(1.0)) > 0.01,
        F.lit(3),
    ).otherwise(F.lit(0))
    return len_term + punct_term + stop_term


def char_shingles(col: Column | str, k: int = 8) -> Column:
    """Distinct k-character shingles of lowercased text (classic near-dup
    unit). Pure expressions: substring at each offset via sequence+transform,
    then array_distinct."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    n = F.length(low)
    offsets = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(offsets, lambda i: low.substr(i, F.lit(k)))
    )


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) of the token stream."""
    toks = tokens(col)
    count = F.size(toks)
    offsets = F.sequence(F.lit(1), F.greatest(count - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(offsets, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic 60-bit document fingerprint: md5_long of
    whitespace-normalized lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")
    return md5_long(normalized)
