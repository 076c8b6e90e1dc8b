"""Text-analysis column expressions (all JVM-side — no UDFs).

Training-data-pipeline text ops: token counting, quality scoring,
n-gram language ID, document fingerprinting. Each is a pure Column
expression so it stays inside whole-stage codegen and has an exact
ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[A-Za-z0-9]+"
PUNCT_PATTERN = r"[\.,;:!\?]"

# tiny per-language stopword lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
}


def token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, PUNCT_PATTERN, ""))
    return F.when(n > 0, (n - stripped) / n.cast("double")).otherwise(F.lit(0.0))


def _marker_hits(text: Column, words: list[str]) -> Column:
    """Count of whole-word marker occurrences (case-insensitive)."""
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))


def stopword_ratio(text: Column) -> Column:
    hits = _marker_hits(text, [w for ws in LANG_MARKERS.values() for w in ws])
    toks = token_count(text)
    return F.when(toks > 0, hits / toks.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + punctuation
    sanity + stopword presence (the template-summary fallback spirit of
    the reference's SummaryGenerator, src/modules/summary-generator.ts:
    74-148 — deterministic content sniffing, no model)."""
    toks = token_count(text).cast("double")
    len_score = F.least(toks / F.lit(50.0), F.lit(1.0))
    punct = punct_ratio(text)
    punct_score = F.when(punct <= 0.1, F.lit(1.0)).otherwise(
        F.greatest(F.lit(0.0), F.lit(1.0) - (punct - 0.1) * 5.0)
    )
    stop_score = F.least(stopword_ratio(text) * F.lit(10.0), F.lit(1.0))
    return F.round((len_score + punct_score + stop_score) / 3.0, 6)


def lang_guess(text: Column) -> Column:
    """Argmax language over marker-word hit counts; 'und' if no hits.
    Ties break in fixed key order (en, es, de)."""
    scores = {lang: _marker_hits(text, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-collapsed lowercase text
    (the reference's content_hash, src/modules/file-scanner.ts:195,
    switched to md5+normalization as the near-dup-friendly variant)."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(norm)


def filter_cascade_verdict(
    text: Column, lang: Column, n_chars: Column, target_lang: str = "en"
) -> Column:
    """C4/CCNet-style quality-filter cascade verdict with FIRST-FAILING-
    RULE attribution (the ablation-ledger semantics of a sequential
    filter pipeline): r1 too-short → r2 wrong-language → r3 digit-heavy
    (5·digits > chars) → r4 long-words (alnum > 12·tokens) → 'kept'.
    Pure integer length arithmetic — identical under batch and
    Structured Streaming (stateless projection), and replayable in
    ANSI SQL (the d_filter_cascade oracle twin)."""
    digits = F.length(text) - F.length(F.regexp_replace(text, "[0-9]", ""))
    alnum = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))
    ntoks = F.size(
        F.filter(
            F.split(
                F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")),
                " ",
            ),
            lambda t: t != "",
        )
    )
    return (
        F.when(n_chars < 200, "r1_too_short")
        .when(lang != target_lang, "r2_not_target_lang")
        .when(digits * 5 > n_chars, "r3_digit_heavy")
        .when(alnum > ntoks * 12, "r4_long_words")
        .otherwise("kept")
    )


# PII patterns shared by the scan entry (d_pii_scan) and the redactor —
# one definition so the pre-screen counts exactly what redaction removes.
PII_PATTERNS = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "URL": r"https?://[^\s]+",
    "PHONE": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "IP": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def redact_pii(text: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """PII REDACTION (the transform the d_pii_scan pre-screen precedes):
    each matched span is replaced by a fixed typed placeholder
    (``<EMAIL>``, ``<URL>``, ``<PHONE>``, ``<IP>``) — the standard
    corpus-release treatment (placeholder over deletion so sentence
    structure and token counts stay stable). Pure JVM regexp_replace
    chain — whole-stage codegen, no UDF, order fixed (EMAIL before
    URL so mailto-like text can't double-match; PHONE after URL so
    digits inside URLs are already collapsed). Deterministic and
    idempotent: placeholders match no pattern."""
    order = kinds if kinds is not None else ("EMAIL", "URL", "PHONE", "IP")
    out = text
    for kind in order:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind}>")
    return out
