"""Text-analysis column functions (SURVEY.md §2 B12 + north-star text ops).

All of these are pure Catalyst expressions (no Python in the hot path):
tokenization, shingling, token counting, language-ID scoring, quality
scoring, and document fingerprinting run inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A BPE-ish tokenizer regex: word pieces or single non-word non-space
# characters — an approximation of subword pre-tokenization.
BPE_TOKEN_RE = r"[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]"

# Tiny deterministic stopword lists for the language-ID heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization, dropping empty tokens (the reference's
    empty-value filter semantics, reference clients/exclusion_requests.py:158)."""
    return F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0)


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish regex tokenizer."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)).cast("long")


def shingles(toks: Column, k: int = 3) -> Column:
    """Word k-shingles. Documents shorter than k words (but non-empty)
    become a single whole-document shingle; ZERO-token documents get an
    EMPTY shingle set — a shared "" fallback shingle would make every
    empty/whitespace doc a perfect near-duplicate of every other one
    (and, one level up, give them identical all-NULL minhash
    signatures), quadratically pairing junk below the hot-shingle
    df-cap."""
    # slice() references `toks` ONCE per element; k element_at() calls
    # would re-evaluate an inline `toks` child k times per shingle
    # (HOF lambdas don't share subexpressions — callers should still
    # materialize toks as a column first, see _exploded_shingles).
    joined = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return (
        F.when(F.size(toks) >= k, joined)
        .when(F.size(toks) > 0, F.array(F.concat_ws(" ", toks)))
        .otherwise(F.array().cast("array<string>"))
    )


def stopword_hits(toks: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of `lang` (case-insensitive)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t)))).cast("long")


def lang_id(toks: Column) -> Column:
    """N-gram/stopword heuristic language ID: argmax of per-language
    stopword hit counts, deterministic tie-break by language order
    (en > de > fr > und for all-zero)."""
    en, de, fr = (stopword_hits(toks, lang) for lang in ("en", "de", "fr"))
    return (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards moderate length,
    low punctuation density, and presence of stopwords (fluency proxy).
    Purely arithmetic → identical in any engine. NULL text scores NULL
    (dropped by any >= gate) — without the explicit guard, least() and
    greatest() SKIP NULL arguments, so a NULL-text doc would score 0.7
    and sail through a 0.5 curation gate an empty-string doc fails."""
    t = tokens(text)
    n_tok = F.size(t).cast("double")
    n_chars = F.length(text).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_ratio = punct_count(text).cast("double") / F.greatest(n_chars, F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))
    sw = stopword_hits(t, "en").cast("double") / F.greatest(n_tok, F.lit(1.0))
    sw_score = F.least(sw * 5.0, F.lit(1.0))
    return F.when(
        text.isNotNull(), len_score * 0.4 + punct_score * 0.3 + sw_score * 0.3
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, ASCII-whitespace trimmed + collapsed). Trimming is a
    REGEX, not trim(): engines disagree about trim() itself — DuckDB's
    strips U+00A0 NBSP, Spark's does not (unicode sweep finding). The
    engine keeps Java's `\\s` ([ \\t\\n\\x0B\\f\\r]); the oracles spell
    that class out explicitly because RE2's \\s EXCLUDES \\x0B vertical
    tab (code review r3) — the explicit class is the only
    cross-engine-deterministic spelling. Identical across engines, so
    exact near-dup grouping is oracle-testable."""
    trimmed = F.regexp_replace(text, r"^\s+|\s+$", "")
    normalized = F.regexp_replace(F.lower(trimmed), r"\s+", " ")
    return F.md5(normalized)


#: Characteristic character trigrams per language (tiny public-knowledge
#: profiles; real systems learn these from corpora — the operator shape
#: is identical).
TRIGRAM_PROFILES = {
    "en": ("the", "ing", "and", "ion"),
    "de": ("der", "sch", "ein", "und"),
    "fr": ("les", "des", "ent", "que"),
    "es": ("los", "ción", "ado", "ent"),
}


def trigram_hits(text: Column, lang: str) -> Column:
    """Total occurrences of a language's profile trigrams, counted with
    the replace-length trick — pure codegen, no explode, no regex."""
    low = F.lower(text)
    total = F.lit(0).cast("long")
    for tri in TRIGRAM_PROFILES[lang]:
        occ = (F.length(low) - F.length(F.replace(low, F.lit(tri)))) / len(tri)
        total = total + occ.cast("long")
    return total


def lang_id_ngram(text: Column) -> Column:
    """Character-n-gram language ID (the north-star's n-gram heuristic,
    complementing the stopword-profile lang_id): argmax of profile-
    trigram occurrence counts, first-listed language wins ties, 'und'
    when nothing matches."""
    hits = {lang: trigram_hits(text, lang) for lang in TRIGRAM_PROFILES}
    en, de, fr, es = hits["en"], hits["de"], hits["fr"], hits["es"]
    return (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de >= es) & (de > 0), F.lit("de"))
        .when((fr >= es) & (fr > 0), F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )


# PII patterns kept to portable regex (no lookaround) so the same
# pattern string runs under Java regex (Spark) and RE2 (DuckDB).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\d{3}-\d{3}-\d{4}", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def redact_pii(text: Column) -> Column:
    """Scrub emails, phone numbers, and IPv4 addresses to typed
    placeholders — the standard pre-training privacy pass, pure
    Catalyst regexp_replace chain (whole-stage codegen, no UDF)."""
    out = text
    for _, pattern, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (audit side of redact_pii)."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("long")
        for kind, pattern, _ in PII_PATTERNS
    }
