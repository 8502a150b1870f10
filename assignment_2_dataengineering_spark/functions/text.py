"""Text-analysis column expressions for large-scale corpus pipelines.

These extend the engine beyond the reference's operator set (which has no
text analytics) toward what a 100 TB training-data pipeline needs:
tokenization, shingles, quality signals, language ID, fingerprints.
Everything here is a pure Catalyst expression (whole-stage codegen, no
Python), so these run at full scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-density
# language-ID heuristic. Deliberately small + deterministic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "das", "und", "ist", "in", "zu", "den", "von", "mit"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "en", "un", "une"],
}

# BPE-ish tokenizer: letter runs, digit runs, or single punctuation marks.
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens_ws(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(text, " ")


def tokens_regex(text: Column) -> Column:
    """BPE-ish regex tokens (letters / digits / punct singletons)."""
    return F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0)


def token_count_ws(text: Column) -> Column:
    return F.size(tokens_ws(text))


def token_count_regex(text: Column) -> Column:
    return F.size(tokens_regex(text))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as array<string>; [] when the doc is shorter
    than n words. Basis for Jaccard / MinHash dedup (operators.dedup)."""
    return shingles_from_tokens(tokens_ws(text), n)


def shingles_from_tokens(w: Column, n: int = 3) -> Column:
    """Shingles over an existing token-array column. Prefer this with a
    materialized token column when the expression fans out (every
    reference to `w` re-evaluates its defining expression in an inlined
    projection — see operators.dedup._with_shingle_set)."""
    # transform over a 0-based index sequence; element_at is 1-based.
    # CaseWhen evaluates lazily per row, so the sequence/element_at branch
    # never runs for short docs.
    return F.when(F.size(w) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + 1 + k) for k in range(n)]),
        )
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords — the classic
    cheap quality / language signal. Delegates to the _from_tokens
    form so the two can never drift."""
    return stopword_ratio_from_tokens(tokens_ws(text), lang)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [a-z0-9 ] (lowercased)."""
    stripped = F.regexp_replace(F.lower(text), "[a-z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length band + stopword density -
    punctuation noise. Deterministic, SQL-mirrorable."""
    n = F.length(text)
    len_ok = F.when((n >= 50) & (n <= 5000), F.lit(0.5)).otherwise(F.lit(0.0))
    sw = F.least(stopword_ratio(text) * 2.5, F.lit(0.5))
    return F.round(F.greatest(len_ok + sw - punct_ratio(text), F.lit(0.0)), 4)


def langid_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-density scores (n-gram heuristic)."""
    w = tokens_ws(text)
    denom = F.greatest(F.size(w), F.lit(1)).cast("double")
    return {
        lang: F.size(F.filter(w, lambda t: t.isin(words))) / denom
        for lang, words in STOPWORDS.items()
    }


def langid_best(text: Column, threshold: float = 0.08) -> Column:
    """argmax language with deterministic tie-break (lexicographic lang
    order via greatest-on-struct), 'und' when below threshold."""
    scores = langid_scores(text)
    # struct(score, neg-lexicographic lang) so greatest() picks highest
    # score then lexicographically-smallest language.
    pairs = [
        F.struct(s.alias("score"), F.lit(-i).alias("ord"), F.lit(lang).alias("lang"))
        for i, (lang, s) in enumerate(sorted(scores.items()))
    ]
    best = F.greatest(*pairs)
    return F.when(best["score"] >= threshold, best["lang"]).otherwise(F.lit("und"))


# URL / email signals (C4-style filters count them; this corpus has
# none, which the oracle verifies as exact zeros).
URL_PATTERN = r"https?://[^\s]+"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

# PII patterns, restricted to the Java-regex ∩ RE2 common subset (no
# lookaround, no backreferences) so the same strings drive Spark's
# codegen regexp and the DuckDB oracle identically.
IPV4_PATTERN = r"\b\d{1,3}(\.\d{1,3}){3}\b"
# Digits and dashes ONLY — no space separator: [\d\- ]{7,} spanned
# space-separated runs of ordinary numbers, so a year list
# ("1999 2000 2001") collapsed to one [PHONE]. Precision over recall
# for corpus scrubbing: destroying real data is worse than missing a
# space-formatted phone (which needs checksum-level validation anyway).
PHONE_PATTERN = r"\+?\d[\d\-]{7,}\d"


def pii_scrub(text: Column) -> Column:
    """Redact PII spans in place: email → [EMAIL], IPv4 → [IP],
    phone-ish digit runs → [PHONE]. Order matters — emails may embed
    digit+dot runs and IPs are digit runs, so each pass must consume
    its spans before the next, coarser pattern sees them. Pure
    regexp_replace chain: whole-stage codegen, scan speed, no shuffle —
    the right shape for a scrub that runs over every byte of a 100 TB
    corpus.

    PLACEMENT RULE (measured at sf10, SCALE.md §6h): do NOT evaluate
    this scrub in the same stage as normalize_text/fingerprint. The
    email class and the normalize class are structurally different
    large character classes, and running both hot in one task degrades
    java.util.regex ~15-30x (JIT inline-cache pollution at the
    per-char predicate sites; same-shape pairs are unaffected). Put an
    exchange between them — see q_corpus_pipeline, which fingerprints
    before its dedup shuffle and scrubs after."""
    t = F.regexp_replace(text, EMAIL_PATTERN, "[EMAIL]")
    t = F.regexp_replace(t, IPV4_PATTERN, "[IP]")
    return F.regexp_replace(t, PHONE_PATTERN, "[PHONE]")


def dedup_tokens_ordered(w: Column) -> Column:
    """Order-preserving within-document token dedup: keep the FIRST
    occurrence of each token (the Gopher-style intra-doc repetition
    cleaner, at word granularity). filter((x, i) → array_position(w, x)
    == i+1) is O(k²) in tokens-per-doc but purely per-row codegen — no
    shuffle, no state; for book-length docs switch to the
    posexplode → min(pos) → reassemble aggregation form instead. Pass a
    MATERIALIZED token column (explode(array(..)) barrier) or the
    defining split() re-runs per reference."""
    return F.filter(w, lambda x, i: F.array_position(w, x) == i + 1)


def repetition_ratio(text: Column, n: int = 2) -> Column:
    """Fraction of repeated word n-grams: 1 - distinct/total — the
    Gopher/C4 boilerplate-and-loop signal. 0.0 for docs shorter than n
    words. Delegates to the _from_grams form so the two can never
    drift (note: inlined here the gram expression is re-evaluated per
    reference — materialize the grams and call the _from_grams form on
    hot paths)."""
    return repetition_ratio_from_grams(shingles(text, n))


def stopword_ratio_from_tokens(w: Column, lang: str = "en") -> Column:
    """stopword_ratio over a MATERIALIZED token-array column — use when
    the caller has already paid the explode(array(x)) Generate barrier
    so the text isn't re-split per reference (see
    operators.dedup._with_shingle_set for why)."""
    hits = F.size(F.filter(w, lambda t: t.isin(STOPWORDS[lang])))
    return hits / F.greatest(F.size(w), F.lit(1)).cast("double")


def repetition_ratio_from_grams(grams: Column) -> Column:
    """repetition_ratio over a MATERIALIZED n-gram array column. The
    expression references `grams` three times (two sizes + distinct);
    on a materialized column those are array reads, inlined they would
    each rebuild every gram via element_at → re-split of the text."""
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - F.size(F.array_distinct(grams)) / total.cast("double"), 4)
    )


def pattern_count(text: Column, pattern: str) -> Column:
    """Occurrences of a regex in the text (URL/email/PII counting)."""
    return F.regexp_count(text, F.lit(pattern))


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum to
    space, squeeze runs, trim."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[^a-z0-9]+", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit document fingerprint: md5 of the normalized
    text (exact-dedup key; rolling-hash analog expressible as md5 over a
    canonical byte stream)."""
    return F.md5(normalize_text(text))
