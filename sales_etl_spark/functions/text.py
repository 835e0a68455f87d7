"""Text-analysis expression library (LLM-data-pipeline surface).

Everything here is native Spark SQL expressions — regex extraction,
higher-order array functions, hashes — so the hot path stays inside
whole-stage codegen on the JVM. At 100 TB a Python UDF here would be
the pipeline's bottleneck; there is none.

Used by: quality scoring, language ID, token counting, fingerprinting,
shingling (the MinHash/Jaccard dedup substrate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Word tokens (letters/digits/underscore runs).
WORD_RE = r"\w+"
#: BPE-ish pre-tokenizer: word runs OR single non-space punctuation —
#: the classic GPT-style regex reduced to its portable core.
BPE_RE = r"\w+|[^\w\s]"
#: Punctuation / symbol characters.
PUNCT_RE = r"[^\w\s]"

#: Minimal per-language marker word sets for the n-gram/stopword
#: language heuristic. Deliberately tiny — the point is the operator
#: shape (score per language, argmax), not lexicography.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est"),
    "es": ("el", "los", "las", "es", "una", "y"),
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str, pattern: str = WORD_RE) -> Column:
    """Array of tokens by regex extraction (codegen'd, no UDF)."""
    return F.regexp_extract_all(_col(text), F.lit(pattern), 0)


def token_count(text: Column | str, pattern: str = BPE_RE) -> Column:
    """Token count under the BPE-ish pre-tokenizer."""
    return F.size(tokens(text, pattern))


def char_count(text: Column | str) -> Column:
    return F.length(_col(text))


def word_count(text: Column | str) -> Column:
    return F.size(tokens(text, WORD_RE))


def avg_word_len(text: Column | str) -> Column:
    """Mean token length; 0.0 for empty docs. Exact: integer sums
    divided once in double."""
    toks = tokens(text, WORD_RE)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.when(F.size(toks) > 0,
                  total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars; 0.0 for empty docs."""
    c = _col(text)
    n_punct = F.size(tokens(c, PUNCT_RE))
    return F.when(
        F.length(c) > 0, n_punct.cast("double") / F.length(c)
    ).otherwise(F.lit(0.0))


def stopword_hits(text: Column | str, words: tuple[str, ...]) -> Column:
    """Count of tokens that are in ``words`` (lowercased match)."""
    toks = tokens(F.lower(_col(text)), WORD_RE)
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t)))


def stopword_ratio(text: Column | str,
                   words: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    toks = tokens(F.lower(_col(text)), WORD_RE)
    hits = stopword_hits(text, words)
    return F.when(
        F.size(toks) > 0, hits.cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: score = marker-word hits per language,
    argmax with deterministic tie-break (language code order), 'und'
    when nothing scores. A real pipeline swaps the marker sets for
    char-n-gram profiles; the operator shape is identical."""
    scores = [
        (code, stopword_hits(text, words))
        for code, words in sorted(LANG_MARKERS.items())
    ]
    best_code = F.lit("und")
    best_score = F.lit(0)
    # fold left keeping strict-greater so earlier (alphabetical) code
    # wins ties — deterministic across engines
    for code, score in scores:
        is_better = score > best_score
        best_code = F.when(is_better, F.lit(code)).otherwise(best_code)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_code


def normalize_text(text: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace,
    trim (reference has no text ops; this is the LLM-pipeline standard
    normalization)."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint of normalized text."""
    return F.md5(normalize_text(text))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingle array from an ALREADY MATERIALIZED token
    array column.

    ``toks`` must be a plain column reference (projected in a previous
    select), not the tokenization expression itself: Spark does not
    eliminate common subexpressions across higher-order-function
    lambdas, so an inline ``regexp_extract_all`` here would re-run the
    regex once per shingle — measured ~10× slower on real documents.
    Documents shorter than n words yield one shingle of the whole doc.
    """
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(k > 0, grams).otherwise(F.array().cast("array<string>"))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle array (the MinHash/Jaccard unit). For hot
    paths prefer projecting ``tokens(normalize_text(...))`` first and
    calling :func:`shingles_from_tokens` — see its note."""
    return shingles_from_tokens(tokens(normalize_text(text), WORD_RE), n)


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

#: Conservative PII patterns, written in the RE2 ∩ java.util.regex
#: dialect so the Spark expression and the DuckDB oracle compile the
#: SAME string (no lookaround, no backrefs).
EMAIL_PII_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PII_RE = r"https?://\S+"


def pii_email_count(text: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_col(text), F.lit(EMAIL_PII_RE), 0))


def pii_url_count(text: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_col(text), F.lit(URL_PII_RE), 0))


def redact_pii(text: Column | str) -> Column:
    """Replace URLs then emails with typed placeholder tags — the
    standard scrub before text enters a training corpus. URL pass runs
    first so an address inside a query string is swallowed by [URL]
    rather than leaving a dangling fragment."""
    return F.regexp_replace(
        F.regexp_replace(_col(text), URL_PII_RE, "[URL]"),
        EMAIL_PII_RE,
        "[EMAIL]",
    )
