"""Text-analysis column expressions — all JVM-native (whole-stage codegen),
no Python in the hot path.

These are the building blocks a large-scale training-data pipeline needs
over a `documents(text string)` corpus: tokenization, language-ID
heuristics, quality scoring, fingerprinting. Every expression is pure
column algebra so Catalyst can pipeline it inside a single scan stage —
at 100 TB these run at parquet-read speed with zero shuffles.

Thresholds use integer cross-multiplication (``10*n_stop >= n_tok``)
instead of float ratios so results are engine-exact for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny English stopword set for the language-ID heuristic.
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

# BPE-ish tokenizer regex: words / digit runs / single punctuation.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column) -> Column:
    """Whitespace tokens (non-distinct)."""
    return F.split(text, " ")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(F.split(text, " "))


def token_count(text: Column) -> Column:
    return F.size(F.split(text, " "))


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count via regex (stand-in for a BPE vocab)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_RE), F.lit(0)))


def stopword_count(text: Column) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(*EN_STOPWORDS)))


def lang_guess(text: Column) -> Column:
    """n-gram-free language ID heuristic: >=10% English stopwords -> 'en'.

    Integer cross-multiply keeps it exact: 10*n_stop >= n_tok.
    """
    return F.when(
        10 * stopword_count(text) >= token_count(text), F.lit("en")
    ).otherwise(F.lit("other"))


def punct_count(text: Column) -> Column:
    # group index 0 is required: the pattern has no capture groups and
    # PySpark's default group index is 1 (throws at runtime).
    return F.size(F.regexp_extract_all(text, F.lit("[^a-z0-9 ]"), F.lit(0)))


def quality_score(text: Column, n_chars: Column) -> Column:
    """Integer quality score 0-6: length band + stopword presence + size."""
    return (
        F.when(n_chars.between(100, 2000), 3).otherwise(0)
        + F.when(10 * stopword_count(text) >= token_count(text), 2).otherwise(0)
        + F.when(token_count(text) >= 30, 1).otherwise(0)
    ).cast("int")


def fingerprint(text: Column) -> Column:
    """Whole-document fingerprint: md5 of the alnum-normalized text."""
    return F.md5(F.regexp_replace(text, "[^a-z0-9]+", ""))


def sanitize_filename(name: Column, max_len: int = 200) -> Column:
    """C14 (content_storage.py:142-156): replace filesystem-unsafe chars
    with '_' and truncate. The rebuild has no file sinks (binary columns
    instead), but the scalar surface exists for export paths."""
    return F.substring(
        F.regexp_replace(name, r'[<>:"/\\|?*]', "_"), 1, max_len
    )


def min_kgram_fingerprint(text_col_name: str, k: int = 8) -> Column:
    """Rolling-hash-style fingerprint: min md5 over character k-grams
    (a 1-hash winnowing sketch — deterministic and order-free).

    Takes a column *name* (positional substring needs SQL-expr lambdas).
    """
    return F.expr(
        f"array_min(transform(sequence(1, greatest(length({text_col_name}) - {k - 1}, 1)), "
        f"i -> md5(substring({text_col_name}, i, {k}))))"
    )


# --- PII scrubbing -----------------------------------------------------
# Backslash-free patterns (classes use [.]) so the same literal string is
# valid under Java regex (Spark) and RE2 (DuckDB) with no escape-layer
# differences. Redaction order matters: emails first (their local parts
# may contain digit runs), then dotted IPv4 (digit groups <= 3 never trip
# the long-run phone pattern), then bare 9+-digit runs.
# (?i) is valid in both Java regex and RE2; real emails are any-case
# (review finding r05: a lowercase-only class let Mixed.Case@Example.COM
# through the scrub)
EMAIL_RE = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
IPV4_RE = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
PHONE_RE = "[0-9]{9,}"

_PII_RULES = [(EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>")]


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and long digit runs with typed
    placeholder tokens — the standard pre-training scrub pass. Pure
    regexp_replace chain: codegen'd, zero shuffles, scan-speed at 100 TB."""
    out = text
    for pat, token in _PII_RULES:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> list[Column]:
    """(n_emails, n_ips, n_phones) found in ``text`` — counted on the
    raw string with the same patterns redact_pii applies, in the same
    order semantics (counts are independent: an email's digits are not
    double-counted as phones because the phone count is taken after
    removing email matches)."""
    no_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    no_ip = F.regexp_replace(no_email, IPV4_RE, "<IP>")
    # idx=0 (whole match): Spark's default idx is 1 and errors on
    # group-free patterns; DuckDB's regexp_extract_all defaults to 0
    return [
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0))
        .alias("n_emails"),
        F.size(F.regexp_extract_all(no_email, F.lit(IPV4_RE), 0))
        .alias("n_ips"),
        F.size(F.regexp_extract_all(no_ip, F.lit(PHONE_RE), 0))
        .alias("n_phones"),
    ]
