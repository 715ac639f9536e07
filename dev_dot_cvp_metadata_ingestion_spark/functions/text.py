"""Text-analysis column functions (beyond-reference scale extensions).

All pure Column expressions — JVM-side, codegen'd, no UDFs — so they
run at full scan speed over a 100 TB documents table and are exactly
reproducible in the DuckDB oracle:

* tokenization / token counts (whitespace split, empties dropped)
* quality scoring (length / punctuation / stopword ratios)
* language-ID (stopword-hit heuristic over per-language wordlists)
* document fingerprinting (normalized md5 + rolling polynomial hash)

Determinism notes: ratios are single IEEE-754 divisions (same operands
→ same bits in every engine); the rolling hash is a left fold with
modulus 1e9+7 so intermediate values never overflow int64 in engines
that check overflow.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007

# small representative stopword lists (public common-word lists)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"],
    "fr": ["le", "la", "les", "et", "un", "une", "est", "de", "pour", "dans"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de", "para"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens with empties dropped (handles leading blanks)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer alternation (public BPE vocab convention):
# contraction suffixes, space-prefixed letter/digit runs, punctuation
# runs, whitespace runs. The original's trailing-space lookahead
# (`\s+(?!\S)`) is dropped so the SAME pattern is valid in both Java
# regex (Spark) and RE2 (DuckDB oracle), which has no lookahead.
BPE_SPLIT_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """Pre-tokenizer match count — the standard proxy for BPE token
    cost before merges (whitespace counts undercount code/punct-heavy
    text). Pure regexp_count: JVM-side, codegen, no UDF."""
    return F.regexp_count(text, F.lit(BPE_SPLIT_RE))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are sentence punctuation."""
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def _hits(toks: Column, words: list[str]) -> Column:
    # ascii_lower, not lower(): the word lists are all-ASCII, so the
    # ASCII-only fold matches the same tokens while staying
    # Unicode-version-stable across engines (hash-checked oracles
    # mirror the translate fold; see ascii_lower's contract note).
    return F.size(F.filter(toks, lambda t: ascii_lower(t).isin(words)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    n = F.size(toks)
    return F.when(n > 0, _hits(toks, STOPWORDS[lang]) / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, 1]: length saturation,
    stopword presence, and punctuation sanity — the standard cheap
    pre-filter for LLM training corpora."""
    toks = tokens(text)
    n = F.size(toks)
    len_term = F.least(n / F.lit(100.0), F.lit(1.0))
    stop_term = F.when(n > 0, _hits(toks, STOPWORDS["en"]) / n).otherwise(F.lit(0.0))
    punct_term = F.when(punct_ratio(text) < 0.1, F.lit(1.0)).otherwise(F.lit(0.0))
    return len_term * 0.3 + stop_term * 0.5 + punct_term * 0.2


def rolling_hash(text: Column) -> Column:
    """Rolling polynomial hash over tokens: fold of
    ``h = (h*31 + (7*len(t) + ascii(t))) mod 1e9+7`` — an
    order-sensitive content fingerprint."""
    codes = F.transform(
        tokens(text), lambda t: (F.length(t) * 7 + F.ascii(t)).cast("long")
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % MOD,
    )


# ASCII-only case fold. Full Unicode case mapping is NOT engine-stable:
# it depends on the engine's bundled Unicode version (JDK 17.0.20 ships
# Unicode 16 casing data and lowercases U+1C89 -> U+1C8A; CPython 3.11
# carries Unicode 14 and maps it to itself; DuckDB pins its own ICU),
# so an md5 over `lower(text)` is not bit-portable across engines — a
# hypothesis property test found the single-char falsifier 'Ᲊ'.
# The fingerprint contract is therefore: fold EXACTLY the 26 ASCII
# letters A-Z, nothing else. `translate` with an explicit alphabet is
# identical in Spark, DuckDB, and Python by construction.
_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(text: Column) -> Column:
    """Engine-stable case fold: maps A-Z to a-z and leaves every other
    codepoint untouched (see the Unicode-version note above)."""
    return F.translate(text, _ASCII_UPPER, _ASCII_LOWER)


def content_fingerprint(text: Column) -> Column:
    """Exact content fingerprint: md5 of the case/whitespace-normalized
    text (the key for exact dedup). Normalization = whitespace-split
    tokens joined by single spaces, ASCII-only case fold (A-Z -> a-z;
    full Unicode lowercasing is Unicode-version-dependent across
    engines and is deliberately NOT applied — see ``ascii_lower``)."""
    return F.md5(F.array_join(tokens(ascii_lower(text)), " "))


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    # engine-stable fold (r10 VERDICT casing sweep): see _hits
    toks = tokens(ascii_lower(text))
    return [(lang, _hits(toks, words)) for lang, words in STOPWORDS.items()]


def lang_id(text: Column) -> Column:
    """Heuristic language ID: the language with the most stopword hits;
    ties and zero hits resolve to 'und' / alphabetical-first winner."""
    scores = lang_scores(text)
    best = F.greatest(*[c for _, c in scores])
    result = F.lit("und")
    # alphabetical-first tie-break: evaluate in sorted order, first match wins
    chain = None
    for lang, c in sorted(scores):
        cond = (c == best) & (best > 0)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    return chain.otherwise(result)


# --- PII redaction (training-data hygiene pass) -----------------------
# Patterns restricted to constructs with identical semantics in Java
# regex (Spark executors) and Python `re` (the test oracle): character
# classes, bounded repetition, non-capturing groups, \b. No lookaround,
# no \p classes. Applied email -> IPv4 -> phone so the later, looser
# digit patterns never eat into an already-redacted placeholder.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# Octets bounded to 0-255 (no leading zeros), so version-like strings
# (1.2.3.4567) and big dotted numbers (310.555.862.999) are not eaten
# as IPs (ADVICE r8 — overscrubbing skews downstream token stats).
_OCTET = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
PII_IPV4_RE = rf"\b(?:{_OCTET}\.){{3}}{_OCTET}\b"
# A match must carry explicit phone SHAPE — a +country-code prefix, a
# parenthesized area code, or a separator after the area-code group —
# so bare 10-13 digit runs (ids, timestamps) survive (ADVICE r8). The
# old form made every separator optional, redacting any such run.
PII_PHONE_RE = (
    r"(?:\+\d{1,3}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}"  # +1 555 123 4567, +15551234567
    r"|\(\d{3}\)[-. ]?\d{3}[-. ]?\d{4}"  # (555) 123-4567
    r"|\b\d{3}[-. ]\d{3}[-. ]?\d{4})\b"  # 555-123-4567, 555 123 4567
)

_PII_PASSES = (
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_IPV4_RE, "<IP>"),
    (PII_PHONE_RE, "<PHONE>"),
)


def pii_counts(text: Column) -> Column:
    """struct(n_emails, n_ips, n_phones) — match counts BEFORE
    scrubbing, counted in the same email->ip->phone pass order on the
    progressively-scrubbed text so overlapping patterns are attributed
    exactly once, mirroring ``pii_scrub``."""
    n_emails = F.regexp_count(text, F.lit(PII_EMAIL_RE))
    after_email = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(after_email, F.lit(PII_IPV4_RE))
    after_ip = F.regexp_replace(after_email, PII_IPV4_RE, "<IP>")
    n_phones = F.regexp_count(after_ip, F.lit(PII_PHONE_RE))
    return F.struct(
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
    )


def pii_scrub(text: Column) -> Column:
    """Redact emails, IPv4 addresses, and phone numbers with typed
    placeholders — pure JVM-side regexp_replace chain (map-side, no
    shuffle, no UDF), the standard pre-training hygiene pass."""
    out = text
    for pat, repl in _PII_PASSES:
        out = F.regexp_replace(out, pat, repl)
    return out
