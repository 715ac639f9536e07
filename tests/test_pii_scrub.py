"""PII redaction: Spark's JVM regex chain pinned row-for-row to an
independent Python `re` oracle over generated strings that embed
emails / IPv4s / phone numbers (and near-misses) in corpus-like text.
The patterns deliberately use only constructs with identical semantics
in Java regex and Python re, so the oracle is exact, not approximate.
"""

from __future__ import annotations

import random
import re

from dev_dot_cvp_metadata_ingestion_spark.functions.text import (
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    pii_counts,
    pii_scrub,
)

WORDS = "the fast key order sort table scan merge part window small".split()
EMAILS = ["a.user+tag@example.com", "X9@sub.domain.org", "ops_1@a.io"]
IPS = ["10.0.0.1", "192.168.255.3", "8.8.8.8"]
PHONES = ["+1 415 555 2671", "415-555-2671", "(415) 555 2671", "+44-202-555-0199"]
NEAR_MISSES = ["not@an", "1.2.3", "12345", "user@@x.com", "ver1.2.3.4beta"]
# ADVICE r8 overscrub classes that must SURVIVE: bare digit runs
# (ids/timestamps) and dotted numbers with out-of-range octets
MUST_SURVIVE = [
    "4155552671",  # bare 10-digit id — no separators, no prefix
    "1734567890123",  # epoch-millis-like 13-digit run
    "id 9999999999 end",
    "310.555.862.999",  # dotted, octets > 255 — not an IP
    "1.2.3.4567",  # version-like
]


def _py_scrub(s: str) -> tuple[str, int, int, int]:
    n_e = len(re.findall(PII_EMAIL_RE, s))
    s = re.sub(PII_EMAIL_RE, "<EMAIL>", s)
    n_i = len(re.findall(PII_IPV4_RE, s))
    s = re.sub(PII_IPV4_RE, "<IP>", s)
    n_p = len(re.findall(PII_PHONE_RE, s))
    s = re.sub(PII_PHONE_RE, "<PHONE>", s)
    return s, n_e, n_i, n_p


def _gen_rows(n=120, seed=14):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        parts = [rng.choice(WORDS) for _ in range(rng.randrange(3, 12))]
        for pool in (EMAILS, IPS, PHONES, NEAR_MISSES):
            for _ in range(rng.randrange(0, 3)):
                parts.insert(rng.randrange(len(parts) + 1), rng.choice(pool))
        rows.append((i, " ".join(parts)))
    rows.append((n, ""))  # empty text
    rows.append((n + 1, "a.user+tag@example.com"))  # PII-only text
    return rows


def test_pii_scrub_matches_python_re(spark):
    rows = _gen_rows()
    df = spark.createDataFrame(rows, "id long, text string")
    import pyspark.sql.functions as F

    got = {
        r["id"]: (r["clean"], r["p"]["n_emails"], r["p"]["n_ips"], r["p"]["n_phones"])
        for r in df.select(
            "id",
            pii_scrub(F.col("text")).alias("clean"),
            pii_counts(F.col("text")).alias("p"),
        ).collect()
    }
    for rid, text in rows:
        assert got[rid] == _py_scrub(text), f"row {rid}: {text!r}"


def test_pii_scrub_clean_corpus_is_identity(spark, sf_dir):
    """The synthetic corpus carries no PII: scrub must be a byte-level
    identity and counts all zero (guards against over-eager patterns
    chewing ordinary text)."""
    import pyspark.sql.functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = d.select(
        "doc_id", "text",
        pii_scrub(F.col("text")).alias("clean"),
        pii_counts(F.col("text")).alias("p"),
    ).filter(
        (F.col("clean") != F.col("text"))
        | (F.col("p.n_emails") + F.col("p.n_ips") + F.col("p.n_phones") > 0)
    )
    assert bad.count() == 0


def test_bare_digit_runs_and_bad_octets_survive(spark):
    """ADVICE r8: ids, timestamps, and version-ish dotted numbers must
    NOT be redacted — the phone pattern needs explicit phone shape
    (+CC, parens, or a separator) and IPv4 octets are bounded to 255.
    Checked against both engines so the Java/Python parity holds for
    the negative space too."""
    import pyspark.sql.functions as F

    rows = [(i, s) for i, s in enumerate(MUST_SURVIVE)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["clean"]
        for r in df.select(
            "id", pii_scrub(F.col("text")).alias("clean")
        ).collect()
    }
    for i, s in rows:
        assert got[i] == s, f"spark redacted {s!r} -> {got[i]!r}"
        assert _py_scrub(s)[0] == s, f"python re redacted {s!r}"


def test_real_phone_shapes_still_redact(spark):
    """The tightened pattern must keep catching actual phone formats."""
    import pyspark.sql.functions as F

    rows = [(i, f"call {p} now") for i, p in enumerate(PHONES)]
    df = spark.createDataFrame(rows, "id long, text string")
    for r in df.select(
        "id", pii_scrub(F.col("text")).alias("clean")
    ).collect():
        assert r["clean"] == "call <PHONE> now", r["clean"]
