"""Property-based semantics pins (hypothesis): the core column
functions must agree with straightforward pure-Python models on
arbitrary unicode input — the invariants the oracle queries rely on,
checked well beyond the fixture corpus."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, example, given, settings, strategies as st

from pyspark.sql import functions as F

from dev_dot_cvp_metadata_ingestion_spark.functions.text import (
    bpe_token_count,  # noqa: F401  (regex parity is oracle-checked)
    content_fingerprint,
    rolling_hash,
    token_count,
    tokens,
)
from dev_dot_cvp_metadata_ingestion_spark.operators.dedup import (
    base_hash,
    shingles,
)

MOD = 1_000_000_007

# printable-ish unicode without surrogates; \s-class whitespace mixed in
_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
    ),
    max_size=60,
)


def _py_tokens(s: str) -> list[str]:
    # Java regex \s (what Spark's split uses) is ASCII-only:
    # [ \t\n\x0B\f\r]. Unicode spaces ( …) are TOKEN characters —
    # and DuckDB's RE2 \s agrees, which is why the oracles hash-match;
    # a unicode-aware Python \s would not.
    return [t for t in re.split(r"[ \t\n\x0b\f\r]+", s) if t != ""]


def _py_shingles(s: str, n: int) -> list[str]:
    t = _py_tokens(s)
    if len(t) < n:
        return []
    out, seen = [], set()
    for i in range(len(t) - n + 1):
        sh = " ".join(t[i:i + n])
        if sh not in seen:
            seen.add(sh)
            out.append(sh)
    return out


def _py_base_hash(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def _py_rolling(s: str) -> int:
    h = 0
    for t in _py_tokens(s):
        h = (h * 31 + (7 * len(t) + ord(t[0]))) % MOD
    return h


_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(st.lists(_text, min_size=1, max_size=24))
@_settings
def test_token_and_shingle_models(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select(
        "id",
        tokens(F.col("text")).alias("toks"),
        token_count(F.col("text")).alias("n"),
        shingles(F.col("text"), 2).alias("sh2"),
        shingles(F.col("text"), 3).alias("sh3"),
    ).collect()
    for r in rows:
        s = texts[r.id]
        assert list(r.toks) == _py_tokens(s), repr(s)
        assert r.n == len(_py_tokens(s)), repr(s)
        assert list(r.sh2) == _py_shingles(s, 2), repr(s)
        assert list(r.sh3) == _py_shingles(s, 3), repr(s)


def _py_ascii_lower(s: str) -> str:
    # the Python twin of functions.text.ascii_lower: fold ONLY A-Z.
    # Full str.lower() is Unicode-version-dependent (CPython 3.11 =
    # Unicode 14; JDK 17.0.20 = Unicode 16 casing data) and diverges
    # from the JVM on e.g. U+1C89 — the round-9 falsifier below.
    return s.translate(_ASCII_FOLD)


_ASCII_FOLD = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


@given(st.lists(_text, min_size=1, max_size=24))
# round-9 hypothesis falsifier: JDK 17 (Unicode 16) lowercases
# U+1C89 -> U+1C8A, CPython 3.11 (Unicode 14) does not. The
# fingerprint contract is now ASCII-only folding so this must pass;
# committed as a permanent regression example.
@example(["Ᲊ"])
# Kelvin sign and dotted capital I: classic multi-engine lowercasing
# hazards (K -> k, İ -> i̇) — untouched by the ASCII-only fold.
@example(["K İ MiXeD AsCiI"])
@_settings
def test_hash_and_fingerprint_models(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select(
        "id",
        base_hash(F.col("text")).alias("bh"),
        rolling_hash(F.col("text")).alias("rh"),
        content_fingerprint(F.col("text")).alias("fp"),
    ).collect()
    for r in rows:
        s = texts[r.id]
        assert r.bh == _py_base_hash(s), repr(s)
        assert r.rh == _py_rolling(s), repr(s)
        norm = " ".join(_py_tokens(_py_ascii_lower(s)))
        assert r.fp == hashlib.md5(norm.encode("utf-8")).hexdigest(), repr(s)


@given(st.lists(_text, min_size=1, max_size=16))
# the r9 Unicode-16-vs-14 falsifier and the classic casing hazards
# must leave the ASCII-only fold untouched on EVERY tokenize path
@example(["Ᲊ"])
@example(["K İ MiXeD AsCiI", "THE the ThE tHe"])
@_settings
def test_tokenize_fold_parity_all_engines(spark, texts):
    """r10 VERDICT casing sweep: every hash-checked tokenize entry
    point is the composition tokens(ascii_lower(text)) on the Spark
    side and _TOKS(_ASCII_LOWER) in the DuckDB oracles. This property
    pins the composition — and the stopword-hit count built on it —
    to the pure-Python model AND to DuckDB itself on arbitrary
    Unicode, so no corpus can make the engines' group keys diverge."""
    import duckdb

    from dev_dot_cvp_metadata_ingestion_spark.functions.text import (
        STOPWORDS,
        ascii_lower,
        lang_scores,
    )
    from dev_dot_cvp_metadata_ingestion_spark.plans.datapipe import (
        _TOKS,
        _ascii_lower_sql,
        _stop_hits,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    en_hits = dict(lang_scores(F.col("text")))["en"]
    rows = df.select(
        "id",
        tokens(ascii_lower(F.col("text"))).alias("toks"),
        en_hits.alias("h_en"),
    ).collect()

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, s) for i, s in enumerate(texts)]
    )
    duck = {
        r[0]: (list(r[1]), r[2])
        for r in con.execute(
            f"""
            WITH toks AS (
              SELECT id, {_TOKS.format(c=_ascii_lower_sql('text'))} AS t
              FROM t
            )
            SELECT id, t, {_stop_hits('en')} AS h_en FROM toks
            """
        ).fetchall()
    }
    stop_en = set(STOPWORDS["en"])
    for r in rows:
        s = texts[r.id]
        want_toks = _py_tokens(_py_ascii_lower(s))
        want_hits = sum(
            1 for w in _py_tokens(s) if _py_ascii_lower(w) in stop_en
        )
        assert list(r.toks) == want_toks, repr(s)
        assert r.h_en == want_hits, repr(s)
        dt, dh = duck[r.id]
        assert dt == want_toks, repr(s)
        assert dh == want_hits, repr(s)


# r16 fast-tier split (VERDICT r15 item 3): this module is in the SLOW
# tier — long layout/stream/property sweeps excluded from the default
# `-m "not slow"` run (pytest.ini) so the driver's verify-window pytest
# completes; run the FULL suite with `pytest -m ""`.
import pytest as _pytest_r16

pytestmark = _pytest_r16.mark.slow
