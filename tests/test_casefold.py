"""Cross-engine İ (U+0130) lowering — the one codepoint whose lowercase
mapping changes string length (core.casefold). Python str.lower() and
JVM lower() expand İ→i+U+0307; DuckDB maps it to plain i. Every
lowercase-then-tokenize spec pre-translates İ→i so all three engines
produce identical tokens/keys. These tests pin each engine PAIR on
adversarial İ inputs (the driver corpora contain no İ, so the
differential gate alone would never exercise this)."""

import duckdb
import pytest

from pii_detection_redaction_spark.core import casefold as CF
from pii_detection_redaction_spark.core import decontam as DC
from pii_detection_redaction_spark.core import hashing as H
from pii_detection_redaction_spark.core.urlnorm import canonicalize_url

I_TEXTS = [
    "dİe İst das İN the",
    "altrİ beİ depoİs İ",
    "İİ dİedİe dı̇e di̇e",  # doubled İ, dotless-i+dot, literal i+U+0307
    "İ",
    "plain ascii only",
    "",
]


ALL_CPS = "".join(
    chr(c) for c in range(1, 0x110000) if not (0xD800 <= c <= 0xDFFF)
)


def test_simple_lower_equals_duckdb_lower():
    con = duckdb.connect()
    for t in I_TEXTS + ["ſ ı I İ i̇ Σς", "Ꟈield Ᲊa 𐕰b Ƛc"]:
        assert CF.simple_lower(t) == con.execute(
            "SELECT lower(?)", [t]
        ).fetchone()[0], repr(t)


def test_simple_lower_equals_duckdb_on_full_domain():
    """THE premise: simple_lower == DuckDB lower() for EVERY codepoint.
    Exhaustive, one call per engine — this is what re-derives the PINNED
    table, so a CPython or DuckDB Unicode-table bump that shifts the
    divergence set fails here loudly instead of leaking into the
    differential gates."""
    con = duckdb.connect()
    duck = con.execute("SELECT lower(?)", [ALL_CPS]).fetchone()[0]
    assert CF.simple_lower(ALL_CPS) == duck
    # the py-vs-duck divergence is covered by the pin table (İ + a subset
    # of PINNED — the rest of PINNED is JVM-only divergence, Unicode-16
    # capitals this CPython doesn't lower either; the JVM test pins those)
    div = {c for c, d in zip(ALL_CPS, duck) if c.lower() != d}
    pinned = {chr(cp) for cp in CF.PINNED}
    assert CF.I_DOT in div
    assert div - {CF.I_DOT} <= pinned
    # every pinned char really is identity under DuckDB's lower
    for cp in CF.PINNED:
        assert duck[ALL_CPS.index(chr(cp))] == chr(cp)


def test_simple_lower_is_the_only_length_change():
    """İ is the only codepoint where lower() changes length — the property
    that makes one-char pinning sufficient for token-boundary agreement;
    re-verified so a Unicode-table bump can't silently invalidate it."""
    changed = [c for c in map(chr, range(0x110000)) if len(c.lower()) != 1]
    assert changed == [CF.I_DOT]


def test_jvm_simple_lower_col_equals_duckdb_on_full_domain(spark):
    """The JVM arm (functions.casefold.simple_lower_col) matches DuckDB
    lower() for EVERY codepoint too — Java's own lower() diverges on İ
    plus all 70 pinned capitals (its tables are newer than both)."""
    from pyspark.sql import functions as F

    from pii_detection_redaction_spark.functions.casefold import (
        simple_lower_col,
    )

    con = duckdb.connect()
    # chunk so one row stays well under UTF8String limits
    n = len(ALL_CPS)
    chunks = [ALL_CPS[i : i + 200_000] for i in range(0, n, 200_000)]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(chunks)], "i int, s string"
    )
    got = {
        r["i"]: r["l"]
        for r in df.select("i", simple_lower_col(F.col("s")).alias("l")).collect()
    }
    for i, chunk in enumerate(chunks):
        duck = con.execute("SELECT lower(?)", [chunk]).fetchone()[0]
        assert got[i] == duck, f"chunk {i}"


def test_hashing_tokenize_matches_duckdb_words():
    """core.hashing.tokenize (minhash/shingles/token_shards spec) ==
    DuckDB's regexp_extract_all(lower(t), NONSPACE_RUN) replay — the
    oracle's exact pattern (the explicit class, not \\S: RE2's \\s
    excludes \\x0b)."""
    con = duckdb.connect()
    for t in I_TEXTS + ["a b\x0bc", "nb sp joined"]:
        got = con.execute(
            f"SELECT regexp_extract_all(lower(?), '{CF.NONSPACE_RUN}')", [t]
        ).fetchone()[0]
        assert H.tokenize(t) == got, repr(t)


def test_decontam_tokens_three_engines(spark):
    """JVM tokens_col == DuckDB string_split_regex replay on İ text."""
    from pyspark.sql import functions as F

    from pii_detection_redaction_spark.operators.decontam import tokens_col

    df = spark.createDataFrame([(t,) for t in I_TEXTS], "text string")
    jvm = [r.t for r in df.select(tokens_col(F.col("text")).alias("t")).collect()]
    con = duckdb.connect()
    for t, got in zip(I_TEXTS, jvm):
        want = con.execute(
            "SELECT list_filter(string_split_regex(lower(?), ?), x -> x <> '')",
            [t, DC.TOKEN_SPLIT_RE],
        ).fetchone()[0]
        assert got == want, repr(t)


def test_host_and_canonical_url_three_engines(spark):
    """host_col / canonical_url_col (JVM) == Python urlnorm == DuckDB lower
    on a host containing İ."""
    from pyspark.sql import functions as F

    from pii_detection_redaction_spark.operators.web import (
        HOST_REGEX,
        canonical_url_col,
        host_col,
    )

    from pii_detection_redaction_spark.core.urlnorm import (
        HOST_PORT_RE,
        HOST_USERINFO_RE,
    )

    urls = [
        "http://Wİkİ.example.com/Path",
        "https://İ.example.org:443/x?utm_source=t",
        "http://plain.example.net/",
        "http://user@Blocked.COM:8080/x",  # userinfo+port strip off the KEY
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url", host_col().alias("h"), canonical_url_col().alias("c")
    ).collect()
    con = duckdb.connect()
    for r in rows:
        duck_host = con.execute(
            "SELECT coalesce(lower(regexp_replace(regexp_replace("
            "regexp_extract(?, ?, 1), ?, ''), ?, '')), '')",
            [r.url, HOST_REGEX, HOST_USERINFO_RE, HOST_PORT_RE],
        ).fetchone()[0]
        assert r.h == duck_host, r.url
        assert r.c == canonicalize_url(r.url), r.url
        assert "̇" not in r.h and "̇" not in r.c
    got = {r.url: r.h for r in rows}
    assert got["http://user@Blocked.COM:8080/x"] == "blocked.com"


def test_word_class_and_toxicity_pinned_cross_engine(spark):
    """The \\S-class pin (core.casefold NONSPACE_*) and the ASCII-only
    case expansion: word counts, stopword hits, and toxicity hits agree
    across Python oracle, JVM columns, and DuckDB SQL on NBSP-joined and
    fold-character text — exactly the inputs where the bare escapes fork
    (Python's Unicode \\s eats NBSP; Python/RE2 (?i) folds ſ→s and
    U+212A→k where Java does not; RE2's \\s excludes \\x0b)."""
    from pyspark.sql import functions as F

    from pii_detection_redaction_spark.core import quality as Q
    from pii_detection_redaction_spark.core.toxicity import (
        TOXICITY_REGEX_CI,
        toxicity_hits,
    )
    from pii_detection_redaction_spark.functions.quality import (
        TOXICITY_RE_JVM,
        WORD_RE_JVM,
    )

    texts = [
        "Un deux trois",          # NBSP-joined: ONE word everywhere
        "a b\x0bc d",                        # \x0b is whitespace everywhere
        "ſhit ſhit ſhit",     # ſhit: NOT a toxicity hit
        "fucK fucK",               # Kelvin K: NOT a hit
        "the shit of it",                    # real hits stay hits
        "line one line two",            # U+2028: nonspace everywhere
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    jvm = {
        r["i"]: (r["w"], r["x"])
        for r in df.select(
            "i",
            F.regexp_count("t", F.lit(WORD_RE_JVM)).alias("w"),
            F.regexp_count("t", F.lit(TOXICITY_RE_JVM)).alias("x"),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        m = Q.text_metrics(t)
        dw = con.execute(
            f"SELECT len(regexp_extract_all(?, '{CF.NONSPACE_RUN}'))", [t]
        ).fetchone()[0]
        dx = con.execute(
            f"SELECT len(regexp_extract_all(?, '{TOXICITY_REGEX_CI}'))", [t]
        ).fetchone()[0]
        assert m["n_words"] == jvm[i][0] == dw, (t, m["n_words"], jvm[i], dw)
        assert toxicity_hits(t) == jvm[i][1] == dx, (t, toxicity_hits(t), jvm[i], dx)
    # and the semantics themselves: ſ/K never fold into hits, NBSP never splits
    assert toxicity_hits(texts[2]) == 0 and toxicity_hits(texts[3]) == 0
    assert toxicity_hits(texts[4]) == 1
    assert Q.text_metrics(texts[0])["n_words"] == 1
