"""Cross-engine parity of the SHARED PRIMITIVES every oracle leans on.

The \\x0B tokenizer divergence (ADVICE r11: Java \\s vs RE2 \\s) showed that
engine agreement on primitives is an assumption worth pinning ONCE,
mechanically, instead of rediscovering per-oracle. Each test evaluates the
same primitive on Spark and DuckDB over a nasty-input corpus (control
chars incl. \\x0B, empties, NULLs, whitespace runs, negatives) and asserts
byte-identical results within the repo's stated contract (ASCII corpus;
see multimodal_frames oracle note).

Primitives covered = the ones the committed oracles actually use:
lower/trim, the pinned whitespace split class, md5 hex, sha256 hex,
conv-hex -> BIGINT (the bloom/simhash word rule), floor/truncating integer
division, and % on negatives.
"""
from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

NASTY = [
    "",
    " ",
    "  ",
    "a b",
    "a\x0bb",
    "a\tb\nc",
    "A MiXeD CaSe",
    "a  b   c",
    "\x0blead",
    "trail\x0b",
    "a\fb\rc d",
    " \t\r\n\x0b\f ",
    "0123456789",
    "punct!@#$%^&*()[]{}",
    "x" * 200,
    ("word " * 40).strip(),
    None,
]

SPLIT_CLASS_SPARK = r"[ \t\r\n\x0B\f]+"          # java.util.regex
SPLIT_CLASS_DUCK = r"[ \t\r\n\x0B\f]+"           # RE2 (same spelling)


def _df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(NASTY)], schema="i long, s string"
    )


def _duck(expr: str):
    rel = duckdb.sql(
        f"SELECT i, {expr} AS v FROM t ORDER BY i",
        params=None,
        connection=_conn(),
    )
    return [r[1] for r in rel.fetchall()]


_CONN = None


def _conn():
    global _CONN
    if _CONN is None:
        _CONN = duckdb.connect()
        _CONN.execute("CREATE TABLE t(i BIGINT, s VARCHAR)")
        _CONN.executemany(
            "INSERT INTO t VALUES (?, ?)", list(enumerate(NASTY))
        )
    return _CONN


def _spark_vals(df, col):
    return [r["v"] for r in df.select("i", col.alias("v")).orderBy("i").collect()]


def test_lower_trim_parity(spark):
    df = _df(spark)
    assert _spark_vals(df, F.lower(F.col("s"))) == _duck("lower(s)")
    # BOTH engines' trim strips ASCII space only — \t/\x0B survive on both
    assert _spark_vals(df, F.trim(F.col("s"))) == _duck("trim(s)")


def test_pinned_split_class_parity(spark):
    df = _df(spark)
    got = _spark_vals(
        df,
        F.array_join(
            F.split(F.coalesce(F.col("s"), F.lit("")), SPLIT_CLASS_SPARK), "\x01"
        ),
    )
    want = _duck(
        "array_to_string(string_split_regex(COALESCE(s, ''), "
        f"'{SPLIT_CLASS_DUCK}'), chr(1))"
    )
    assert got == want


def test_md5_hex_parity(spark):
    df = _df(spark)
    got = _spark_vals(df, F.md5(F.encode(F.col("s"), "UTF-8")))
    assert got == _duck("md5(s)")


def test_sha256_hex_parity(spark):
    df = _df(spark)
    got = _spark_vals(df, F.sha2(F.col("s"), 256))
    assert got == _duck("sha256(s)")


def test_conv_hex_word_parity(spark):
    """The bloom/simhash 32-bit-word rule: first/second 8 hex chars of
    md5 -> non-negative BIGINT, identical on conv(...,16,10) and
    ('0x'||...)::BIGINT."""
    df = _df(spark).filter(F.col("s").isNotNull())
    for lo, name in ((1, "lo"), (9, "hi")):
        got = _spark_vals(
            df,
            F.expr(
                f"cast(conv(substring(md5(encode(s, 'UTF-8')), {lo}, 8), 16, 10)"
                " as bigint)"
            ),
        )
        want = [
            r[1]
            for r in _conn()
            .sql(
                f"SELECT i, ('0x' || substring(md5(s), {lo}, 8))::BIGINT"
                " FROM t WHERE s IS NOT NULL ORDER BY i"
            )
            .fetchall()
        ]
        assert got == want, name
        assert all(0 <= v < (1 << 32) for v in got)


INTS = [(7, 2), (-7, 2), (7, -2), (-7, -2), (0, 3), (5, 5), (10**12 + 3, 7)]


def test_integer_division_and_mod_parity(spark):
    """Spark `div` truncates toward zero; DuckDB `//` does too (the
    round-9 gotcha pins this on NEGATIVES — exact floor needs the pmod
    route). Spark % and DuckDB % both take the dividend's sign."""
    df = spark.createDataFrame(INTS, schema="m long, d long")
    got_div = [r[0] for r in df.select(F.expr("m div d")).collect()]
    got_mod = [r[0] for r in df.select(F.expr("m % d")).collect()]
    c = duckdb.connect()
    c.execute("CREATE TABLE p(m BIGINT, d BIGINT)")
    c.executemany("INSERT INTO p VALUES (?, ?)", INTS)
    want_div = [r[0] for r in c.sql("SELECT m // d FROM p").fetchall()]
    want_mod = [r[0] for r in c.sql("SELECT m % d FROM p").fetchall()]
    assert got_div == want_div
    assert got_mod == want_mod


def test_substring_indexing_parity(spark):
    """1-based, length-clamped substring on both engines (frame windows)."""
    df = _df(spark).filter(F.col("s").isNotNull())
    for start, ln in ((1, 3), (2, 100), (5, 1), (100, 4)):
        got = _spark_vals(df, F.expr(f"substring(s, {start}, {ln})"))
        want = [
            r[1]
            for r in _conn()
            .sql(
                f"SELECT i, substring(s, {start}, {ln}) FROM t"
                " WHERE s IS NOT NULL ORDER BY i"
            )
            .fetchall()
        ]
        assert got == want, (start, ln)
