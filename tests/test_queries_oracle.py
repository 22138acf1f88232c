"""The primary correctness gate, run locally: every queries() entry must
match its DuckDB oracle (same check the driver performs at sf0.01)."""

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR
from tests.oracle_check import check_query


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, name):
    problems = check_query(spark, name, SF_DIR)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_documents_corpus_is_pure_ascii(spark):
    """Load-bearing precondition of the multimodal_frames oracle twin:
    the stub slices BYTES while DuckDB's substring/sha256 are CHARACTER
    ops, so the two agree iff every document is pure ASCII (char == byte).
    Pin the precondition on BOTH engines at the graded dir, so a testdata
    regeneration that introduces multi-byte text fails HERE with a named
    reason instead of as an opaque frame-hash mismatch."""
    import duckdb

    import os

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_bad_spark = docs.filter(
        "octet_length(text) <> length(text) OR text IS NULL"
    ).count()
    assert n_bad_spark == 0

    (n_bad_duck,) = duckdb.sql(
        f"""
        SELECT count(*) FROM read_parquet('{os.path.join(SF_DIR, "documents.parquet")}')
        WHERE octet_length(encode(text)) <> length(text) OR text IS NULL
        """
    ).fetchone()
    assert n_bad_duck == 0


def test_frames_oracle_diverges_without_ascii_precondition():
    """The converse certificate: on a MULTI-BYTE payload the stub's byte
    windows and the oracle's character windows genuinely differ — the
    ASCII precondition above is load-bearing, not decorative. Pure
    local computation (hashlib vs DuckDB), no Spark needed."""
    import hashlib

    import duckdb

    # é is 2 bytes in UTF-8, so byte length (52) and char length (51)
    # disagree and the window boundaries land on different content
    text = "é" + "abcdefghij" * 5
    payload = text.encode("utf-8")
    step_bytes = max(1, len(payload) // 4)
    stub_hashes = [
        hashlib.sha256(payload[i * step_bytes : (i + 1) * step_bytes]).hexdigest()
        for i in range(4)
    ]
    oracle_hashes = [
        h
        for (h,) in duckdb.sql(
            """
            SELECT sha256(substring(t, CAST(i * GREATEST(n // 4, 1) + 1 AS BIGINT),
                                    GREATEST(n // 4, 1)))
            FROM (SELECT ? AS t, length(?) AS n), UNNEST([0, 1, 2, 3]) AS u(i)
            ORDER BY i
            """,
            params=[text, text],
        ).fetchall()
    ]
    assert stub_hashes != oracle_hashes
