"""Bucketed tables: pre-shuffled storage for co-located joins.

Writing a fact table bucketed by its join key hash-partitions the DATA ON
DISK; any later equi-join between tables bucketed the same way (same key,
same bucket count) needs NO shuffle at read time — the exchange the join
would otherwise pay on every query is paid once at write time. This is the
standard answer for a 100 TB fact table joined on the same key by many
recurring queries (the complement of `broadcast` for small dims and
`salted_join` for skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    buckets: int = 16,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sort-within-bucket) parquet table
    in the session catalog. ``sort_cols`` additionally pre-sorts each
    bucket file so a sort-merge join skips its sort too."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, *bucket_cols)
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-spec bucketed tables on their bucket key — plans as a
    shuffle-free sort-merge join (bucketed scans already satisfy the
    join's distribution requirement)."""
    return spark.table(left_table).join(
        spark.table(right_table), on=on, how=how
    )
