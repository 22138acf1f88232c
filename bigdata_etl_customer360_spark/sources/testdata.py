"""Loaders for the driver's synthetic TPC-H-ish tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# Scan-plan memo keyed on (applicationId, sf_dir, table): every
# spark.read.parquet call re-lists the path and re-reads parquet footers
# for schema resolution on the DRIVER — measured 70-130 ms per call at
# local[32], re-paid by every query build and every bench pass (~300+
# calls across the 235-query bench). The testdata paths are immutable
# for an application's lifetime, so the resolved scan DataFrame (a plan
# + schema, NO rows — every action still reads the parquet) is the
# production catalog-table shape: declare once, reference thereafter
# (guide §6 file-listing costs). A stopped/restarted application gets a
# fresh applicationId and therefore fresh entries; cloned sessions share
# shared-state and interoperate with the memoized plan as usual.
_SCAN_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def load_table(
    spark: SparkSession,
    name: str,
    sf_dir: str = DEFAULT_SF_DIR,
    columns: list[str] | None = None,
) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # the conf is consulted at plan AND execution time, so set it on
        # the calling session even when the scan plan comes from the memo
        # (a different session of the same application may execute it)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _SCAN_MEMO.get(key)
    if df is None:
        if name == "events":
            # events.ts has shipped as parquet TIMESTAMP(NANOS) in some
            # testdata generations (which Spark's vectorized reader rejects —
            # read as long nanos and convert) and plain TIMESTAMP(MICROS) in
            # others. Adapt to whichever is on disk instead of assuming a
            # generation.
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            if isinstance(df.schema["ts"].dataType, T.LongType):
                # integer DIV, not `/`: epoch-nanos (~1.7e18) exceed double's
                # exact integer range, so float division drifts the odd
                # microsecond. Micro-aligned data -> truncation is lossless
                # and matches DuckDB's nanos→micros cast.
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
                # naive micros: interpret the wall-clock as UTC so the column
                # is the same instant (and same session-TZ-rendered value) as
                # the nanos generation produced via timestamp_micros
                df = df.withColumn("ts", F.to_utc_timestamp(F.col("ts"), "UTC"))
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _SCAN_MEMO[key] = df
    if columns:
        df = df.select(*columns)
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view so queries can run
    through the ``spark.sql`` surface (same names the DuckDB oracle
    uses)."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
