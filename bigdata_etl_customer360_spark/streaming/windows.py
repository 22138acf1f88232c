"""Structured Streaming surface: windowed aggregation, late-data handling,
streaming dedup.

The reference has NO streaming (SURVEY §2.9) — "daily" is one file per day
replayed in batch (ETL_customer_interaction.py:85-92). This module is the
engine's forward path for the same workloads as unbounded sources: the
identical declarative aggregations, plus watermarks for state cleanup.

Everything here is expressed so batch and streaming share semantics: a
tumbling agg over a bounded file source with ``availableNow`` produces
exactly the batch `groupBy(window(...))` result — the equivalence tests
pin that.

Scale notes: streaming state lives in the state store, keyed by
(window, group) — watermarks bound it; without one, a 100 TB/day stream
grows state forever. ``maxFilesPerTrigger`` bounds micro-batch size so one
trigger never has to fit a backlog in memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_from_parquet(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream with a PINNED schema (streaming reads do not
    infer; unbounded sources can't be scanned ahead of time)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    aggs: Sequence[Column],
    group_cols: Sequence[str] = (),
    watermark: str = "1 day",
) -> DataFrame:
    """Tumbling event-time aggregation with a watermark.

    The watermark lets Spark finalize + evict window state once event time
    passes window_end + delay — late rows beyond it are dropped, which is
    the documented trade (completeness vs unbounded state)."""
    wm = df.withWatermark(ts_col, watermark)
    return (
        wm.groupBy(F.window(ts_col, window).alias("w"), *[F.col(c) for c in group_cols])
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "*",
        )
        .drop("w")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    slide: str,
    aggs: Sequence[Column],
    group_cols: Sequence[str] = (),
    watermark: str = "1 day",
) -> DataFrame:
    """Sliding (overlapping) event-time aggregation — each row lands in
    window/slide buckets; state cost multiplies accordingly."""
    wm = df.withWatermark(ts_col, watermark)
    return (
        wm.groupBy(
            F.window(ts_col, window, slide).alias("w"), *[F.col(c) for c in group_cols]
        )
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "*",
        )
        .drop("w")
    )


def stream_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup on key columns within the watermark horizon —
    the unbounded-source counterpart of ``operators.dedup.dedup_exact``
    (state is evicted as event time advances, so memory stays bounded)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drain every available input with trigger(availableNow) into a memory
    sink and return the result as a batch DataFrame. Test/backfill helper:
    this is exactly the batch-equivalence harness — a streaming plan run
    this way must match its batch twin."""
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
