"""Kafka-shaped streaming source + stream-stream joins.

The reference has no streaming ingestion at all (its "daily" feed is one
file per day, ETL_customer_interaction.py:85-92); this is the engine's
unbounded-ingest path. The design splits TRANSPORT from PLUMBING, like
``operators.enrich``'s injected classifier transport:

- ``KAFKA_ENVELOPE_SCHEMA`` / ``parse_kafka_json`` are the real thing: the
  exact record shape Spark's Kafka connector produces and the
  payload-extraction plan (binary value → JSON → typed columns) that runs
  identically against a real broker.
- ``read_kafka_stream`` wires a real broker when the
  ``spark-sql-kafka-0-10`` connector jar is on the classpath (it is not in
  this sandbox — the call raises a clear error instead of a Py4J trace).
- ``kafka_envelope_stream`` is the stub transport: a file-backed stream
  with the SAME envelope schema, so every downstream plan (parsing,
  windowing, stream-stream joins, dedup) is exercised for real; swapping
  in a broker changes one call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: The record schema Spark's Kafka source emits — consumers written against
#: this envelope run unchanged on a real broker.
KAFKA_ENVELOPE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Real-broker Kafka stream (envelope rows). Requires the
    ``spark-sql-kafka-0-10`` connector on the classpath; ``maxOffsets
    PerTrigger`` bounds micro-batch size the way ``maxFilesPerTrigger``
    does for file sources (a 100 TB backlog must not land in one
    trigger)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception as exc:  # pragma: no cover - depends on classpath
        raise RuntimeError(
            "Kafka connector not on the classpath; add the "
            "spark-sql-kafka-0-10 package (or use kafka_envelope_stream "
            "for the file-backed stub transport)"
        ) from exc
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def kafka_envelope_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stub transport: stream envelope-shaped parquet from ``path``.
    Everything downstream of the source boundary — parsing, watermarks,
    joins, state — sees rows indistinguishable from a broker's."""
    reader = spark.readStream.schema(KAFKA_ENVELOPE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def write_kafka_envelope(
    df: DataFrame,
    path: str,
    topic: str,
    key_col: str,
    value_struct_cols: list[str],
    ts_col: str,
) -> None:
    """Test/fixture helper: serialize rows INTO the envelope (key bytes,
    JSON value bytes, metadata) the way a producer would, and land them as
    parquet for ``kafka_envelope_stream``. Offsets are per-partition
    monotone (row_number over the key hash partition), mirroring broker
    semantics."""
    from pyspark.sql import Window

    npart = 4
    part = F.pmod(F.xxhash64(F.col(key_col)), F.lit(npart)).cast("int")
    w = Window.partitionBy(part).orderBy(F.col(ts_col).asc(), F.col(key_col).asc())
    env = df.select(
        F.col(key_col).cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*value_struct_cols)).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        part.alias("partition"),
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
        F.col(ts_col).cast("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    env.write.mode("overwrite").parquet(path)


def parse_kafka_json(
    df: DataFrame,
    payload_schema: StructType,
    keep_meta: bool = True,
) -> DataFrame:
    """Envelope → typed columns: cast the value bytes to string, parse with
    an EXPLICIT schema (streaming can't infer), flatten. Corrupt payloads
    yield null struct fields rather than killing the query — filter on a
    required field downstream if drop semantics are wanted."""
    parsed = df.withColumn(
        "_payload", F.from_json(F.col("value").cast("string"), payload_schema)
    )
    meta = ["topic", "partition", "offset", "timestamp"] if keep_meta else []
    return parsed.select(*meta, "_payload.*")


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with the time-range constraint that makes
    unbounded joins feasible: rows pair only when
    ``right_ts ∈ [left_ts - max_delay, left_ts + max_delay]``, so each
    side's join state is evicted once the other side's watermark passes
    the range — state is O(keys active inside the delay window), not
    O(stream). Without the range bound Spark would have to keep EVERY
    past row of both streams forever.

    The same plan runs in batch (watermarks are no-ops there); the
    equivalence test pins streaming == batch on a drained bounded source.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} - INTERVAL {max_delay}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} + INTERVAL {max_delay}"))
    )
    return lw.alias("l").join(rw.alias("r"), cond, how)
