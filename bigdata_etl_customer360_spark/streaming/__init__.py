from bigdata_etl_customer360_spark.streaming.windows import (
    run_available_now,
    sliding_agg,
    stream_dedup,
    stream_from_parquet,
    tumbling_agg,
)
from bigdata_etl_customer360_spark.streaming.stateful import sessionize
from bigdata_etl_customer360_spark.streaming.sources import (
    KAFKA_ENVELOPE_SCHEMA,
    kafka_envelope_stream,
    parse_kafka_json,
    read_kafka_stream,
    stream_stream_join,
    write_kafka_envelope,
)

__all__ = [
    "KAFKA_ENVELOPE_SCHEMA",
    "kafka_envelope_stream",
    "parse_kafka_json",
    "read_kafka_stream",
    "run_available_now",
    "sessionize",
    "sliding_agg",
    "stream_dedup",
    "stream_from_parquet",
    "stream_stream_join",
    "tumbling_agg",
    "write_kafka_envelope",
]
