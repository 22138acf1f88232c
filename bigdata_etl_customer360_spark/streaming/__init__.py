from bigdata_etl_customer360_spark.streaming.windows import (
    run_available_now,
    sliding_agg,
    stream_dedup,
    stream_from_parquet,
    tumbling_agg,
)
from bigdata_etl_customer360_spark.streaming.stateful import sessionize

__all__ = [
    "run_available_now",
    "sessionize",
    "sliding_agg",
    "stream_dedup",
    "stream_from_parquet",
    "tumbling_agg",
]
