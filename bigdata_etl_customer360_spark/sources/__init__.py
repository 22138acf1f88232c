from bigdata_etl_customer360_spark.sources.readers import (
    date_range_paths,
    read_csv,
    read_json_lines,
    read_orc,
    read_parquet,
)
from bigdata_etl_customer360_spark.sources.testdata import TABLES, load_table
from bigdata_etl_customer360_spark.sources.sinks import write_console, write_jdbc, write_parquet
from bigdata_etl_customer360_spark.sources.bucketed import (
    co_located_join,
    read_bucketed,
    write_bucketed,
)
from bigdata_etl_customer360_spark.sources.layout import (
    with_zorder_key,
    with_zorder_key_ranked,
    write_zordered,
    zorder_expr,
)

__all__ = [
    "date_range_paths",
    "read_csv",
    "read_json_lines",
    "read_orc",
    "read_parquet",
    "TABLES",
    "load_table",
    "write_console",
    "write_jdbc",
    "write_parquet",
    "co_located_join",
    "read_bucketed",
    "write_bucketed",
]
