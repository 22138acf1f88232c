from bigdata_etl_customer360_spark.operators.relational import (
    bucketize,
    map_dimension,
    map_dimension_join,
    multi_agg,
    pivot_agg,
    top_k_per_group,
    trend_compare,
    union_by_name,
)

__all__ = [
    "bucketize",
    "map_dimension",
    "map_dimension_join",
    "multi_agg",
    "pivot_agg",
    "top_k_per_group",
    "trend_compare",
    "union_by_name",
]
