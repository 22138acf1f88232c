from bigdata_etl_customer360_spark.functions.expressions import (
    argmax_label,
    bucketize_expr,
    case_map,
    exact_sum,
    flag_concat,
)

__all__ = ["argmax_label", "bucketize_expr", "case_map", "exact_sum", "flag_concat"]
