from bigdata_etl_customer360_spark.plans.pipelines import (
    behavior_trend,
    user_profile,
)

__all__ = ["behavior_trend", "user_profile"]
