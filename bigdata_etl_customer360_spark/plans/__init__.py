from bigdata_etl_customer360_spark.plans.pipelines import (
    behavior_trend,
    user_profile,
)
from bigdata_etl_customer360_spark.plans.reference_replay import (
    behavior_pipeline,
    interaction_pipeline,
)

__all__ = ["behavior_pipeline", "behavior_trend", "interaction_pipeline", "user_profile"]
