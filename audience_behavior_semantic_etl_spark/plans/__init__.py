from audience_behavior_semantic_etl_spark.plans.etl_process import (  # noqa: F401
    ETLProcess,
    ETLStep,
)
