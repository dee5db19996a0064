from wikipedia_data_pipeline_spark.plans.inspect import (  # noqa: F401
    PlanSummary,
    executed_plan,
    global_windows,
    plan_summary,
)
