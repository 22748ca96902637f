from pac_data_pipeline_spark.plans.pipelines import (  # noqa: F401
    csv_report_pipeline,
    party_rollup_pipeline,
    snowflake_batch_pipeline,
)
