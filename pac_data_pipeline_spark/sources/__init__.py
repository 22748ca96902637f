from pac_data_pipeline_spark.sources.readers import (  # noqa: F401
    TABLES,
    load_tables,
    register_views,
    scan_csv,
    scan_jdbc,
    scan_parquet,
    table_exists,
)
