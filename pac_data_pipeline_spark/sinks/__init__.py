from pac_data_pipeline_spark.sinks.documents import (  # noqa: F401
    dry_run,
    foreach_partition_write,
    keyed_json_tree,
    nested_path_records,
    to_doc_records,
    with_batch_id,
    write_parquet,
)
