from pac_data_pipeline_spark.operators.aggregates import (  # noqa: F401
    conditional_party_rollup,
    distinct_values,
    frequency_table,
    global_summary,
    groupby_sum,
)
from pac_data_pipeline_spark.operators.dedup import (  # noqa: F401
    dedup_keep_first,
    reconcile_counts,
)
from pac_data_pipeline_spark.operators.joins import (  # noqa: F401
    dim_lookup,
    lookup_misses,
)
from pac_data_pipeline_spark.operators.topk import top_k, top_k_groups  # noqa: F401
