from pac_data_pipeline_spark.functions.cleaning import (  # noqa: F401
    clean,
    drop_all_null_rows,
    normalize_columns,
    with_metadata,
)
from pac_data_pipeline_spark.functions.scalar import (  # noqa: F401
    bin_amount,
    classify_membership,
    composite_key,
    iso_timestamp,
    party_label,
    to_double_coerce,
    to_double_coerce_zero,
    to_double_strict,
    to_timestamp_coerce,
)
