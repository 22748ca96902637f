"""Wide↔long reshape operators.

The reference reshapes per-candidate wide frames into keyed JSON
documents (``pac_to_firebase.py:120`` builds nested dicts column by
column); the relational equivalents are pivot (long→wide, covered by
``operators.aggregates.conditional_party_rollup``) and unpivot
(wide→long), implemented here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def unpivot_long(
    df: DataFrame,
    id_cols: tuple[str, ...],
    value_cols: tuple[str, ...],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Melt ``value_cols`` into (``var_name``, ``value_name``) rows,
    keeping ``id_cols`` as identifiers.

    Uses the native ``DataFrame.unpivot`` (Spark's Expand node): a
    zero-shuffle scan-stage transform that emits len(value_cols)
    rows per input row. At 100 TB this is strictly a row-multiplier
    in the scan stage — column pruning still reaches the parquet
    reader (only id + value columns are read), and no exchange is
    introduced; whatever partitioning the input had survives.

    All value columns must share (or be coercible to) one type —
    Spark resolves the common type exactly like SQL UNPIVOT.
    """
    out = df.unpivot(
        list(id_cols), list(value_cols), var_name, value_name
    )
    return out.select(*id_cols, var_name, value_name)
