"""Custom aggregates via grouped-agg pandas UDFs — the UDAF tier of
the Python integration (scalar HOFs and mapInPandas cover per-row
work; applyInPandasWithState covers streaming state; this covers
whole-group reductions the built-ins lack).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the UDF kind from REAL signature annotations, and stringified
ones break the inference.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """Geometric mean: exp(mean(log x)) over the group's non-null
    values, vectorized on the Arrow batch."""
    import numpy as np

    x = v.dropna()
    if not len(x):
        return None
    return float(np.exp(np.log(x.to_numpy(dtype="float64")).mean()))
