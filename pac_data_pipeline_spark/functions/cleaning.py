"""Schema-driven cleaning layer (SURVEY §2.3/§2.4/§1.3).

The reference cleans dynamically-inferred schemas by column-name
pattern and dtype (pac_snowflake_pipeline.py:71-135,
pac_snowflake_realtime.py:74-86, index_align_to_firebase.py:150-170).
Here the same rules become **one** ``select`` of cast expressions
built by walking ``df.schema`` — fully Catalyst-optimizable, zero
UDFs, and the whole clean stage fuses into the scan's
whole-stage-codegen span.

Coercion parity (SURVEY §1.2): pandas ``errors='coerce'`` maps to
``try_cast`` (null on failure) — NOT plain ``cast``, which throws
under Spark 4's default ANSI mode.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Column-name patterns driving type coercion, per the reference's
#: evident intent (pac_snowflake_pipeline.py:92-113 — note we
#: implement name-contains matching, not the reference's latent
#: `'amount' in df.columns` list-membership bug).
MONEY_PATTERNS = ("value", "price", "amount")
DATE_PATTERNS = ("date",)
NUMERIC_NAMES = ("id", "count", "number", "quantity")


def normalize_columns(df: DataFrame) -> DataFrame:
    """P1/P2: ``strip().lower().replace(' ','_')`` on every column
    name (reference pac_snowflake_realtime.py:78). Pure rename — no
    data movement."""
    return df.toDF(*[re.sub(r"\s+", "_", c.strip().lower()) for c in df.columns])


def clean(
    df: DataFrame,
    money_patterns: tuple[str, ...] = MONEY_PATTERNS,
    date_patterns: tuple[str, ...] = DATE_PATTERNS,
    numeric_names: tuple[str, ...] = NUMERIC_NAMES,
    drop_all_null: bool = True,
) -> DataFrame:
    """Generic schema-driven clean (reference
    pac_snowflake_pipeline.clean_snowflake_data, :71-135):

    * string columns: trim whitespace (E4/E6)
    * name contains value/price/amount → double, unparseable → 0 (E7)
    * exact name id/count/number/quantity → double, unparseable → 0
    * name contains date → timestamp, unparseable → null (E8)
    * drop rows where every column is null (F4)

    Emitted as a single projection so Catalyst folds it into the scan.
    """
    df = normalize_columns(df)
    exprs = []
    for field in df.schema.fields:
        name = field.name
        col = F.col(name)
        is_string = isinstance(field.dataType, T.StringType)
        if any(p in name for p in money_patterns) or name in numeric_names:
            if is_string:
                e = F.coalesce(F.trim(col).try_cast("double"), F.lit(0.0))
            elif isinstance(field.dataType, T.NumericType):
                e = F.coalesce(col.cast("double"), F.lit(0.0))
            else:
                e = col
        elif any(p in name for p in date_patterns) and is_string:
            e = F.try_to_timestamp(F.trim(col))
        elif is_string:
            e = F.trim(col)
        else:
            e = col
        exprs.append(e.alias(name))
    out = df.select(*exprs)
    if drop_all_null:
        out = drop_all_null_rows(out)
    return out


def drop_all_null_rows(df: DataFrame) -> DataFrame:
    """F4: ``dropna(how='all')`` (pac_snowflake_pipeline.py:116)."""
    return df.na.drop(how="all")


def with_metadata(
    df: DataFrame,
    data_source: str | None = None,
    record_type: str | None = None,
    processed_ts: bool = False,
    record_id: bool = False,
) -> DataFrame:
    """P5/P6: literal metadata columns + synthetic per-row id
    (reference pac_data_processor.py:55-57, :121). ``uuid()`` and
    ``current_timestamp()`` are nondeterministic — correctness
    checks exclude them from hashing (SURVEY §7.4)."""
    if data_source is not None:
        df = df.withColumn("data_source", F.lit(data_source))
    if record_type is not None:
        df = df.withColumn("record_type", F.lit(record_type))
    if processed_ts:
        df = df.withColumn("processed_date", F.current_timestamp())
    if record_id:
        df = df.withColumn("record_id", F.expr("uuid()"))
    return df
