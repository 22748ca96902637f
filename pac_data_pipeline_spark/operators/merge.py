"""MERGE-style upsert as a relational operator.

The reference's sink performs document upserts one RPC at a time
(``upload_to_firebase``, pac_data_processor.py:199-287 — set() on an
existing key overwrites, on a new key inserts). This is the same
semantics as SQL MERGE, expressed engine-side so the sink receives
the already-merged state in one pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    update_cols: Sequence[str],
) -> DataFrame:
    """MERGE target USING source: matched keys take the source's
    ``update_cols``, unmatched source keys insert, unmatched target
    keys persist unchanged. Adds ``merge_action`` ('update' |
    'insert' | 'keep') for audit.

    One full-outer equi-join shuffle on the key — with both sides
    bucketed on the key (sources/layout.py) even that exchange
    disappears. Presence on each side is tracked with explicit
    marker literals, not payload-null probing, so legitimately-null
    values merge correctly. No driver loop, no per-row RPC: the
    merged state lands on the sink in bulk. Source must be
    key-unique (enforce upstream with dedup_keep_first); a duplicate
    source key would fan out the join.
    """
    non_key = [c for c in target.columns if c not in key_cols]
    for c in update_cols:
        if c not in non_key:
            raise ValueError(f"update col {c!r} not in target payload")
    tgt = target.withColumn("__tgt", F.lit(True))
    src = source.select(
        *key_cols,
        *[F.col(c).alias(f"__src_{c}") for c in update_cols],
        F.lit(True).alias("__src"),
    )
    joined = tgt.join(src, on=list(key_cols), how="full_outer")
    src_present = F.col("__src").isNotNull()
    tgt_present = F.col("__tgt").isNotNull()
    action = (
        F.when(src_present & tgt_present, F.lit("update"))
        .when(src_present, F.lit("insert"))
        .otherwise(F.lit("keep"))
    )
    out_cols = list(key_cols) + [
        (
            F.when(src_present, F.col(f"__src_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            if c in update_cols
            else F.col(c)
        )
        for c in non_key
    ]
    return joined.select(*out_cols, action.alias("merge_action"))


def merge_upsert_latest(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    update_cols: Sequence[str],
    version_col: str,
) -> DataFrame:
    """CDC-style conditional MERGE: a matched source row wins only
    when its ``version_col`` (event time / sequence number) is
    strictly newer than the target's — the idempotent ingestion
    rule that makes replays and out-of-order feeds safe. Unmatched
    source keys insert; stale source rows leave the target
    untouched (action 'keep').

    Same single full-outer key join as :func:`merge_upsert`; the
    version comparison is a scan-stage predicate on the joined row.
    Chain one call per ingestion wave: state converges to the
    row with the max version per key regardless of arrival order.
    """
    non_key = [c for c in target.columns if c not in key_cols]
    if version_col not in non_key:
        raise ValueError("version col must be a target payload column")
    for c in update_cols:
        if c not in non_key:
            raise ValueError(f"update col {c!r} not in target payload")
    upd = list(dict.fromkeys(list(update_cols) + [version_col]))
    tgt = target.withColumn("__tgt", F.lit(True))
    src = source.select(
        *key_cols,
        *[F.col(c).alias(f"__src_{c}") for c in upd],
        F.lit(True).alias("__src"),
    )
    joined = tgt.join(src, on=list(key_cols), how="full_outer")
    src_present = F.col("__src").isNotNull()
    tgt_present = F.col("__tgt").isNotNull()
    src_ver = F.col(f"__src_{version_col}")
    tgt_ver = F.col(version_col)
    newer = src_present & (
        ~tgt_present
        # a versionless target row loses to any versioned source row
        | (tgt_ver.isNull() & src_ver.isNotNull())
        | (src_ver > tgt_ver)
    )
    action = (
        F.when(newer & tgt_present, F.lit("update"))
        .when(newer, F.lit("insert"))
        .otherwise(F.lit("keep"))
    )
    out_cols = list(key_cols) + [
        (
            F.when(newer, F.col(f"__src_{c}")).otherwise(F.col(c)).alias(c)
            if c in upd
            else F.col(c)
        )
        for c in non_key
    ]
    return joined.select(*out_cols, action.alias("merge_action"))
