"""Sorted-Neighborhood dedup — the third candidate-generation family.

The repo already ships two ways to find near-duplicate pairs without
an all-pairs product: signature banding (MinHash/SimHash LSH) and
prefix filtering (PPJoin / Ed-Join / containment).  The classical
third family is the **Sorted Neighborhood Method** (Hernández &
Stolfo, SIGMOD 1995): derive a sort key per record, sort the corpus,
and compare only records within a fixed window ``w`` of each other in
the sorted order.  One sort per pass, O(w·n) candidates, and — the
part LSH cannot do — *transposition-tolerant clustering for free*:
records whose keys share a prefix land adjacent regardless of how
their tails differ.  Its blind spot (records similar in the middle
but different at the key's head) is patched the way the paper
prescribes: **multi-pass** SNM with independent key functions, union
of candidates.  Here: a forward key (head of the normalized text) and
a reversed key (tail of the normalized text).

Scale shape, stage by stage (the 100 TB audit):

- the sort is ``repartitionByRange`` + ``sortWithinPartitions`` —
  Spark's own distributed sort, never a global window;
- exact global positions come from ``monotonically_increasing_id``
  over the range-sorted frame (partition index in the high 31 bits,
  *consecutive* local offsets in the low 33 — the documented layout)
  plus per-partition row counts: a P-row aggregate collected to the
  driver and prefix-summed (P = partition count; this is precisely
  the bounded collect inside ``RDD.zipWithIndex``, restated in
  DataFrame land with zero Python in the row path), then rejoined as
  a broadcast P-row offset table.  The frame is localCheckpointed
  first: both the count aggregate and the final join consume it, and
  the id must be frozen (same discipline as
  ``dedup_text.py``'s gid assignment);
- neighborhood pairing is a band-bucket **equi**-join: with bucket
  width ``B = w - 1``, any pair at rank distance 1..B has its b-side
  bucket in {a-bucket, a-bucket + 1}, so the a-side explodes two
  probe buckets and the join is a plain shuffle join on the bucket
  id — no window, no inequality join, no product;
- verification is exact token-3-gram Jaccard on candidate pairs only
  (``ngram_jaccard_pairs``), linear in candidate volume = O(w·n).

Reference semantics: near-dup discovery parity with the reference's
pandas ``drop_duplicates``-adjacent cleaning (pac_data_processor.py
prepare/dedup stages), generalized to fuzzy matching; the SNM
formulation itself is from the public record-linkage literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pac_data_pipeline_spark.ext.dedup_text import ngram_jaccard_pairs

#: monotonically_increasing_id packs the partition index in the high
#: 31 bits and a consecutive per-partition record offset in the low
#: 33 — the same layout sinks/documents.py relies on for batch ids.
_MID_LOCAL_BITS = 33
_MID_LOCAL_MASK = (1 << _MID_LOCAL_BITS) - 1


def global_rank(
    df: DataFrame, key_cols: list[str], rank_col: str = "rank"
) -> DataFrame:
    """Exact 0-based global rank in ``ORDER BY key_cols``, with every
    stage distributed — no global window, no RDD round-trip.

    ``repartitionByRange`` assigns increasing key ranges to
    increasing partition indexes and ``sortWithinPartitions``
    finishes the total order, so global rank = (rows in earlier
    partitions) + (local offset).  The local offset is the low 33
    bits of ``monotonically_increasing_id``; the earlier-partition
    totals are a P-row aggregate, prefix-summed driver-side (the
    bounded ``zipWithIndex`` collect — P is the partition count, not
    the data) and broadcast back.  ``key_cols`` must form a total
    order (include a unique id as the last key) or ranks are
    partition-boundary-dependent.
    """
    ranked = (
        df.repartitionByRange(*key_cols)
        .sortWithinPartitions(*key_cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        # freeze the nondeterministic id AND serve the two consumers
        # below (count aggregate + offset join) one materialization
        .localCheckpoint()
    )
    ranked = ranked.withColumn(
        "__pid", F.shiftright("__mid", _MID_LOCAL_BITS).cast("long")
    ).withColumn(
        "__local", F.col("__mid").bitwiseAND(_MID_LOCAL_MASK).cast("long")
    )
    # bounded collect: one row per partition (the zipWithIndex
    # pattern) — prefix-sum driver-side, rejoin as a broadcast table
    counts = sorted(
        ranked.groupBy("__pid").count().collect(),
        key=lambda r: r["__pid"],
    )
    offsets, acc = [], 0
    for row in counts:
        offsets.append((row["__pid"], acc))
        acc += row["count"]
    spark = df.sparkSession
    from pac_data_pipeline_spark.session import local_table

    off = local_table(spark, offsets or [(0, 0)], "__pid long, __off long")
    return (
        ranked.join(F.broadcast(off), "__pid")
        .withColumn(rank_col, F.col("__off") + F.col("__local"))
        .drop("__mid", "__pid", "__local", "__off")
    )


def _snm_pass_pairs(
    keyed: DataFrame, key_col: str, id_col: str, window: int
) -> DataFrame:
    """Candidate pairs for ONE SNM pass: all (a, b) with
    ``1 <= rank(b) - rank(a) <= window - 1`` in the total order
    ``(key, id)``.  Band-bucket equi-join on ``floor(rank / B)``:
    the a-side probes its own bucket and the next one, so every
    in-window pair meets exactly once and the join never widens
    beyond bucket width B = window - 1."""
    B = window - 1
    ranked = global_rank(keyed, [key_col, id_col], rank_col="__r")
    a = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col("__r").alias("__ra"),
        F.explode(
            F.array(
                F.floor(F.col("__r") / B),
                F.floor(F.col("__r") / B) + 1,
            )
        ).alias("__bkt"),
    )
    b = ranked.select(
        F.col(id_col).alias("id_b"),
        F.col("__r").alias("__rb"),
        F.floor(F.col("__r") / B).alias("__bkt"),
    )
    dist = F.col("__rb") - F.col("__ra")
    return (
        a.join(b, "__bkt")
        .where((dist >= 1) & (dist <= B))
        .select("id_a", "id_b")
    )


def snm_normalized_key_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The portable key frame both passes share: text ASCII-sanitized
    (per-codepoint lower() differs across engines outside ASCII — the
    x_edit_join contract) and lowercased; forward key = first 16
    chars, reversed key = first 16 chars of the reversed text.  Null
    text keys as '' — null docs cluster together and fall to the
    verify stage, where the null-gram guard scores them UNKNOWN."""
    norm = F.lower(
        F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), "[^ -~]", "")
    )
    return df.select(
        F.col(id_col),
        F.substring(norm, 1, 16).alias("k_fwd"),
        F.substring(F.reverse(norm), 1, 16).alias("k_rev"),
    )


def snm_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    n: int = 3,
    threshold: float = 0.4,
) -> DataFrame:
    """Multi-pass SNM near-dup pairs, verified.

    Two passes (forward / reversed key) generate O(w·n) candidates
    each; pairs are normalized to ``id_a < id_b``, counted across
    passes (``passes`` — 2 means both key functions agreed, e.g.
    exact duplicates), then exact-verified with token-3-gram Jaccard
    and thresholded on the *rounded* value so both engines apply the
    identical cut.  Output: (id_a, id_b, passes, jaccard), one row
    per surviving pair.

    Total cost: two range-sort shuffles + two bucket-join shuffles +
    one pair-verify join — every stage linear in corpus size for
    fixed ``window``.  SNM is a *heuristic* candidate generator (the
    differential oracle mirrors the windowing rather than proving
    completeness — unlike the exact prefix-filter joins); its niche
    is key-prefix-clustered duplicates at one sort per pass, and the
    multi-pass union is the published mitigation for head-of-key
    divergence."""
    keys = snm_normalized_key_frame(
        df, text_col=text_col, id_col=id_col
    ).localCheckpoint()  # 2 consumers: one per pass
    p_fwd = _snm_pass_pairs(
        keys.select(id_col, "k_fwd"), "k_fwd", id_col, window
    )
    p_rev = _snm_pass_pairs(
        keys.select(id_col, "k_rev"), "k_rev", id_col, window
    )
    lo = F.least("id_a", "id_b").alias("id_a")
    hi = F.greatest("id_a", "id_b").alias("id_b")
    cand = (
        p_fwd.select(lo, hi)
        .unionAll(p_rev.select(lo, hi))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("passes"))
        # 2 consumers (verify join + passes join): materialize so the
        # two sort passes run once, not once per consumer
        .localCheckpoint()
    )
    verified = ngram_jaccard_pairs(
        df, cand.select("id_a", "id_b"), text_col=text_col,
        id_col=id_col, n=n,
    )
    return (
        cand.join(verified, ["id_a", "id_b"])
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "passes", "jaccard")
    )
