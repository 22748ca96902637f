"""Deterministic corpus sampling and dataset mixing for training
pipelines.

Training-data pipelines need samples that are REPRODUCIBLE across
runs and clusters — `df.sample()` depends on partition layout and
seed plumbing, so the scale idiom is hash-based selection: a row is
in the p% sample iff ``hash(id) mod 100 < p``. Same rows selected on
any engine, any partitioning, any run; downstream joins of sampled
tables stay consistent because membership is a pure function of the
key.

md5 (not xxhash64) so an external SQL engine reproduces the exact
sample byte-for-byte — md5 is standardized, engine hash functions
are not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 hex chars of
    md5(key) as an int, mod n_buckets. Uniform for any key type
    (cast to string first)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )


def hash_sample(
    df: DataFrame, pct: int, id_col: str = "doc_id", n_buckets: int = 100
) -> DataFrame:
    """Keep rows whose hash bucket < pct — a stable pct% sample."""
    return df.filter(hash_bucket(id_col, n_buckets) < pct)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, int],
    id_col: str = "doc_id",
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. lang → pct): the hash-bucket
    threshold varies by stratum. Unlisted strata get default_pct.
    This is `sampleBy` without its run-to-run nondeterminism."""
    expr = F.lit(default_pct)
    for value, pct in fractions.items():
        expr = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(expr)
    return df.filter(hash_bucket(id_col) < expr)


def domain_mix(
    df: DataFrame,
    targets: dict[str, float],
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Rebalance a corpus to target per-domain shares of a total row
    budget (DoReMi/Pile-style dataset mixing): domain ``s`` is
    hash-sampled at rate ``min(1, targets[s]·budget / count_s)``.
    Domains absent from ``targets`` are dropped.

    Two-pass but cheap: pass 1 is a partial-aggregated per-domain
    count (output rows = #domains, tiny); the thresholds broadcast
    back onto the scan, so the sample itself is a zero-shuffle
    filter. Membership is a pure function of the id (md5 bucket) —
    the same rows are selected on any engine, partitioning, or run,
    and threshold arithmetic sticks to IEEE doubles in a fixed
    expression order so external engines reproduce it exactly."""
    tgt = F.create_map(
        *[
            x
            for k, v in targets.items()
            for x in (F.lit(k), F.lit(float(v)))
        ]
    )
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__cnt"))
    thresholds = counts.select(
        source_col,
        F.least(
            F.lit(n_buckets).cast("bigint"),
            F.floor(
                tgt[F.col(source_col)]
                * F.lit(budget)
                * F.lit(n_buckets)
                / F.col("__cnt")
            ),
        ).alias("__thr"),
    )
    joined = df.join(F.broadcast(thresholds), source_col, "inner")
    return joined.filter(
        hash_bucket(id_col, n_buckets) < F.col("__thr")
    ).drop("__thr")


def interleave(
    sources: Sequence[tuple[DataFrame, int]], id_col: str = "doc_id"
) -> DataFrame:
    """Mix datasets at declared per-source percentages: each source
    is hash-sampled at its rate and tagged, then unioned. The union
    is a zero-shuffle narrow op; total output rate = Σ pct_i·|src_i|.
    Schemas must align (select the shared columns first)."""
    parts = []
    for i, (df, pct) in enumerate(sources):
        parts.append(
            hash_sample(df, pct, id_col).withColumn(
                "source_idx", F.lit(i).cast("int")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-Res): each row draws a reproducible
    uniform u from md5(id) and scores ``-ln(u) / w``; the k smallest
    scores are the sample. Inclusion probability is proportional to
    weight, membership is a pure function of the key — the same
    rows on any engine, partitioning, or run (md5, not an engine
    hash, so external SQL reproduces the exact sample).

    Scale shape: scan-stage score computation + global top-k, which
    Spark plans as TakeOrderedAndProject — per-partition heaps, no
    full sort, no shuffle of the corpus. Zero- and null-weight rows
    are excluded (their score is undefined)."""
    c = F.col(id_col).cast("string")
    h = F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")
    # u in (0, 1]: (h + 1) / 2^32 — never 0, so ln(u) is finite
    u = (h + F.lit(1).cast("bigint")) / F.lit(4294967296.0)
    score = -F.log(u) / F.col(weight_col)
    return (
        df.filter(
            F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0)
            & F.col(id_col).isNotNull()
        )
        .withColumn("__score", score)
        .orderBy(F.col("__score").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__score")
    )
