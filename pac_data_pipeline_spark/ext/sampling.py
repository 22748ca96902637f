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

from pyspark.sql import Column, DataFrame, Window
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


def temperature_mixture(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    budget: int = 1_000_000,
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-sampled domain mixture with exact largest-remainder
    budget apportionment — the "how many tokens from each source"
    table a pretraining run starts from (GPT-3 / PaLM style α-mixing:
    weight each domain by ``n_tokens^α`` with α = 0.5 so small
    domains up-sample and giant ones down-sample, then apportion the
    token budget to the weights).

    Determinism contract (hash-exact against the SQL mirror):
    ``sqrt`` is correctly rounded in IEEE 754 — the ONLY float op
    libms must get exactly right alongside +,−,×,÷ — so
    ``W_d = floor(sqrt(n_d)·scale + 0.5)`` is identical on every
    engine; from there everything is integer: Σ W exact, base quota
    ``B·W_d // ΣW``, leftover distributed to the largest remainders
    ``B·W_d mod ΣW`` (ties → domain name asc) — Hamilton's method,
    which by construction hands out EXACTLY ``budget`` tokens (the
    float-share × budget rounding it replaces can be off by
    |domains|). Caller contract: ``budget · max(W_d) < 2^63``.

    Scale shape: token counts are scan-side ``size(filter(split))``
    — no explode, one map-side-combinable agg to |domains| rows;
    the apportionment window rides that tiny aggregate, never the
    corpus. NULL-domain rows drop (a NULL source cannot receive an
    allocation); NULL text counts 0 tokens.

    Returns (source, n_tokens, weight, p, alloc_tokens, epochs):
    ``p`` the floor-rounded mixture probability, ``epochs`` the
    pass-count over each domain the allocation implies (the GPT-3
    table's "epochs elapsed" column).
    """
    from pac_data_pipeline_spark.functions.rounding import floor_round

    # token count via the shared tokens() contract (COLUMN API,
    # never an F.expr SQL literal: Spark's SQL string parser
    # unescapes '\f' to a literal 'f' — unknown-escape fallback —
    # silently adding the letter f to the separator class; caught
    # by the plain-Python replay test). Reusing ext.text keeps the
    # mixture's token counts comparable with x_top_tokens /
    # x_cms_heavy_hitters by construction.
    from pac_data_pipeline_spark.ext.text import tokens

    ntok = F.size(
        F.filter(
            tokens(F.coalesce(F.col(text_col), F.lit(""))),
            lambda x: x != "",
        )
    )
    agg = (
        df.filter(F.col(domain_col).isNotNull())
        .select(
            F.col(domain_col).cast("string").alias("source"),
            ntok.cast("bigint").alias("tk"),
        )
        .groupBy("source")
        .agg(F.sum("tk").alias("n_tokens"))
        .select(
            "source",
            "n_tokens",
            F.floor(
                F.sqrt(F.col("n_tokens").cast("double"))
                * F.lit(float(weight_scale))
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("weight"),
        )
    )
    w_tot = Window.partitionBy()
    w_rank = Window.partitionBy().orderBy(
        F.desc("rem"), F.asc("source")
    )
    quotas = agg.select(
        "*",
        F.sum("weight").over(w_tot).alias("tw"),
    ).select(
        "*",
        # exact integer quota — `/` on longs is DOUBLE division and
        # a cast-back can be one off at scale; `div` never is
        F.expr(f"({budget} * weight) div tw").alias("base"),
        F.expr(f"({budget} * weight) % tw").alias("rem"),
    )
    ranked = quotas.select(
        "*",
        F.row_number().over(w_rank).alias("rk"),
        (F.lit(budget) - F.sum("base").over(w_tot)).alias("leftover"),
    )
    return ranked.select(
        "source",
        "n_tokens",
        "weight",
        floor_round(F.col("weight") / F.col("tw"), 6).alias("p"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc_tokens"),
        floor_round(
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            / F.nullif(F.col("n_tokens"), F.lit(0)),
            6,
        ).alias("epochs"),
    )


def temperature_mixture_sql(
    table: str = "documents",
    domain_col: str = "source",
    text_col: str = "text",
    budget: int = 1_000_000,
    weight_scale: int = 1_000_000,
) -> str:
    """The identical mixture as DuckDB SQL — same sqrt (correctly
    rounded IEEE), same integer quotas/remainders, same tie-break,
    same floor-rounds."""
    from pac_data_pipeline_spark.functions.rounding import floor_round_sql

    p = floor_round_sql("CAST(weight AS DOUBLE) / tw", 6)
    epochs = floor_round_sql(
        "CAST(alloc_tokens AS DOUBLE) / nullif(n_tokens, 0)", 6
    )
    return f"""
        WITH agg AS (
            SELECT CAST({domain_col} AS VARCHAR) AS source,
                   SUM(len(list_filter(string_split_regex(
                       trim(coalesce({text_col}, ''), ' '),
                       '[ \\t\\n\\f\\r]+'), x -> x <> ''))) AS n_tokens
            FROM {table}
            WHERE {domain_col} IS NOT NULL
            GROUP BY 1
        ),
        wts AS (
            SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))
                        * {weight_scale} + 0.5) AS BIGINT) AS weight
            FROM agg
        ),
        quotas AS (
            SELECT *,
                   SUM(weight) OVER () AS tw,
                   ({budget} * weight) // SUM(weight) OVER () AS base,
                   ({budget} * weight) % SUM(weight) OVER () AS rem
            FROM wts
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER (
                       ORDER BY rem DESC, source ASC) AS rk,
                   {budget} - SUM(base) OVER () AS leftover
            FROM quotas
        )
        SELECT source, n_tokens, weight,
               {p} AS p,
               CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc_tokens,
               {epochs.replace("alloc_tokens",
                   "(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)")}
                   AS epochs
        FROM ranked
    """


def stratified_reservoir(
    df: DataFrame,
    k: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-``k``-row stratified sample with MERGE-EXACT
    per-stratum quotas — the deterministic distributed equivalent of
    per-stratum reservoir sampling (Vitter's Algorithm R keeps a
    uniform k-subset per reservoir; here the "reservoir survivor"
    rule is *keep the quota smallest md5 keys*, which is a uniform
    subset for a hash uniform on ids and — unlike a real reservoir —
    independent of partitioning, arrival order, and merge topology:
    any two partial reservoirs merged in any order agree, because
    min-k of a union is min-k of mins).

    Quotas are Hamilton largest-remainder apportionments of ``k`` to
    the stratum sizes (the temperature_mixture integer contract: all
    `div`/`%`, never float shares — Σ quotas == k by construction;
    ties on remainder break by stratum name asc; caller contract
    ``k ≤ |eligible rows|`` and ``k · max(n_s) < 2^63``).
    ELIGIBLE means non-NULL stratum AND non-NULL id: NULL-stratum
    rows have no quota to target, and NULL-id rows have no hash key
    — and Spark ASC sorts NULLs FIRST while external engines sort
    them LAST, so letting a NULL id into the rank would silently
    hand rank 1 to different rows on different engines (the
    ngram_novelty NULL-id rule). With k above the eligible count,
    quotas exceed what strata can fill and the output shrinks
    accordingly (mirrored on both engines).

    Scale shape: pass 1 is a map-side-combinable per-stratum count
    (|strata| rows — the quota window rides that tiny aggregate,
    never the corpus); pass 2 ranks within stratum by (md5, id) —
    ONE corpus shuffle on the stratum key — and keeps rank ≤ quota
    via the broadcast quota table. quota_s is a COLUMN, which the
    rank-limit pushdown cannot see, so an explicit ``rank ≤ k``
    LITERAL pre-filter rides the same window: Catalyst turns it
    into WindowGroupLimit (per-partition top-k heaps, pinned in
    tests/test_scale_patterns.py) — a skewed stratum keeps k rows
    of window state instead of sorting itself end to end, and the
    quota filter then prunes within those k.

    Returns the sampled rows plus (strat_n, quota, rk) lineage.
    """
    eligible = df.filter(
        F.col(strata_col).isNotNull() & F.col(id_col).isNotNull()
    )
    w_tot = Window.partitionBy()
    w_rank = Window.partitionBy().orderBy(F.desc("rem"), F.asc("__s"))
    counts = (
        eligible.groupBy(F.col(strata_col).cast("string").alias("__s"))
        .agg(F.count(F.lit(1)).alias("strat_n"))
        .select("*", F.sum("strat_n").over(w_tot).alias("tn"))
        .select(
            "*",
            F.expr(f"({k} * strat_n) div tn").alias("base"),
            F.expr(f"({k} * strat_n) % tn").alias("rem"),
        )
        .select(
            "*",
            F.row_number().over(w_rank).alias("qrk"),
            (F.lit(k) - F.sum("base").over(w_tot)).alias("leftover"),
        )
        .select(
            "__s",
            "strat_n",
            (
                F.col("base")
                + F.when(F.col("qrk") <= F.col("leftover"), 1).otherwise(0)
            ).alias("quota"),
        )
    )
    w_strat = Window.partitionBy("__s").orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        eligible.withColumn("__s", F.col(strata_col).cast("string"))
        .withColumn("rk", F.row_number().over(w_strat))
        .filter(F.col("rk") <= F.lit(k))
        .join(F.broadcast(counts), "__s")
        .filter(F.col("rk") <= F.col("quota"))
        .drop("__s")
    )


def split_leakage_audit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Train/val/test split with a CONTENT-LEAKAGE audit — the
    eval-contamination check a training pipeline runs before
    trusting held-out numbers: two deterministic md5 split policies
    side by side, (a) ``by_doc`` (bucket the doc id — the naive
    split every tutorial writes) and (b) ``by_content`` (bucket the
    normalized-text fingerprint), with the number of LEAKED docs per
    split — docs whose exact near-normalization duplicate landed in
    a DIFFERENT split. Splitting on the content key co-locates every
    duplicate by construction, so ``by_content`` proves 0 leaked
    while ``by_doc`` exposes the contamination the duplicates cause
    (Lee et al. 2022 measure precisely this train-test overlap).

    Scale shape: the fingerprint is scan-side (md5 of normalized
    text); each policy is a pure column split (no shuffle); the
    audit is ONE (policy, fingerprint, split) aggregation with
    map-side partials plus a window over the per-fingerprint split
    combinations (≤ 3 rows per fingerprint) — never a self-join of
    the corpus. Deterministic md5 buckets keep membership
    reproducible across engines and runs (the hash_sample
    contract); NULL-text docs share the NULL fingerprint and bucket
    via the empty-string key, mirrored in the oracle.

    Returns (policy, split, n_docs, n_leaked) ordered by both.
    """
    from pac_data_pipeline_spark.ext.text import fingerprint

    fp = fingerprint(df.select(F.col(id_col).alias("doc_id"), text_col))

    def assign(policy: str, key) -> DataFrame:
        b = hash_bucket(key)
        split = (
            F.when(b < train_pct, "train")
            .when(b < train_pct + val_pct, "val")
            .otherwise("test")
        )
        return fp.select(
            F.lit(policy).alias("policy"),
            "fingerprint",
            split.alias("split"),
        )

    both = assign("by_doc", F.col("doc_id")).unionByName(
        assign("by_content", F.coalesce(F.col("fingerprint"), F.lit("")))
    )
    per = both.groupBy("policy", "fingerprint", "split").agg(
        F.count(F.lit(1)).alias("c")
    )
    wfp = Window.partitionBy("policy", "fingerprint")
    marked = per.select(
        "policy",
        "split",
        "c",
        (F.count(F.lit(1)).over(wfp) > 1).alias("crosses"),
    )
    return (
        marked.groupBy("policy", "split")
        .agg(
            F.sum("c").alias("n_docs"),
            F.sum(F.when(F.col("crosses"), F.col("c")).otherwise(0)).alias(
                "n_leaked"
            ),
        )
        .orderBy("policy", "split")
    )


def doremi_reweight(
    doc_losses: DataFrame,
    domain_col: str = "source",
    loss_col: str = "loss_micro",
) -> DataFrame:
    """One domain-reweighting step in the DoReMi direction (Xie et
    al., NeurIPS 2023): up-weight domains whose loss EXCEEDS the
    corpus-wide reference (the proxy model finds them hard /
    under-trained), down-weight easy ones — the mixture-setting
    complement of per-instance DSIR selection.

    DoReMi proper runs exponentiated-gradient updates inside a
    proxy-model training loop; this is the LINEARIZED one-step
    rendering over an already-computed per-document loss column
    (e.g. the corpus-LM avg_nll in micro-nats): with uniform prior
    weights, ``exp(η·excess) ≈ 1 + η·excess``, so

        w_raw(d)    = max(0, 1_000_000 + excess_micro(d))      (η = 1)
        weight_ppm  = (1_000_000 · w_raw) div Σ w_raw

    — every quantity an exact integer (floor divisions on positive
    operands only), which is what makes the step reproducible
    bit-for-bit by a SQL oracle; the exponentiated production
    variant is one ``F.exp`` swap away and deliberately not the
    oracle tier (the DSIR/log-domain convention).

    ``doc_losses`` is (domain_col, loss_col) with one row per scored
    document, loss an exact non-negative integer (micro-units).
    Returns one row per domain: (domain, n_docs, dom_loss_micro,
    excess_micro, weight_ppm). NULL domains group together (an
    unlabeled shard is still a shard); domains whose mean loss sits
    more than one unit below the reference floor at weight 0 —
    dropped from the next mixture, the clamp DoReMi applies through
    the simplex projection.

    Scale shape: ONE shuffle (the per-domain aggregate over the
    per-doc loss frame); the |domains|-row aggregate
    localCheckpoints because the reference total, the weight
    normalizer, and the final projection all consume it — inlining
    would re-run the upstream corpus scoring once per consumer (the
    bm25/dedup-cluster lesson). Totals ride 1-row broadcasts.
    """
    dom = (
        doc_losses.groupBy(domain_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(loss_col).alias("__s"),
        )
        .localCheckpoint()  # tiny; 3 consumers below
    )
    tot = dom.agg(
        F.sum("__s").alias("__st"), F.sum("n_docs").alias("__nt")
    )
    d2 = dom.crossJoin(F.broadcast(tot)).select(
        domain_col,
        "n_docs",
        F.expr("__s div n_docs").alias("dom_loss_micro"),
        F.expr("(__s div n_docs) - (__st div __nt)").alias(
            "excess_micro"
        ),
        F.greatest(
            F.lit(0).cast("long"),
            F.lit(1_000_000)
            + F.expr("(__s div n_docs) - (__st div __nt)"),
        ).alias("__w_raw"),
    )
    w_tot = d2.agg(F.sum("__w_raw").alias("__wt"))
    return d2.crossJoin(F.broadcast(w_tot)).select(
        domain_col,
        "n_docs",
        "dom_loss_micro",
        "excess_micro",
        F.expr("(1000000 * __w_raw) div __wt").alias("weight_ppm"),
    )
