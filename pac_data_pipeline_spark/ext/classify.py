"""Corpus-trained text classification: multinomial Naive Bayes.

The classifier tier of an LLM data pipeline (fastText-style
quality/domain filtering — e.g. "wiki-like vs crawl" gates): train
token statistics on labeled documents, then score every document
against every label and keep the argmax. Everything is expressed as
DataFrame aggregations under the pinned cross-engine text contract
(:data:`~pac_data_pipeline_spark.ext.text.TOKEN_SEP` tokenization +
``ascii_lower`` folding), so a DuckDB oracle reproduces the whole
train+predict pipeline hash-exactly.

Semantics (multinomial NB, add-one smoothing, natural logs)::

    score(d, l) = ln(d_l / N)                        # doc-count prior
                + Σ_t m(d,t) · ln(c(t,l) + 1)        # seen-token term
                - M_d · ln(n_l + V)                  # normalizer

    prediction(d) = argmax_l round(score, 2)         # ties → min label

The third line is the load-bearing rewrite for scale: because
unseen-in-label tokens contribute ``ln(0 + 1) = 0`` to the numerator
sum, scoring needs only an INNER join between per-doc token counts
and the model — never a dense doc × label × vocab expansion. The
normalizer needs nothing but the doc's total token count.

Plan shape / 100 TB judgment: two token-keyed shuffles (model:
``(label, token)``; per-doc counts: ``(doc, token)`` — the pair keys
spread hot stopwords like the skew-safe distinct pattern), one
vocab-sized model that broadcast-joins onto the count stream, one
``(doc, label)`` aggregation whose width is bounded by labels
actually sharing tokens with the doc, and a label-stats dim of
``|labels|`` rows carried as a broadcast. No collect() anywhere; the
model stays distributed until Spark's planner broadcasts it.

Scores are rounded before the argmax so cross-engine float
summation-order noise (~1e-12 on ~1e3-magnitude log sums) cannot
flip the ranking; ties after rounding break on the smaller label.

Reference parity: the reference pipeline has no ML surface — this is
the beyond-reference extension tier (SURVEY.md §2.10), following the
standard multinomial NB formulation (McCallum & Nigam 1998).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pac_data_pipeline_spark.ext.text import ascii_lower, tokens


def _doc_tokens(
    df: DataFrame, id_col: str, text_col: str, extra: list[str]
) -> DataFrame:
    """(doc, token) stream under the pinned contract: TOKEN_SEP
    split, ascii fold, empty tokens dropped."""
    return (
        df.select(
            F.col(id_col), *extra,
            F.explode(tokens(ascii_lower(F.col(text_col)))).alias("token"),
        )
        .filter(F.col("token") != "")
    )


def nb_train(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Fit the model: returns ``(token_counts, label_stats)``.

    ``token_counts``: one row per (label, token) with instance count
    ``c`` — vocab-sized, the broadcastable side of scoring.
    ``label_stats``: one row per label with total token instances
    ``n_l``, doc count ``d_l``, corpus doc count ``n_docs``, and
    vocab size ``v`` (distinct tokens corpus-wide) — |labels| rows.
    Rows with a NULL label are excluded from training."""
    labeled = df.filter(F.col(label_col).isNotNull())
    toks = _doc_tokens(labeled, id_col, text_col, [F.col(label_col)])
    token_counts = toks.groupBy(label_col, "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    # per-label token totals from the vocab-sized counts (not the
    # instance stream: same result, far smaller aggregation input)
    label_tokens = token_counts.groupBy(label_col).agg(
        F.sum("c").alias("n_l")
    )
    label_docs = labeled.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("d_l")
    )
    corpus = labeled.agg(F.count(F.lit(1)).alias("n_docs"))
    vocab = token_counts.select("token").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    label_stats = (
        label_docs.join(label_tokens, label_col)
        .crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(vocab))
    )
    return token_counts, label_stats


def nb_predict(
    df: DataFrame,
    token_counts: DataFrame,
    label_stats: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against every label and keep the argmax:
    one output row per document — (id, predicted label, rounded
    score, token count). Documents with no tokens fall back to the
    prior-plus-normalizer score (argmax of the prior)."""
    toks = _doc_tokens(df, id_col, text_col, [])
    doc_counts = toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("m")
    )
    doc_totals = doc_counts.groupBy(id_col).agg(
        F.sum("m").alias("m_d")
    )
    # sparse numerator: only (token, label) pairs the model has seen
    # contribute — ln(0+1) = 0 covers the rest, so inner join.
    sparse = (
        doc_counts.join(F.broadcast(token_counts), "token")
        .groupBy(id_col, label_col)
        .agg(F.sum(F.col("m") * F.log(F.col("c") + 1)).alias("s"))
    )
    grid = (
        df.select(id_col)
        .crossJoin(F.broadcast(label_stats))
        .join(doc_totals, id_col, "left")
        .join(sparse, [id_col, label_col], "left")
        .select(
            id_col,
            F.col(label_col),
            F.round(
                F.log(F.col("d_l") / F.col("n_docs"))
                + F.coalesce(F.col("s"), F.lit(0.0))
                - F.coalesce(F.col("m_d"), F.lit(0)).cast("double")
                * F.log((F.col("n_l") + F.col("v")).cast("double")),
                2,
            ).alias("score"),
            F.coalesce(F.col("m_d"), F.lit(0)).cast("bigint").alias("n_tokens"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc(label_col)
    )
    return (
        grid.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            id_col,
            F.col(label_col).alias("pred_" + label_col),
            "score",
            "n_tokens",
        )
    )


def nb_classify(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Self-train on the labeled rows of ``df`` and score every row
    (including unlabeled ones) — the one-call shape the registry
    query uses."""
    token_counts, label_stats = nb_train(df, label_col, text_col, id_col)
    return nb_predict(
        df, token_counts, label_stats, label_col, text_col, id_col
    )
