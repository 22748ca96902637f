"""End-to-end training-corpus preparation against the synthetic
testdata: HTML-to-text extraction (pages synthesized, links
harvested, URLs canonicalized) -> quality gates -> NB domain
classifier -> exact + chunk-level dedup -> substring-duplication
audit -> decontamination (exact + Bloom scale path) -> DSIR
importance selection -> domain mixing -> n-gram novelty gate ->
temperature-sampled token budget -> stratified reservoir sample ->
train/val/test split with leakage audit, finishing with a DoReMi
next-round mixture update and a per-source report card.

Run:  python examples/corpus_prep.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pac_data_pipeline_spark.session import get_spark
from pac_data_pipeline_spark.sources.readers import scan_parquet
from pac_data_pipeline_spark.ext.text import corpus_report, gopher_rules
from pac_data_pipeline_spark.ext.classify import nb_classify
from pac_data_pipeline_spark.ext.corpus import chunk_dedup, suffix_duplication
from pac_data_pipeline_spark.ext.dedup_text import (
    bloom_decontaminate,
    decontaminate,
    exact_dedup,
    ngram_novelty,
)
from pac_data_pipeline_spark.ext.dsir import dsir_scores
from pac_data_pipeline_spark.ext.html import (
    html_extract,
    html_links,
    html_links_domain_rollup,
    html_wrap,
    url_normalize_col,
)
from pac_data_pipeline_spark.ext.sampling import (
    domain_mix,
    doremi_reweight,
    split_leakage_audit,
    stratified_reservoir,
    temperature_mixture,
)

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus_prep", master="local[4]")
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet")

    # crawl front door: pages in, clean text + a canonical link graph out
    pages = html_wrap(docs)
    extracted = html_extract(pages)
    print(
        "HTML extract — docs:", extracted.count(),
        "avg chars:",
        round(extracted.agg(F.avg("n_chars")).collect()[0][0], 1),
    )
    links = html_links(pages).withColumn(
        "url_norm", url_normalize_col(F.col("url"))
    )
    print("outbound link domains:")
    html_links_domain_rollup(links).orderBy(F.desc("n_links")).show(8)

    gated = gopher_rules(docs).filter(F.col("keep")).select("doc_id")
    kept = docs.join(gated, "doc_id")
    print("after quality gates:", kept.count())

    preds = nb_classify(docs)  # self-trained lang/domain gate
    agree = preds.join(docs.select("doc_id", "lang"), "doc_id").filter(
        F.col("pred_lang") == F.col("lang")
    )
    print("NB classifier agrees with labels on:", agree.count(), "docs")

    deduped = exact_dedup(kept)
    print("after exact dedup:", deduped.count())

    dup_audit = suffix_duplication(deduped)
    print(
        "substring-duplication audit — docs with a 20+-char repeat:",
        dup_audit.filter(F.col("n_dup_ge_t") > 0).count(),
    )

    span_stats = chunk_dedup(deduped, chunk_tokens=32)
    print(
        "span dedup kept chunks:",
        span_stats.agg(F.sum("n_kept")).collect()[0][0],
        "of",
        span_stats.agg(F.sum("n_chunks")).collect()[0][0],
    )

    eval_set = docs.filter(F.col("doc_id") % 97 == 0)
    flags = decontaminate(deduped, eval_set, n=8)
    clean = deduped.join(flags, "doc_id").filter(~F.col("contaminated"))
    print("after decontamination:", clean.count())

    # the Bloom tier flags a SUPERSET of the exact join (no false
    # negatives) from a fixed-size broadcast bitmap — the shape that
    # survives a benchmark suite 1000x this size
    bloom = bloom_decontaminate(deduped, eval_set, n=8)
    print(
        "bloom-flagged (>= exact by construction):",
        bloom.filter(F.col("contaminated")).count(),
        "vs exact:",
        flags.filter(F.col("contaminated")).count(),
    )

    # DSIR importance selection (Xie et al. 2023): keep the docs
    # whose hashed-bigram profile looks most like the EN target
    dsir = dsir_scores(docs, F.col("lang") == "en", target_cols=("lang",))
    keep = dsir.filter(F.col("n_feats") > 0).orderBy(
        F.desc("dsir_micro"), "doc_id"
    ).limit(400).select("doc_id")
    clean = clean.join(keep, "doc_id")
    print("after DSIR selection (top 400 target-like):", clean.count())

    mixed = domain_mix(
        clean,
        targets={"src0": 0.3, "src1": 0.3, "src2": 0.2, "src3": 0.2},
        budget=200,
    )
    print("after domain mixing:", mixed.count())

    # duplication-aware freshness gate (Lee et al. 2022): drop docs
    # mostly assembled from n-grams first seen elsewhere — the gate
    # consumes the MIXED corpus so the chain really is
    # mix -> novelty -> budget -> sample -> split
    novelty = ngram_novelty(mixed, n=3)
    fresh = mixed.join(
        novelty.filter(F.col("novelty") >= 0.2).select("doc_id"), "doc_id"
    )
    print("after novelty gate (>= 0.2):", fresh.count())

    print("temperature-sampled token budget (GPT-3 style, α = 0.5):")
    temperature_mixture(fresh, budget=100_000).show(10, truncate=False)

    sample = stratified_reservoir(fresh, k=40, strata_col="source")
    print("stratified reservoir (exactly k = 40) per source:")
    sample.groupBy("source").count().orderBy("source").show(10)

    print("train/val/test split policies + content-leakage audit:")
    split_leakage_audit(fresh).show(10, truncate=False)

    # DoReMi-step mixture update: which domains should the NEXT
    # training round up-weight? (per-domain excess corpus-LM loss)
    from pac_data_pipeline_spark.ext.text import ngram_lm_score

    losses = (
        ngram_lm_score(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "source",
            F.round(F.col("avg_nll") * 1000).cast("long").alias(
                "loss_micro"
            ),
        )
    )
    print("DoReMi next-round domain weights (ppm):")
    doremi_reweight(losses).orderBy(F.desc("weight_ppm")).show(
        10, truncate=False
    )

    corpus_report(clean).show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
