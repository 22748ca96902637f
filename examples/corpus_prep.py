"""End-to-end training-corpus preparation against the synthetic
testdata: HTML-to-text extraction (pages synthesized, links
harvested, URLs canonicalized) -> quality gates -> NB domain
classifier -> exact + chunk-level dedup -> substring-duplication
audit -> decontamination -> domain mixing, finishing with a
per-source report card.

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
from pac_data_pipeline_spark.ext.dedup_text import decontaminate, exact_dedup
from pac_data_pipeline_spark.ext.html import (
    html_extract,
    html_links,
    html_links_domain_rollup,
    html_wrap,
    url_normalize_col,
)
from pac_data_pipeline_spark.ext.sampling import domain_mix

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

    mixed = domain_mix(
        clean,
        targets={"src0": 0.3, "src1": 0.3, "src2": 0.2, "src3": 0.2},
        budget=200,
    )
    print("after domain mixing:", mixed.count())

    corpus_report(clean).show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
