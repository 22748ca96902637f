"""Multimodal decode + corpus-LM quality scoring against the
synthetic testdata: a mixed BMP/PNG/JPEG/GIF/TIFF/WebP media table decoded
for real (pure numpy/stdlib codecs), mixed PCM/G.711 audio features,
and the corpus-trained bigram-LM perplexity filter ranking the most
and least corpus-like documents.

Run:  python examples/media_and_quality.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pac_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="media_and_quality", master="local[4]")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    from pac_data_pipeline_spark.ext.multimodal import (
        audio_features,
        audio_media_from_documents,
        extract_features,
        mixed_media_from_documents,
    )

    print("-- mixed-format image decode (BMP/PNG/JPEG/GIF/TIFF/WebP by doc_id % 6)")
    media = mixed_media_from_documents(docs)
    feats = extract_features(media)
    feats.join(media.select("doc_id", F.col("meta.format").alias("fmt")),
               "doc_id").groupBy("fmt").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("decoded").cast("int")).alias("n_decoded"),
        F.round(F.avg("width"), 1).alias("avg_w"),
        F.round(F.avg("height"), 1).alias("avg_h"),
    ).orderBy("fmt").show()

    print("-- audio features over mixed PCM / G.711 mu-law / A-law WAVs")
    audio_features(
        audio_media_from_documents(docs.limit(200), encoding="mixed")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("decoded").cast("int")).alias("n_decoded"),
        F.round(F.avg("duration_s"), 3).alias("avg_dur_s"),
        F.round(F.avg("rms"), 4).alias("avg_rms"),
    ).show()

    from pac_data_pipeline_spark.ext.text import ngram_lm_score

    print("-- video near-dup: sampled-frame dHash over real AVI payloads")
    from pac_data_pipeline_spark.ext.multimodal import (
        video_frame_dhash,
        video_media_from_documents,
        video_near_dup,
    )

    vids = video_media_from_documents(docs.limit(120))
    pairs = video_near_dup(video_frame_dhash(vids, every_n=2), max_hamming=4)
    print("   near-dup video pairs (any frame within Hamming 4):")
    pairs.orderBy("min_hamming", "id_a", "id_b").show(8)

    print("-- corpus-LM perplexity filter: most / least corpus-like docs")
    scored = ngram_lm_score(docs).join(
        docs.select("doc_id", F.substring("text", 1, 48).alias("snippet")),
        "doc_id",
    )
    print("   most fluent (lowest avg bigram NLL):")
    scored.orderBy("avg_nll").show(5, truncate=False)
    print("   least corpus-like (highest avg bigram NLL):")
    scored.orderBy(F.col("avg_nll").desc()).show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
