"""corpus_report(): the data card for a training corpus — the
corpus-domain analog of monitor_report()'s 10-section system report
(SURVEY §3.2). One entry point returning a dict of small lazy
DataFrames; nothing executes until the caller acts, and every section
is built from operators that are themselves oracle- or pytest-
verified (x3b signal battery, x1e/x1f dup clustering).

Scale shape: the per-doc signal battery is ONE corpus scan (row-local
columns, reused across sections via plans.layout.reuse); duplication
runs the winnowing cluster pipeline once; every section's final
aggregate is grouped on low-cardinality keys (source, language,
length bucket) — tiny outputs, no global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

LENGTH_BUCKET = 64  # tokens per histogram bucket


def corpus_report(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Five sections:
    - volume: per source — docs, chars, whitespace tokens, BPE-ish
      tokens (the context-budget column);
    - language_mix: per detected language — docs, token share;
    - quality: per detected language — exact median/p90 of the x3b
      quality signals (SQL `percentile`, deterministic);
    - duplication: corpus-level — clusters, member docs, drop count,
      dup fraction (winnowing-fingerprint cluster pipeline);
    - length_histogram: docs per LENGTH_BUCKET-token band.
    """
    from ..functions.numeric import fround
    from ..plans.layout import reuse
    from .dedup import dup_clusters, winnow_edges
    from .text import winnow_fp, x3b_doc_signals

    docs = load_table(spark, sf_dir, "documents")
    signals = reuse(
        x3b_doc_signals(spark, sf_dir).join(
            docs.select("doc_id", "source", "n_chars"), "doc_id"
        )
    )

    volume = (
        signals.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars").alias("chars"),
            F.sum("token_cnt").alias("tokens"),
            F.sum("bpe_ish_tokens").alias("bpe_ish_tokens"),
        )
        .orderBy("source")
    )

    tot = signals.agg(F.sum("token_cnt").alias("_t"))
    language_mix = (
        signals.groupBy("detected_lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("token_cnt").alias("tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "detected_lang",
            "docs",
            "tokens",
            fround(F.col("tokens") / F.col("_t"), 4).alias("token_share"),
        )
        .orderBy("detected_lang")
    )

    quality = (
        signals.groupBy("detected_lang")
        .agg(
            fround(F.expr("percentile(token_cnt, 0.5)"), 4).alias(
                "median_tokens"
            ),
            fround(F.expr("percentile(stopword_ratio, 0.5)"), 4).alias(
                "median_stopword_ratio"
            ),
            fround(F.expr("percentile(avg_token_len, 0.5)"), 4).alias(
                "median_avg_token_len"
            ),
            fround(F.expr("percentile(dup_ngram_frac, 0.9)"), 4).alias(
                "p90_dup_ngram_frac"
            ),
        )
        .orderBy("detected_lang")
    )

    clusters = dup_clusters(winnow_edges(winnow_fp(docs)))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    duplication = (
        clusters.agg(
            F.countDistinct("cluster_id").alias("clusters"),
            F.count(F.lit(1)).alias("docs_in_clusters"),
            (
                F.count(F.lit(1)) - F.countDistinct("cluster_id")
            ).alias("would_drop"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "clusters",
            "docs_in_clusters",
            "would_drop",
            fround(F.col("would_drop") / F.col("_n"), 4).alias("dup_frac"),
        )
    )

    length_histogram = (
        signals.select(
            (F.floor(F.col("token_cnt") / LENGTH_BUCKET) * LENGTH_BUCKET)
            .cast("long")
            .alias("bucket_lo")
        )
        .groupBy("bucket_lo")
        .agg(F.count(F.lit(1)).alias("docs"))
        .orderBy("bucket_lo")
    )

    return {
        "volume": volume,
        "language_mix": language_mix,
        "quality": quality,
        "duplication": duplication,
        "length_histogram": length_histogram,
    }
