"""corpus_report(): the data card for a training corpus — the
corpus-domain analog of monitor_report()'s 10-section system report
(SURVEY §3.2). One entry point returning a dict of small DataFrames,
every section built from operators that are themselves oracle- or
pytest-verified (x3b signal battery, x1e/x1f dup clustering).

Scale shape: the per-doc signal battery is ONE corpus scan — source
and n_chars ride the battery's own projection (doc_signals
passthrough), never a join of the battery back to its input (which
would be a corpus-to-corpus shuffle); the signals frame is shared
across sections via plans.layout.reuse; every section's final
aggregate is grouped on low-cardinality keys (source, language,
length bucket) — tiny outputs, no global sorts.

Laziness: sections are lazy DataFrames EXCEPT duplication, whose
transitive closure is an iterative job (dup_clusters checkpoints and
counts per round) and therefore runs when the section is BUILT — so
it is built only when requested via `sections`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

LENGTH_BUCKET = 64  # tokens per histogram bucket

SECTIONS = (
    "volume",
    "language_mix",
    "quality",
    "duplication",
    "length_histogram",
)


def corpus_report(
    spark: SparkSession,
    sf_dir: str,
    sections: tuple[str, ...] = SECTIONS,
) -> dict[str, DataFrame]:
    """Five sections (pass `sections` to build a subset — duplication
    is the expensive one, see module docstring):
    - volume: per source — docs, chars, whitespace tokens, BPE-ish
      tokens (the context-budget column);
    - language_mix: per detected language — docs, token share;
    - quality: per detected language — exact median/p90 of the x3b
      quality signals (SQL `percentile`, deterministic);
    - duplication: corpus-level — clusters, member docs, drop count,
      dup fraction (winnowing-fingerprint cluster pipeline);
    - length_histogram: docs per LENGTH_BUCKET-token band.

    Caching note (ADVICE r3): the shared signals frame is persisted
    via reuse() and stays cached for as long as the returned sections
    are live — repeated report builds in a long-lived session should
    `spark.catalog.clearCache()` between builds (bench.py does), or
    unpersist selectively once the sections have been materialized.
    """
    from ..functions.numeric import fround
    from ..plans.layout import reuse
    from .dedup import dup_clusters, winnow_edges
    from .text import doc_signals, winnow_fp

    unknown = set(sections) - set(SECTIONS)
    if unknown:
        raise ValueError(f"unknown sections {sorted(unknown)}")
    docs = load_table(spark, sf_dir, "documents")
    signals = reuse(doc_signals(docs, passthrough=("source", "n_chars")))

    def volume() -> DataFrame:
        return (
            signals.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("n_chars").alias("chars"),
                F.sum("token_cnt").alias("tokens"),
                F.sum("bpe_ish_tokens").alias("bpe_ish_tokens"),
            )
            .orderBy("source")
        )

    def language_mix() -> DataFrame:
        tot = signals.agg(F.sum("token_cnt").alias("_t"))
        return (
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
                fround(F.col("tokens") / F.col("_t"), 4).alias(
                    "token_share"
                ),
            )
            .orderBy("detected_lang")
        )

    def quality() -> DataFrame:
        return (
            signals.groupBy("detected_lang")
            .agg(
                fround(F.expr("percentile(token_cnt, 0.5)"), 4).alias(
                    "median_tokens"
                ),
                fround(
                    F.expr("percentile(stopword_ratio, 0.5)"), 4
                ).alias("median_stopword_ratio"),
                fround(
                    F.expr("percentile(avg_token_len, 0.5)"), 4
                ).alias("median_avg_token_len"),
                fround(
                    F.expr("percentile(dup_ngram_frac, 0.9)"), 4
                ).alias("p90_dup_ngram_frac"),
            )
            .orderBy("detected_lang")
        )

    def duplication() -> DataFrame:
        clusters = dup_clusters(winnow_edges(winnow_fp(docs)))
        n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
        return (
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
                fround(F.col("would_drop") / F.col("_n"), 4).alias(
                    "dup_frac"
                ),
            )
        )

    def length_histogram() -> DataFrame:
        return (
            signals.select(
                (
                    F.floor(F.col("token_cnt") / LENGTH_BUCKET)
                    * LENGTH_BUCKET
                )
                .cast("long")
                .alias("bucket_lo")
            )
            .groupBy("bucket_lo")
            .agg(F.count(F.lit(1)).alias("docs"))
            .orderBy("bucket_lo")
        )

    builders = {
        "volume": volume,
        "language_mix": language_mix,
        "quality": quality,
        "duplication": duplication,
        "length_histogram": length_histogram,
    }
    return {name: builders[name]() for name in SECTIONS if name in sections}
