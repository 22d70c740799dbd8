"""corpus_report(): the training-corpus data card. Volume and
language-mix sections are checked value-exact against DuckDB; the
duplication section must agree with the declared x1f dedup-apply
query; the histogram must partition the corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_ORACLE
from .oracle_util import duckdb_run
from peerdb_cdc_psql_clickhouse_spark.operators.report import (
    LENGTH_BUCKET,
    corpus_report,
)


def test_sections_present(spark):
    rep = corpus_report(spark, SF_ORACLE)
    assert set(rep) == {
        "volume",
        "language_mix",
        "quality",
        "duplication",
        "length_histogram",
    }


def test_section_subset_skips_expensive_build(spark):
    # duplication's transitive closure runs at build time (documented)
    # — a caller asking only for cheap sections must not pay for it
    rep = corpus_report(spark, SF_ORACLE, sections=("volume",))
    assert set(rep) == {"volume"}
    import pytest

    with pytest.raises(ValueError, match="unknown sections"):
        corpus_report(spark, SF_ORACLE, sections=("volume", "nope"))


def test_volume_matches_duckdb(spark):
    rep = corpus_report(spark, SF_ORACLE)
    got = {
        r.source: (r.docs, r.chars, r.tokens)
        for r in rep["volume"].collect()
    }
    want = {
        s: (d, c, t)
        for s, d, c, t in duckdb_run(
            """
            SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
                   CAST(SUM(n_chars) AS BIGINT) AS chars,
                   CAST(SUM(len(list_filter(
                     string_split_regex(lower(text), '\\s+'),
                     t -> t <> ''))) AS BIGINT) AS tokens
            FROM documents GROUP BY source
            """,
            SF_ORACLE,
        ).itertuples(index=False, name=None)
    }
    assert got == want


def test_language_mix_shares_sum_to_one(spark):
    rows = corpus_report(spark, SF_ORACLE)["language_mix"].collect()
    assert abs(sum(r.token_share for r in rows) - 1.0) < 0.01
    assert sum(r.docs for r in rows) == duckdb_run(
        "SELECT COUNT(*) n FROM documents", SF_ORACLE
    )["n"][0]


def test_duplication_agrees_with_dedup_apply(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        x1f_dedup_apply,
    )

    dup = corpus_report(spark, SF_ORACLE)["duplication"].collect()[0]
    drops = x1f_dedup_apply(spark, SF_ORACLE).filter(~F.col("keep")).count()
    assert dup.would_drop == drops
    assert 0.0 <= dup.dup_frac < 1.0


def test_histogram_partitions_corpus(spark):
    rep = corpus_report(spark, SF_ORACLE)
    rows = rep["length_histogram"].collect()
    n = duckdb_run("SELECT COUNT(*) n FROM documents", SF_ORACLE)["n"][0]
    assert sum(r.docs for r in rows) == n
    assert all(r.bucket_lo % LENGTH_BUCKET == 0 for r in rows)
