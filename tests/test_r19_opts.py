"""Round-19 optimization pins: every change here must be
result-invisible — these tests prove the optimized internals produce
byte-identical frames to the shapes they replaced.

- winnow_edges (inverted-list combos, the x1d pattern): equals the old
  df-cap-agg + filtering-join + fingerprint-keyed self-join shape, and
  its uniqueness precondition ((fingerprint, doc_id) unique) holds
  corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE
from peerdb_cdc_psql_clickhouse_spark.catalog import load_table
from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
    WINNOW_MAX_DF,
    WINNOW_MIN_SHARED,
    winnow_edges,
)
from peerdb_cdc_psql_clickhouse_spark.operators.text import winnow_fp


def test_winnow_fp_doc_pairs_unique(spark):
    # the inverted-list rewrite's premise: winnow_fp explodes
    # array_distinct'd per-doc minima, so (fingerprint, doc_id) is
    # unique and list length == df, combos == self-join pairs
    fp = winnow_fp(load_table(spark, SF_SMOKE, "documents"))
    total = fp.count()
    distinct = fp.dropDuplicates(["fingerprint", "doc_id"]).count()
    assert total == distinct > 0


def _self_join_edges(fp, max_df, min_shared):
    """The pre-r19 winnow_edges shape, kept verbatim as the
    equivalence reference."""
    ok = (
        fp.groupBy("fingerprint")
        .count()
        .filter(F.col("count") <= max_df)
        .select("fingerprint")
    )
    fpf = fp.join(ok, "fingerprint")
    a = fpf.select("fingerprint", F.col("doc_id").alias("src"))
    b = fpf.select("fingerprint", F.col("doc_id").alias("dst"))
    return (
        a.join(b, "fingerprint")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .count()
        .filter(F.col("count") >= min_shared)
        .select("src", "dst")
    )


def test_winnow_edges_combos_match_self_join(spark):
    fp = winnow_fp(load_table(spark, SF_SMOKE, "documents"))
    got = sorted(
        (r.src, r.dst) for r in winnow_edges(fp).collect()
    )
    want = sorted(
        (r.src, r.dst)
        for r in _self_join_edges(
            fp, WINNOW_MAX_DF, WINNOW_MIN_SHARED
        ).collect()
    )
    assert got == want and len(got) > 0
