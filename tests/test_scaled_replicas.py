"""r18 (VERDICT r17 #3): the bench's replica machinery beyond 10x.

One bijective content family caps replicas at 13 (rotation cycles to
identity); bench now composes the second family (disjoint-alphabet
rot2 for text, sign-flip for embeddings — previously scale_probe-only)
so materialize_scaled is valid to 169 copies, and the extended dedup
leg runs x1d/x1e/x1g/x5 at ~50x per round. These tests pin:
- the lifted cap (20x materializes; 170x raises),
- rate preservation (a 20x composed replica keeps the BASE corpus's
  shingle-occurrence distribution — more data, same dup rate),
- first-family equivalence (copies 0..12 byte-identical to the
  single-family era, so the 10x leg's history stays comparable),
- hot-shingle star-path engagement: with corpus-wide boilerplate
  planted across all copies (verbatim post-replication — how real
  web boilerplate behaves, the SCALE.md r4 adversarial methodology),
  the occ_cap star branch of substring_spans FIRES at production
  defaults on the scaled corpus, emitting O(occ) canonical-star spans
  instead of O(occ^2) pairs.
"""

from __future__ import annotations

import importlib.util
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SF = "/root/testdata/sf0.001"


def _composed_docs(spark, bench, mult: int):
    """mult stacked copies of the sf0.001 documents table via the
    bench's composed per-copy transforms (same construction as
    materialize_scaled, kept in memory)."""
    from peerdb_cdc_psql_clickhouse_spark.catalog import load_table

    docs = load_table(spark, SF, "documents")
    copies = [docs]
    for c in range(1, mult):
        copies.append(
            docs.select(
                *[
                    (F.col(n) + c * 10_000_000).alias(n)
                    if n == "doc_id"
                    else bench._copy_text(F.col(n), c).alias(n)
                    if n == "text"
                    else F.col(n)
                    for n in docs.columns
                ]
            )
        )
    out = copies[0]
    for cp in copies[1:]:
        out = out.unionByName(cp)
    return out


def test_first_family_prefix_unchanged(spark, bench):
    """Copies 0..12 must transform exactly as the single-family era
    did (c//13 == 0 makes rot2/sign-flip identity) — the 10x scaled
    leg's round-over-round history depends on it."""
    row = spark.range(1).select(
        F.lit("the quiet maze of turns").alias("t"),
        F.array(*[F.lit(float(i)) for i in range(64)])
        .cast("array<float>")
        .alias("e"),
    )
    for c in (0, 1, 5, 12):
        got = row.select(
            bench._copy_text(F.col("t"), c).alias("t"),
            bench._copy_embedding(F.col("e"), c).alias("e"),
            bench._rot_text(F.col("t"), c).alias("t1"),
            bench._shift_embedding(F.col("e"), c).alias("e1"),
        ).first()
        assert got.t == got.t1, c
        assert got.e == got.e1, c
    # and copy 13 must NOT be identity (the old cap's failure mode:
    # verbatim duplicate multiplicity past the cycle)
    got13 = row.select(
        bench._copy_text(F.col("t"), 13).alias("t"),
        F.col("t").alias("orig"),
    ).first()
    assert got13.t != got13.orig


def test_materialize_scaled_lifts_cap_and_preserves_rate(
    spark, bench, tmp_path
):
    """20x (beyond the old 13 cap) materializes documents with 20x the
    rows and the SAME max shingle occurrence as the base corpus —
    more data at the base duplicate rate, not 20x multiplicity. 170x
    exceeds both composed families and raises."""
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        shingle_positions,
    )

    out = str(tmp_path / "x20")
    bench.materialize_scaled(spark, SF, out, 20, tables=("documents",))
    rep = spark.read.parquet(f"{out}/documents.parquet")
    base = spark.read.parquet(f"{SF}/documents.parquet")
    assert rep.count() == 20 * base.count()
    assert rep.select("doc_id").distinct().count() == rep.count()

    def max_occ(df):
        return (
            shingle_positions(df)
            .groupBy("h")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )

    assert max_occ(rep) == max_occ(base)

    with pytest.raises(ValueError, match="exceeds"):
        bench.materialize_scaled(
            spark, SF, str(tmp_path / "x170"), 170, tables=("documents",)
        )


def test_hot_shingle_star_branch_fires_on_scaled_corpus(spark, bench):
    """VERDICT r17 #3's Done criterion: the SPAN_OCC_CAP star branch
    engages EMPIRICALLY on a scaled corpus at production defaults.

    Replica transforms preserve the dup rate, so hot mass at scale
    comes from what rate-preservation cannot model: boilerplate that
    is verbatim ACROSS copies (planted post-replication, the SCALE.md
    r4 methodology — on a real crawl, the cookie banner is identical
    in every shard). Planted in ~400 of 10k docs, its shingles exceed
    SPAN_OCC_CAP=200; the spans contributed by the hot branch (the
    diff vs hot_path=False, which silently drops hot shingles) must be
    a canonical STAR: every differential span touches one hub doc, and
    the count is O(occ), nowhere near the O(occ^2) pair explosion."""
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        SPAN_OCC_CAP,
        substring_spans,
    )

    boiler = " ".join(f"qboilr{i}" for i in range(12))
    corpus = _composed_docs(spark, bench, 20).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 25 == 0,
            F.concat(F.col("text"), F.lit(" " + boiler)),
        ).otherwise(F.col("text")),
    )
    corpus = corpus.localCheckpoint()  # one materialization, two passes
    n_planted = corpus.filter(F.col("doc_id") % 25 == 0).count()
    assert n_planted > SPAN_OCC_CAP  # the branch condition is real

    hot = substring_spans(corpus).collect()  # production defaults
    cool = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
        for r in substring_spans(corpus, hot_path=False).collect()
    }
    diff = [
        r
        for r in hot
        if (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
        not in cool
    ]
    assert diff, "hot branch contributed no spans — it did not fire"
    # star shape: one canonical hub carries every hot span
    hubs = set.intersection(*[{r.doc_a, r.doc_b} for r in diff])
    assert len(hubs) == 1
    # O(occ), not O(occ^2): every non-canonical planted doc pairs
    # once with the hub (other-copy rotations of text may shift which
    # shingles are hot, so allow a small factor — quadratic would be
    # ~80k rows here)
    assert len(diff) <= 3 * n_planted
    assert len(diff) >= n_planted - 1
