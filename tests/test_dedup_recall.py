"""Dedup quality with planted near-duplicate texts: copies of real
documents with a few words changed must be caught by each near-dup
family member (MinHash+LSH candidates, small SimHash Hamming distance,
n-gram Jaccard pairs)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from peerdb_cdc_psql_clickhouse_spark.catalog import load_table
from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signature,
    simhash,
)

SF = "/root/testdata/sf0.001"
N_PLANTED = 15
OFFSET = 1_000_000


@pytest.fixture(scope="module")
def planted(spark):
    """Docs + near-dup copies of doc_id < N_PLANTED: first word of
    every 25th position changed via regexp (small perturbation)."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") < N_PLANTED).select(
        (F.col("doc_id") + OFFSET).alias("doc_id"),
        # perturb: replace the first occurrence of ' the ' (if any)
        F.regexp_replace("text", r" the ", " THE-EDIT ").alias("text"),
    )
    return docs.unionByName(dups)


def test_minhash_lsh_catches_planted_neardups(spark, planted):
    sig = minhash_signature(planted, "doc_id", "text")
    pairs = lsh_candidate_pairs(sig, "doc_id")
    found = {
        (r["id_a"], r["id_b"])
        for r in pairs.filter(F.col("est_jaccard") >= 0.5).collect()
    }
    hits = sum(
        1 for i in range(N_PLANTED) if (i, i + OFFSET) in found
    )
    assert hits >= int(N_PLANTED * 0.85), f"only {hits}/{N_PLANTED}"


def test_simhash_planted_neardups_have_small_hamming(spark, planted):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(
        planted, "doc_id", "text"
    ).collect()}
    close = 0
    for i in range(N_PLANTED):
        d = bin(sigs[i] ^ sigs[i + OFFSET]).count("1")
        if d <= 3:  # of 16 bits
            close += 1
    assert close >= int(N_PLANTED * 0.85), f"only {close}/{N_PLANTED}"


def test_planting_adds_no_false_original_pairs(spark, planted):
    """Specificity: the high-jaccard pairs among ORIGINALS in the
    planted corpus are exactly the corpus's own natural duplicates —
    perturbation introduces no false positives between originals."""
    def high_pairs(df):
        sig = minhash_signature(df, "doc_id", "text")
        return {
            (r["id_a"], r["id_b"])
            for r in lsh_candidate_pairs(sig, "doc_id")
            .filter(F.col("est_jaccard") >= 0.9)
            .collect()
        }

    originals = load_table(spark, SF, "documents").select("doc_id", "text")
    natural = high_pairs(originals)
    with_planted = {
        p
        for p in high_pairs(planted)
        if p[0] < OFFSET and p[1] < OFFSET
    }
    assert with_planted == natural

def test_stream_neardup_screen_against_history(spark, tmp_path):
    """Incremental ingestion: a streaming batch containing (a) a
    near-copy of a historical doc and (b) a novel doc is screened
    against the static signature table — the near-copy flags with high
    est_jaccard, the novel doc doesn't flag."""
    from pyspark.sql import functions as F

    from peerdb_cdc_psql_clickhouse_spark.catalog import load_table
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        minhash_signature,
        stream_neardup_candidates,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    hist_sig = minhash_signature(docs, "doc_id", "text")

    base = docs.orderBy("doc_id").limit(1).collect()[0]
    near_copy = base["text"] + " extra tail words here"
    novel = " ".join(f"zq{i}w unique nonsense token" for i in range(30))
    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [(900001, near_copy), (900002, novel)],
        "doc_id long, text string",
    ).write.parquet(feed)

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        feed
    )
    flagged = stream_neardup_candidates(stream, hist_sig)
    got = []
    q = (
        flagged.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _id: got.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    hits = {
        (r["doc_id"], r["hist_id"]): r["est_jaccard"] for r in got
    }
    assert any(
        d == 900001 and h == base["doc_id"] and j >= 0.5
        for (d, h), j in hits.items()
    )  # near-copy found against its historical original
    assert not any(d == 900002 for (d, _h) in hits)  # novel doc clean
