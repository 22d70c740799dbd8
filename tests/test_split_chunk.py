"""split_corpus: DuckDB replays assignment bit-for-bit, proportions
track weights, membership is stable under corpus growth.
chunk_documents: DuckDB replay, full coverage, overlap arithmetic.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from .conftest import SF_SMOKE
from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
    chunk_documents,
    chunk_oracle,
    split_corpus,
    split_oracle,
)


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _duck(sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    return con.execute(sql).fetchall()


def test_split_matches_duckdb_and_tracks_weights(spark):
    w = {"train": 0.9, "val": 0.06, "test": 0.04}
    got = {
        r["doc_id"]: r["split"]
        for r in split_corpus(_docs(spark), w, seed=5).collect()
    }
    want = dict(
        _duck(
            split_oracle(w, seed=5).replace(
                "SELECT *,", "SELECT doc_id,"
            )
        )
    )
    assert got == want
    n = len(got)
    from collections import Counter

    c = Counter(got.values())
    assert abs(c["train"] / n - 0.9) < 0.05
    assert c["val"] > 0 and c["test"] > 0


def test_split_stable_under_growth(spark):
    base = _docs(spark)
    grown = base.unionByName(
        base.select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    )
    a = {
        r["doc_id"]: r["split"] for r in split_corpus(base, seed=5).collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in split_corpus(grown, seed=5).collect()
        if r["doc_id"] < 10_000_000
    }
    assert a == b  # old docs never reassigned


def test_chunks_match_duckdb(spark):
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(_docs(spark), 32, 24).collect()
    }
    want = {
        (r[0], r[1]): (r[2], r[3]) for r in _duck(chunk_oracle(32, 24))
    }
    assert got == want and len(got) > 0


def test_chunk_coverage_and_overlap(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100)))],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(df, max_tokens=32, stride=24).collect(),
        key=lambda r: r.chunk_id,
    )
    toks = [f"t{i}" for i in range(100)]
    seen = []
    for r in rows:
        start = r.chunk_id * 24
        expect = toks[start : start + 32]
        assert r.chunk_text.split(" ") == expect
        seen.extend(expect)
    assert set(seen) == set(toks)  # every token covered
    # consecutive chunks overlap by max_tokens - stride = 8
    assert rows[0].chunk_text.split(" ")[-8:] == rows[1].chunk_text.split(" ")[:8]
    # last chunk may be short but never empty
    assert all(r.n_tokens > 0 for r in rows)


def test_chunk_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "just three tokens"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, max_tokens=32, stride=24).collect()
    assert [(r.doc_id, r.chunk_id, r.n_tokens) for r in rows] == [(1, 0, 3)]
