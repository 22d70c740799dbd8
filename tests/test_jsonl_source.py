"""JSONL corpus source/sink: explicit-schema round trip, corrupt-line
quarantine, gzip shards, and the streaming front door feeding a dedup
screen."""

from __future__ import annotations

import glob
import gzip
import os

from pyspark.sql import functions as F

from peerdb_cdc_psql_clickhouse_spark.sources.jsonl import (
    read_jsonl,
    read_jsonl_stream,
    write_jsonl,
)


def _sample_docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_round_trip_preserves_rows(spark, tmp_path):
    docs = _sample_docs(spark)
    path = str(tmp_path / "corpus")
    write_jsonl(docs, path, shards=3)
    back = read_jsonl(spark, path)
    assert back.corrupt.count() == 0
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.good.select(*docs.columns).collect()}
    assert a == b
    assert len(glob.glob(os.path.join(path, "part-*"))) == 3


def test_gzip_shards_round_trip(spark, tmp_path):
    docs = _sample_docs(spark).limit(20)
    path = str(tmp_path / "gz")
    write_jsonl(docs, path, shards=2, compress=True)
    files = glob.glob(os.path.join(path, "part-*.gz"))
    assert len(files) == 2
    with gzip.open(files[0], "rt") as f:
        assert f.readline().startswith("{")
    back = read_jsonl(spark, path)
    assert back.good.count() == 20


def test_corrupt_lines_quarantined_not_nulled(spark, tmp_path):
    land = tmp_path / "land"
    land.mkdir()
    lines = [
        '{"doc_id": 1, "text": "good one", "lang": "en", '
        '"source": "t", "n_chars": 8}',
        "this is not json at all",
        '{"doc_id": 2, "text": "also fine", "lang": "en", '
        '"source": "t", "n_chars": 9}',
        '{"doc_id": "unclosed...',
    ]
    (land / "shard0.jsonl").write_text("\n".join(lines) + "\n")
    got = read_jsonl(spark, str(land))
    assert got.good.count() == 2
    assert set(
        r["doc_id"] for r in got.good.select("doc_id").collect()
    ) == {1, 2}
    bad = [r["_corrupt"] for r in got.corrupt.collect()]
    assert len(bad) == 2
    assert "this is not json at all" in bad


def test_stream_front_door_feeds_line_screen(spark, tmp_path):
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        line_stats,
        stream_line_dedup_candidates,
    )

    boiler = "subscribe to our newsletter"
    history = spark.createDataFrame(
        [(1, f"old doc\n{boiler}")], "doc_id long, text string"
    )
    stats = line_stats(history)
    land = str(tmp_path / "land")
    write_jsonl(
        spark.createDataFrame(
            [(900, f"{boiler}\nnew stuff", "en", "web", 10)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ),
        land,
    )
    stream = read_jsonl_stream(spark, land, max_files_per_trigger=1)
    got = []
    q = (
        stream_line_dedup_candidates(
            stream.select("doc_id", "text"), stats
        )
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _id: got.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert {(r["doc_id"], r["canon_id"]) for r in got} == {(900, 1)}
