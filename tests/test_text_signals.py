"""Text-analysis signal ops vs driver-side Python oracles.

The declared x3* queries are DuckDB-hash-checked by the driver; these
tests cover the non-declared text APIs (repetition filters) against an
exact Python re-implementation on collected rows at sf0.001.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

from peerdb_cdc_psql_clickhouse_spark.catalog import load_table
from peerdb_cdc_psql_clickhouse_spark.operators.text import (
    repetition_signals,
)

SF = "/root/testdata/sf0.001"


def _py_signals(text: str, n: int = 3):
    toks = [t for t in re.split(r"\s+", text.lower()) if t != ""]
    if len(toks) >= n:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    else:
        grams = [" ".join(toks)]
    sents = [
        s.strip()
        for s in re.split(r"[.!?]\s+|[.!?]$", text)
        if s.strip() != ""
    ]

    def frac(arr):
        if not arr:
            return 0.0
        import math

        raw = (len(arr) - len(set(arr))) / len(arr)
        return math.floor(raw * 10_000 + 0.5) / 10_000

    return (len(grams), frac(grams), len(sents), frac(sents))


def test_repetition_signals_match_python_oracle(spark):
    docs = load_table(spark, SF, "documents")
    got = {
        r["doc_id"]: (
            r["ngram_cnt"],
            r["dup_ngram_frac"],
            r["sentence_cnt"],
            r["dup_sentence_frac"],
        )
        for r in repetition_signals(docs).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(got) == len(texts)
    mismatches = {
        d: (got[d], _py_signals(t))
        for d, t in texts.items()
        if got[d] != _py_signals(t)
    }
    assert not mismatches, dict(list(mismatches.items())[:3])


def test_repetition_signals_flag_repetitive_docs(spark):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    clean = "one two three four five six seven eight nine ten"
    loopy = "buy now " * 30  # pathological boilerplate
    df = spark.createDataFrame([(1, clean), (2, loopy)], schema)
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert got[1]["dup_ngram_frac"] == 0.0
    assert got[2]["dup_ngram_frac"] > 0.9


def test_repetition_signals_degenerate_docs(spark):
    schema = "doc_id long, text string"
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two")], schema
    )
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    for d in (1, 2, 3):
        assert got[d]["dup_ngram_frac"] == 0.0
        assert got[d]["dup_sentence_frac"] == 0.0


def test_repetition_signals_plan_is_map_only(spark):
    import contextlib
    import io

    docs = load_table(spark, SF, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        repetition_signals(docs).explain("formatted")
    assert "Exchange" not in buf.getvalue()  # zero shuffle, one scan
