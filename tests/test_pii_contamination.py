"""PII signals/masking and benchmark-contamination screening."""

from __future__ import annotations

import re

from peerdb_cdc_psql_clickhouse_spark.catalog import load_table
from peerdb_cdc_psql_clickhouse_spark.operators.text import (
    PII_PATTERNS,
    contamination_flags,
    pii_signals,
)

SF = "/root/testdata/sf0.001"


def test_pii_counts_and_masking(spark):
    rows = [
        (1, "contact me at alice@example.com or bob@test.org thanks"),
        (2, "call +1 (555) 123-4567 now"),
        (3, "server at 192.168.1.100 is down"),
        (4, "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_signals(df).collect()}
    assert got[1]["n_email"] == 2 and got[1]["pii_total"] == 2
    assert got[2]["n_phone"] == 1
    assert got[3]["n_ipv4"] == 1
    assert got[4]["pii_total"] == 0
    assert "alice@example.com" not in got[1]["masked_text"]
    assert got[1]["masked_text"].count("[PII]") == 2
    assert got[4]["masked_text"] == rows[3][1]  # untouched


def test_pii_counts_match_python_re_on_corpus(spark):
    docs = load_table(spark, SF, "documents")
    got = {
        r["doc_id"]: (r["n_email"], r["n_phone"], r["n_ipv4"])
        for r in pii_signals(docs).collect()
    }
    for r in docs.collect():
        want = tuple(
            len(re.findall(PII_PATTERNS[k], r["text"]))
            for k in ("email", "phone", "ipv4")
        )
        assert got[r["doc_id"]] == want, r["doc_id"]


def test_contamination_flags_planted_benchmark_overlap(spark):
    docs = load_table(spark, SF, "documents")
    # benchmark items = verbatim snippets of two real docs -> those
    # docs MUST flag; an unrelated probe must flag nothing
    snippets = [
        (r["doc_id"], " ".join(r["text"].split()[:12]))
        for r in docs.orderBy("doc_id").limit(2).collect()
    ]
    bench = spark.createDataFrame(
        [(s,) for _, s in snippets] + [("zz qq xx yy ww vv uu tt",)],
        "text string",
    )
    got = {
        r["doc_id"]: (r["shared_ngrams"], r["contaminated"])
        for r in contamination_flags(docs, bench).collect()
    }
    assert len(got) == docs.count()  # every doc gets a row
    for doc_id, _ in snippets:
        shared, flagged = got[doc_id]
        assert flagged and shared >= 2, doc_id
    # overwhelming majority of the corpus is clean
    n_flagged = sum(1 for _, f in got.values() if f)
    assert n_flagged < docs.count() * 0.2


def test_contamination_plan_broadcasts_benchmark(spark):
    import contextlib
    import io

    docs = load_table(spark, SF, "documents")
    bench = spark.createDataFrame([("some probe text here",)], "text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        contamination_flags(docs, bench).explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
