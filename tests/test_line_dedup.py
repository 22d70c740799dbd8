"""Line-level exact dedup (C4/FineWeb style): repeated lines removed
corpus-wide, canonical (lowest (doc_id, line_no)) copy kept, docs
rebuilt in order. Hand corpora with known outcomes first, then full
DuckDB replay parity on planted multi-line corpora (testdata docs have
no newlines, so real-table parity only proves the passthrough leg).
"""

from __future__ import annotations

import duckdb

from .conftest import SF_ORACLE
from .oracle_util import _norm_frame, duckdb_run

from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
    line_dedup_apply,
    line_dedup_oracle,
    line_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = "accept all cookies to continue"
NAV = "home | products | about"


def test_repeated_line_kept_once_in_canonical(spark):
    rows = [
        (1, f"unique one\n{BOILER}\nbody of one"),
        (2, f"{BOILER}\nbody of two"),
        (3, f"body of three\n{BOILER}"),
    ]
    out = {
        r["doc_id"]: (r["text"], r["removed_lines"])
        for r in line_dedup_apply(_docs(spark, rows)).collect()
    }
    # canonical carrier is doc 1 (lowest (doc_id, line_no)) — untouched
    assert out[1] == (f"unique one\n{BOILER}\nbody of one", 0)
    assert out[2] == ("body of two", 1)
    assert out[3] == ("body of three", 1)


def test_within_doc_repeats_also_collapse(spark):
    rows = [(1, "x\nx\nx\ny")]
    out = line_dedup_apply(_docs(spark, rows)).collect()[0]
    assert out["text"] == "x\ny"
    assert out["removed_lines"] == 2


def test_blank_lines_are_separators_not_content(spark):
    # blank lines repeat everywhere but are never dedup keys; a doc
    # with no removals passes through VERBATIM (blanks intact), a
    # rebuilt doc is normalized to its non-blank survivors
    rows = [
        (1, "a\n\n\nb"),
        (2, f"{BOILER}\n\nc"),
        (3, f"d\n\n{BOILER}"),
    ]
    out = {
        r["doc_id"]: (r["text"], r["removed_lines"])
        for r in line_dedup_apply(_docs(spark, rows)).collect()
    }
    assert out[1] == ("a\n\n\nb", 0)
    # canonical doc keeps its copy AND (no removals) its blank line
    assert out[2] == (f"{BOILER}\n\nc", 0)
    assert out[3] == ("d", 1)


def test_doc_reduced_to_nothing_and_empty_doc(spark):
    rows = [(1, NAV), (2, NAV), (3, "")]
    out = {
        r["doc_id"]: (r["text"], r["removed_lines"])
        for r in line_dedup_apply(_docs(spark, rows)).collect()
    }
    assert out[1] == (NAV, 0)
    assert out[2] == ("", 1)
    assert out[3] == ("", 0)


def test_min_count_threshold(spark):
    rows = [(1, "p\nq"), (2, "p\nr"), (3, "p\ns")]
    # min_count=4: nothing removed (p occurs 3x)
    assert (
        line_dedup_apply(_docs(spark, rows), min_count=4)
        .filter("removed_lines > 0")
        .count()
        == 0
    )
    # default min_count=2 removes p from docs 2 and 3
    removed = (
        line_dedup_apply(_docs(spark, rows))
        .filter("removed_lines > 0")
        .count()
    )
    assert removed == 2


def test_line_stats_counts_and_canonical(spark):
    rows = [(5, f"{NAV}\nalpha"), (2, f"beta\n{NAV}"), (9, NAV)]
    stats = {
        r["occurrences"]: (r["canon_id"], r["canon_line_no"])
        for r in line_stats(_docs(spark, rows))
        .filter("occurrences > 1")
        .collect()
    }
    # NAV occurs 3x; canonical is doc 2 line 2? no — lowest (id, line)
    # is (2, 2) vs (5, 1) vs (9, 1): struct min orders by id first
    assert stats == {3: (2, 2)}


def test_duckdb_oracle_parity_planted(spark):
    rows = []
    for i in range(40):
        body = [f"unique {i} {j}" for j in range(i % 5)]
        lines = [BOILER] + body if i % 2 else body + [NAV, BOILER]
        rows.append((i, "\n".join(lines)))
    docs = _docs(spark, rows)
    got = line_dedup_apply(docs).toPandas()
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = con.execute(line_dedup_oracle()).fetchdf()
    g_rows, g_cols = _norm_frame(got)
    w_rows, w_cols = _norm_frame(want)
    assert g_cols == w_cols
    assert g_rows == w_rows
    assert (got["removed_lines"] > 0).sum() >= 38


def test_oracle_parity_real_documents(spark):
    # testdata docs are single-line; parity still proves the
    # passthrough + whole-doc-duplicate legs end to end
    got = line_dedup_apply(
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    ).toPandas()
    want = duckdb_run(line_dedup_oracle(), SF_ORACLE)
    g_rows, g_cols = _norm_frame(got)
    w_rows, w_cols = _norm_frame(want)
    assert g_cols == w_cols
    assert g_rows == w_rows


# -- incremental + streaming screens ----------------------------------------


def test_screen_matches_batch_operator_when_ids_ordered(spark):
    history = _docs(
        spark,
        [
            (1, f"intro one\n{BOILER}\nbody one"),
            (2, f"{NAV}\nbody two"),
        ],
    )
    batch = _docs(
        spark,
        [
            (10, f"{BOILER}\nfresh text ten"),
            (11, f"fresh text eleven\n{NAV}\n{BOILER}"),
            (12, "entirely novel content"),
        ],
    )
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        line_dedup_against,
    )

    got = {
        r["doc_id"]: (r["text"], r["removed_lines"])
        for r in line_dedup_against(batch, line_stats(history)).collect()
    }
    # the batch operator over history+batch, restricted to batch ids
    # (batch ids sort after history ids and the batch has no internal
    # repeats, so the corpus canonical is always the history copy)
    want = {
        r["doc_id"]: (r["text"], r["removed_lines"])
        for r in line_dedup_apply(history.unionByName(batch)).collect()
        if r["doc_id"] >= 10
    }
    assert got == want
    assert got[10] == ("fresh text ten", 1)
    assert got[11] == ("fresh text eleven", 2)
    assert got[12] == ("entirely novel content", 0)


def test_stats_merge_accumulates(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        line_stats_merge,
    )

    h0 = line_stats(_docs(spark, [(1, f"a\n{BOILER}")]))
    merged = line_stats_merge(h0, _docs(spark, [(7, f"{BOILER}\nz")]))
    by_occ = {
        r["occurrences"]: (r["canon_id"], r["canon_line_no"])
        for r in merged.collect()
    }
    # BOILER now 2 occurrences, canonical still (1, 2)
    assert by_occ[2] == (1, 2)
    # a third fold re-checks canonical stability with a lower id
    merged2 = line_stats_merge(merged, _docs(spark, [(0, BOILER)]))
    row = merged2.filter("occurrences = 3").collect()[0]
    assert (row["canon_id"], row["canon_line_no"]) == (0, 1)


def test_stream_line_screen(spark, tmp_path):
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        stream_line_dedup_candidates,
    )

    history = _docs(spark, [(1, f"one\n{BOILER}"), (2, f"{NAV}\ntwo")])
    stats = line_stats(history)
    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [(901, f"{BOILER}\nnovel line"), (902, "all novel here")],
        "doc_id long, text string",
    ).write.parquet(feed)
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        feed
    )
    got = []
    q = (
        stream_line_dedup_candidates(stream, stats)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, _id: got.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    flagged = {(r["doc_id"], r["line_no"], r["canon_id"]) for r in got}
    assert flagged == {(901, 1, 1)}


def test_randomized_python_oracle(spark):
    """Randomized corpora vs an independent pure-Python reference
    implementation (same contract: corpus-wide line counts, lowest
    (doc_id, line_no) canonical, non-blank survivors rebuilt)."""
    import random

    rng = random.Random(20260814)
    pool = [f"line {i}" for i in range(12)] + ["", "  "]
    for trial in range(5):
        rows = [
            (
                did,
                "\n".join(
                    rng.choice(pool)
                    for _ in range(rng.randint(0, 8))
                ),
            )
            for did in range(rng.randint(1, 12))
        ]
        got = {
            r["doc_id"]: (r["text"], r["removed_lines"])
            for r in line_dedup_apply(_docs(spark, rows)).collect()
        }

        # independent reference
        occ: dict[str, list[tuple[int, int]]] = {}
        for did, text in rows:
            for ln0, line in enumerate(text.split("\n")):
                if line.strip():
                    occ.setdefault(line, []).append((did, ln0 + 1))
        canon = {line: min(ps) for line, ps in occ.items()}
        want = {}
        for did, text in rows:
            kept, removed = [], 0
            for ln0, line in enumerate(text.split("\n")):
                if not line.strip():
                    continue
                if len(occ[line]) < 2 or canon[line] == (did, ln0 + 1):
                    kept.append(line)
                else:
                    removed += 1
            want[did] = (
                text if removed == 0 else "\n".join(kept),
                removed,
            )
        assert got == want, f"trial {trial}"
