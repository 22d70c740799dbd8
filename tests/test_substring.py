"""substring_spans: exact shared-substring detection via positional
shingle hashes + diagonal run grouping (the distributed stand-in for
Lee et al.'s suffix-array exact-substring dedup).

Two layers: hand-built corpora where every span boundary is known in
advance, then full DuckDB oracle parity on the real documents table —
the same rigor as the driver's hash gate, minus the 50-slot cap.
"""

from __future__ import annotations

from .conftest import SF_ORACLE
from .oracle_util import _norm_frame, duckdb_run

from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
    substring_spans,
    substring_spans_oracle,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = [f"w{i}" for i in range(100)]


def test_single_shared_span_exact_boundaries(spark):
    # doc 1 tokens 11..30 == doc 2 tokens 6..25 (20 shared tokens),
    # unique filler everywhere else
    shared = WORDS[:20]
    a = [f"a{i}" for i in range(10)] + shared + [f"A{i}" for i in range(10)]
    b = [f"b{i}" for i in range(5)] + shared + [f"B{i}" for i in range(15)]
    out = substring_spans(
        _docs(spark, [(1, " ".join(a)), (2, " ".join(b))])
    ).collect()
    assert len(out) == 1
    r = out[0]
    # 20 shared tokens = 16 consecutive 5-shingle matches
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert (r.start_a, r.start_b) == (11, 6)
    assert r.match_shingles == 16
    assert r.span_tokens == 20


def test_below_min_run_not_reported(spark):
    # 8 shared tokens = 4 shingle matches; min_run=5 filters it out
    shared = WORDS[:8]
    a = [f"a{i}" for i in range(10)] + shared
    b = [f"b{i}" for i in range(10)] + shared
    rows = [(1, " ".join(a)), (2, " ".join(b))]
    assert substring_spans(_docs(spark, rows), min_run=5).count() == 0
    hit = substring_spans(_docs(spark, rows), min_run=4).collect()
    assert len(hit) == 1 and hit[0].span_tokens == 8


def test_two_disjoint_spans_stay_separate(spark):
    # same doc pair, two shared regions separated by unique filler on
    # BOTH sides -> two island rows, not one merged span
    s1, s2 = WORDS[:10], WORDS[50:60]
    a = s1 + [f"a{i}" for i in range(7)] + s2
    b = s1 + [f"b{i}" for i in range(3)] + s2
    out = sorted(
        substring_spans(_docs(spark, [(1, " ".join(a)), (2, " ".join(b))]))
        .collect(),
        key=lambda r: r.start_a,
    )
    assert [(r.start_a, r.start_b, r.span_tokens) for r in out] == [
        (1, 1, 10),
        (18, 14, 10),
    ]


def test_repeated_shingle_within_doc(spark):
    # the shared phrase occurs TWICE in doc b -> one span per b-side
    # occurrence (distinct diagonals), boundaries exact
    shared = WORDS[:10]
    a = [f"a{i}" for i in range(4)] + shared
    b = shared + [f"b{i}" for i in range(5)] + shared
    out = sorted(
        substring_spans(_docs(spark, [(1, " ".join(a)), (2, " ".join(b))]))
        .collect(),
        key=lambda r: r.start_b,
    )
    assert [(r.start_a, r.start_b, r.span_tokens) for r in out] == [
        (5, 1, 10),
        (5, 16, 10),
    ]


def test_three_docs_pairwise(spark):
    shared = WORDS[:12]
    rows = [
        (i, " ".join([f"x{i}_{j}" for j in range(i)] + shared))
        for i in (1, 2, 3)
    ]
    out = substring_spans(_docs(spark, rows)).collect()
    assert {(r.doc_a, r.doc_b) for r in out} == {(1, 2), (1, 3), (2, 3)}
    assert all(r.span_tokens == 12 for r in out)


def test_occ_cap_routes_boilerplate_to_star(spark):
    # a phrase present in ALL 30 docs is boilerplate: with occ_cap
    # below its fan-out the r4 hot path reports one star span per
    # non-canonical doc (O(occ), not O(occ²)); hot_path=False restores
    # the pre-r4 silent drop; a loose cap reports every pair
    shared = WORDS[:10]
    rows = [
        (i, " ".join([f"u{i}_{j}" for j in range(3)] + shared))
        for i in range(30)
    ]
    docs = _docs(spark, rows)
    star = substring_spans(docs, occ_cap=20).collect()
    assert {(r.doc_a, r.doc_b) for r in star} == {
        (0, i) for i in range(1, 30)
    }
    assert all(
        (r.start_a, r.start_b, r.span_tokens) == (4, 4, 10) for r in star
    )
    assert substring_spans(docs, occ_cap=20, hot_path=False).count() == 0
    assert substring_spans(docs, occ_cap=1000).count() == 30 * 29 / 2


def test_hot_boilerplate_apply_removes_all_but_canonical(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        substring_dedup_apply,
    )

    shared = WORDS[:10]
    rows = [
        (i, " ".join([f"u{i}_{j}" for j in range(3)] + shared))
        for i in range(30)
    ]
    docs = _docs(spark, rows)
    spans = substring_spans(docs, occ_cap=20)
    out = {
        r.doc_id: (r.text, r.removed_tokens)
        for r in substring_dedup_apply(docs, spans).collect()
    }
    # canonical carrier (doc 0) keeps the boilerplate verbatim
    assert out[0] == (" ".join([f"u0_{j}" for j in range(3)] + shared), 0)
    for i in range(1, 30):
        assert out[i] == (" ".join(f"u{i}_{j}" for j in range(3)), 10), i


def test_hot_path_duckdb_parity_planted(spark):
    # mixed corpus — hot boilerplate in 25 docs + a cool chunk shared
    # by 2 docs + unique noise — against the DuckDB replay including
    # the star branch; exact row-set agreement
    import duckdb

    boiler = WORDS[:10]
    cool = WORDS[40:52]
    rows = []
    for i in range(25):
        toks = [f"n{i}_{j}" for j in range(i % 4)] + boiler
        if i in (3, 7):
            toks = toks + cool
        rows.append((i, " ".join(toks)))
    docs = _docs(spark, rows)
    got = substring_spans(docs, occ_cap=10).toPandas()
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = con.execute(
        substring_spans_oracle(occ_cap=10)
    ).fetchdf()
    g_rows, g_cols = _norm_frame(got)
    w_rows, w_cols = _norm_frame(want)
    assert g_cols == w_cols
    assert g_rows == w_rows
    assert len(g_rows) >= 24, "hot star spans + cool pair span expected"


def test_oracle_parity_documents(spark):
    got = substring_spans(
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    ).toPandas()
    want = duckdb_run(substring_spans_oracle(), SF_ORACLE)
    assert len(got) > 0, "expected shared spans among planted near-dups"
    g_rows, g_cols = _norm_frame(got)
    w_rows, w_cols = _norm_frame(want)
    assert g_cols == w_cols
    assert g_rows == w_rows


# -- independent DP oracle ---------------------------------------------------
# The DuckDB parity oracle replays the SAME shingle-hash algorithm; this
# one is algorithm-independent: classic O(n*m) common-substring dynamic
# programming per doc pair, enumerating maximal shared token runs with
# their 1-based start positions. Hash collisions aside (60-bit md5 on
# tiny corpora: none), the operator must agree exactly.


def _dp_spans(tok_a, tok_b, min_tokens):
    n, m = len(tok_a), len(tok_b)
    run = [[0] * (m + 1) for _ in range(n + 1)]
    spans = []
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if tok_a[i - 1] == tok_b[j - 1]:
                run[i][j] = run[i - 1][j - 1] + 1
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            r = run[i][j]
            if r >= min_tokens and (
                i == n or j == m or run[i + 1][j + 1] <= r
            ):
                # maximal: cannot be extended right
                spans.append((i - r + 1, j - r + 1, r))
    return spans


def test_dp_oracle_randomized(spark):
    import random

    rng = random.Random(20260813)
    vocab = [f"t{i}" for i in range(40)]
    k, min_run = 5, 3
    min_tokens = k + min_run - 1  # 7
    docs = []
    for d in range(8):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 60))]
        docs.append(words)
    # plant guaranteed overlaps
    chunk = [rng.choice(vocab) for _ in range(12)]
    docs[1][3:3] = chunk
    docs[4][0:0] = chunk
    docs[6].extend(chunk[:9])

    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
        for r in substring_spans(
            _docs(
                spark,
                [(i, " ".join(w)) for i, w in enumerate(docs)],
            ),
            k=k,
            min_run=min_run,
            occ_cap=10_000,
        ).collect()
    }
    want = set()
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            if len(docs[a]) < k or len(docs[b]) < k:
                continue
            for sa, sb, ln in _dp_spans(docs[a], docs[b], min_tokens):
                want.add((a, b, sa, sb, ln))
    assert got == want
    assert want, "planted overlaps must produce spans"


# -- apply step --------------------------------------------------------------


def test_apply_removes_span_from_higher_id_only(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        substring_dedup_apply,
    )

    shared = WORDS[:20]
    a = [f"a{i}" for i in range(5)] + shared
    b = [f"b{i}" for i in range(3)] + shared + [f"B{i}" for i in range(4)]
    docs = _docs(spark, [(1, " ".join(a)), (2, " ".join(b))])
    spans = substring_spans(docs)
    out = {
        r.doc_id: (r.text, r.removed_tokens)
        for r in substring_dedup_apply(docs, spans).collect()
    }
    # doc 1 (lowest id) keeps its content verbatim (token-joined)
    assert out[1] == (" ".join(a), 0)
    # doc 2 loses exactly the shared 20 tokens, keeps its filler
    want_b = [f"b{i}" for i in range(3)] + [f"B{i}" for i in range(4)]
    assert out[2] == (" ".join(want_b), 20)


def test_apply_python_reference_randomized(spark):
    # independent apply: take the (already DP-verified) span set and
    # remove ranges in plain Python; texts must match exactly
    import random

    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        substring_dedup_apply,
    )

    rng = random.Random(99)
    vocab = [f"v{i}" for i in range(30)]
    docs_tok = []
    chunk = [rng.choice(vocab) for _ in range(15)]
    for d in range(6):
        w = [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
        if d in (1, 3, 5):
            pos = rng.randint(0, len(w))
            w[pos:pos] = chunk
        docs_tok.append(w)
    docs = _docs(
        spark, [(i, " ".join(w)) for i, w in enumerate(docs_tok)]
    )
    spans = substring_spans(docs, occ_cap=10_000)
    span_rows = spans.collect()
    removed = {i: set() for i in range(len(docs_tok))}
    for r in span_rows:
        for p in range(r.start_b, r.start_b + r.span_tokens):
            removed[r.doc_b].add(p)
    want = {
        i: (
            " ".join(
                t
                for p, t in enumerate(w, start=1)
                if p not in removed[i]
            ),
            len(removed[i]),
        )
        for i, w in enumerate(docs_tok)
    }
    got = {
        r.doc_id: (r.text, r.removed_tokens)
        for r in substring_dedup_apply(docs, spans).collect()
    }
    assert got == want
    assert any(n for _t, n in want.values()), "chunk must be removed somewhere"


def test_apply_empty_and_short_docs_pass_through(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        substring_dedup_apply,
    )

    docs = _docs(spark, [(1, ""), (2, "one"), (3, "two tokens")])
    spans = substring_spans(docs)
    out = {
        r.doc_id: (r.text, r.removed_tokens)
        for r in substring_dedup_apply(docs, spans).collect()
    }
    assert out == {1: ("", 0), 2: ("one", 0), 3: ("two tokens", 0)}


# -- incremental screen (new batch vs historical index) ----------------------


def test_incremental_screen_new_vs_history_only(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        shingle_positions,
        substring_spans_against,
    )

    chunk = WORDS[:15]
    # history: docs 1,2 share chunk with each other (old-old — must
    # NOT be reported); doc 3 is clean
    old_rows = [
        (1, " ".join([f"o1_{i}" for i in range(4)] + chunk)),
        (2, " ".join(chunk + [f"o2_{i}" for i in range(6)])),
        (3, " ".join(f"o3_{i}" for i in range(20))),
    ]
    # batch: doc 100 shares chunk with history AND with doc 101
    # (new-new — must NOT be reported); doc 102 clean
    new_rows = [
        (100, " ".join([f"n0_{i}" for i in range(2)] + chunk)),
        (101, " ".join(chunk)),
        (102, " ".join(f"n2_{i}" for i in range(15))),
    ]
    hist = shingle_positions(_docs(spark, old_rows))
    out = substring_spans_against(_docs(spark, new_rows), hist).collect()
    got = {
        (r.new_id, r.old_id, r.start_new, r.start_old, r.span_tokens)
        for r in out
    }
    # every (new with chunk) x (old with chunk) pair, exact boundaries
    assert got == {
        (100, 1, 3, 5, 15),
        (100, 2, 3, 1, 15),
        (101, 1, 1, 5, 15),
        (101, 2, 1, 1, 15),
    }


def test_incremental_screen_flags_history_hot_boilerplate(spark):
    # boilerplate present in MORE than occ_cap history docs: a new doc
    # carrying it must still flag (r4 star path) — against the
    # history's min (id, pos) occurrence only — and a clean new doc
    # must not
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        shingle_positions,
        substring_spans_against,
    )

    boiler = WORDS[:10]
    old_rows = [
        (i, " ".join([f"h{i}_{j}" for j in range(2)] + boiler))
        for i in range(30)
    ]
    new_rows = [
        (100, " ".join([f"n_{j}" for j in range(4)] + boiler)),
        (101, " ".join(f"z_{j}" for j in range(20))),
    ]
    hist = shingle_positions(_docs(spark, old_rows))
    out = substring_spans_against(
        _docs(spark, new_rows), hist, occ_cap=20
    ).collect()
    got = {
        (r.new_id, r.old_id, r.start_new, r.start_old, r.span_tokens)
        for r in out
    }
    # canonical history occurrence is doc 0 at pos 3 (2 filler tokens)
    assert got == {(100, 0, 5, 3, 10)}


def test_incremental_screen_agrees_with_batch_operator(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        shingle_positions,
        substring_spans_against,
    )

    import random

    rng = random.Random(7)
    vocab = [f"q{i}" for i in range(25)]
    chunk = [rng.choice(vocab) for _ in range(10)]
    old_rows, new_rows = [], []
    for i in range(5):
        w = [rng.choice(vocab) for _ in range(rng.randint(5, 30))]
        if i % 2:
            w[2:2] = chunk
        old_rows.append((i, " ".join(w)))
    for i in range(5):
        w = [rng.choice(vocab) for _ in range(rng.randint(5, 30))]
        if i % 2 == 0:
            w.extend(chunk)
        new_rows.append((100 + i, " ".join(w)))

    hist = shingle_positions(_docs(spark, old_rows))
    inc = {
        (r.new_id, r.old_id, r.start_new, r.start_old, r.span_tokens)
        for r in substring_spans_against(
            _docs(spark, new_rows), hist, occ_cap=10_000
        ).collect()
    }
    # reference: the batch operator over the union, restricted to
    # cross (old, new) pairs — ids chosen so old < new always
    union = substring_spans(
        _docs(spark, old_rows + new_rows), occ_cap=10_000
    ).collect()
    want = {
        (r.doc_b, r.doc_a, r.start_b, r.start_a, r.span_tokens)
        for r in union
        if r.doc_a < 100 <= r.doc_b
    }
    assert inc == want
    assert want, "planted overlaps must appear"


def test_substring_spans_materialized_shingles_match_persisted(spark):
    """r13 (ADVICE r12): the shared shingle frame takes reuse()'s
    write-once-parquet path when the caller signals corpus scale
    (materialize_shingles / a shingle_size_hint_bytes past the
    threshold) — results must be identical to the persist path."""
    shared = WORDS[:20]
    a = [f"a{i}" for i in range(10)] + shared + [f"A{i}" for i in range(10)]
    b = [f"b{i}" for i in range(5)] + shared + [f"B{i}" for i in range(15)]
    docs = _docs(spark, [(1, " ".join(a)), (2, " ".join(b))])
    want = sorted(map(tuple, substring_spans(docs).collect()))
    got = sorted(
        map(
            tuple,
            substring_spans(docs, materialize_shingles=True).collect(),
        )
    )
    assert got == want and len(got) == 1
    # the hint alone must flip the strategy past the threshold too
    from peerdb_cdc_psql_clickhouse_spark.plans import layout

    got_hint = sorted(
        map(
            tuple,
            substring_spans(
                docs,
                shingle_size_hint_bytes=layout.MATERIALIZE_THRESHOLD_BYTES
                + 1,
            ).collect(),
        )
    )
    assert got_hint == want


def test_table_bytes_local_paths(tmp_path):
    """catalog.table_bytes: file, directory, and missing-path shapes."""
    from peerdb_cdc_psql_clickhouse_spark.catalog import table_bytes

    one = tmp_path / "one.parquet"
    one.write_bytes(b"x" * 10)
    assert table_bytes(str(tmp_path), "one") == 10

    d = tmp_path / "many.parquet"
    (d / "sub").mkdir(parents=True)
    (d / "part-0").write_bytes(b"x" * 7)
    (d / "sub" / "part-1").write_bytes(b"x" * 5)
    assert table_bytes(str(tmp_path), "many") == 12

    assert table_bytes(str(tmp_path), "absent") is None
