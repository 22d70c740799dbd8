"""clean_corpus: the composed exact -> line -> substring cleaning
chain. Hand corpus with all three duplication modes planted, stage
toggles, and the near-idempotence property (second pass removes
nothing)."""

from __future__ import annotations

from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import clean_corpus

WORDS = [f"w{i}" for i in range(60)]
SPAN = " ".join(WORDS[:20])  # 20 shared tokens -> substring hit
LINE = "all rights reserved worldwide"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(spark):
    return _docs(
        spark,
        [
            # 1+2: exact duplicates (2 dropped entirely)
            (1, "identical full document content here"),
            (2, "identical full document content here"),
            # 3: canonical carriers of LINE and SPAN
            (3, f"{LINE}\nunique body three {SPAN}"),
            # 4: repeats LINE (cut) and SPAN (cut), keeps own tail
            (4, f"{LINE}\nown intro four {SPAN} own tail four"),
            # 5: clean
            (5, "entirely original five"),
        ],
    )


def test_all_three_stages_fire(spark):
    out = {
        r["doc_id"]: (r["text"], r["removed_lines"], r["removed_tokens"])
        for r in clean_corpus(_corpus(spark)).collect()
    }
    assert set(out) == {1, 3, 4, 5}  # doc 2 dropped by exact stage
    assert out[1] == ("identical full document content here", 0, 0)
    assert out[3][1:] == (0, 0)  # canonical keeps everything
    # doc 4 lost the LINE (1 line) and the SPAN (20 tokens)
    assert out[4][1] == 1
    assert out[4][2] == 20
    assert "own intro four" in out[4][0]
    assert "own tail four" in out[4][0]
    assert SPAN not in out[4][0]
    assert LINE not in out[4][0]
    assert out[5] == ("entirely original five", 0, 0)


def test_stage_toggles(spark):
    docs = _corpus(spark)
    no_sub = {
        r["doc_id"]: r["removed_tokens"]
        for r in clean_corpus(docs, substrings=False).collect()
    }
    assert set(no_sub) == {1, 3, 4, 5} and all(
        v == 0 for v in no_sub.values()
    )
    no_exact = clean_corpus(docs, exact=False)
    assert no_exact.count() == 5  # doc 2 survives
    # line stage off: LINE keeps both copies, SPAN still cut
    no_lines = {
        r["doc_id"]: (r["text"], r["removed_lines"])
        for r in clean_corpus(docs, lines=False).collect()
    }
    assert no_lines[4][1] == 0
    assert LINE in no_lines[4][0]


def test_second_pass_is_noop(spark):
    first = clean_corpus(_corpus(spark)).select("doc_id", "text")
    again = clean_corpus(first).collect()
    assert {r["doc_id"] for r in again} == {1, 3, 4, 5}
    assert all(
        r["removed_lines"] == 0 and r["removed_tokens"] == 0
        for r in again
    )
    texts_1 = {
        r["doc_id"]: r["text"] for r in first.collect()
    }
    texts_2 = {r["doc_id"]: r["text"] for r in again}
    assert texts_1 == texts_2


def test_decontaminate_stage_drops_benchmark_overlap(spark):
    bench = spark.createDataFrame(
        [("what is the capital of assyria and its rivers",)],
        "text string",
    )
    docs = _corpus(spark).unionByName(
        _docs(
            spark,
            [(6, "padding what is the capital of assyria and its "
                 "rivers more padding")],
        )
    )
    # exact-screen path
    ids = {
        r["doc_id"]
        for r in clean_corpus(docs, decontaminate=bench).collect()
    }
    assert ids == {1, 3, 4, 5}  # 6 dropped (contaminated), 2 (exact dup)
    # bloom path gives the same verdicts here (fp ~ 0 at default m)
    from peerdb_cdc_psql_clickhouse_spark.operators.dedup import (
        _shingles_of,
        _tokens,
    )
    from peerdb_cdc_psql_clickhouse_spark.operators.text import bloom_build
    from pyspark.sql import functions as F

    grams = (
        bench.select(_tokens(F.col("text")).alias("_toks"))
        .select(
            F.explode(
                F.array_distinct(_shingles_of(F.col("_toks"), 3))
            ).alias("gram")
        )
        .distinct()
    )
    bloom = bloom_build(grams)
    ids_b = {
        r["doc_id"]
        for r in clean_corpus(docs, decontaminate=bloom).collect()
    }
    assert ids_b == ids


def _stage_mtimes(root):
    import glob
    import os

    out = {}
    for f in glob.glob(f"{root}/**/*", recursive=True):
        if os.path.isfile(f):
            out[f] = os.path.getmtime(f)
    return out


def test_staged_run_matches_unstaged_and_resumes(spark, tmp_path):
    """stage_dir makes the chain restartable: same output as the
    in-memory chain, re-run skips completed stages (file mtimes
    untouched), and removing a stage's _SUCCESS recomputes that stage
    and downstream but not upstream."""
    import os
    import time

    sd = str(tmp_path / "stages")
    want = {
        (r["doc_id"], r["text"], r["removed_lines"], r["removed_tokens"])
        for r in clean_corpus(_corpus(spark)).collect()
    }
    got = {
        (r["doc_id"], r["text"], r["removed_lines"], r["removed_tokens"])
        for r in clean_corpus(_corpus(spark), stage_dir=sd).collect()
    }
    assert got == want
    for stage in ("exact", "lines", "substrings"):
        assert os.path.exists(f"{sd}/{stage}/_SUCCESS")

    # resume: nothing recomputes
    before = _stage_mtimes(sd)
    time.sleep(1.1)
    again = {
        (r["doc_id"], r["text"], r["removed_lines"], r["removed_tokens"])
        for r in clean_corpus(_corpus(spark), stage_dir=sd).collect()
    }
    assert again == want
    assert _stage_mtimes(sd) == before

    # crash window: a stage without its marker re-runs, upstream not
    os.remove(f"{sd}/lines/_SUCCESS")
    time.sleep(1.1)
    third = {
        (r["doc_id"], r["text"], r["removed_lines"], r["removed_tokens"])
        for r in clean_corpus(_corpus(spark), stage_dir=sd).collect()
    }
    assert third == want
    after = _stage_mtimes(sd)
    exact_files = {f: t for f, t in before.items() if "/exact/" in f}
    assert {f: t for f, t in after.items() if "/exact/" in f} == exact_files
    assert any(
        after[f] != before.get(f)
        for f in after
        if "/lines/" in f and f.endswith("_SUCCESS")
    )
    # rebuild PROPAGATES: downstream substrings stage also re-ran,
    # even though its own marker was present (stale-cache guard)
    assert any(
        after[f] != before.get(f)
        for f in after
        if "/substrings/" in f and f.endswith("_SUCCESS")
    )


def test_stage_fingerprint_invalidates_on_param_or_input_change(
    spark, tmp_path
):
    """ADVICE r4: resuming the same stage_dir with different settings
    or a different corpus must NOT silently reuse stale stage output —
    the _FINGERPRINT manifest forces the rebuild."""
    import time

    sd = str(tmp_path / "stages")
    base = clean_corpus(
        _corpus(spark), stage_dir=sd, line_min_count=2
    ).collect()
    assert base
    before = _stage_mtimes(sd)

    # same settings, same corpus -> full reuse
    time.sleep(1.1)
    clean_corpus(_corpus(spark), stage_dir=sd, line_min_count=2).collect()
    assert _stage_mtimes(sd) == before

    # line_min_count change reaches only the lines stage's plan:
    # exact reuses, lines + downstream rebuild
    time.sleep(1.1)
    clean_corpus(_corpus(spark), stage_dir=sd, line_min_count=3).collect()
    after = _stage_mtimes(sd)
    assert {f: t for f, t in after.items() if "/exact/" in f} == {
        f: t for f, t in before.items() if "/exact/" in f
    }
    assert any(
        after[f] != before.get(f)
        for f in after
        if "/lines/" in f and f.endswith("_SUCCESS")
    )

    # different corpus -> the first stage's fingerprint changes and
    # the whole chain rebuilds (the exact failure mode ADVICE named)
    smaller = _corpus(spark).filter("doc_id <= 3")
    before2 = _stage_mtimes(sd)
    time.sleep(1.1)
    out_small = clean_corpus(
        smaller, stage_dir=sd, line_min_count=3
    ).collect()
    after2 = _stage_mtimes(sd)
    assert any(
        after2[f] != before2.get(f)
        for f in after2
        if "/exact/" in f and f.endswith("_SUCCESS")
    )
    assert {r["doc_id"] for r in out_small} <= {1, 2, 3}


def test_stage_fingerprint_sees_a_corpus_swapped_by_path(
    spark, tmp_path
):
    """r5 code review: the logical plan prints only 'paths: N
    provided', so two parquet reads from DIFFERENT directories
    fingerprinted identically — the realistic corpus change (same
    recipe, new path) reused stale stages. The physical-plan
    fingerprint must rebuild."""
    import time

    sd = str(tmp_path / "stages")
    pa, pb = str(tmp_path / "corpusA"), str(tmp_path / "corpusB")
    _corpus(spark).write.parquet(pa)
    _corpus(spark).filter("doc_id % 2 = 0").write.parquet(pb)

    out_a = clean_corpus(spark.read.parquet(pa), stage_dir=sd).collect()
    before = _stage_mtimes(sd)
    time.sleep(1.1)
    # same path -> full reuse
    clean_corpus(spark.read.parquet(pa), stage_dir=sd).collect()
    assert _stage_mtimes(sd) == before

    time.sleep(1.1)
    out_b = clean_corpus(spark.read.parquet(pb), stage_dir=sd).collect()
    after = _stage_mtimes(sd)
    assert any(
        after[f] != before.get(f)
        for f in after
        if "/exact/" in f and f.endswith("_SUCCESS")
    ), "path swap must invalidate the first stage"
    # the staged result equals a fresh unstaged clean of corpus B
    # (canonical choices legitimately differ from corpus A's: a doc
    # whose duplicate-canonical was odd survives in the even-only
    # corpus)
    want_b = {
        r["doc_id"]
        for r in clean_corpus(spark.read.parquet(pb)).collect()
    }
    assert {r["doc_id"] for r in out_b} == want_b
    assert out_a  # corpus A result was non-trivial


def test_deconta_fingerprint_sees_inmemory_benchmark_swap(
    spark, tmp_path
):
    """ADVICE r7 (medium): an in-memory benchmark frame is a
    LocalRelation whose canonical plan string omits the ROW DATA and
    whose inputFiles() is empty — a plan-only fingerprint let a
    swapped benchmark set (same schema) resume with the STALE
    decontaminated stage. The data-carrying case must hash the rows
    themselves."""
    import time

    sd = str(tmp_path / "stages")
    phrase_a = "what is the capital of assyria and its rivers"
    phrase_b = "name the airspeed velocity of an unladen swallow"
    docs = _corpus(spark).unionByName(
        _docs(
            spark,
            [
                (6, f"padding {phrase_a} more padding"),
                (7, f"filler {phrase_b} more filler"),
            ],
        )
    )
    bench_a = spark.createDataFrame([(phrase_a,)], "text string")
    bench_b = spark.createDataFrame([(phrase_b,)], "text string")

    out_a = {
        r["doc_id"]
        for r in clean_corpus(
            docs, stage_dir=sd, decontaminate=bench_a
        ).collect()
    }
    assert out_a == {1, 3, 4, 5, 7}  # 6 contaminated, 2 exact-dup
    before = _stage_mtimes(sd)

    # same benchmark rows (a fresh but identical frame) -> full reuse
    time.sleep(1.1)
    clean_corpus(
        docs,
        stage_dir=sd,
        decontaminate=spark.createDataFrame([(phrase_a,)], "text string"),
    ).collect()
    assert _stage_mtimes(sd) == before

    # swapped benchmark SET, identical schema -> the decontaminated
    # stage (and downstream) must rebuild and drop doc 7 instead
    time.sleep(1.1)
    out_b = {
        r["doc_id"]
        for r in clean_corpus(
            docs, stage_dir=sd, decontaminate=bench_b
        ).collect()
    }
    assert out_b == {1, 3, 4, 5, 6}
    after = _stage_mtimes(sd)
    assert any(
        after[f] != before.get(f)
        for f in after
        if "/decontaminated/" in f and f.endswith("_SUCCESS")
    ), "benchmark swap must invalidate the decontaminated stage"


def test_deconta_fingerprint_sees_mixed_plan_inmemory_swap(
    spark, tmp_path
):
    """Review follow-up on the ADVICE r7 fix: a benchmark frame that
    UNIONS a parquet-backed set with an in-memory one has non-empty
    inputFiles(), but its LocalRelation half is still invisible to
    the plan string — the fingerprint must hash rows whenever the
    plan CONTAINS a LocalRelation leaf, not only when it is fully
    in-memory."""
    import time

    sd = str(tmp_path / "stages")
    phrase_a = "what is the capital of assyria and its rivers"
    phrase_b = "name the airspeed velocity of an unladen swallow"
    phrase_c = "what do you mean an african or european swallow"
    docs = _corpus(spark).unionByName(
        _docs(
            spark,
            [
                (6, f"padding {phrase_a} more padding"),
                (7, f"filler {phrase_b} more filler"),
                (8, f"prefix {phrase_c} suffix"),
            ],
        )
    )
    file_bench = str(tmp_path / "bench_file")
    spark.createDataFrame([(phrase_a,)], "text string").write.parquet(
        file_bench
    )

    def bench(phrase):
        return spark.read.parquet(file_bench).unionByName(
            spark.createDataFrame([(phrase,)], "text string")
        )

    out_b = {
        r["doc_id"]
        for r in clean_corpus(
            docs, stage_dir=sd, decontaminate=bench(phrase_b)
        ).collect()
    }
    assert out_b == {1, 3, 4, 5, 8}  # 6 (file half) + 7 (memory half)
    before = _stage_mtimes(sd)

    # swap ONLY the in-memory half -> must rebuild, now dropping 8
    time.sleep(1.1)
    out_c = {
        r["doc_id"]
        for r in clean_corpus(
            docs, stage_dir=sd, decontaminate=bench(phrase_c)
        ).collect()
    }
    assert out_c == {1, 3, 4, 5, 7}
    after = _stage_mtimes(sd)
    assert any(
        after[f] != before.get(f)
        for f in after
        if "/decontaminated/" in f and f.endswith("_SUCCESS")
    ), "in-memory half swap must invalidate the decontaminated stage"


def test_fingerprint_distinguishes_hashlike_data_literals(spark):
    """ADVICE r5: the id/address normalizations are anchored to the
    plan-printer contexts (`name#N`, ` at 0xADDR`), so two recipes
    that differ ONLY in a data literal that LOOKS like an expression
    id ('#123' vs '#124') or a hex string must fingerprint
    differently."""
    from pyspark.sql import functions as F

    from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
        _plan_fingerprint,
    )

    docs = spark.createDataFrame(
        [(1, "a #123 b"), (2, "c 0xdead d")], "doc_id long, text string"
    )
    fp_a = _plan_fingerprint(docs.filter(F.col("text").contains("#123")))
    fp_b = _plan_fingerprint(docs.filter(F.col("text").contains("#124")))
    assert fp_a != fp_b
    fp_c = _plan_fingerprint(docs.filter(F.col("text").contains("0xdead")))
    fp_d = _plan_fingerprint(docs.filter(F.col("text").contains("0xbeef")))
    assert fp_c != fp_d
    # and the same recipe still fingerprints identically across calls
    assert fp_a == _plan_fingerprint(
        docs.filter(F.col("text").contains("#123"))
    )

def test_fingerprint_distinguishes_word_anchored_literals(spark):
    """r6 review: the r5 regex `\\b(\\w+)#\\d+` erased literals shaped
    like `bug#123` (word char before '#') — the COMMON literal shape —
    so two configs differing only in such a needle fingerprinted
    identically. The canonicalized-plan fingerprint keeps every data
    literal byte-for-byte."""
    from pyspark.sql import functions as F

    from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
        _plan_fingerprint,
    )

    docs = spark.createDataFrame(
        [(1, "fix bug#123 now"), (2, "fix bug#124 now")],
        "doc_id long, text string",
    )
    fp_a = _plan_fingerprint(docs.filter(F.col("text").contains("bug#123")))
    fp_b = _plan_fingerprint(docs.filter(F.col("text").contains("bug#124")))
    assert fp_a != fp_b


def test_fingerprint_stable_for_unaliased_aggregates(spark, tmp_path):
    """r6 review: attribute ids of unaliased aggregates print as
    `count(1)#12L` — no word char before '#', so the r5 regex left the
    session-specific id in place and the cross-session stage cache
    could NEVER hit for such recipes. Canonicalization normalizes ids
    positionally: two independently built copies of the same recipe
    (different exprIds) must fingerprint identically, and a changed
    grouping column must not."""
    from pyspark.sql import functions as F

    from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
        _plan_fingerprint,
    )

    p = str(tmp_path / "fp_corpus")
    spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "doc_id long, text string, k string"
    ).write.parquet(p)
    base = spark.read.parquet(p)

    def recipe(col):
        return base.groupBy(col).agg(F.count("*"))

    assert _plan_fingerprint(recipe("k")) == _plan_fingerprint(recipe("k"))
    assert _plan_fingerprint(recipe("k")) != _plan_fingerprint(
        recipe("text")
    )


def test_fingerprint_extra_params_disambiguate(spark):
    """Python-closure params canonicalize to just the function name —
    the `extra` channel must split otherwise-identical plans (this is
    how clean_corpus hashes its own kwargs and the Bloom filter
    bits)."""
    from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
        _plan_fingerprint,
    )

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    assert _plan_fingerprint(docs, extra="t=1") != _plan_fingerprint(
        docs, extra="t=2"
    )
    assert _plan_fingerprint(docs, extra="t=1") == _plan_fingerprint(
        docs, extra="t=1"
    )
