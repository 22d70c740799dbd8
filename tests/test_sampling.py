"""stratified_sample: training-mix construction over the documents
corpus — approximate (map-only sampleBy) and exact (windowed rank)
variants."""

from __future__ import annotations

import math

import pytest

from peerdb_cdc_psql_clickhouse_spark.catalog import load_table
from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
    stratified_sample,
)

SF = "/root/testdata/sf0.001"
MIX = {"en": 0.5, "fr": 0.2}  # es/de dropped: the dict is the recipe


def _by_lang(df):
    out = {}
    for r in df.groupBy("lang").count().collect():
        out[r["lang"]] = r["count"]
    return out


def test_exact_sample_hits_exact_counts(spark):
    docs = load_table(spark, SF, "documents")
    totals = _by_lang(docs)
    got = _by_lang(stratified_sample(docs, "lang", MIX, exact=True))
    assert set(got) <= set(MIX)
    for lang, frac in MIX.items():
        assert got.get(lang, 0) == math.ceil(totals[lang] * frac), lang


def test_exact_sample_is_deterministic_and_seed_sensitive(spark):
    docs = load_table(spark, SF, "documents")
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}
    a = ids(stratified_sample(docs, "lang", MIX, exact=True))
    b = ids(stratified_sample(docs, "lang", MIX, exact=True))
    assert a == b  # same seed -> byte-identical membership
    c = ids(stratified_sample(docs, "lang", MIX, seed=7, exact=True))
    assert a != c  # different seed -> different membership


def test_approximate_sample_close_to_fractions(spark):
    docs = load_table(spark, SF, "documents")
    totals = _by_lang(docs)
    got = _by_lang(stratified_sample(docs, "lang", MIX))
    assert set(got) <= set(MIX)
    for lang, frac in MIX.items():
        expect = totals[lang] * frac
        assert abs(got.get(lang, 0) - expect) < 4 * math.sqrt(expect) + 1


def test_approximate_sample_is_map_only(spark):
    import contextlib
    import io

    docs = load_table(spark, SF, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        stratified_sample(docs, "lang", MIX).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_fraction_validation(spark):
    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError, match="fractions"):
        stratified_sample(docs, "lang", {"en": 1.5})


def _doc_tokens(spark):
    from pyspark.sql import functions as F

    from peerdb_cdc_psql_clickhouse_spark.operators.text import tokens_col

    return load_table(spark, SF, "documents").select(
        "doc_id", F.size(tokens_col(F.col("text"))).cast("long").alias("token_cnt")
    )


def test_pack_documents_respects_budget(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
        pack_documents,
    )

    docs = _doc_tokens(spark)
    budget = 200
    packed = pack_documents(docs, budget=budget).collect()
    assert len(packed) == docs.count()  # every doc assigned
    by_bin: dict[int, list[int]] = {}
    for r in packed:
        by_bin.setdefault(r["bin_id"], []).append(r["token_cnt"])
    for b, toks in by_bin.items():
        assert sum(toks) <= budget or len(toks) == 1, (b, toks)
    # packing is doing real work: far fewer bins than docs
    assert len(by_bin) < len(packed) / 2


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    toks=st.lists(
        st.integers(min_value=0, max_value=300), min_size=1, max_size=60
    ),
    budget=st.sampled_from([64, 256, 1024]),
)
def test_pack_documents_budget_property(spark, toks, budget):
    """For ANY token-count multiset and budget: every doc assigned
    exactly once, and no bin exceeds the budget unless it holds a
    single oversize doc."""
    from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
        pack_documents,
    )

    rows = [(i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, token_cnt long")
    got = pack_documents(df, budget=budget, shards=4).collect()
    assert sorted(r["doc_id"] for r in got) == [i for i, _ in rows]
    by_bin: dict[int, list[int]] = {}
    for r in got:
        by_bin.setdefault(r["bin_id"], []).append(r["token_cnt"])
    for toks_in_bin in by_bin.values():
        assert sum(toks_in_bin) <= budget or len(toks_in_bin) == 1


def test_pack_documents_preserves_non_long_id_types(spark):
    """Output field types derive from the input schema — string doc
    ids and int token counts must round-trip (ADVICE r2: the schema
    was hardcoded `long, long`)."""
    from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
        pack_documents,
    )

    rows = [("doc-a", 50), ("doc-b", 70), ("doc-c", 10)]
    df = spark.createDataFrame(rows, "doc_id string, token_cnt int")
    got = pack_documents(df, budget=100, shards=2)
    assert dict(got.dtypes) == {
        "doc_id": "string",
        "token_cnt": "int",
        "bin_id": "bigint",
    }
    out = {r["doc_id"]: r["token_cnt"] for r in got.collect()}
    assert out == dict(rows)


def test_exact_sample_duplicate_rows_deterministic_with_id_col(spark):
    """Fully duplicate rows tie on the all-columns hash; an explicit
    unique id_col restores a total order so the cutoff is stable
    across partitionings (ADVICE r2)."""
    rows = [(i, "en", "same text") for i in range(40)] + [
        (100 + i, "fr", "autre") for i in range(20)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    pick = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}
    a = pick(
        stratified_sample(docs, "lang", MIX, exact=True, id_col="doc_id")
    )
    b = pick(
        stratified_sample(
            docs.repartition(7), "lang", MIX, exact=True, id_col="doc_id"
        )
    )
    assert a == b
    assert len([d for d in a if d < 100]) == 20  # ceil(40 * 0.5)
    assert len([d for d in a if d >= 100]) == 4  # ceil(20 * 0.2)


def test_x7b_training_mix_invariants(spark):
    """The composed declared pipeline (select -> exact sample -> pack):
    every output doc was selected by x7, per-stratum counts hit the
    exact ceil(frac*n) recipe, and every bin respects the token budget
    (single-doc oversize exempt)."""
    import math

    from pyspark.sql import functions as F

    from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
        X7B_BUDGET,
        X7B_MIX,
        x7_corpus_select,
        x7b_training_mix,
    )

    sel = (
        x7_corpus_select(spark, SF)
        .filter(F.col("selected"))
        .select("doc_id", "detected_lang")
        .collect()
    )
    lang_of = {r["doc_id"]: r["detected_lang"] for r in sel}
    totals: dict[str, int] = {}
    for lang in lang_of.values():
        totals[lang] = totals.get(lang, 0) + 1

    got = x7b_training_mix(spark, SF).collect()
    assert set(r["doc_id"] for r in got) <= set(lang_of)
    by_lang: dict[str, int] = {}
    by_bin: dict[int, list[int]] = {}
    for r in got:
        by_lang[lang_of[r["doc_id"]]] = by_lang.get(lang_of[r["doc_id"]], 0) + 1
        by_bin.setdefault(r["bin_id"], []).append(r["token_cnt"])
    for lang, frac in X7B_MIX.items():
        if totals.get(lang):
            assert by_lang.get(lang, 0) == math.ceil(totals[lang] * frac)
    assert set(by_lang) <= set(X7B_MIX)  # de never sampled
    for b, toks in by_bin.items():
        assert sum(toks) <= X7B_BUDGET or len(toks) == 1, (b, toks)


def test_pack_documents_deterministic_and_oversize_isolated(spark):
    from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
        pack_documents,
    )

    rows = [(1, 50), (2, 50), (3, 999), (4, 60), (5, 10)]
    df = spark.createDataFrame(rows, "doc_id long, token_cnt long")
    a = {(r["doc_id"], r["bin_id"]) for r in pack_documents(df, budget=100).collect()}
    b = {(r["doc_id"], r["bin_id"]) for r in pack_documents(df, budget=100).collect()}
    assert a == b  # hash-shard + id-ordered greedy = deterministic
    bins = {d: bi for d, bi in a}
    # oversize doc 3 sits alone in its bin
    assert sum(1 for d, bi in a if bi == bins[3]) == 1
