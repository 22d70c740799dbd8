"""budget_sample: token-budget stratified selection. Asserts exact
DuckDB parity on the real corpus, the budget invariant (selected
tokens minus the boundary doc fit the budget; adding the next doc in
hash order would not), determinism across partitionings, and recipe
semantics (absent strata drop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE
from .oracle_util import duckdb_run
from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
    budget_sample,
    budget_sample_oracle,
)

BUDGETS = {"en": 2000, "fr": 800, "es": 1}  # es: below any single doc


def _docs(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    return docs.select(
        "doc_id",
        F.col("lang").alias("stratum"),
        F.size(toks).cast("long").alias("token_cnt"),
    )


def test_duckdb_parity(spark):
    got = {
        (r.doc_id, r.stratum, r.token_cnt)
        for r in budget_sample(
            _docs(spark), "stratum", BUDGETS, seed=9
        ).collect()
    }
    want = {
        tuple(t)
        for t in duckdb_run(
            budget_sample_oracle(BUDGETS, seed=9), SF_SMOKE
        ).itertuples(index=False, name=None)
    }
    assert got == want
    assert got, "selection must be non-empty"


def test_budget_invariant_and_progress(spark):
    out = budget_sample(_docs(spark), "stratum", BUDGETS, seed=1)
    per = {
        r.stratum: (r.total, r.n, r.mx)
        for r in out.groupBy("stratum")
        .agg(
            F.sum("token_cnt").alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.max("token_cnt").alias("mx"),
        )
        .collect()
    }
    # es budget (1 token) is below any document: exactly the boundary
    # doc is taken — progress, not starvation
    assert per["es"][1] == 1
    for stratum, (total, _n, mx) in per.items():
        # all but the boundary doc fit strictly inside the budget
        assert total - mx < BUDGETS[stratum]


def test_absent_stratum_drops(spark):
    out = budget_sample(_docs(spark), "stratum", {"en": 500}, seed=0)
    assert {r.stratum for r in out.collect()} == {"en"}


def test_partitioning_independent(spark):
    docs = _docs(spark)
    a = {
        r.doc_id
        for r in budget_sample(
            docs.repartition(3), "stratum", BUDGETS, seed=4
        ).collect()
    }
    b = {
        r.doc_id
        for r in budget_sample(
            docs.repartition(11), "stratum", BUDGETS, seed=4
        ).collect()
    }
    assert a == b
