"""Temperature-flattened source mixing: DuckDB replays membership
bit-for-bit, T=1 is the identity, T→∞ flattens toward uniform,
realized per-source counts track the analytic targets.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE
from peerdb_cdc_psql_clickhouse_spark.operators.pipeline import (
    temperature_oracle,
    temperature_rates,
    temperature_sample,
)


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _counts(spark):
    return {
        r["source"]: r["n"]
        for r in _docs(spark).groupBy("source").agg(F.count("*").alias("n")).collect()
    }


def test_duckdb_replays_membership_exactly(spark):
    got = sorted(
        r.doc_id
        for r in temperature_sample(
            _docs(spark), temperature=3.0, seed=7
        ).collect()
    )
    sql = temperature_oracle(_counts(spark), 3.0, seed=7)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    want = sorted(r[0] for r in con.execute(
        sql.replace("SELECT *", "SELECT doc_id")
    ).fetchall())
    assert got == want and len(got) > 0


def test_t1_is_identity_and_rates_monotone(spark):
    counts = _counts(spark)
    r1 = temperature_rates(counts, 1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in r1.values())
    assert temperature_sample(_docs(spark), temperature=1.0).count() == sum(
        counts.values()
    )
    # flattening: the LARGEST source's rate falls as T grows
    big = max(counts, key=counts.get)
    small = min(counts, key=counts.get)
    prev = 1.0
    for t in (2.0, 4.0, 8.0):
        r = temperature_rates(counts, t)
        assert r[big] <= prev + 1e-12
        prev = r[big]
        assert r[small] >= r[big]  # tail never thinned below the head


def test_realized_counts_track_targets(spark):
    counts = _counts(spark)
    t = 4.0
    rates = temperature_rates(counts, t)
    kept = {
        r["source"]: r["n"]
        for r in temperature_sample(_docs(spark), temperature=t)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for s, n in counts.items():
        target = rates[s] * n
        # deterministic hash thinning ~ binomial: allow 5 sigma + slack
        tol = 5 * (target * (1 - rates[s] + 1e-9)) ** 0.5 + 3
        assert abs(kept.get(s, 0) - target) <= tol, (s, kept.get(s), target)


def test_budget_total_downscales(spark):
    counts = _counts(spark)
    n = sum(counts.values())
    out = temperature_sample(
        _docs(spark), temperature=2.0, total=n // 4
    ).count()
    assert abs(out - n // 4) / (n // 4) < 0.15


def test_bad_temperature_raises():
    with pytest.raises(ValueError):
        temperature_rates({"a": 1}, 0.0)
