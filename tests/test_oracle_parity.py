"""The internal mirror of the driver's correctness gate: every declared
query with an oracle must hash-match DuckDB on the same parquet data.
Runs at sf0.001 by default (fast); set SPARK_GRAFT_ORACLE_SF to the
sf0.01 dir to reproduce the driver's exact configuration.
"""

from __future__ import annotations

import pytest

from peerdb_cdc_psql_clickhouse_spark.registry import all_queries

from .conftest import SF_ORACLE
from .oracle_util import compare

_QUERIES = all_queries()
_WITH_ORACLE = sorted(n for n, q in _QUERIES.items() if q.oracle)
_ROWS_ONLY = sorted(n for n, q in _QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, name):
    q = _QUERIES[name]
    compare(q.build(spark, SF_ORACLE), q.oracle, SF_ORACLE)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = _QUERIES[name]
    df = q.build(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
