"""Driver-style oracle comparison: run a declared Spark query and its
DuckDB oracle SQL on the same parquet tables, then compare row count,
column names, and order-insensitive values. Mirrors the driver's
CORRECTNESS gate so a green test here predicts a green driver run.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from peerdb_cdc_psql_clickhouse_spark.catalog import TESTDATA_TABLES


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v.normalize())
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def driver_canon_check(pdf) -> None:
    """Replicate the external driver's canonicalization exactly: it
    sorts the raw pandas frame with sort_values over every column,
    which raises TypeError on unhashable cells (bytes/bytearray from
    BinaryType, list/ndarray from ArrayType). CORRECTNESS_r01 x4b/x5b
    died there while the hex-normalizing compare below passed — so run
    this first for any declared query."""
    if len(pdf):
        pdf.sort_values(list(pdf.columns))


def _norm_frame(pdf):
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows), list(pdf.columns)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert spark result == duckdb oracle result (driver-style)."""
    got = spark_df.toPandas()
    driver_canon_check(got)
    want = duckdb_run(oracle_sql, sf_dir)
    g_rows, g_cols = _norm_frame(got)
    w_rows, w_cols = _norm_frame(want)
    assert g_cols == w_cols, f"column mismatch: spark={g_cols} duckdb={w_cols}"
    assert len(g_rows) == len(w_rows), (
        f"row count mismatch: spark={len(g_rows)} duckdb={len(w_rows)}"
    )
    mismatches = [
        (i, g, w) for i, (g, w) in enumerate(zip(g_rows, w_rows)) if g != w
    ]
    assert not mismatches, (
        f"{len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
