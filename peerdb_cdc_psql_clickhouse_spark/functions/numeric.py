"""Deterministic numeric aggregation helpers.

Two cross-engine hazards drive this module's design:

1. Floating-point sums are order-dependent; Spark's partial-aggregation
   order differs from DuckDB's. Fix: route sums through DECIMAL (exact,
   order-insensitive), then cast the final value to DOUBLE (the same
   exact decimal converts to the same double in both engines).

2. ROUND(double, n) disagrees between engines on values near the half
   boundary (Spark rounds the exact binary expansion HALF_UP; DuckDB
   multiplies/nearbyints). Fix: never ROUND doubles — use fixed-point
   flooring, FLOOR(x * 10^s + 0.5) / 10^s, which is the same IEEE
   operation sequence in both engines and therefore bit-identical.

DuckDB quirk handled by the *_sql twins: SUM(INTEGER) returns HUGEINT
(int128), which pandas turns into float64 — always CAST the final SQL
aggregate to BIGINT or DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fround(c: Column, scale: int) -> Column:
    """Deterministic half-up fixed-point rounding of a double, as the
    IEEE sequence FLOOR(x * 10^s + 0.5) / 10^s. Returns DOUBLE."""
    m = float(10**scale)
    return F.floor(c * F.lit(m) + F.lit(0.5)) / F.lit(m)


def fround_sql(expr: str, scale: int) -> str:
    m = float(10**scale)
    return f"FLOOR(({expr}) * {m} + 0.5) / {m}"


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Order-insensitive exact sum of a double column, surfaced as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg(col: str | Column, in_scale: int = 2, out_scale: int = 4) -> Column:
    """Deterministic average: exact decimal sum -> double -> one IEEE
    division -> fixed-point floor-round. Returns DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum(c.cast(f"decimal(18,{in_scale})")).cast("double")
    return fround(s / F.count(c), out_scale)


def davg_sql(expr: str, in_scale: int = 2, out_scale: int = 4) -> str:
    s = f"CAST(SUM(CAST({expr} AS DECIMAL(18,{in_scale}))) AS DOUBLE)"
    return fround_sql(f"{s} / COUNT({expr})", out_scale)


def isum_sql(expr: str) -> str:
    """Integer SUM with the HUGEINT->BIGINT normalization."""
    return f"CAST(SUM({expr}) AS BIGINT)"
