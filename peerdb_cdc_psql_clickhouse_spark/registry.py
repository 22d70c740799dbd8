"""Declared-query registry — the contract surface for __spark_entry__.py.

Every operator from SURVEY.md §2 that is SQL-expressible registers a
(builder, oracle_sql) pair here via the @declare decorator. Builders
take (spark, sf_dir) and return a DataFrame; oracle_sql is equivalent
ANSI SQL DuckDB runs on the same parquet views. Column names/types are
aligned on both sides because the driver hash-compares values after
sorting columns by name.

Determinism rules (SURVEY §7 hard parts):
- never LIMIT without a total ORDER BY (unique tiebreak column);
- sums of doubles go through DECIMAL casts (order-insensitive exact
  arithmetic) instead of float accumulation;
- averages = decimal-sum -> double -> divide -> round -> decimal cast;
- hashes must be engine-portable: md5 hex (identical in Spark/DuckDB),
  never xxhash64/murmur (engine-specific).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver does rows-only check
    doc: str = ""


QUERIES: dict[str, Query] = {}


def declare(name: str, oracle: str | None, doc: str = ""):
    """Register a declared query. Use as a decorator on the builder."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate declared query {name!r}")
        QUERIES[name] = Query(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def all_queries() -> dict[str, Query]:
    """Import every operator module (side effect: registration) and
    return the full registry."""
    from .operators import (  # noqa: F401
        asof,
        cdc,
        dedup,
        metrics,
        multimodal,
        pipeline,
        relational,
        similarity,
        text,
    )

    return dict(QUERIES)
