"""Engine-portable hashing.

xxhash64/murmur3 differ between Spark and DuckDB; md5/sha2 hex digests
are identical everywhere. hash64() derives a signed-ish 60-bit int from
the first 15 hex chars of md5 — enough for MinHash/fingerprint use and
exactly reproducible in DuckDB via
  CAST(CONCAT('0x', SUBSTR(md5(x), 1, 15)) AS BIGINT)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column) -> Column:
    """60-bit integer hash of a string column, portable to DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    return f"CAST(CONCAT('0x', SUBSTR(md5({expr}), 1, 15)) AS BIGINT)"


def content_sha256(col: Column) -> Column:
    """Hex sha256 of a string column; DuckDB: sha256(x)."""
    return F.sha2(col, 256)
