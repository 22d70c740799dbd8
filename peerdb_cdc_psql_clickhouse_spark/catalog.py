"""Explicit-schema catalog.

The reference uses fixed DDL up front (quickstart_prepare_peers.sh:25-49)
and validates an expected-tables list (peerdb_config.yaml:47-53); we
mirror that with explicit StructType registration — never inference.

Two table groups:
- TESTDATA: the driver's TPC-H-ish parquet tables (TESTDATA.md).
- REFERENCE: the reference's OLTP schemas (customers/products/orders,
  quickstart_prepare_peers.sh:25-49) plus the engine-side CDC event
  and metrics schemas (FIXTURES.md A4-A6).
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# --- driver testdata (read from parquet; schemas documented for checks) ---

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# --- reference OLTP schemas (quickstart_prepare_peers.sh:25-49) ---

CUSTOMERS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("email", T.StringType()),
    ]
)

PRODUCTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("weight", T.DecimalType(10, 2)),
    ]
)

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("order_date", T.DateType()),
        T.StructField("purchaser", T.IntegerType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("product_id", T.IntegerType()),
    ]
)

# FK metadata (quickstart_prepare_peers.sh:47-48) — informational; used
# for join planning (broadcast dimension side) and synthetic generation.
FOREIGN_KEYS = {
    ("orders", "purchaser"): ("customers", "id"),
    ("orders", "product_id"): ("products", "id"),
}

# CDC change-event envelope we attach to any row schema (SURVEY §1.1;
# ops enumerated monitor.ps1:833-835, LSN ordering from logical WAL).
CDC_META_FIELDS = [
    T.StructField("_op", T.StringType(), False),  # insert|update|delete
    T.StructField("_version", T.LongType(), False),  # total order (LSN analog)
    T.StructField("_ts", T.TimestampType(), False),
]


def corpus_cache_key(sf_dir: str, filename: str) -> str:
    """Identity of one testdata file for per-process build-once caches
    (IVF / text indexes): absolute path + mtime, so a regenerated
    corpus under the same path gets a fresh artifact. One shared
    definition so the two caches cannot drift."""
    import os

    src = os.path.join(os.path.abspath(sf_dir), filename)
    # nanosecond mtime: a corpus rewritten within the same SECOND as
    # the cached build must still get a fresh key (code review r5 —
    # parquet rewrites routinely complete in <1 s). One atomic stat —
    # exists-then-stat would crash if the file vanished in between.
    try:
        mt = os.stat(src).st_mtime_ns
    except FileNotFoundError:
        mt = 0
    return f"{src}:{mt}"


def change_event_schema(row_schema: T.StructType) -> T.StructType:
    """Schema of an ordered change stream for a table (FIXTURES.md A4)."""
    return T.StructType(CDC_META_FIELDS + list(row_schema.fields))


# batch_metrics: structured stand-in for the stress/resource logs
# (FIXTURES.md A5; shape of testing-results/*.log per monitor.ps1:1167-1180).
BATCH_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("test_id", T.StringType()),
        T.StructField("batch", T.IntegerType()),
        T.StructField("container", T.StringType()),
        T.StructField("cpu_pct", T.DoubleType()),
        T.StructField("mem", T.StringType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rows_ok", T.IntegerType()),
        T.StructField("rows_failed", T.IntegerType()),
    ]
)

# table_stats: engine catalog stats (FIXTURES.md A6; stand-in for
# ClickHouse system.parts / pg_*_size, monitor.ps1:664,1057,1074).
TABLE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("part", T.StringType()),
        T.StructField("rows", T.LongType()),
        T.StructField("bytes", T.LongType()),
    ]
)


def table_bytes(sf_dir: str, name: str) -> int | None:
    """Best-effort on-disk size of one testdata table, for reuse()
    size hints (layout.reuse switches persist -> write-once-parquet
    past MATERIALIZE_THRESHOLD_BYTES; callers scale this compressed
    figure by their derivation's expansion factor). Local paths only
    — returns None for URIs/missing paths, which reuse() treats as
    'no hint' (persist)."""
    path = f"{sf_dir}/{name}.parquet"
    if os.path.isfile(path):
        return os.path.getsize(path)
    if not os.path.isdir(path):
        return None
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            with contextlib.suppress(OSError):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _parquet_part_files(path: str) -> list[str]:
    """Data part files under a directory dataset, mirroring Spark's
    pathFilter (ADVICE r18): files/dirs starting with '_' or '.' are
    metadata (e.g. a stale _temporary from an interrupted write) that
    load_table's reader ignores, so footer-derived stats must skip
    them too or the counts disagree with what Spark actually reads."""
    out = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        out += [
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
    return out


def _dataset_stat_key(path: str) -> tuple[str, int]:
    """Cache key for footer-derived stats. For directory datasets the
    top dir's mtime does not change on an in-place part-file rewrite
    (ADVICE r18), so the key takes the max part-file mtime_ns too.
    Raises OSError for missing paths (callers return None)."""
    st = os.stat(path)
    mt = st.st_mtime_ns
    if os.path.isdir(path):
        for p in _parquet_part_files(path):
            with contextlib.suppress(OSError):
                mt = max(mt, os.stat(p).st_mtime_ns)
    return (path, mt)


# Exact row-count cache: (path, mtime_ns) -> num_rows from the parquet
# footer (r18 opt). Several operators size scale knobs off the corpus
# ROW COUNT (planes_for occupancy, ivf_auto_centroids) and used to run
# a full count() job at plan-build time to get it. The footer already
# carries the exact count — this is the standalone analog of reading
# row counts from table stats in a metastore, which is exactly what
# planes_for's contract asks callers to do at 100 TB.
_TABLE_ROWS_CACHE: dict[tuple[str, int], int] = {}


def table_rows(sf_dir: str, name: str) -> int | None:
    """Exact row count of one testdata table from parquet footer
    metadata (no Spark job; ~1 ms driver-side). None for URIs/missing
    paths or unreadable footers — callers fall back to a count()."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        key = _dataset_stat_key(path)
    except OSError:
        return None
    hit = _TABLE_ROWS_CACHE.get(key)
    if hit is not None:
        return hit
    try:
        import pyarrow.parquet as pq

        if os.path.isfile(path):
            n = int(pq.read_metadata(path).num_rows)
        elif os.path.isdir(path):
            n = 0
            for f in _parquet_part_files(path):
                n += int(pq.read_metadata(f).num_rows)
        else:
            return None
    except Exception:  # noqa: BLE001 - metadata is an optimization only
        return None
    _TABLE_ROWS_CACHE[key] = n
    return n


_COLUMN_MINMAX_CACHE: dict[tuple[str, int, str], tuple | None] = {}


def table_column_minmax(
    sf_dir: str, name: str, column: str
) -> tuple | None:
    """Exact (min, max) of one column from parquet footer row-group
    statistics (no Spark job). None when the file is missing, any row
    group lacks exact stats for the column, or every value is NULL —
    callers fall back to an aggregate. Matches F.min/F.max semantics:
    parquet stats cover non-null values only."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        key = _dataset_stat_key(path) + (column,)
    except OSError:
        return None
    if key in _COLUMN_MINMAX_CACHE:
        return _COLUMN_MINMAX_CACHE[key]
    out = None
    try:
        import pyarrow.parquet as pq

        files = []
        if os.path.isfile(path):
            files = [path]
        elif os.path.isdir(path):
            files = _parquet_part_files(path)
        lo = hi = None
        for f in files:
            md = pq.read_metadata(f)
            idx = md.schema.names.index(column)
            for rg in range(md.num_row_groups):
                col_md = md.row_group(rg).column(idx)
                # ADVICE r18: parquet writers may TRUNCATE binary/
                # string statistics (max becomes an upper bound, not a
                # real value), so the exact-min/max contract only
                # holds for integral/boolean physical types — refuse
                # anything else so a future caller on a string column
                # cannot get truncated bounds.
                if col_md.physical_type not in (
                    "INT32",
                    "INT64",
                    "BOOLEAN",
                ):
                    raise ValueError("non-integral physical type")
                st = col_md.statistics
                if st is None or not st.has_min_max:
                    raise ValueError("no stats")
                if st.num_values == 0:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        out = (lo, hi) if lo is not None else None
    except Exception:  # noqa: BLE001 - stats are an optimization only
        out = None
    _COLUMN_MINMAX_CACHE[key] = out
    return out


# Inferred-schema cache: (path, file mtime) -> raw reader StructType.
# A StructType is pure Python (no session binding), so entries are
# valid across SparkSessions; the mtime in the key invalidates on
# regeneration. Why it exists (r17): spark.read.parquet infers the
# schema per call (driver-side listing + footer read, ~70-125 ms at
# sf0.1), and the bench contract rebuilds every query's plan per
# iteration — across 50 builders x several tables that inference was
# pure repeated driver time. A production catalog (metastore) never
# re-infers schemas per query; this cache is the standalone analog.
# We cache the INFERRED schema rather than trusting TESTDATA_SCHEMAS
# because physical testdata generations drift (see events.ts below).
_TABLE_SCHEMA_CACHE: dict[tuple[str, int], T.StructType] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table. Parquet scan → Catalyst gets
    column pruning + predicate pushdown for free. The file's schema is
    inferred once per (path, mtime) and passed explicitly on repeat
    loads (same plan, minus the per-call footer-inference job).

    events.ts has shipped as both TIMESTAMP(NANOS) (which Spark's
    parquet reader rejects — read as long nanos and rebuild) and plain
    TIMESTAMP(MICROS) across testdata generations; branch on the dtype
    the reader actually produced so both generations load exactly.
    The cache stores the RAW reader schema (pre-rebuild), so the
    branch applies identically on hits and misses.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = None
    with contextlib.suppress(OSError):  # URI/missing: just re-infer
        # st_mtime_ns, not getmtime's float-seconds (ADVICE r17):
        # parquet regeneration completes in <1 s, so a float-seconds
        # key could serve a stale schema after an in-place rewrite
        # within mtime granularity; corpus_cache_key (above) already
        # uses ns for the same reason.
        key = (path, os.stat(path).st_mtime_ns)
    schema = _TABLE_SCHEMA_CACHE.get(key) if key is not None else None
    if schema is None:
        df = spark.read.parquet(path)
        if key is not None:
            _TABLE_SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for spark.sql use."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
