"""Relational operations the reference issues as SQL (SURVEY.md §2.1).

Each O-Rxx maps a query shape the reference's scripts send to
PostgreSQL/ClickHouse onto the driver's TPC-H-ish testdata, expressed
with the DataFrame API so Catalyst gets pushdown/pruning for free.

Reference citations are in each docstring (file:line in /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hashing import hash64_sql
from ..registry import declare


def r1_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-R1 health probe SELECT 1 (insert.ps1:63,77;
    monitor.ps1:995,1005). Declared surface: rides r4_scalar_probes'
    row as the literal `one` column since r5 (slot freed for
    x9_bm25_search) — the probe IS `SELECT 1`, so the declared merge
    loses nothing."""
    return spark.range(1).select(F.lit(1).alias("one"))


@declare(
    "r2_projection_distinct",
    "SELECT DISTINCT o_custkey AS purchaser FROM "
    "(SELECT o_custkey FROM orders) "
    "ORDER BY purchaser LIMIT 10",
    doc="O-R2 full-table projection scan (insert.ps1:96,123) + O-R3 "
    "SELECT DISTINCT purchaser FROM orders LIMIT 10 (insert.ps1:106). "
    "The projection feeds the distinct, so column pruning reaches the "
    "parquet scan (asserted by the r2 plan gate in tests/test_plans.py: "
    "ReadSchema is exactly o_custkey); distinct is a partial-agg "
    "shuffle, ORDER BY added for determinism, limit pushed per "
    "partition",
)
def r2_projection_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .select(F.col("o_custkey").alias("purchaser"))
        .distinct()
        .orderBy("purchaser")
        .limit(10)
    )


@declare(
    "r4_scalar_probes",
    """
SELECT 1 AS one, o.max_id, o.cnt, o.str_bytes,
       li.returned_total, li.total_qty, li.row_cnt, li.max_key
FROM (
  SELECT MAX(o_orderkey) AS max_id,
         COUNT(*) AS cnt,
         CAST(SUM(LENGTH(o_orderpriority) + LENGTH(o_orderstatus))
              AS BIGINT) AS str_bytes
  FROM orders
) o
CROSS JOIN (
  SELECT CAST(SUM(CASE WHEN l_returnflag = 'A'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
              AS DOUBLE) AS returned_total,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS total_qty,
         COUNT(*) AS row_cnt,
         MAX(l_orderkey) AS max_key
  FROM lineitem
) li
""",
    doc="O-R1 health probe SELECT 1 (insert.ps1:63,77 — merged r5, "
    "the `one` column) + O-R4 ungrouped MAX (insert.ps1:149) + O-R5 "
    "COUNT(*) (insert.ps1:163; monitor.ps1:727,824) + O-R6 count+size "
    "in one scan (monitor.ps1:604-609) + O-R7 filtered SUM "
    "(monitor.ps1:664,1074, as a conditional sum so it shares the "
    "lineitem scan) + O-R9 multi-scalar one-row select "
    "(monitor.ps1:1057). One scan per table, partial aggregates, "
    "broadcast cross of two 1-row frames — six separate probe "
    "round-trips in the reference collapse to two scans",
)
def r4_scalar_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_agg = load_table(spark, sf_dir, "orders").agg(
        F.max("o_orderkey").alias("max_id"),
        F.count(F.lit(1)).alias("cnt"),
        F.sum(
            F.length("o_orderpriority") + F.length("o_orderstatus")
        ).alias("str_bytes"),
    )
    li_agg = load_table(spark, sf_dir, "lineitem").agg(
        F.sum(
            F.when(
                F.col("l_returnflag") == "A",
                F.col("l_extendedprice").cast("decimal(18,2)"),
            )
        )
        .cast("double")
        .alias("returned_total"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_qty"),
        F.count(F.lit(1)).alias("row_cnt"),
        F.max("l_orderkey").alias("max_key"),
    )
    return o_agg.select(F.lit(1).alias("one"), "*").crossJoin(
        F.broadcast(li_agg)
    )


@declare(
    "r8_cross_join_group",
    "SELECT COUNT(*) AS cnt, r_name AS setting "
    "FROM nation, region WHERE n_regionkey = r_regionkey "
    "GROUP BY r_name",
    doc="O-R8 implicit-comma join + filter + GROUP BY "
    "(monitor.ps1:1036, pg_stat_activity x pg_settings). region is "
    "tiny -> Catalyst broadcasts it; no shuffle on the probe side",
)
def r8_cross_join_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.crossJoin(F.broadcast(region))
        .filter(F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("setting"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("cnt", "setting")
    )


def r10_version_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-R10 SELECT version() (monitor.ps1:534,550,566). No longer a
    standalone declared slot: the engine/version columns ride on the
    r14_replication_slots status row (both are engine-specific
    rows-only probes), freeing the 50th declared slot for the composed
    training-mix pipeline (x7b). The API stays for monitor use."""
    return spark.range(1).select(
        F.lit("spark").alias("engine"), F.lit(spark.version).alias("version")
    )


# -- O-R11 + O-D12: deterministic synthetic-workload generators ------------
#
# The reference builds 500-row VALUES batches (insert.ps1:289-292) and
# per-loop synthetic orders (insert.ps1:281-284) with Get-Random FK
# picks; we derive the same shapes deterministically (registry
# determinism rules) from a 60-bit md5 hash so the DuckDB oracle
# reproduces them bit-for-bit. At scale this is the synthetic-load
# generator: a spark.range over N partitions, zero input I/O, append
# to the sink.


def synth_batch(
    spark: SparkSession, n: int, prefix: str, base_id: int, batch: str = ""
) -> DataFrame:
    """n synthetic order rows with md5-derived FK/quantity/date picks
    (the deterministic analog of insert.ps1:281-287). `batch` labels
    the workload the rows belong to."""
    from ..functions.hashing import hash64

    base = spark.range(n).withColumnRenamed("id", "i")
    h = hash64(F.concat(F.lit(prefix), F.col("i").cast("string")))
    return base.select(
        F.lit(batch).alias("batch"),
        (F.col("i") + base_id).cast("int").alias("id"),
        F.date_format(
            F.date_sub(
                F.to_date(F.lit("2026-01-01")), F.pmod(h, 30).cast("int")
            ),
            "yyyy-MM-dd",
        ).alias("order_date"),
        (F.pmod(h, 4) + 1001).cast("int").alias("purchaser"),
        (F.pmod(h, 9) + 101).cast("int").alias("product_id"),
        (F.pmod(h, 99) + 1).cast("int").alias("quantity"),
    )


def _synth_batch_sql(n: int, prefix: str, base_id: int, batch: str) -> str:
    h = hash64_sql(f"CONCAT('{prefix}', CAST(i AS VARCHAR))")
    return f"""
SELECT '{batch}' AS batch,
       CAST(i + {base_id} AS INT) AS id,
       strftime(DATE '2026-01-01' - CAST(h % 30 AS INT), '%Y-%m-%d')
         AS order_date,
       CAST(h % 4 + 1001 AS INT) AS purchaser,
       CAST(h % 9 + 101 AS INT) AS product_id,
       CAST(h % 99 + 1 AS INT) AS quantity
FROM (SELECT i, {h} AS h
      FROM (SELECT unnest(generate_series(0, {n - 1})) AS i))
"""


@declare(
    "r11_batched_insert",
    _synth_batch_sql(500, "ins:", 20001, "insert")
    + "UNION ALL"
    + _synth_batch_sql(1000, "synth:", 10001, "synth"),
    doc="O-R11 multi-row batched INSERT: the 500-row VALUES batch "
    "(insert.ps1:289-292, built :280-287) + O-D12 synthetic workload "
    "generator: 1000 orders with random FK sampling and quantity 1-99 "
    "(insert.ps1:281-283), both made deterministic via md5-based "
    "indexing instead of Get-Random and returned as one labeled "
    "append-ready DataFrame",
)
def r11_batched_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ins = synth_batch(spark, 500, "ins:", 20001, batch="insert")
    synth = synth_batch(spark, 1000, "synth:", 10001, batch="synth")
    return ins.unionByName(synth)


# -- O-R12/O-R13: DDL catalog + seed rows (quickstart_prepare_peers.sh) ----

# Literal seed rows from quickstart_prepare_peers.sh:54-77 (weights
# pre-rounded to the NUMERIC(10,2) values Postgres stores).
SEED_CUSTOMERS = [
    (1001, "Sally", "Thomas", "sally.thomas@acme.com"),
    (1002, "George", "Bailey", "gbailey@foobar.com"),
    (1003, "Edward", "Walker", "ed@walker.com"),
    (1004, "Anne", "Kretchmar", "annek@noanswer.org"),
]
SEED_PRODUCTS = [
    (101, "scooter", "Small 2-wheel scooter", "3.14"),
    (102, "car battery", "12V car battery", "8.10"),
    (103, "12-pack drill bits",
     "12-pack of drill bits with sizes ranging from #40 to #3", "0.80"),
    (104, "hammer", "12oz carpenter's hammer", "0.75"),
    (105, "hammer", "14oz carpenter's hammer", "0.88"),
    (106, "hammer", "16oz carpenter's hammer", "1.00"),
    (107, "rocks", "box of assorted rocks", "5.30"),
    (108, "jacket", "water resistent black wind breaker", "0.10"),
    (109, "spare tire", "24 inch sparetire", "22.20"),
]
SEED_ORDERS = [
    (10001, "2016-01-16", 1001, 1, 102),
    (10002, "2016-01-17", 1002, 2, 105),
    (10003, "2016-02-19", 1002, 2, 106),
    (10004, "2016-02-21", 1003, 1, 107),
    (10005, "2025-07-25", 1001, 99, 101),
]


def seed_frames(spark: SparkSession):
    """The reference's seed data as typed DataFrames (O-R13,
    quickstart_prepare_peers.sh:54-77), schemas from the catalog."""
    from ..catalog import CUSTOMERS_SCHEMA, ORDERS_SCHEMA, PRODUCTS_SCHEMA
    from ..functions.values import values_frame

    # values_frame (r19): createDataFrame over Python rows compiled to
    # Scan ExistingRDD — r13's exec re-pickled these 18 rows through a
    # Python worker on every run (~1 s noop exec for 5 output rows);
    # the VALUES LocalRelation is pure JVM, identical rows and schema.
    customers = values_frame(spark, SEED_CUSTOMERS, CUSTOMERS_SCHEMA)
    products = values_frame(spark, SEED_PRODUCTS, PRODUCTS_SCHEMA)
    orders = values_frame(spark, SEED_ORDERS, ORDERS_SCHEMA)
    return customers, products, orders


def _ddl_rows():
    """information_schema-style rows for the reference DDL
    (quickstart_prepare_peers.sh:25-49), from the explicit catalog."""
    from ..catalog import (
        CUSTOMERS_SCHEMA,
        FOREIGN_KEYS,
        ORDERS_SCHEMA,
        PRODUCTS_SCHEMA,
    )

    ddl_types = {
        ("customers", "id"): "integer",
        ("customers", "first_name"): "varchar(50)",
        ("customers", "last_name"): "varchar(50)",
        ("customers", "email"): "varchar(100)",
        ("products", "id"): "integer",
        ("products", "name"): "varchar(100)",
        ("products", "description"): "text",
        ("products", "weight"): "numeric(10,2)",
        ("orders", "id"): "integer",
        ("orders", "order_date"): "date",
        ("orders", "purchaser"): "integer",
        ("orders", "quantity"): "integer",
        ("orders", "product_id"): "integer",
    }
    rows = []
    for tname, schema in (
        ("customers", CUSTOMERS_SCHEMA),
        ("orders", ORDERS_SCHEMA),
        ("products", PRODUCTS_SCHEMA),
    ):
        for ordinal, field in enumerate(schema.fields, start=1):
            fk = FOREIGN_KEYS.get((tname, field.name))
            rows.append(
                (
                    tname,
                    ordinal,
                    field.name,
                    ddl_types[(tname, field.name)],
                    field.name == "id",
                    fk[0] if fk else None,
                )
            )
    return rows


@declare(
    "r12_ddl_catalog",
    "SELECT * FROM (VALUES "
    + ", ".join(
        "('{0}', {1}, '{2}', '{3}', {4}, {5})".format(
            t, o, c, d, str(pk).lower(), f"'{fk}'" if fk else "CAST(NULL AS VARCHAR)"
        )
        for (t, o, c, d, pk, fk) in _ddl_rows()
    )
    + ") AS t(table_name, ordinal, column_name, data_type, is_pk, fk_table)",
    doc="O-R12 DDL: CREATE TABLE with PK/FK constraints "
    "(quickstart_prepare_peers.sh:25-49) — constraints live as catalog "
    "metadata (Spark doesn't enforce them; used for broadcast-join "
    "planning and synthetic generation)",
)
def r12_ddl_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("table_name", T.StringType()),
            T.StructField("ordinal", T.IntegerType()),
            T.StructField("column_name", T.StringType()),
            T.StructField("data_type", T.StringType()),
            T.StructField("is_pk", T.BooleanType()),
            T.StructField("fk_table", T.StringType()),
        ]
    )
    from ..functions.values import values_frame

    return values_frame(spark, _ddl_rows(), schema)


@declare(
    "r13_seed_join",
    """
WITH c(id, first_name, last_name, email) AS (VALUES
  (1001, 'Sally', 'Thomas', 'sally.thomas@acme.com'),
  (1002, 'George', 'Bailey', 'gbailey@foobar.com'),
  (1003, 'Edward', 'Walker', 'ed@walker.com'),
  (1004, 'Anne', 'Kretchmar', 'annek@noanswer.org')),
p(id, name, weight) AS (VALUES
  (101, 'scooter', CAST(3.14 AS DECIMAL(10,2))),
  (102, 'car battery', CAST(8.10 AS DECIMAL(10,2))),
  (103, '12-pack drill bits', CAST(0.80 AS DECIMAL(10,2))),
  (104, 'hammer', CAST(0.75 AS DECIMAL(10,2))),
  (105, 'hammer', CAST(0.88 AS DECIMAL(10,2))),
  (106, 'hammer', CAST(1.00 AS DECIMAL(10,2))),
  (107, 'rocks', CAST(5.30 AS DECIMAL(10,2))),
  (108, 'jacket', CAST(0.10 AS DECIMAL(10,2))),
  (109, 'spare tire', CAST(22.20 AS DECIMAL(10,2)))),
o(id, order_date, purchaser, quantity, product_id) AS (VALUES
  (10001, DATE '2016-01-16', 1001, 1, 102),
  (10002, DATE '2016-01-17', 1002, 2, 105),
  (10003, DATE '2016-02-19', 1002, 2, 106),
  (10004, DATE '2016-02-21', 1003, 1, 107),
  (10005, DATE '2025-07-25', 1001, 99, 101))
SELECT o.id AS order_id, strftime(o.order_date, '%Y-%m-%d') AS order_date,
       o.quantity, c.email AS customer_email, p.name AS product_name,
       CAST(p.weight AS DOUBLE) AS weight
FROM o JOIN c ON o.purchaser = c.id JOIN p ON o.product_id = p.id
""",
    doc="O-R13 seed rows (quickstart_prepare_peers.sh:54-77) + FK "
    "broadcast equi-joins (:47-48): fact orders joined to both "
    "dimensions — the star-schema lookup pattern; dims broadcast, no "
    "shuffle on the fact side",
)
def r13_seed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customers, products, orders = seed_frames(spark)
    return (
        orders.join(
            F.broadcast(customers), orders.purchaser == customers.id
        )
        .join(F.broadcast(products), orders.product_id == products.id)
        .select(
            orders.id.alias("order_id"),
            F.date_format("order_date", "yyyy-MM-dd").alias("order_date"),
            "quantity",
            F.col("email").alias("customer_email"),
            F.col("name").alias("product_name"),
            F.col("weight").cast("double").alias("weight"),
        )
    )


@declare(
    "r14_replication_slots",
    None,  # live stream state; rows-only check
    doc="O-R14 SELECT * FROM pg_replication_slots (README.md:240) / "
    "O-C9 flow status: runs a real miniature streaming mirror "
    "(availableNow drain over a spooled change feed) and returns its "
    "durable progress as the slots DataFrame; carries the O-R10 "
    "engine/version probe columns (monitor.ps1:534) — both are "
    "engine-specific status probes, merged to free a declared slot",
)
def r14_replication_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..catalog import change_event_schema
    from ..operators.cdc import events_as_changes
    from ..sources.changes import write_change_batches
    from ..streaming.mirror import Mirror, stream_status
    from pyspark.sql import types as T

    row_schema = T.StructType(
        [
            T.StructField("entity_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="slots_probe_")
    try:
        changes = events_as_changes(spark, sf_dir).filter(
            F.col("_version") < 500
        )
        write_change_batches(changes, f"{work}/changes", rows_per_batch=250)
        mirror = Mirror(
            spark,
            name="slots_probe",
            schema="public",
            table="events_mirror",
            key_cols=["entity_id"],
            row_schema=row_schema,
            target_root=f"{work}/warehouse",
            checkpoint_root=f"{work}/ckpt",
        )
        q = mirror.start(
            f"{work}/changes", available_now=True, max_files_per_trigger=None
        )
        q.awaitTermination(120)
        # stream_status materializes the query's progress into LOCAL
        # rows (recentProgress via py4j, then createDataFrame), and
        # the probe columns below are literals — nothing in this frame
        # reads the temp dirs, so the old collect + re-createDataFrame
        # round trip was a pure double materialization (r19; ~0.3 s of
        # driver time per build).
        return stream_status(spark, [q]).select(
            "*",
            F.lit("spark").alias("engine"),
            F.lit(spark.version).alias("engine_version"),
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
