"""Write-path workload tests (O-R11/R12/R13): real spark.sql DDL over
a warehouse, seed inserts, and batched append — the executable side of
the declared catalog/seed/insert queries."""

from __future__ import annotations

from peerdb_cdc_psql_clickhouse_spark.operators.relational import (
    r11_batched_insert,
    seed_frames,
)


def test_ddl_create_insert_roundtrip(spark, tmp_path):
    """O-R12 CREATE DATABASE/TABLE + O-R13 seed INSERT via spark.sql,
    parquet-backed (quickstart_prepare_peers.sh:16-77 flow)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS refdb")
    try:
        spark.sql(
            "CREATE TABLE refdb.customers "
            "(id INT, first_name STRING, last_name STRING, email STRING) "
            f"USING parquet LOCATION '{tmp_path}/customers' "
            "TBLPROPERTIES ('primary_key'='id')"
        )
        customers, _, _ = seed_frames(spark)
        customers.write.mode("append").saveAsTable("refdb.customers")
        assert spark.table("refdb.customers").count() == 4
        props = spark.sql(
            "SHOW TBLPROPERTIES refdb.customers"
        ).collect()
        assert any(
            r["key"] == "primary_key" and r["value"] == "id" for r in props
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS refdb.customers")
        spark.sql("DROP DATABASE IF EXISTS refdb")


def test_batched_insert_append(spark, tmp_path):
    """O-R11 + O-D12: the generated batches (500-row insert + 1000-row
    synth, disjoint id ranges) append to a parquet sink; a second
    shifted append doubles the rows with ids still unique."""
    batch = r11_batched_insert(spark, "")
    assert batch.count() == 1500
    assert batch.filter(batch.batch == "insert").count() == 500
    assert batch.filter(batch.batch == "synth").count() == 1000
    path = str(tmp_path / "orders_sink")
    batch.write.mode("append").parquet(path)
    batch.withColumn("id", batch.id + 20000).write.mode("append").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 3000
    assert back.select("id").distinct().count() == 3000


def test_seed_frames_match_reference_cardinality(spark):
    customers, products, orders = seed_frames(spark)
    assert (customers.count(), products.count(), orders.count()) == (4, 9, 5)
