"""JDBC source/sink for real OLTP endpoints (the reference's Postgres
`source` peer, quickstart_prepare_peers.sh:16-19, and its ClickHouse
`target`, :88).

Spark's JDBC relation gives predicate pushdown and parallel
partitioned scans; the knobs that matter at scale are partitionColumn/
lowerBound/upperBound/numPartitions (parallel snapshot, O-C1) and
fetchsize. No Postgres/ClickHouse driver jars ship in this container,
but Spark's bundled Derby embedded driver does — tests/test_jdbc.py
runs a REAL write -> parallel partitioned read round-trip through
these builders against a Derby database (env-gated: skips if the
Derby driver is absent). Against Postgres/ClickHouse only the URL and
driver class change; the option surface is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def snapshot_read_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    bounds: tuple[int, int] | None = None,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Options for a parallel JDBC snapshot read (O-C1). With a numeric
    partition column + bounds, Spark issues num_partitions range-
    predicated scans instead of one serial cursor — the
    flow-snapshot-worker parallelism analog."""
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetchsize)}
    if partition_column is not None:
        if bounds is None:
            raise ValueError("bounds required with partition_column")
        lo, hi = bounds
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lo),
            upperBound=str(hi),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc(spark: SparkSession, **options: str) -> DataFrame:
    return spark.read.format("jdbc").options(**options).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 500,
) -> None:
    """Batched JDBC append — batchsize mirrors the reference's 500-row
    INSERT batches (insert.ps1:12)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )
