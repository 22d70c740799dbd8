"""Change-stream source: the engine-side analog of the reference's
logical-WAL feed (wal_level=logical, docker-compose.yml:66-67;
postgresql.conf:9-14). A change stream is files of envelope rows
(_op, _version, _ts, <row columns>) — catalog.change_event_schema —
laid out one directory per micro-batch so a file source replays them
in bounded batches (O-C5, insert.ps1:11-13 BatchSize=500).

At 100 TB the same layout holds: capture appends parquet to
`changes_dir/batch=<n>/`, Spark's file source discovers new files via
listing + checkpointed offsets, and maxFilesPerTrigger bounds batch
size. No ordering assumption is ever made on file or row order —
apply is max-version-wins (operators.cdc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_change_batches(
    changes: DataFrame,
    path: str,
    rows_per_batch: int = 500,
    version_col: str = "_version",
) -> None:
    """Spool an ordered change set into micro-batch directories
    (batch = _version div rows_per_batch — the insert.ps1:289-292
    batched-VALUES analog). Each batch dir is one commit unit."""
    from pyspark.sql import functions as F

    if "`" in version_col:
        # mirrors project_embeddings' guard (ADVICE r16): the name is
        # interpolated inside a backtick-quoted F.expr identifier, so
        # a backtick would escape the quoting and inject into the SQL
        raise ValueError(
            f"version_col may not contain a backtick: {version_col!r}"
        )

    (
        changes.withColumn(
            "_batch",
            F.expr(f"`{version_col}` div {int(rows_per_batch)}"),
        )
        .repartition("_batch")
        .write.partitionBy("_batch")
        .mode("overwrite")
        .parquet(path)
    )


def read_changes(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Batch read of a spooled change set (snapshot-catchup path)."""
    return (
        spark.read.schema(_with_batch(schema))
        .option("basePath", path)
        .parquet(path)
        .drop("_batch")
    )


def read_changes_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Streaming read of the change feed (O-C2). One file per trigger
    by default = one micro-batch per capture batch (O-C5 pacing);
    offsets live in the query checkpoint (O-C8 durable state)."""
    reader = spark.readStream.schema(_with_batch(schema)).option(
        "basePath", path
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path).drop("_batch")


def _with_batch(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields) + [T.StructField("_batch", T.IntegerType())]
    )
