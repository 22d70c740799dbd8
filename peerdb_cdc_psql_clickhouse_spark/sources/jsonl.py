"""JSONL corpus source/sink — the interchange format LLM data
pipelines actually ship (one JSON object per line, optionally
gzipped; the shape of public web-corpus dumps and most open-dataset
releases).

Spark's native json reader handles the heavy lifting (splittable
reads for uncompressed files, per-file parallelism for .gz — a
gzip member is not splittable, so shard counts drive parallelism at
scale, which is how those corpora are distributed anyway). This
module adds the engine conventions on top:

- EXPLICIT schema always (catalog discipline — inference is a full
  extra pass over 100 TB and type-drifts between shards);
- corrupt-record quarantine instead of silent NULL rows: bad lines
  land in a `_corrupt` column and `read_jsonl` splits them out so
  ingestion can count/route them (the CDC dead-letter pattern,
  operators/cdc.validate_changes);
- a documents-table profile (`DOCUMENTS_JSONL_SCHEMA` matching
  catalog's documents columns) so a JSONL drop-in corpus flows
  straight into every O-X operator.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt"


@dataclass(frozen=True)
class JsonlRead:
    """Split result: parseable rows and quarantined raw lines."""

    good: DataFrame
    corrupt: DataFrame  # (_corrupt string) — the raw offending lines


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
) -> JsonlRead:
    """Read a JSONL corpus with explicit schema + corrupt-line
    quarantine. PERMISSIVE mode keeps bad lines in `_corrupt`; `good`
    drops the quarantine column and carries only fully-parsed rows.

    The raw parse is shared via reuse() — required, not just an
    optimization: Spark refuses corrupt-column-only queries against
    raw JSON (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    and the documented remedy is exactly this cache-the-parse. Call
    spark.catalog.clearCache() (or unpersist) when done with a
    long-lived session (the corpus_report convention)."""
    from ..plans.layout import reuse

    full = T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )
    raw = reuse(
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    good = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    corrupt = raw.filter(F.col(_CORRUPT).isNotNull()).select(_CORRUPT)
    return JsonlRead(good=good, corrupt=corrupt)


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming ingestion of a JSONL landing directory — new shard
    files become micro-batches (the continuous-ingest front door for
    the stream_*_candidates dedup screens). Corrupt lines are dropped
    stream-side (route them via read_jsonl in a batch backfill if
    they need counting)."""
    reader = spark.readStream.schema(schema).option("mode", "PERMISSIVE")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    compress: bool = False,
) -> None:
    """Write a corpus as JSONL shards. `shards` controls output file
    count (repartition — distributors usually fix shard sizes);
    gzip per shard when compress=True (the release-artifact form)."""
    out = df.repartition(shards) if shards else df
    w = out.write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)
