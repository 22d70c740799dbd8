"""Multimodal columns (O-X4 + brief): image/audio/video as opaque
binary columns with typed metadata, processed with Arrow-batched
mapInPandas.

The container has no image/audio libraries, so the decode step is a
clearly-marked deterministic fake (or NotImplementedError for real
codecs) — but the Spark-side plumbing is real and tested: schema,
partition-preserving mapInPandas signature, Arrow batch shape, parquet
round-trip of binary + struct metadata.

Scale notes: binary payloads ride in parquet as-is (no decode on scan);
mapInPandas streams Arrow batches so peak memory is one batch, not one
partition; feature extraction keys nothing — embarrassingly parallel,
zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import declare

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("frame_count", T.IntegerType()),
    ]
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Build a multimodal table from documents: text bytes play the
    opaque payload; metadata struct is typed. At scale the payload
    column would come from an object-store manifest instead."""
    payload = F.encode(F.col("text"), "utf-8")
    mime = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str) -> dict:
    """STUB decode step. Real image/audio decoding needs libs absent
    from this container; raise for real codecs, return a deterministic
    fake summary instead so the pipeline shape is testable."""
    if mime not in ("image/png", "audio/wav", "video/mp4"):
        raise NotImplementedError(f"no decoder for {mime!r}")
    # deterministic fake: byte-level stats as 'decoded features'
    mean = sum(payload) / len(payload) if payload else 0.0
    frames = 1 if mime == "image/png" else max(1, len(payload) // 1024)
    return {"byte_mean": mean, "frame_count": frames}


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, zero-shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(payload, meta["mime"])
                for payload, meta in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "byte_mean": [f["byte_mean"] for f in feats],
                    "frame_count": [f["frame_count"] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


@declare(
    "x4_multimodal_meta",
    """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(doc_id % 640 + 16 AS INT) AS width,
       CAST(doc_id % 480 + 16 AS INT) AS height
FROM documents
""",
    doc="O-X4 multimodal column plumbing: binary payload + typed "
    "metadata struct, flattened metadata projection (the decode stage "
    "is the stubbed mapInPandas path, tested in pytest)",
)
def x4_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@declare(
    "x5_approx_distinct",
    None,  # approximate by definition; rows-only check
    doc="O-X5 approx distinct at scale: HyperLogLog++ sketch "
    "(approx_count_distinct), constant memory per partition",
)
def x5_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )
