"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas functions over ``mapInPandas``. The actual
codec step is STUBBED (image/audio libraries are not available in this
environment): ``decoder='fake'`` produces a deterministic synthetic
decode so the Spark-side plumbing — schema, partitioning, UDF
signature, batch shape — is real and tested; ``decoder='real'`` raises
NotImplementedError at the exact point a Pillow/ffmpeg call belongs.

Scale notes (100 TB): payloads stay in executor memory only for the
duration of one Arrow batch (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch); decode is a narrow map
— no shuffle; downstream feature columns are small, so write
feature tables separately from payload tables and join on asset_id
(payload tables are scanned only by the decode pass).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata for an opaque media payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_channels", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "asset_id long, byte_len int, sha1 string, mean_intensity double, "
    "width int, height int"
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents table: the
    text bytes stand in for an encoded payload (deterministic)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(3).alias("n_channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("double").alias("duration_s"),
            F.lit("fake/raw").alias("codec"),
        ).alias("meta"),
    )


def decode_image_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode payloads -> per-asset image features via mapInPandas.

    ``fake``: deterministic pseudo-decode (sha1 + byte statistics) so
    batch shape/schema are exercised without a codec library.
    ``real``: the Pillow/libjpeg call site — NotImplementedError here.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image decode requires Pillow/libjpeg — not available "
                    "in this environment; plug the codec call here"
                )
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "byte_len": payloads.map(len).astype("int32"),
                    "sha1": payloads.map(lambda b: hashlib.sha1(bytes(b)).hexdigest()),
                    # fake "mean pixel": mean byte value of the payload
                    "mean_intensity": payloads.map(
                        lambda b: round(sum(b) / len(b), 6) if len(b) else 0.0
                    ),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                }
            )
            yield out

    return df.select("asset_id", "payload", "meta").mapInPandas(
        _decode, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample_manifest(
    df: DataFrame, every_n_seconds: float = 1.0
) -> DataFrame:
    """Video frame-sampling plan: one row per (asset_id, frame_ts).
    The decode of each frame is the stubbed step; the manifest (what a
    distributed frame-extraction pass fans out over) is real."""
    n_frames = F.greatest(
        F.ceil(F.coalesce(F.col("meta.duration_s"), F.lit(1.0)) / every_n_seconds),
        F.lit(1),
    ).cast("int")
    return df.where(F.col("media_type") == "video").select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_s", F.col("frame_idx") * every_n_seconds)
