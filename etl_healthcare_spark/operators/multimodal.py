"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (north-star capability; no media libs in this container, so the decode
kernels are STUBBED — the Spark-side plumbing is real and tested):

* storage: ``binary`` payload column + a metadata struct (modality, mime,
  width/height/duration, byte_len, sha256) — the schema a 100 TB multimodal
  lake would carry in parquet;
* partitioning: by modality then hash-bucketed id, so decode stages fan out
  evenly and a per-modality filter prunes files;
* compute: `mapInPandas` over Arrow batches — the only sanctioned Python
  hot path.  Batch shape (pandas DataFrame per partition slice) is exactly
  what a real decode (PIL/ffmpeg/torchcodec) would consume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),  # image|audio|video|text
        T.StructField("mime", T.StringType(), True),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)


def attach_media_meta(df: DataFrame, payload_col: str, modality: str, mime: str | None = None) -> DataFrame:
    """Typed metadata struct from an opaque binary column — pure expressions."""
    p = F.col(payload_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).cast("string").alias("mime"),
            F.octet_length(p).cast("long").alias("byte_len"),
            F.sha2(p, 256).alias("sha256"),
        ),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("feat_mean", T.DoubleType(), True),
        T.StructField("feat_dim", T.IntegerType(), True),
    ]
)


def _fake_decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a media decode + feature extraction.

    A real implementation would decode bytes (PIL / soundfile / ffmpeg) and
    emit a feature vector; the container has no media libs, so this derives a
    deterministic pseudo-feature from the payload bytes.  The Arrow batch
    shape, schema, and partitioning are the real contract.
    """
    ids = batch["id"]
    payloads = batch["payload"]
    feat_mean = payloads.map(lambda b: (sum(b[:64]) / max(1, len(b[:64]))) if len(b) else None)
    return pd.DataFrame(
        {
            "id": ids,
            "byte_len": payloads.map(len),
            "feat_mean": feat_mean,
            "feat_dim": 64,
        }
    )


def decode_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """mapInPandas decode stage: Arrow-batched, partition-parallel.

    Raises NotImplementedError only from a *real* decode request (modality
    kernels are stubbed); the deterministic fake keeps the pipeline testable.
    """
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _fake_decode_batch(b)

    return src.mapInPandas(run, schema=DECODED_SCHEMA)


def real_decode(*_args, **_kwargs):
    """Placeholder for the production decode kernel."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; wire PIL/soundfile/ffmpeg here and reuse decode_features' "
        "mapInPandas plumbing"
    )
