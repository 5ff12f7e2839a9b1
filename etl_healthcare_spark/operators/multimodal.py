"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(north-star capability, SURVEY §7.1 step 10; the reference's closest analog
is the opaque payload Buffer of libs/adapters, SURVEY §1.2).

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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("new_width", T.IntegerType(), False),
        T.StructField("new_height", T.IntegerType(), False),
    ]
)


def resize_plan(df: DataFrame, id_col: str, width_col: str, height_col: str, max_side: int = 224) -> DataFrame:
    """Image-resize stage: aspect-preserving fit into ``max_side``.

    The geometry (the part a training pipeline must get right) is computed
    for real inside the same mapInPandas batch a PIL ``Image.resize`` call
    would live in; only the pixel kernel is stubbed (no image libs here).
    new_w = floor(w * max_side / max(w, h)) when the longest side exceeds
    max_side, else unchanged — identical IEEE double ops in the SQL oracle.
    """
    import math

    src = df.select(
        F.col(id_col).alias("id"), F.col(width_col).alias("width"), F.col(height_col).alias("height")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            m = b[["width", "height"]].max(axis=1)
            scale_needed = m > max_side
            new_w = [
                int(math.floor(w * max_side / mx)) if s else int(w)
                for w, mx, s in zip(b["width"], m, scale_needed)
            ]
            new_h = [
                int(math.floor(h * max_side / mx)) if s else int(h)
                for h, mx, s in zip(b["height"], m, scale_needed)
            ]
            yield pd.DataFrame(
                {
                    "id": b["id"],
                    "width": b["width"],
                    "height": b["height"],
                    "new_width": pd.Series(new_w, dtype="int32"),
                    "new_height": pd.Series(new_h, dtype="int32"),
                }
            )

    return src.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("ts_s", T.DoubleType(), False),
        T.StructField("frame_sha", T.StringType(), False),
    ]
)


def sample_frames(
    df: DataFrame, id_col: str, duration_col: str, fps_col: str, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling stage: pick <= ``max_frames`` evenly-strided frame
    indices per clip (stride = max(1, n_frames // max_frames)), fan out one
    row per sampled frame.

    The index arithmetic and the fan-out (the ffmpeg ``select='not(mod(n,k))'``
    analog) are real; the frame decode is a deterministic sha256 stand-in.
    One clip's frames stay inside one Arrow batch — the shape a torchcodec /
    pyav kernel consumes.
    """
    import hashlib

    src = df.select(
        F.col(id_col).alias("id"),
        F.col(duration_col).alias("duration_s"),
        F.col(fps_col).alias("fps"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, tss, shas = [], [], [], []
            for vid, dur, fps in zip(b["id"], b["duration_s"], b["fps"]):
                n_frames = int(dur) * int(fps)
                stride = max(1, n_frames // max_frames)
                k = 0
                idx = 0
                while idx < n_frames and k < max_frames:
                    ids.append(vid)
                    idxs.append(idx)
                    tss.append(idx / int(fps))
                    shas.append(hashlib.sha256(f"{vid}:{idx}".encode()).hexdigest())
                    k += 1
                    idx += stride
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "ts_s": pd.Series(tss, dtype="float64"),
                    "frame_sha": pd.Series(shas, dtype="object"),
                }
            )

    return src.mapInPandas(run, schema=FRAME_SCHEMA)


def real_decode(*_args, **_kwargs):
    """Placeholder for the production decode kernel."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; wire PIL/soundfile/ffmpeg here and reuse decode_features' "
        "mapInPandas plumbing"
    )
