"""Multimodal column handling (SURVEY.md §7 M4): image/audio/video as
opaque ``binary`` payloads with typed metadata, processed via Arrow-batched
``mapInPandas`` — the shape a 100 TB media pipeline uses.

The container has no image/audio libraries, so the decode step is STUBBED:
``decode_image_batch`` raises ``NotImplementedError`` unless
``fake_decode=True``, in which case a deterministic fake decoder derives
"features" from the payload bytes. Everything around the stub — schema,
batch iteration, partitioning, UDF signatures, output types — is real and
tested; swapping in PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def synthesize_assets(docs: DataFrame) -> DataFrame:
    """Build a multimodal asset table from the documents table (the
    container ships no media files): payload = utf-8 bytes of the text,
    modality round-robins over image/audio/video. Deterministic."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.concat(F.lit("application/x-fake-"), modality).alias("mime_type"),
    )


def _fake_features(payload: bytes, n: int = 4) -> list[float]:
    """Deterministic fake 'decoder': n summary statistics of the raw bytes.
    Stands in for decode→resize→embed until real codecs are installed."""
    if not payload:
        return [0.0] * n
    total = len(payload)
    s = sum(payload)
    mx = max(payload)
    mn = min(payload)
    return [float(total), float(s % 997), float(mx), float(mn)]


def extract_features(
    assets: DataFrame, fake_decode: bool = False, batch_hint: int = 1024
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real pipeline shape: ``mapInPandas`` receives pandas batches of
    (asset_id, modality, payload), decodes each payload, emits fixed-width
    feature vectors. Without media libs installed this raises
    ``NotImplementedError`` unless ``fake_decode=True``.
    """

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if not fake_decode:
            raise NotImplementedError(
                "media codecs not installed in this environment; "
                "pass fake_decode=True for the deterministic stub"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        decode_batches, FEATURE_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes_out", LongType()),
        StructField("payload", StringType()),  # base64 of the resized bytes
        StructField("checksum", LongType()),
    ]
)


def resize_images(
    assets: DataFrame,
    target: tuple[int, int] = (64, 64),
    fake_decode: bool = False,
) -> DataFrame:
    """Arrow-batched image resize over binary payloads — the third
    mapInPandas stage of the media pipeline (decode → RESIZE → embed).

    Real pipeline shape: each pandas batch decodes the payload, resamples
    to ``target`` (w, h), re-encodes, and emits the resized payload plus
    output metadata. Without codecs this raises ``NotImplementedError``
    unless ``fake_decode=True``, in which case the deterministic stand-in
    'resize' truncates the payload to w·h bytes (the real operator also
    maps n input bytes to a fixed output size — the plumbing, batching,
    and schema are identical). ``checksum`` (byte sum mod 997) makes the
    output value-checkable end-to-end.
    """
    w, h = target

    def resize_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import base64

        import pandas as pd

        if not fake_decode:
            raise NotImplementedError(
                "media codecs not installed in this environment; "
                "pass fake_decode=True for the deterministic stub"
            )
        cap = w * h
        for pdf in batches:
            out = pdf["payload"].map(lambda b: bytes(b[:cap]))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": w,
                    "height": h,
                    "n_bytes_out": out.map(len),
                    "payload": out.map(
                        lambda b: base64.b64encode(b).decode("ascii")
                    ),
                    "checksum": out.map(lambda b: sum(b) % 997),
                }
            )

    return (
        assets.filter(F.col("modality") == "image")
        .select("asset_id", "payload")
        .mapInPandas(resize_batches, RESIZE_SCHEMA)
    )


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* shape: one row per sampled frame index,
    derived from metadata only (frame count = payload size // 1024 as the
    stand-in). Shows the explode-based fan-out a real frame sampler uses —
    the decode of each frame would be another mapInPandas over this."""
    frames = F.sequence(
        F.lit(0),
        F.greatest((F.length("payload") / 1024).cast("long"), F.lit(0)),
        F.lit(every_n),
    )
    return (
        assets.filter(F.col("modality") == "video")
        .select("asset_id", F.explode(frames).alias("frame_idx"))
    )
