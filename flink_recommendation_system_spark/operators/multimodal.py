"""Multimodal column handling (SURVEY.md §7 M4): image/audio/video as
opaque ``binary`` payloads with typed metadata, processed via Arrow-batched
``mapInPandas`` — the shape a 100 TB media pipeline uses.

Decode tiers (the ``decode=`` parameter):

- ``"real"``: actual codecs via ``functions.codecs`` — PIL when importable
  for images, else the stdlib PNG (zlib/struct) codec; WAV PCM (wave) for
  audio; uncompressed BI_RGB AVI (RIFF) for video — so real encoded bytes
  flow through the Arrow path for every modality even in codec-less
  containers (exercised in tests/test_multimodal_real.py).
- ``"fake"``: deterministic byte-statistics stand-in — the value-oracle
  tier the registered driver queries use (synthetic payloads are not valid
  media, and the oracle must be reproducible in DuckDB).
- ``"stub"`` (default): raise, so a production caller must choose.

The legacy ``fake_decode=True`` flag maps to ``decode="fake"``.
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


def _resolve_mode(decode: str, fake_decode: bool) -> str:
    mode = "fake" if (fake_decode and decode == "stub") else decode
    if mode not in ("stub", "fake", "real"):
        raise ValueError(f"unknown decode mode {decode!r}")
    if mode == "stub":
        raise NotImplementedError(
            "no decode tier selected: pass decode='real' (PIL or the "
            "stdlib PNG/WAV codecs) or decode='fake' (deterministic "
            "byte-statistics stand-in)"
        )
    return mode


def _real_features(payload: bytes, modality: str) -> list[float]:
    """Fixed-width features from REAL decoded media: images →
    [width, height, channels, mean pixel]; audio → [n_frames, sample_rate,
    channels, mean |amplitude|]. Same width as the fake tier so downstream
    schema/consumers are identical."""
    from ..functions import codecs

    if modality == "image":
        arr = codecs.decode_image(payload)
        ch = 1 if arr.ndim == 2 else arr.shape[2]
        return [
            float(arr.shape[1]),
            float(arr.shape[0]),
            float(ch),
            float(round(arr.astype("float64").mean(), 6)),
        ]
    if modality == "audio":
        rate, ch, samples = codecs.decode_wav(payload)
        mean_amp = (
            float(round(abs(samples.astype("float64")).mean(), 6))
            if samples.size
            else 0.0
        )
        return [float(samples.shape[0]), float(rate), float(ch), mean_amp]
    if modality == "video":
        frames = codecs.decode_avi(payload)
        mean_px = (
            float(round(frames.astype("float64").mean(), 6))
            if frames.size
            else 0.0
        )
        return [
            float(frames.shape[0]),
            float(frames.shape[2]),
            float(frames.shape[1]),
            mean_px,
        ]
    raise ValueError(f"unknown modality {modality!r}")


def extract_features(
    assets: DataFrame,
    fake_decode: bool = False,
    batch_hint: int = 1024,
    decode: str = "stub",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` receives pandas batches of (asset_id, modality,
    payload), decodes each payload, emits fixed-width feature vectors.
    ``decode="real"`` runs actual codecs (see module docstring);
    ``decode="fake"`` (= legacy ``fake_decode=True``) the deterministic
    stand-in; the default raises so callers must choose.
    """
    mode = _resolve_mode(decode, fake_decode)

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if mode == "real":
                feats = [
                    _real_features(p, m)
                    for p, m in zip(pdf["payload"], pdf["modality"])
                ]
            else:
                feats = [_fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": feats,
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
    decode: str = "stub",
) -> DataFrame:
    """Arrow-batched image resize over binary payloads — the third
    mapInPandas stage of the media pipeline (decode → RESIZE → embed).

    Each pandas batch decodes the payload, resamples to ``target`` (w, h),
    re-encodes, and emits the resized payload plus output metadata.
    ``decode="real"`` decodes with actual codecs, resamples
    nearest-neighbor, and re-encodes PNG; ``decode="fake"`` (= legacy
    ``fake_decode=True``) is the deterministic stand-in that truncates the
    payload to w·h bytes (same plumbing, batching, and schema — and
    DuckDB-reproducible, which the registered oracle query needs).
    ``checksum`` (byte sum mod 997) makes either tier value-checkable
    end-to-end.
    """
    w, h = target
    mode = _resolve_mode(decode, fake_decode)

    def resize_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import base64

        import pandas as pd

        if mode == "real":
            from ..functions import codecs

            def one(b: bytes) -> bytes:
                return codecs.encode_image(
                    codecs.resize_nearest(codecs.decode_image(b), (w, h))
                )

        else:
            cap = w * h

            def one(b: bytes) -> bytes:
                return bytes(b[:cap])

        for pdf in batches:
            out = pdf["payload"].map(one)
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


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("checksum", LongType()),
    ]
)


def extract_frames(
    assets: DataFrame,
    every_n: int = 10,
    fake_decode: bool = False,
    decode: str = "stub",
    fake_frame_bytes: int = 1024,
) -> DataFrame:
    """Frame sampling WITH decode — the mapInPandas stage
    ``frame_sample_plan`` plans for: every ``every_n``-th frame of each
    video payload, one output row per sampled frame with its dimensions
    and a pixel checksum (byte sum mod 997 — the value-checkable
    fingerprint the media pipeline carries instead of raw pixels).

    ``decode="real"`` decodes uncompressed AVI via ``functions.codecs``;
    ``decode="fake"`` treats the payload as ``fake_frame_bytes``-sized
    pseudo-frames (frame i = payload[F·i : F·(i+1)], width = frame
    length, height = 1) — the same frame-count arithmetic as
    ``frame_sample_plan``, DuckDB-reproducible for the registered oracle.

    Scale shape: one Arrow batch pass over the (already filtered) video
    assets; the per-frame fan-out happens inside the batch, so a payload
    never crosses the wire more than once.
    """
    mode = _resolve_mode(decode, fake_decode)

    def frame_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        # dispatch + codec import hoisted out of the per-row hot loop
        if mode == "real":
            from ..functions import codecs

            def one(aid, payload, rows):
                frames = codecs.decode_avi(payload)
                for i in range(0, frames.shape[0], every_n):
                    f = frames[i]
                    rows.append(
                        (aid, i, f.shape[1], f.shape[0], int(f.sum()) % 997)
                    )

        else:
            fsz = fake_frame_bytes

            def one(aid, payload, rows):
                n_frames = len(payload) // fsz
                for i in range(0, n_frames, every_n):
                    fb = payload[fsz * i: fsz * (i + 1)]
                    rows.append((aid, i, len(fb), 1, sum(fb) % 997))

        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                one(aid, payload, rows)
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "frame_idx", "width", "height", "checksum",
                ],
            )

    return (
        assets.filter(F.col("modality") == "video")
        .select("asset_id", "payload")
        .mapInPandas(frame_batches, FRAME_SCHEMA)
    )


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* shape: one row per sampled frame index,
    derived from metadata only (frame count = payload size // 1024 as the
    stand-in). Shows the explode-based fan-out a real frame sampler uses —
    ``extract_frames`` is the mapInPandas stage that actually decodes."""
    frames = F.sequence(
        F.lit(0),
        F.greatest((F.length("payload") / 1024).cast("long"), F.lit(0)),
        F.lit(every_n),
    )
    return (
        assets.filter(F.col("modality") == "video")
        .select("asset_id", F.explode(frames).alias("frame_idx"))
    )
