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
    # ASCII-payload contract made explicit (round 15): the fake decoder's
    # byte statistics are oracle-checked under "one char == one byte";
    # multi-byte text breaks that premise (DuckDB's ord() sees codepoints
    # where the Arrow payload carries utf-8 bytes), and a NULL text has
    # no payload — both excluded identically in both engines via the
    # byte-length == char-length test (no regex, engine-exact)
    docs = docs.filter(
        F.col("doc_id").isNotNull()
        & (F.octet_length("text") == F.length("text"))
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
    stats = [float(total), float(s % 997), float(mx), float(mn)]
    # honor n on BOTH branches: a fixed-width feature column must not mix
    # widths within one DataFrame (n != 4 previously produced ragged rows)
    return (stats + [0.0] * n)[:n]


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
    on_error: str = "raise",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` receives pandas batches of (asset_id, modality,
    payload), decodes each payload, emits fixed-width feature vectors.
    ``decode="real"`` runs actual codecs (see module docstring);
    ``decode="fake"`` (= legacy ``fake_decode=True``) the deterministic
    stand-in; the default raises so callers must choose.

    ``on_error="skip"`` quarantines malformed payloads per row (the
    codecs raise ValueError per bad input for exactly this) instead of
    failing the job — at corpus scale one corrupt asset among billions
    must not abort the run; the default "raise" keeps strict semantics.
    """
    mode = _resolve_mode(decode, fake_decode)

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid, m, p in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                try:
                    feats = (
                        _real_features(p, m)
                        if (mode == "real" and p)
                        # the binary column is nullable and both tiers
                        # treat an empty payload as zeros
                        else _fake_features(p)
                    )
                except ValueError:
                    # the codecs turn every malformed payload into a
                    # per-row ValueError precisely so the pipeline can
                    # quarantine it — one corrupt image among billions
                    # must not abort the whole run
                    if on_error == "raise":
                        raise
                    continue
                rows.append((aid, m, len(p) if p is not None else 0, feats))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "modality", "n_bytes", "features"],
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
    on_error: str = "raise",
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
            rows = []
            for aid, b in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    o = one(b if b is not None else b"")
                except ValueError:
                    if on_error == "raise":
                        raise
                    continue
                rows.append((
                    aid, w, h, len(o),
                    base64.b64encode(o).decode("ascii"), sum(o) % 997,
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "n_bytes_out",
                    "payload", "checksum",
                ],
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
    on_error: str = "raise",
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
                try:
                    one(aid, payload if payload is not None else b"", rows)
                except ValueError:
                    if on_error == "raise":
                        raise
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


def frame_sample_plan(
    assets: DataFrame, every_n: int = 10, frame_bytes: int = 1024
) -> DataFrame:
    """Video frame-sampling *plan* shape: one row per sampled frame index,
    derived from metadata only (frame count = payload size //
    ``frame_bytes``, the same stand-in as ``extract_frames``'s fake
    tier). Shows the explode-based fan-out a real frame sampler uses —
    ``extract_frames`` is the mapInPandas stage that actually decodes.

    Indices are ``range(0, n_frames, every_n)`` — EXCLUSIVE of n_frames
    and empty when n_frames = 0, exactly the arithmetic the extractor's
    decode loop runs (round-12 review: the previous inclusive sequence
    bound emitted a frame index the extractor never produces, so a
    consumer sizing decode work from the plan over-allocated)."""
    n_frames = (F.length("payload") / frame_bytes).cast("long")
    frames = F.sequence(
        F.lit(0), n_frames - F.lit(1), F.lit(every_n)
    )
    return (
        assets.filter(F.col("modality") == "video")
        .filter(n_frames > 0)
        .select("asset_id", F.explode(frames).alias("frame_idx"))
    )
