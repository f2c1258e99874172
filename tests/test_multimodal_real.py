"""REAL-bytes proof for the multimodal Arrow path (VERDICT r04 item 5):
actual PNG and WAV payloads decoded through ``extract_features`` /
``resize_images`` with ``decode="real"`` — not just the fake tier.

The PNG decoder is validated against hand-assembled files built directly
from the PNG spec (chunk layout + CRC + per-scanline filter arithmetic
computed by hand in the test), so the check is independent of our own
encoder; round-trips then pin encoder/decoder consistency. A PIL-backed
cross-check runs when Pillow is importable (skipped in this container).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from flink_recommendation_system_spark.functions import codecs
from flink_recommendation_system_spark.operators.multimodal import (
    extract_features,
    resize_images,
)

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _png(w: int, h: int, color: int, raw_scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _chunk(b"IEND", b"")
    )


def test_decode_png_filter_none_rgb():
    # 2x2 RGB, filter 0: scanlines are literal pixel bytes
    rows = bytes([0, 255, 0, 0, 0, 255, 0]) + bytes([0, 0, 0, 255, 10, 20, 30])
    arr = codecs.decode_png(_png(2, 2, 2, rows))
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[0, 1].tolist() == [0, 255, 0]
    assert arr[1, 0].tolist() == [0, 0, 255]
    assert arr[1, 1].tolist() == [10, 20, 30]


def test_decode_png_all_filters_gray():
    """One scanline per filter type (gray, width 3), expected pixels
    computed by hand from the spec's reconstruction formulas."""
    # row0 filter1 Sub:   raw 10,5,5   -> recon 10,15,20
    # row1 filter2 Up:    raw 1,1,1    -> recon 11,16,21
    # row2 filter3 Avg:   raw 5,5,5    -> recon 5+(0+11)/2=10, 5+(10+16)/2=18,
    #                                     5+(18+21)/2=24
    # row3 filter4 Paeth: raw 2,2,2    -> p(0,10,0)=10 ->12, p(12,18,10)=18
    #                                     ->20, p(20,24,18)=24 ->26
    raw = (
        bytes([1, 10, 5, 5])
        + bytes([2, 1, 1, 1])
        + bytes([3, 5, 5, 5])
        + bytes([4, 2, 2, 2])
    )
    arr = codecs.decode_png(_png(3, 4, 0, raw))
    assert arr[:, :, 0].tolist() == [
        [10, 15, 20],
        [11, 16, 21],
        [10, 18, 24],
        [12, 20, 26],
    ]


def test_decode_png_rejects_corruption():
    rows = bytes([0, 7])
    good = _png(1, 1, 0, rows)
    with pytest.raises(ValueError, match="signature"):
        codecs.decode_png(b"JUNK" + good)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_png(bytes(bad_crc))
    with pytest.raises(ValueError):
        codecs.decode_png(_png(2, 1, 0, bytes([0, 7])))  # size mismatch


def test_png_roundtrip_and_resize():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(arr)), arr)
    small = codecs.resize_nearest(arr, (2, 2))
    # nearest-neighbor index map: ys = [0,2], xs = [0,2]
    assert np.array_equal(small, arr[[0, 2]][:, [0, 2]])


def test_wav_roundtrip():
    samples = (np.sin(np.arange(64) / 4.0) * 1000).astype(np.int16)
    rate, ch, got = codecs.decode_wav(codecs.encode_wav(8000, samples))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(got[:, 0], samples)


def test_avi_roundtrip():
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(4, 5, 7, 3), dtype=np.uint8)
    got = codecs.decode_avi(codecs.encode_avi(frames, fps=12))
    assert got.shape == frames.shape
    assert np.array_equal(got, frames)


def test_avi_odd_width_padding():
    """Width 5 → 15-byte rows padded to 16; the stride math must not leak
    padding bytes into pixels."""
    frames = np.arange(2 * 3 * 5 * 3, dtype=np.uint8).reshape(2, 3, 5, 3)
    got = codecs.decode_avi(codecs.encode_avi(frames))
    assert np.array_equal(got, frames)


def test_avi_rejects_corruption():
    frames = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    data = codecs.encode_avi(frames)
    with pytest.raises(ValueError, match="signature"):
        codecs.decode_avi(b"RIFX" + data[4:])
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_avi(data[:40])
    # flip compression field (strf offset: BI_RGB dword) → unsupported
    bad = bytearray(data)
    i = data.index(b"strf")
    bad[i + 8 + 16] = 1  # biCompression = BI_RLE8
    with pytest.raises(ValueError, match="unsupported"):
        codecs.decode_avi(bytes(bad))


@pytest.fixture(scope="module")
def real_assets(spark):
    """A tiny asset table whose payloads are REAL encoded media."""
    img1 = codecs.encode_png(
        np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    )
    img2 = codecs.encode_png(np.full((8, 8, 1), 200, dtype=np.uint8))
    wav = codecs.encode_wav(
        16000, (np.ones(100) * 500).astype(np.int16)
    )
    vid = codecs.encode_avi(
        np.full((6, 2, 3, 3), 17, dtype=np.uint8), fps=10
    )
    return spark.createDataFrame(
        [
            (1, "image", bytearray(img1), "image/png"),
            (2, "image", bytearray(img2), "image/png"),
            (3, "audio", bytearray(wav), "audio/wav"),
            (4, "video", bytearray(vid), "video/x-msvideo"),
        ],
        "asset_id long, modality string, payload binary, mime_type string",
    )


def test_extract_features_real_bytes(spark, real_assets):
    got = {
        r["asset_id"]: r
        for r in extract_features(real_assets, decode="real").collect()
    }
    # image 1: 6x4 RGB, mean = mean(0..71) = 35.5
    assert got[1]["features"] == [6.0, 4.0, 3.0, 35.5]
    assert got[2]["features"] == [8.0, 8.0, 1.0, 200.0]
    # audio: 100 frames @16kHz mono, |amp| = 500
    assert got[3]["features"] == [100.0, 16000.0, 1.0, 500.0]
    # video: 6 frames of 3x2 constant 17
    assert got[4]["features"] == [6.0, 3.0, 2.0, 17.0]
    assert got[1]["n_bytes"] == len(bytes(real_assets.collect()[0]["payload"]))


def test_resize_images_real_bytes(spark, real_assets):
    import base64

    got = {
        r["asset_id"]: r
        for r in resize_images(
            real_assets, target=(3, 2), decode="real"
        ).collect()
    }
    assert set(got) == {1, 2}  # audio rows filtered out
    src = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = codecs.decode_png(base64.b64decode(got[1]["payload"]))
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out, codecs.resize_nearest(src, (3, 2)))
    assert got[1]["checksum"] == sum(base64.b64decode(got[1]["payload"])) % 997


def test_extract_frames_real_avi(spark, real_assets):
    """The decode-tier frame sampler over the Arrow path: every 2nd frame
    of the 6-frame fixture, constant-17 pixels → checksum 17·2·3·3 % 997."""
    from flink_recommendation_system_spark.operators.multimodal import (
        extract_frames,
    )

    rows = sorted(
        (r["frame_idx"], r["width"], r["height"], r["checksum"])
        for r in extract_frames(
            real_assets, every_n=2, decode="real"
        ).collect()
    )
    assert rows == [(i, 3, 2, (17 * 2 * 3 * 3) % 997) for i in (0, 2, 4)]


def test_malformed_video_payload_raises(spark):
    assets = spark.createDataFrame(
        [(9, "video", bytearray(b"\x00" * 16), "video/mp4")],
        "asset_id long, modality string, payload binary, mime_type string",
    )
    with pytest.raises(Exception, match="AVI|signature"):
        extract_features(assets, decode="real").collect()


def test_default_mode_still_raises(spark, real_assets):
    with pytest.raises(NotImplementedError, match="decode tier"):
        extract_features(real_assets).collect()


@pytest.mark.skipif(
    codecs._PILImage is None, reason="Pillow not installed in this container"
)
def test_pil_tier_cross_checks_stdlib_codec():  # pragma: no cover
    import io

    arr = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(3, 5, 3)
    data = codecs.encode_png(arr)
    pil = np.asarray(codecs._PILImage.open(io.BytesIO(data)))
    assert np.array_equal(pil, arr)


def test_frame_sample_plan_matches_extractor_indices(spark):
    """The metadata-only plan must emit EXACTLY the (asset_id, frame_idx)
    set the fake-tier extractor decodes at the same (every_n,
    frame_bytes) — including zero rows for payloads shorter than one
    frame (round-12 review: the plan's old inclusive bound emitted an
    index the extractor never produces)."""
    from flink_recommendation_system_spark.operators.multimodal import (
        extract_frames,
        frame_sample_plan,
    )

    rows = [
        (1, "video", bytearray(range(256)) * 5),   # 1280 B → 10 frames
        (2, "video", b"x" * 128),                  # exactly one frame
        (3, "video", b"y" * 127),                  # shorter than a frame
        (4, "video", b""),                         # empty payload
        (5, "image", b"z" * 1000),                 # non-video: excluded
    ]
    assets = spark.createDataFrame(
        [(i, m, bytes(p)) for i, m, p in rows],
        "asset_id long, modality string, payload binary",
    )
    plan = {
        (r["asset_id"], r["frame_idx"])
        for r in frame_sample_plan(
            assets, every_n=3, frame_bytes=128
        ).collect()
    }
    extracted = {
        (r["asset_id"], r["frame_idx"])
        for r in extract_frames(
            assets, every_n=3, decode="fake", fake_frame_bytes=128
        ).collect()
    }
    assert plan == extracted
    assert (2, 0) in plan and not any(a in (3, 4, 5) for a, _ in plan)


def test_decode_avi_rec_lists_and_stream_filter():
    """Frames wrapped in 'LIST rec ' groups (interleaved muxers) must
    decode, and a second stream's '01db' chunks must NOT be interpreted
    with the vids stream's dimensions (round-12 review: both were silent
    wrong-output paths in a codec whose contract forbids them)."""
    import struct

    import numpy as np

    from flink_recommendation_system_spark.functions.codecs import (
        decode_avi,
        encode_avi,
    )

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (2, 4, 6, 3), dtype=np.uint8)
    plain = encode_avi(frames, fps=5)

    def chunk(fourcc, body):
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    # rebuild: same headers, but movi holds frame0 at top level, frame1
    # inside a LIST rec, plus a bogus second-stream '01db' chunk
    movi_off = plain.find(b"LIST", 12)
    while plain[movi_off + 8:movi_off + 12] != b"movi":
        movi_off = plain.find(b"LIST", movi_off + 4)
    (movi_len,) = struct.unpack("<I", plain[movi_off + 4:movi_off + 8])
    movi_body = plain[movi_off + 12:movi_off + 8 + movi_len]
    # extract the two committed 00db chunks from the original movi body
    raws, pos = [], 0
    while pos + 8 <= len(movi_body):
        fcc = movi_body[pos:pos + 4]
        (ln,) = struct.unpack("<I", movi_body[pos + 4:pos + 8])
        if fcc == b"00db":
            raws.append(movi_body[pos + 8:pos + 8 + ln])
        pos += 8 + ln + (ln & 1)
    assert len(raws) == 2
    new_movi = (
        chunk(b"00db", raws[0])
        + chunk(b"LIST", b"rec " + chunk(b"00db", raws[1]))
        + chunk(b"01db", b"\x07" * len(raws[0]))  # second stream: ignore
    )
    rebuilt = (
        plain[:movi_off]
        + chunk(b"LIST", b"movi" + new_movi)
        + plain[movi_off + 8 + movi_len + (movi_len & 1):]
    )
    # fix the RIFF size header
    rebuilt = (
        rebuilt[:4] + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    )
    out = decode_avi(rebuilt)
    assert out.shape == frames.shape
    assert (out == frames).all()


def test_on_error_skip_quarantines_malformed_rows(spark):
    """One corrupt payload among good ones must not abort the job when
    on_error='skip' — the per-row ValueError contract the codecs were
    built for (round-12 review: the real tier previously had no
    quarantine path at all). Default 'raise' keeps strict semantics."""
    import numpy as np
    import pytest

    from flink_recommendation_system_spark.functions.codecs import (
        encode_avi,
        encode_image,
    )
    from flink_recommendation_system_spark.operators.multimodal import (
        extract_features,
        extract_frames,
        resize_images,
    )

    img = encode_image(np.full((4, 4, 3), 9, dtype=np.uint8))
    vid = encode_avi(
        np.zeros((2, 2, 2, 3), dtype=np.uint8), fps=5
    )
    assets = spark.createDataFrame(
        [
            (1, "image", img),
            (2, "image", b"not-a-png"),
            (3, "video", vid),
            (4, "video", b"not-an-avi"),
        ],
        "asset_id long, modality string, payload binary",
    )
    feats = extract_features(assets, decode="real", on_error="skip")
    assert {r["asset_id"] for r in feats.collect()} == {1, 3}
    rs = resize_images(assets, target=(2, 2), decode="real", on_error="skip")
    assert {r["asset_id"] for r in rs.collect()} == {1}
    fr = extract_frames(assets, every_n=1, decode="real", on_error="skip")
    assert {r["asset_id"] for r in fr.collect()} == {3}
    with pytest.raises(Exception):
        extract_features(assets, decode="real").collect()
