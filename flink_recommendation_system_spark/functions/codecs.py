"""Real media codecs for the multimodal operators (VERDICT r04 item 5).

Two tiers, tried in order by ``decode_image`` / ``encode_image``:

- **PIL tier** (optional dependency): used when ``PIL.Image`` is
  importable — any format Pillow supports.
- **Stdlib tier**: a minimal, spec-correct PNG codec built on ``zlib`` +
  ``struct`` (8-bit depth, color types gray/RGB/RGBA, all five scanline
  filters, non-interlaced), and a WAV PCM reader on the stdlib ``wave``
  module. No third-party media library required, so the Arrow-batched
  decode path in ``operators.multimodal`` is exercised with REAL encoded
  bytes even in codec-less containers.

Video uses the spec-minimal uncompressed-AVI (RIFF) reader/writer at the
bottom of this module — no codec library needed for BI_RGB 24-bit frames.

Pixel arrays are numpy ``uint8`` of shape (height, width, channels).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # optional dependency tier
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - absent in the build container
    _PILImage = None

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit gray/RGB/RGBA PNG to a
    (h, w, channels) uint8 array. Raises ``ValueError`` on malformed or
    unsupported input — a malformed payload must be a per-row error the
    pipeline can quarantine, never a silent wrong image."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        expect_crc = data[pos + 8 + length:pos + 12 + length]
        if struct.pack(">I", zlib.crc32(ctype + body)) != expect_crc:
            raise ValueError(f"bad CRC in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported depth/color ({depth}, {color})")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported compression/filter/interlace method")
    ch = _PNG_CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # per-row quarantineable error, per the documented ValueError
        # contract — zlib.error would otherwise leak through it
        raise ValueError(f"bad IDAT stream: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("decompressed size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average — left term is sequential per pixel
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype in (1, 4):  # Sub / Paeth — sequential per pixel
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                if ftype == 1:
                    cur[x] = (line[x] + left) & 0xFF
                else:
                    up = prev[x]
                    ul = prev[x - ch] if x >= ch else 0
                    cur[x] = (line[x] + _paeth(int(left), int(up), int(ul))) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a (h, w, channels∈{1,3,4}) uint8 array as a valid PNG
    (filter 0 scanlines, one zlib stream)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(
        b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image(data: bytes) -> np.ndarray:
    """PIL when importable (any Pillow format), else the stdlib PNG tier."""
    if _PILImage is not None:  # pragma: no cover - absent in container
        import io

        img = _PILImage.open(io.BytesIO(data))
        return np.asarray(img.convert("RGB") if img.mode == "P" else img)
    return decode_png(data)


def encode_image(arr: np.ndarray) -> bytes:
    """PNG bytes for a pixel array (PIL when importable, else stdlib)."""
    if _PILImage is not None:  # pragma: no cover - absent in container
        import io

        buf = io.BytesIO()
        _PILImage.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()
    return encode_png(arr)


def resize_nearest(arr: np.ndarray, target: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resample of a (h, w, ch) array to ``target``
    (w, h) — pure-numpy index mapping, the deterministic baseline
    resampler (PIL's box/bilinear kernels are a quality upgrade, not a
    semantics change)."""
    tw, th = target
    if tw < 1 or th < 1:
        raise ValueError("target must be positive")
    h, w = arr.shape[:2]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return arr[ys][:, xs]


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode PCM WAV bytes (stdlib ``wave``): returns
    (sample_rate, n_channels, samples) with samples int16/uint8 of shape
    (n_frames, n_channels)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as f:
            rate, ch = f.getframerate(), f.getnchannels()
            width = f.getsampwidth()
            frames = f.readframes(f.getnframes())
    except (wave.Error, struct.error, EOFError) as e:
        # same quarantineable-ValueError contract as decode_png
        raise ValueError(f"bad WAV payload: {e}") from e
    if width == 2:
        arr = np.frombuffer(frames, dtype="<i2")
    elif width == 1:
        arr = np.frombuffer(frames, dtype=np.uint8)
    else:
        raise ValueError(f"unsupported sample width {width}")
    return rate, ch, arr.reshape(-1, ch)


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """PCM16 WAV bytes for (n_frames, n_channels) int16 samples."""
    import io
    import wave

    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# --- uncompressed AVI (RIFF) video -----------------------------------------
#
# Spec-minimal reader/writer for the one video container the stdlib can
# handle without a codec library: RIFF 'AVI ' with a single 'vids' stream,
# BI_RGB 24-bit DIB frames ('00db'/'00dc' chunks in LIST 'movi', bottom-up
# BGR rows padded to 4 bytes — the classic uncompressed-AVI layout).
# Same quarantineable-ValueError contract as decode_png: malformed or
# unsupported input is a per-row error, never a silent wrong frame.


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) walking a RIFF chunk list;
    raises ValueError on truncation (chunks are word-aligned)."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if pos + 8 + length > end:
            raise ValueError(f"truncated RIFF chunk {fourcc!r}")
        yield fourcc, pos + 8, length
        pos += 8 + length + (length & 1)


def decode_avi(data: bytes) -> np.ndarray:
    """Decode an uncompressed (BI_RGB 24-bit) AVI to a
    (n_frames, height, width, 3) uint8 RGB array (top-down row order).
    Raises ``ValueError`` on malformed or unsupported input."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI signature")
    (riff_len,) = struct.unpack("<I", data[4:8])
    end = min(8 + riff_len, len(data))
    width = height = bitcount = compression = None
    vids_idx: int | None = None
    stream_idx = -1
    tagged: list[tuple[bytes, bytes]] = []  # (stream-id fourcc prefix, raw)

    def collect_movi(start: int, stop: int) -> None:
        # frames may be grouped inside 'LIST rec ' chunks (interleaved
        # muxers) — recurse, else rec-wrapped frames would silently drop
        for fcc2, b2, l2 in _riff_chunks(data, start, stop):
            if fcc2 == b"LIST" and data[b2:b2 + 4] == b"rec ":
                collect_movi(b2 + 4, b2 + l2)
            elif fcc2[2:4] in (b"db", b"dc"):
                tagged.append((fcc2[:2], data[b2:b2 + l2]))

    for fourcc, body, length in _riff_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = data[body:body + 4]
        if list_type == b"hdrl":
            for fcc2, b2, l2 in _riff_chunks(data, body + 4, body + length):
                if fcc2 != b"LIST" or data[b2:b2 + 4] != b"strl":
                    continue
                # streams are numbered by strl order within hdrl
                stream_idx += 1
                fcc_type = None
                for fcc3, b3, l3 in _riff_chunks(data, b2 + 4, b2 + l2):
                    if fcc3 == b"strh":
                        fcc_type = data[b3:b3 + 4]
                    elif (
                        fcc3 == b"strf"
                        and fcc_type == b"vids"
                        and vids_idx is None
                    ):
                        vids_idx = stream_idx
                        if l3 < 40:
                            raise ValueError("strf too short for BITMAPINFOHEADER")
                        (_sz, width, height, _planes, bitcount, compression) = (
                            struct.unpack("<IiiHHI", data[b3:b3 + 20])
                        )
        elif list_type == b"movi":
            collect_movi(body + 4, body + length)
    if width is None or vids_idx is None:
        raise ValueError("no video ('vids') stream header found")
    # only the vids stream's chunks: a second stream's '01db' frames would
    # otherwise be decoded with THIS stream's dimensions — a silent wrong
    # frame, which this codec's contract forbids
    sid = b"%02d" % vids_idx
    frames: list[bytes] = [raw for s, raw in tagged if s == sid]
    if compression != 0 or bitcount != 24:
        raise ValueError(
            f"unsupported AVI encoding (compression={compression}, "
            f"bits={bitcount}); only BI_RGB 24-bit is supported"
        )
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    out = np.empty((len(frames), h, width, 3), dtype=np.uint8)
    for i, raw in enumerate(frames):
        if len(raw) < stride * h:
            raise ValueError(f"frame {i}: {len(raw)} bytes < {stride * h}")
        rows = np.frombuffer(raw[: stride * h], dtype=np.uint8).reshape(
            h, stride
        )[:, : width * 3].reshape(h, width, 3)
        if height > 0:  # positive biHeight = bottom-up rows
            rows = rows[::-1]
        out[i] = rows[:, :, ::-1]  # BGR -> RGB
    return out


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as an uncompressed BI_RGB
    24-bit AVI (bottom-up BGR DIB rows, '00db' chunks)."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3)")
    n, h, w = frames.shape[:3]
    stride = (w * 3 + 3) & ~3

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    frame_bytes = []
    for f in frames:
        bgr = f[::-1, :, ::-1]  # top-down RGB -> bottom-up BGR
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        frame_bytes.append(rows.tobytes())
    avih = struct.pack(
        "<14I", 1_000_000 // fps, stride * h * fps, 0, 0x10, n, 0, 1,
        stride * h, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, n, stride * h, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                       0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)
