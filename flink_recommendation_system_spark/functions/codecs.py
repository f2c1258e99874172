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

Video has no stdlib codec; it stays stubbed in ``operators.multimodal``.

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
