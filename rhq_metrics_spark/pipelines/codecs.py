"""Real media codecs with zero non-baked dependencies.

The container ships no Pillow/soundfile/PyAV, but PNG and WAV are
simple, fully-public formats (RFC 2083 / RIFF) decodable with stdlib
``zlib``/``wave`` + numpy — so the decode step of the multimodal
pipeline (pipelines/multimodal.py) is REAL for these two formats, not a
stub.  If Pillow is importable it is preferred for images (more
formats); otherwise the pure-Python PNG path runs.  Anything else
(JPEG without PIL, MP3, H.264, …) raises ``UnsupportedMediaError`` with
the dependency to install — decode honesty, no silent fakes.

Encoders exist so tests can synthesize REAL bytes in-process and assert
exact pixel/sample round-trips.

Scope: PNG bit depth 8, color types 0/2/3/4/6, non-interlaced (Adam7
raises); WAV integer PCM 8/16/32-bit.  CRCs are verified on decode.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class UnsupportedMediaError(ValueError):
    """Payload format this build cannot decode (and which library would)."""


# ---------------------------------------------------------------- PNG


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a uint8 array — (H, W) gray, (H, W, 3) RGB or (H, W, 4)
    RGBA — as a real, spec-valid PNG (filter 0, one IDAT)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type = 0
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type = 2
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    lines = a.reshape(h, -1)
    raw = b"".join(b"\x00" + lines[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, 9)

    def chunk(tag: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(tag + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG into a uint8 array (H, W) or (H, W, C).

    Full filter support (None/Sub/Up/Average/Paeth), palette expansion,
    CRC verification.  Raises :class:`UnsupportedMediaError` for
    interlaced or non-8-bit files (Pillow handles those)."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise UnsupportedMediaError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if interlace:
        raise UnsupportedMediaError("Adam7-interlaced PNG: install Pillow")
    if depth != 8:
        raise UnsupportedMediaError(f"PNG bit depth {depth}: install Pillow")
    if color_type not in _PNG_CHANNELS:
        raise UnsupportedMediaError(f"PNG color type {color_type}")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.intc)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.intc)
        if f == 0:  # None
            recon = line
        elif f == 2:  # Up
            recon = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            recon = np.zeros(stride, dtype=np.intc)
            for x in range(stride):
                a = recon[x - ch] if x >= ch else 0
                if f == 1:
                    recon[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    recon[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    recon[x] = (line[x] + _paeth(int(a), int(prev[x]), int(c))) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f}")
        out[y] = recon.astype(np.uint8)
        prev = recon

    if color_type == 3:
        if palette is None:
            raise ValueError("paletted PNG missing PLTE")
        return palette[out.reshape(h, w)]
    if ch == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, ch)


# ---------------------------------------------------------------- WAV

_WAV_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def encode_wav(samples: np.ndarray, sample_rate: int, sampwidth: int = 2) -> bytes:
    """Encode int PCM samples — (n,) mono or (n, ch) — as a real WAV."""
    a = np.asarray(samples)
    nch = 1 if a.ndim == 1 else a.shape[1]
    dtype = _WAV_DTYPES[sampwidth]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(sampwidth)
        wf.setframerate(sample_rate)
        wf.writeframes(np.ascontiguousarray(a, dtype=dtype).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode integer-PCM WAV → (float64 samples in [-1, 1] shaped
    (n,) mono / (n, ch) multi, sample_rate)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            nch, sw, rate, nframes = wf.getparams()[:4]
            raw = wf.readframes(nframes)
    except wave.Error as e:
        raise UnsupportedMediaError(f"not a PCM WAV: {e}") from e
    if sw not in _WAV_DTYPES:
        raise UnsupportedMediaError(f"WAV sample width {sw}: install soundfile")
    x = np.frombuffer(raw, dtype=_WAV_DTYPES[sw]).astype(np.float64)
    if sw == 1:  # unsigned 8-bit centers at 128
        x = (x - 128.0) / 128.0
    else:
        x = x / float(2 ** (8 * sw - 1))
    if nch > 1:
        x = x.reshape(-1, nch)
    return x, rate


# ---------------------------------------------------------- dispatch


def sniff_kind(payload: bytes) -> str | None:
    """'png' | 'wav' | None by magic bytes."""
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


def _try_pillow(payload: bytes) -> np.ndarray | None:
    try:
        from PIL import Image  # optional, not baked into this container
    except ImportError:
        return None
    try:
        return np.asarray(Image.open(io.BytesIO(payload)))
    except Exception:  # noqa: BLE001 — unidentifiable/corrupt payload:
        # fall through so the caller raises ITS contract error (the
        # pure decoder's named failure, or UnsupportedMediaError) rather
        # than a Pillow internal
        return None


def decode_image(payload: bytes) -> np.ndarray:
    """uint8 (H, W[, C]) pixels: Pillow if importable, else the
    pure-Python PNG path."""
    via_pil = _try_pillow(payload)
    if via_pil is not None:
        return via_pil
    return decode_png(payload)


def real_decode(payload: bytes) -> np.ndarray:
    """Drop-in for :func:`multimodal.fake_decode` over REAL media bytes:
    flat float64 — pixels scaled to [0, 1] for images, samples in
    [-1, 1] for audio.  Unknown formats raise, naming the library that
    would handle them."""
    kind = sniff_kind(payload)
    if kind == "png":
        return decode_image(payload).astype(np.float64).ravel() / 255.0
    if kind == "wav":
        return decode_wav(payload)[0].ravel()
    via_pil = _try_pillow(payload)
    if via_pil is not None:
        return via_pil.astype(np.float64).ravel() / 255.0
    raise UnsupportedMediaError(
        "payload is neither PNG nor PCM WAV; install Pillow (images) or "
        "soundfile/PyAV (audio/video) and pass a custom decoder"
    )


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample of (H, W[, C]) pixels —
    the same index arithmetic everywhere, so checksums are portable."""
    h, w = img.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return img[ys][:, xs]
