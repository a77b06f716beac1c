"""Real-codec tests: the multimodal decode step on REAL synthesized
PNG/WAV bytes (VERDICT r3 item 1) — exact pixel/sample assertions, all
PNG filter types, and the Spark ``media_features``/``resize_plan``
paths under the real decoder.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest

from rhq_metrics_spark.pipelines.codecs import (
    UnsupportedMediaError,
    decode_image,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    real_decode,
    resize_nearest,
    sniff_kind,
)


def _rng_img(shape, seed=7):
    return np.random.RandomState(seed).randint(0, 256, size=shape, dtype=np.uint8)


# ------------------------------------------------------------- PNG


@pytest.mark.parametrize("shape", [(5, 4), (6, 3, 3), (4, 7, 4)])
def test_png_roundtrip_exact(shape):
    img = _rng_img(shape)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.array_equal(out, img)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-encode a grayscale/RGB image using a CHOSEN filter per line
    (forward-filtering per the spec) so decode exercises Sub/Up/Avg/Paeth."""
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    lines = img.reshape(h, w * ch).astype(np.intc)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.intc)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    for y in range(h):
        f = filters[y % len(filters)]
        cur = lines[y]
        filt = np.zeros(w * ch, dtype=np.intc)
        for x in range(w * ch):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            v = int(cur[x])
            if f == 0:
                filt[x] = v
            elif f == 1:
                filt[x] = (v - a) & 0xFF
            elif f == 2:
                filt[x] = (v - b) & 0xFF
            elif f == 3:
                filt[x] = (v - ((a + b) >> 1)) & 0xFF
            else:
                filt[x] = (v - paeth(a, b, c)) & 0xFF
        raw.append(f)
        raw += filt.astype(np.uint8).tobytes()
        prev = cur

    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(bytes(raw))

    def chunk(tag, data):
        crc = zlib.crc32(tag + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_filter_types(filters):
    img = _rng_img((8, 5, 3), seed=11)
    assert np.array_equal(decode_png(_png_with_filters(img, filters)), img)


def test_png_palette():
    pal = _rng_img((4, 3), seed=3)  # 4 palette entries, RGB
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(tag, data):
        crc = zlib.crc32(tag + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out, pal[idx])


def test_png_crc_and_unsupported():
    img = _rng_img((3, 3))
    good = encode_png(img)
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # 16-bit depth raises UnsupportedMediaError, not garbage
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)

    def chunk(tag, data):
        crc = zlib.crc32(tag + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)

    png16 = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16) + chunk(b"IEND", b"")
    with pytest.raises(UnsupportedMediaError):
        decode_png(png16)
    with pytest.raises(UnsupportedMediaError):
        decode_png(b"not a png at all")


# ------------------------------------------------------------- WAV


def test_wav_roundtrip_mono16():
    x = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    samples, rate = decode_wav(encode_wav(x, 16_000))
    assert rate == 16_000 and samples.shape == (5,)
    assert np.allclose(samples, x / 32768.0)


def test_wav_roundtrip_stereo_and_8bit():
    st = np.array([[0, 100], [-200, 300]], dtype=np.int16)
    samples, rate = decode_wav(encode_wav(st, 44_100))
    assert rate == 44_100 and samples.shape == (2, 2)
    assert np.allclose(samples, st / 32768.0)
    u8 = np.array([0, 128, 255], dtype=np.uint8)
    s8, _ = decode_wav(encode_wav(u8, 8_000, sampwidth=1))
    assert np.allclose(s8, (u8.astype(float) - 128) / 128.0)
    with pytest.raises(UnsupportedMediaError):
        decode_wav(b"RIFFxxxxWAVEjunk")


# -------------------------------------------------------- dispatch


def test_sniff_and_real_decode():
    img = _rng_img((4, 4))
    png = encode_png(img)
    wav = encode_wav(np.array([0, 16384], dtype=np.int16), 8_000)
    assert sniff_kind(png) == "png" and sniff_kind(wav) == "wav"
    assert sniff_kind(b"\x00\x01") is None
    pix = real_decode(png)
    assert pix.shape == (16,)
    assert np.array_equal(pix, img.astype(np.float64).ravel() / 255.0)
    au = real_decode(wav)
    assert np.allclose(au, [0.0, 0.5])
    with pytest.raises(UnsupportedMediaError):
        real_decode(b"\xff\xd8\xff junk that is not decodable here")


def test_resize_nearest_semantics():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8)
    # each source pixel becomes a 2x2 block
    assert np.array_equal(up[:2, :2], np.full((2, 2), img[0, 0]))
    down = resize_nearest(img, 2, 2)
    assert np.array_equal(down, img[::2, ::2])


# ------------------------------------------------- Spark integration


def test_media_features_real_decoder(spark):
    from rhq_metrics_spark.pipelines.multimodal import media_features

    img = _rng_img((6, 5, 3), seed=21)
    png = encode_png(img)
    pcm = np.array([0, 8192, -8192, 16384], dtype=np.int16)
    wav = encode_wav(pcm, 16_000)
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(png), 5, 6, None, None, "png"),
            (2, "audio", bytearray(wav), None, None, 16_000, None, "wav"),
            (3, "image", None, None, None, None, None, None),
        ],
        "media_id long, kind string, payload binary, width int, height int,"
        " sample_rate int, duration_ms long, codec string",
    )
    rows = {r["media_id"]: r for r in media_features(df, decoder=real_decode).collect()}
    assert rows[1]["feat_dim"] == 6 * 5 * 3
    assert rows[1]["feat_mean"] == f"{img.astype(np.float64).ravel().mean() / 255.0:.10f}"
    assert rows[1]["sha256"] == hashlib.sha256(png.hex().encode()).hexdigest()
    assert rows[2]["feat_dim"] == 4
    assert rows[2]["feat_mean"] == f"{(pcm / 32768.0).mean():.10f}"
    assert rows[3]["feat_dim"] is None  # null payload stays null


def test_resize_plan_real(spark):
    from rhq_metrics_spark.pipelines.multimodal import resize_plan

    img = _rng_img((10, 8, 3), seed=5)
    png = encode_png(img)
    df = spark.createDataFrame(
        [(1, "image", bytearray(png), 8, 10, None, None, "png")],
        "media_id long, kind string, payload binary, width int, height int,"
        " sample_rate int, duration_ms long, codec string",
    )
    row = resize_plan(df, 4, 4, real=True).collect()[0]
    expected = np.ascontiguousarray(resize_nearest(img, 4, 4))
    assert row["resized_sha"] == hashlib.sha256(expected.tobytes()).hexdigest()
    assert (row["width"], row["height"]) == (4, 4)


# -- Pillow integration (VERDICT r4 item 5) ---------------------------------
# The container ships without Pillow; these split into (a) glue tests
# that fake the PIL module so the preference/fallback wiring always
# runs, and (b) real-Pillow tests that skip-without / run-with.


def _fake_pil(monkeypatch, array):
    import sys
    import types

    image_mod = types.SimpleNamespace(open=lambda fh: array)
    pil = types.ModuleType("PIL")
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


def test_pillow_preferred_when_importable(monkeypatch):
    from rhq_metrics_spark.pipelines import codecs

    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    _fake_pil(monkeypatch, img)
    # decode_image returns the Pillow result even for non-PNG payloads
    assert np.array_equal(codecs.decode_image(b"\xff\xd8not-a-png"), img)
    # real_decode scales the Pillow pixels to [0, 1]
    flat = codecs.real_decode(b"\xff\xd8not-a-png")
    assert np.allclose(flat, img.astype(np.float64).ravel() / 255.0)


def test_pillow_failure_falls_back_to_contract_error(monkeypatch):
    import sys
    import types

    from rhq_metrics_spark.pipelines import codecs
    from rhq_metrics_spark.pipelines.codecs import UnsupportedMediaError

    def boom(fh):
        raise OSError("cannot identify image file")

    image_mod = types.SimpleNamespace(open=boom)
    pil = types.ModuleType("PIL")
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    # a Pillow that can't identify the payload must surface OUR error,
    # not a PIL internal
    with pytest.raises(UnsupportedMediaError, match="install Pillow"):
        codecs.real_decode(b"garbage-payload-no-magic")


def test_real_pillow_png_matches_pure_decoder():
    PIL = pytest.importorskip("PIL")  # noqa: F841 — runs where installed
    from rhq_metrics_spark.pipelines import codecs

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    payload = codecs.encode_png(img)
    via_pillow = codecs._try_pillow(payload)
    assert via_pillow is not None
    assert np.array_equal(via_pillow, codecs.decode_png(payload))


def test_real_pillow_jpeg_decodes():
    PIL = pytest.importorskip("PIL")
    import io as _io

    from PIL import Image

    from rhq_metrics_spark.pipelines import codecs

    img = Image.new("RGB", (8, 8), (200, 30, 90))
    buf = _io.BytesIO()
    img.save(buf, format="JPEG")
    flat = codecs.real_decode(buf.getvalue())
    assert flat.shape == (8 * 8 * 3,) and 0.0 <= flat.min() <= flat.max() <= 1.0
