"""The stdlib PNG codec (operators.multimodal.png_encode/png_decode):
round trips for every supported channel count, and a hand-built encoder
that uses ALL five scanline filters so the decoder's Sub/Up/Average/
Paeth paths are exercised (png_encode itself emits only filter 0)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from wikipedia_data_pipeline_spark.operators.multimodal import (
    _PNG_SIG,
    png_decode,
    png_encode,
)


def _rand_img(h, w, c, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return a if c > 1 else a[:, :, 0]


@pytest.mark.parametrize("c", [1, 3, 4])
def test_roundtrip(c):
    img = _rand_img(13, 17, c, seed=c)
    out = png_decode(png_encode(img))
    ref = img if img.ndim == 3 else img[:, :, None]
    assert out.shape == ref.shape
    assert (out == ref).all()


def _encode_with_filters(a: np.ndarray, filters: list[int]) -> bytes:
    """Filtered PNG writer (test-only): applies the given per-scanline
    filter types, cycling, per the spec's difference formulas."""
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 6: 6}.get(c, 2)
    stride = w * c
    prev = np.zeros(stride, dtype=np.int64)
    raw = b""
    for y in range(h):
        line = a[y].reshape(stride).astype(np.int64)
        f = filters[y % len(filters)]
        enc = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            left = line[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                )
            enc[x] = (line[x] - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decoder_handles_all_five_filters():
    img = _rand_img(10, 9, 3, seed=42)
    data = _encode_with_filters(img, [0, 1, 2, 3, 4])
    assert (png_decode(data) == img).all()


def test_decoder_multi_idat_and_rejections():
    img = _rand_img(4, 4, 3, seed=1)
    data = png_encode(img)
    # split the IDAT into two chunks — decoders must concatenate
    sig_ihdr = data[: 8 + 12 + 13]
    idat_body = zlib.compress(
        b"".join(b"\x00" + img[y].tobytes() for y in range(4))
    )
    half = len(idat_body) // 2

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    split = (
        sig_ihdr
        + chunk(b"IDAT", idat_body[:half])
        + chunk(b"IDAT", idat_body[half:])
        + chunk(b"IEND", b"")
    )
    assert (png_decode(split) == img).all()
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    # 16-bit depth must be rejected, not mis-decoded
    bad_ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad = _PNG_SIG + chunk(b"IHDR", bad_ihdr) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        png_decode(bad)


def test_wav_roundtrip_and_rejections():
    from wikipedia_data_pipeline_spark.operators.multimodal import (
        wav_decode,
        wav_encode,
    )

    samples = (np.arange(777, dtype=np.int64) * 131 % 65536 - 32768).astype(
        "<i2"
    )
    rate, out = wav_decode(wav_encode(samples, 16000))
    assert rate == 16000
    assert (out == samples).all()
    with pytest.raises(ValueError):
        wav_decode(b"RIFFxxxxNOPE")
    # 8-bit PCM must be rejected, not mis-read
    bad = bytearray(wav_encode(samples[:4], 8000))
    bad[34] = 8  # bits-per-sample field inside fmt chunk
    with pytest.raises(ValueError):
        wav_decode(bytes(bad))


def test_video_container_selective_decode():
    from wikipedia_data_pipeline_spark.operators.multimodal import (
        png_decode,
        video_encode,
        video_iter_frames,
    )

    frames = [_rand_img(5, 7, 1, seed=s) for s in range(5)]
    data = video_encode(frames)
    got = {idx: png_decode(png)[:, :, 0] for idx, png in video_iter_frames(data)}
    assert set(got) == {0, 1, 2, 3, 4}
    for i, f in enumerate(frames):
        assert (got[i] == f).all()
    with pytest.raises(ValueError):
        list(video_iter_frames(b"XXXX...."))
