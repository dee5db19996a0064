"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature-extraction as Arrow-batched pandas functions over
``mapInPandas``.

Decode depth, by format:

* **REAL, dependency-free**: PNG (``png_encode``/``png_decode`` —
  zlib + all five scanline filters), WAV PCM (``wav_encode``/
  ``wav_decode`` — RIFF chunk walk), and a length-prefixed PNG video
  container with selective frame decode. Each is proven end-to-end by
  a driver-checked query whose oracle recomputes every pixel/sample
  arithmetically.
* **Header-level**: PNG/GIF/JPEG container headers
  (``parse_image_header``).
* **Stub / gated**: ``decode_image_meta`` (deterministic fake dims —
  kept as the plumbing-shape demo) and ``decode_image_real``
  (Pillow-gated breadth path: JPEG pixels, interlacing, 16-bit). The
  container ships no codec libs, so compressed image/audio codecs stay
  declared out; swapping in PIL/libvips changes only inner function
  bodies — the binary schema, Arrow batch shape, and mapInPandas
  iterator contract are identical.

Scale notes: binary payloads ride in the same parquet row groups;
mapInPandas streams Arrow batches so peak memory is one batch per task,
not one partition. Batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, n_pixels bigint"
)


def attach_binary_payload(documents: DataFrame) -> DataFrame:
    """Treat each document's UTF-8 bytes as an opaque media payload with
    typed metadata — the schema pattern for image/audio/video columns:
    (id, payload BINARY, media_type STRING, n_bytes BIGINT)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def _fake_dims(n_bytes: pd.Series) -> tuple[pd.Series, pd.Series]:
    # deterministic stand-in for a real decoder: dimensions derived from
    # payload length only
    width = 1 + (n_bytes % 640)
    height = 1 + (n_bytes % 480)
    return width, height


def decode_image_meta(media: DataFrame) -> DataFrame:
    """mapInPandas 'decode': emits per-image metadata rows. The iterator
    contract (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]) is the
    real production shape for batched decoders."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).astype("int64")
            width, height = _fake_dims(n_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "width": width,
                    "height": height,
                    "n_pixels": width * height,
                }
            )

    return media.mapInPandas(decode, schema=IMAGE_META_SCHEMA)


AUDIO_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sample_rate bigint, n_samples bigint, "
    "duration_us bigint"
)

VIDEO_FRAMES_SCHEMA = (
    "doc_id bigint, n_bytes bigint, n_frames bigint, frame_idx bigint, "
    "frame_offset bigint"
)

FRAME_SAMPLE_STRIDE = 4


def decode_audio_meta(media: DataFrame) -> DataFrame:
    """mapInPandas audio 'decode' stub: deterministic sample-rate /
    sample-count / duration metadata derived from payload length only
    (integer arithmetic → exactly oracle-checkable). Swapping in a real
    codec (soundfile/ffmpeg) changes only the inner function body."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).astype("int64")
            sample_rate = 8000 * (1 + (n_bytes % 3))
            n_samples = n_bytes * 4
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "sample_rate": sample_rate,
                    "n_samples": n_samples,
                    "duration_us": n_samples * 1_000_000 // sample_rate,
                }
            )

    return media.mapInPandas(decode, schema=AUDIO_META_SCHEMA)


def sample_video_frames(media: DataFrame) -> DataFrame:
    """Frame sampling: one output row per sampled frame (every
    ``FRAME_SAMPLE_STRIDE``-th of a stubbed ``n_frames`` count) — the
    1→N row-expansion shape a real keyframe extractor has. mapInPandas
    so the expansion happens inside the Arrow batch, never on the
    driver; output partitioning inherits the input split layout."""

    stride = FRAME_SAMPLE_STRIDE

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).astype("int64")
            n_frames = 1 + (n_bytes % 24)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "n_frames": n_frames,
                }
            )
            out = out.loc[out.index.repeat((n_frames + stride - 1) // stride)]
            out["frame_idx"] = out.groupby(level=0).cumcount() * stride
            out["frame_offset"] = out["frame_idx"] * (
                out["n_bytes"] // out["n_frames"]
            )
            yield out.reset_index(drop=True)

    return media.mapInPandas(sample, schema=VIDEO_FRAMES_SCHEMA)


IMAGE_HEADER_SCHEMA = (
    "doc_id bigint, n_bytes bigint, format string, width bigint, height bigint"
)


def parse_image_header(b: bytes | None) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from real image container headers —
    PNG (IHDR), GIF87a/89a (logical screen), JPEG (first SOF0/1/2
    frame) — pure Python, no codec dependency. Unknown/truncated
    payloads → (None, None, None)."""
    if not b:
        return (None, None, None)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                return (
                    "jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            i += 2 + seg_len
        return ("jpeg", None, None)
    return (None, None, None)


def decode_image_headers(media: DataFrame) -> DataFrame:
    """REAL image metadata decode over the standard mapInPandas shape:
    container-header parsing (PNG/GIF/JPEG) inside the Arrow batch.
    Payloads that are not images yield null format/dims rather than
    failing the task — at 100 TB a poison payload must never kill the
    job."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf["payload"].map(parse_image_header)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ).astype("int64"),
                    "format": parsed.map(lambda t: t[0]),
                    "width": parsed.map(lambda t: t[1]).astype("Int64"),
                    "height": parsed.map(lambda t: t[2]).astype("Int64"),
                }
            )

    return media.mapInPandas(decode, schema=IMAGE_HEADER_SCHEMA)


PIL_IMAGE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, format string, mode string, "
    "width bigint, height bigint"
)


def decode_image_real(media: DataFrame) -> DataFrame:
    """Full pixel-capable decoder via Pillow when present (optional
    dependency — VERDICT.md round-1 item 9). Raises NotImplementedError
    if no codec is installed; ``decode_image_headers`` is the
    dependency-free metadata path and ``decode_image_meta`` the
    deterministic plumbing stub."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires an image codec (e.g. Pillow); "
            "not available in this environment — use decode_image_headers "
            "(header-level, dependency-free) or decode_image_meta (stub)"
        ) from exc

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    with Image.open(io.BytesIO(payload)) as img:
                        rows.append(
                            (doc_id, len(payload), (img.format or "").lower(),
                             img.mode, img.width, img.height)
                        )
                except Exception:
                    rows.append((doc_id, len(payload or b""), None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "format", "mode", "width", "height"],
            )

    return media.mapInPandas(decode, schema=PIL_IMAGE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL dependency-free PNG codec (stdlib zlib + numpy defilter)
# ---------------------------------------------------------------------------
#
# Closes the "decode is stubbed" gap for PNG without Pillow: a complete
# encoder (filter-0 scanlines, one zlib stream) and decoder (all five
# PNG filter types, 8-bit gray/RGB/RGBA, non-interlaced) in ~100 lines
# of stdlib+numpy. Production swaps in libvips/Pillow for breadth
# (JPEG, interlacing, 16-bit); the ENGINE-side contract — Arrow-batched
# mapInPandas over binary columns, one batch in memory per task — is
# identical, which is the part that matters at 100 TB.

_PNG_SIG = b"\x89PNG\r\n\x1a\x0a"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # grayscale, RGB, RGBA


def png_encode(pixels) -> bytes:
    """Minimal PNG writer: ``pixels`` is a (h, w) or (h, w, c) uint8
    numpy array (c in {1, 3, 4}); emits filter-0 scanlines in one IDAT."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # one (h, stride+1) array — filter byte column + payload — beats a
    # per-row bytes join by ~h small allocations per image
    rows = np.zeros((h, w * c + 1), dtype=np.uint8)
    rows[:, 1:] = a.reshape(h, w * c)
    raw = rows.tobytes()
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_decode(data: bytes):
    """Minimal PNG reader: returns an (h, w, c) uint8 numpy array.
    Handles 8-bit depth, color types 0/2/6, all five scanline filters,
    non-interlaced, multi-IDAT. Raises ValueError on anything else.

    Decode cost discipline (r11): the whole scanline payload parses as
    ONE (h, stride+1) reshape; when every row is filter 0 — the common
    case for tool-generated thumbnails and this engine's encoder — the
    unfilter is a single slice copy with no per-row Python at all
    (the prior per-row loop paid ~10 small-numpy calls per scanline,
    which dominated aHash at the 100x replica's 1M tiny images).
    Mixed-filter images dispatch per row: None/Sub/Up are vectorized
    numpy (slice copy / modular-lane cumsum / +=); Average and Paeth
    carry a true left-neighbor recurrence that has no exact numpy scan
    (the half-sum and min-of-three predictors don't compose under
    mod-256), so they run the sequential loop over Python ints on
    bytearrays — several times faster than numpy scalar indexing, and
    the first thing a libvips/Pillow swap-in would replace."""
    import struct
    import zlib

    import numpy as np

    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, idat, meta = len(_PNG_SIG), [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype not in _CHANNELS or inter != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} type={ctype} "
                    f"interlace={inter})"
                )
            meta = (w, h, _CHANNELS[ctype])
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("truncated PNG")
    w, h, c = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("bad scanline payload size")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    if ftypes.max(initial=0) == 0:
        # all-None fast path: the payload IS the image
        return rows[:, 1:].reshape(h, w, c).copy()
    if ftypes.max() > 4:
        raise ValueError(f"bad filter {int(ftypes.max())}")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(ftypes[y])
        if ftype == 0:
            out[y] = rows[y, 1:]
        elif ftype == 1:  # Sub: recurrence a[x] = enc[x] + a[x-c] is a
            # per-channel-lane modular prefix sum — vectorized cumsum
            out[y] = (
                rows[y, 1:]
                .reshape(-1, c)
                .astype(np.uint64)
                .cumsum(axis=0)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ftype == 2:  # Up
            np.add(rows[y, 1:], prev, out=out[y])
        elif ftype == 3:  # Average
            line = bytearray(rows[y, 1:].tobytes())
            pv = prev.tobytes()
            for x in range(stride):
                left = line[x - c] if x >= c else 0
                line[x] = (line[x] + ((left + pv[x]) >> 1)) & 0xFF
            out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        else:  # Paeth
            line = bytearray(rows[y, 1:].tobytes())
            pv = prev.tobytes()
            for x in range(stride):
                a_ = line[x - c] if x >= c else 0
                b_ = pv[x]
                cc = pv[x - c] if x >= c else 0
                p = a_ + b_ - cc
                pa, pb, pc = abs(p - a_), abs(p - b_), abs(p - cc)
                pred = a_ if (pa <= pb and pa <= pc) else (b_ if pb <= pc else cc)
                line[x] = (line[x] + pred) & 0xFF
            out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = out[y]
    return out.reshape(h, w, c)


PNG_STATS_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, channels bigint, "
    "sum_r bigint, sum_g bigint, sum_b bigint"
)


def synth_png_corpus(documents: DataFrame) -> DataFrame:
    """Deterministic synthetic image corpus: per document, a REAL PNG
    (this module's encoder) whose RGB pixels are closed-form functions
    of (doc_id, x, y) — so an oracle can recompute every pixel
    arithmetically and any encoder/decoder bug breaks the value hash.

    Formulas (w = 1 + d%16, h = 1 + d%12): r = (x+y+d) % 256,
    g = (2x+d) % 256, b = (3y+d) % 256."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # the pixel formula is (base(x, y) + d) % 256 per channel, so
        # the per-shape base plane is doc-independent — cache the ≤192
        # (w, h) templates and synthesize each image with one add+mod
        # instead of ~8 small-numpy ops (the per-tiny-image overhead
        # dominated this corpus at the 100x replica)
        base_cache: dict = {}

        def base_of(w: int, h: int):
            key = (w, h)
            b = base_cache.get(key)
            if b is None:
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                b = np.stack(
                    [
                        x + y,
                        2 * x + np.zeros_like(y),
                        3 * y + np.zeros_like(x),
                    ],
                    axis=-1,
                )
                base_cache[key] = b
            return b

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 1 + d % 16, 1 + d % 12
                img = (base_of(w, h) + d) % 256
                img = img.astype(np.uint8)
                payloads.append(png_encode(img))
            out = pdf[["doc_id"]].copy()
            out["payload"] = payloads
            yield out

    return documents.select("doc_id").mapInPandas(
        encode, schema="doc_id bigint, payload binary"
    )


def decode_png_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL pixel decode + per-channel stats: inflate, defilter, sum.
    Arrow-batched mapInPandas — one batch of payloads in memory per
    task, the production decoder shape."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = png_decode(bytes(payload))
                h, w, c = px.shape
                sums = px.reshape(-1, c).sum(axis=0, dtype="int64")
                r = int(sums[0])
                g = int(sums[1]) if c > 1 else r
                b = int(sums[2]) if c > 2 else r
                rows.append((int(doc_id), w, h, c, r, g, b))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    return media.mapInPandas(decode, schema=PNG_STATS_SCHEMA)


LUMA_HIST_SCHEMA = "bin bigint, n_pixels bigint"


def decode_png_luma_histogram(media: DataFrame) -> DataFrame:
    """REAL pixel decode + integer-luma histogram partials: inflate,
    defilter, luma = (r + g + b) // 3 (exact integer — no Rec.601
    float weights, so the SQL twin replays it bit-for-bit), 16 bins of
    width 16. Each Arrow batch emits its PARTIAL per-bin counts
    (np.bincount), so the caller's groupBy(bin).sum is a 16-row
    map-side-combined aggregate — the decode never shuffles pixels."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            counts = np.zeros(16, dtype="int64")
            for payload in pdf["payload"]:
                px = png_decode(bytes(payload)).astype("int64")
                if px.shape[2] >= 3:
                    luma = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
                else:
                    luma = px[:, :, 0]
                counts += np.bincount(
                    (luma >> 4).ravel(), minlength=16
                )[:16]
            yield pd.DataFrame(
                {"bin": np.arange(16, dtype="int64"), "n_pixels": counts}
            )

    return media.mapInPandas(decode, schema=LUMA_HIST_SCHEMA)


# ---------------------------------------------------------------------------
# REAL dependency-free WAV (RIFF/PCM) codec
# ---------------------------------------------------------------------------

def wav_encode(samples, sample_rate: int) -> bytes:
    """Minimal WAV writer: mono 16-bit little-endian PCM."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVEfmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes):
    """Minimal WAV reader: returns (sample_rate, int16 numpy array).
    Mono/stereo 16-bit PCM, chunk-walking (skips LIST/fact/etc.);
    ValueError on anything else."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, channels, bits, pcm = 12, None, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt} bits={bits})")
        elif tag == b"data":
            pcm = body
    if rate is None or pcm is None:
        raise ValueError("truncated WAV")
    a = np.frombuffer(pcm, dtype="<i2")
    if channels and channels > 1:
        a = a.reshape(-1, channels)
    return rate, a


WAV_STATS_SCHEMA = (
    "doc_id bigint, sample_rate bigint, n_samples bigint, duration_us bigint, "
    "sum_samples bigint, peak bigint"
)


def synth_wav_corpus(documents: DataFrame) -> DataFrame:
    """Deterministic synthetic audio corpus: per document a REAL mono
    16-bit PCM WAV whose samples are closed-form in (doc_id, i), so an
    oracle recomputes them arithmetically."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rate = 8000 * (1 + d % 3)
                n = 64 + d % 128
                i = np.arange(n, dtype=np.int64)
                samples = ((i * (d + 3)) % 65536) - 32768
                payloads.append(wav_encode(samples, rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return documents.select("doc_id").mapInPandas(
        encode, schema="doc_id bigint, payload binary"
    )


def decode_wav_stats(media: DataFrame) -> DataFrame:
    """REAL PCM decode + waveform stats (duration, integer sum, peak)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, a = wav_decode(bytes(payload))
                n = int(a.shape[0])
                rows.append(
                    (
                        int(doc_id),
                        rate,
                        n,
                        n * 1_000_000 // rate,
                        int(a.sum(dtype="int64")),
                        int(np.abs(a.astype("int64")).max()) if n else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "duration_us",
                    "sum_samples", "peak",
                ],
            )

    return media.mapInPandas(decode, schema=WAV_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# REAL frame-sampled video decode over a length-prefixed PNG container
# ---------------------------------------------------------------------------

_WDPV_MAGIC = b"WDPV"


def video_encode(frames: list) -> bytes:
    """Minimal video container: magic + u32 frame count + per frame a
    u32 length-prefixed PNG (this module's real encoder). The stand-in
    for an MJPEG/fragmented-MP4 payload — parse/seek semantics are the
    same; only the codec differs."""
    import struct

    body = b"".join(
        struct.pack("<I", len(p)) + p
        for p in (png_encode(f) for f in frames)
    )
    return _WDPV_MAGIC + struct.pack("<I", len(frames)) + body


def video_iter_frames(data: bytes):
    """Yield (frame_idx, png_bytes) WITHOUT decoding — the container
    walk is cheap; decode cost is paid only for sampled frames."""
    import struct

    if data[:4] != _WDPV_MAGIC:
        raise ValueError("not a WDPV container")
    (n,) = struct.unpack("<I", data[4:8])
    pos = 8
    for idx in range(n):
        (length,) = struct.unpack("<I", data[pos : pos + 4])
        yield idx, data[pos + 4 : pos + 4 + length]
        pos += 4 + length


VIDEO_STATS_SCHEMA = (
    "doc_id bigint, n_frames bigint, frame_idx bigint, width bigint, "
    "height bigint, sum_gray bigint"
)


def synth_video_corpus(documents: DataFrame) -> DataFrame:
    """Per document a REAL container of grayscale PNG frames whose
    pixels are closed-form in (doc_id, frame, x, y)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf, w, h = 1 + d % 9, 1 + d % 8, 1 + d % 6
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                frames = [
                    ((x + 2 * y + d + 5 * f) % 256).astype(np.uint8)
                    for f in range(nf)
                ]
                payloads.append(video_encode(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return documents.select("doc_id").mapInPandas(
        encode, schema="doc_id bigint, payload binary"
    )


def decode_video_frame_stats(media: DataFrame, stride: int = 2) -> DataFrame:
    """REAL keyframe extraction: walk the container, png_decode every
    ``stride``-th frame only, emit per-frame pixel stats — the 1→N
    expansion happens inside the Arrow batch, and undecoded frames cost
    one length-prefix read each."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                import struct

                (nf,) = struct.unpack("<I", data[4:8])
                for idx, png in video_iter_frames(data):
                    if idx % stride:
                        continue
                    px = png_decode(png)
                    h, w, _c = px.shape
                    rows.append(
                        (
                            int(doc_id), nf, idx, w, h,
                            int(px.sum(dtype="int64")),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "frame_idx", "width", "height",
                    "sum_gray",
                ],
            )

    return media.mapInPandas(decode, schema=VIDEO_STATS_SCHEMA)


WAV_FRAME_ENERGY_SCHEMA = (
    "doc_id bigint, frame_idx bigint, energy bigint"
)
VAD_FRAME_LEN = 32  # samples per analysis frame


def decode_wav_frame_energies(media: DataFrame) -> DataFrame:
    """REAL PCM decode → per-frame energies: the WAV payload is chunk-
    walked (wav_decode), samples framed into VAD_FRAME_LEN-sample
    windows (partial tail dropped), and each frame reduced to its
    integer energy Σx² — the front half of every voice-activity /
    silence-trim pipeline. Arrow-batch mapInPandas like the other
    decoders; the relational back half (thresholding, run-length
    segmentation) stays in Spark SQL where it belongs."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, a = wav_decode(bytes(payload))
                nf = int(a.shape[0]) // VAD_FRAME_LEN
                if nf:
                    fr = (
                        a[: nf * VAD_FRAME_LEN]
                        .astype("int64")
                        .reshape(nf, VAD_FRAME_LEN)
                    )
                    en = (fr * fr).sum(axis=1)
                    rows.extend(
                        (int(doc_id), j, int(en[j])) for j in range(nf)
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "energy"]
            )

    return media.mapInPandas(decode, schema=WAV_FRAME_ENERGY_SCHEMA)


PNG_AHASH_SCHEMA = "doc_id bigint, ahash_lo bigint, ahash_hi bigint"


def decode_png_ahash(media: DataFrame) -> DataFrame:
    """REAL pixel decode → 64-bit average hash (aHash): nearest-
    neighbor 8×8 downsample of the integer gray image
    ((r+g+b) // 3), bit j set iff cell gray > floor(mean) — the
    classic perceptual fingerprint behind first-stage image
    near-duplicate detection, packed into two BIGINT halves so the
    relational side can group/Hamming-join it (the
    embedding_hamming_topk signature convention). Every step is
    integer arithmetic, so an oracle replays the hash exactly from
    the closed-form pixels."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # shape-keyed cache of the flat 8×8 downsample indices — the
        # per-image np.ix_/arange rebuild was ~3x the decode cost on
        # thumbnail-sized images (r11 profile); bit packing runs on
        # Python ints (64 bools) instead of three tiny-array numpy ops
        grid_cache: dict = {}

        def grid_idx(h: int, w: int):
            key = (h, w)
            idx = grid_cache.get(key)
            if idx is None:
                gx = np.arange(8) * w // 8
                gy = np.arange(8) * h // 8
                # (gy, gx): row-major j = gy*8+gx
                idx = (gy[:, None] * w + gx[None, :]).ravel()
                grid_cache[key] = idx
            return idx

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = png_decode(bytes(payload))
                h, w, c = px.shape
                gray = px.reshape(h * w, c).sum(axis=1, dtype=np.int64) // c
                cells = gray[grid_idx(h, w)]
                mean = int(cells.sum()) // 64
                bits = (cells > mean).tolist()
                lo = 0
                hi = 0
                for j in range(32):
                    if bits[j]:
                        lo |= 1 << j
                    if bits[32 + j]:
                        hi |= 1 << j
                rows.append((int(doc_id), lo, hi))
            yield pd.DataFrame(
                rows, columns=["doc_id", "ahash_lo", "ahash_hi"]
            )

    return media.mapInPandas(decode, schema=PNG_AHASH_SCHEMA)
