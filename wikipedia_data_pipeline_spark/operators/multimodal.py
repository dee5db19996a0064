"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature-extraction as Arrow-batched pandas functions over
``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image_meta`` derives deterministic fake dimensions from the
payload bytes (and ``decode_image_real`` raises NotImplementedError
until a codec is present). Everything around the stub — binary schema,
Arrow batch shape, mapInPandas iterator contract, partition-preserving
plan — is real and tested; swapping in PIL/libvips later changes only
the inner function body.

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


def decode_image_real(media: DataFrame) -> DataFrame:
    """Real decoder slot — requires an image codec (PIL etc.), which
    this container does not ship."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires an image codec (e.g. Pillow); "
            "not available in this environment — use decode_image_meta "
            "for the plumbing-level stub"
        ) from exc
    raise NotImplementedError("wire PIL decode here when codecs are available")
