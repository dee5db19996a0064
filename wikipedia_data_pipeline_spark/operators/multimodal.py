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
