"""Multimodal + UDF-surface query registrations.

The multimodal decode is a deterministic stub (no codecs in this
container) — but because the fake dimensions derive only from payload
length, the mapInPandas path is still exactly oracle-checkable.
"""

from __future__ import annotations

from wikipedia_data_pipeline_spark.operators import multimodal as MM
from wikipedia_data_pipeline_spark.operators import udfs as U
from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table


@register(
    "multimodal_image_meta",
    oracle="""
WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents)
SELECT doc_id, n_bytes,
       1 + (n_bytes % 640) AS width,
       1 + (n_bytes % 480) AS height,
       (1 + (n_bytes % 640)) * (1 + (n_bytes % 480)) AS n_pixels
FROM m
""",
)
def multimodal_image_meta(spark, sf_dir):
    """binary payload column → mapInPandas decode (stubbed) → metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.decode_image_meta(MM.attach_binary_payload(docs))


@register(
    "multimodal_audio_meta",
    oracle="""
WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents)
SELECT doc_id, n_bytes,
       8000 * (1 + (n_bytes % 3)) AS sample_rate,
       n_bytes * 4 AS n_samples,
       (n_bytes * 4 * 1000000) // (8000 * (1 + (n_bytes % 3))) AS duration_us
FROM m
""",
)
def multimodal_audio_meta(spark, sf_dir):
    """Audio decode stub via mapInPandas: deterministic sample-rate /
    duration metadata from the payload bytes."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.decode_audio_meta(MM.attach_binary_payload(docs))


@register(
    "multimodal_video_framesample",
    oracle=f"""
WITH m AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         1 + (octet_length(encode(text)) % 24) AS n_frames
  FROM documents
)
SELECT doc_id, n_bytes, n_frames,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(f AS BIGINT) * (n_bytes // n_frames) AS frame_offset
FROM m, unnest(generate_series(0, n_frames - 1, {MM.FRAME_SAMPLE_STRIDE})) AS u(f)
""",
)
def multimodal_video_framesample(spark, sf_dir):
    """Video frame sampling stub: 1→N row expansion inside mapInPandas
    (every 4th frame), exact-checkable against generate_series."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.sample_video_frames(MM.attach_binary_payload(docs))


@register(
    "udf_pandas_token_count",
    oracle="SELECT doc_id, len(string_split(text, ' '))::BIGINT AS ws_tokens FROM documents",
)
def udf_pandas_token_count(spark, sf_dir):
    """Vectorized pandas UDF (Arrow) — must agree with the SQL count."""
    return U.token_counts_pandas(load_table(spark, sf_dir, "documents"))


@register(
    "udf_grouped_top_word",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
counts AS (
  SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word
),
ranked AS (
  SELECT doc_id, word, c,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, word) AS rn
  FROM counts
),
ntok AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
         FROM documents)
SELECT n.doc_id, n.n_tokens, r.word AS top_word, r.c AS top_count
FROM ntok n JOIN ranked r ON n.doc_id = r.doc_id AND r.rn = 1
""",
)
def udf_grouped_top_word(spark, sf_dir):
    """groupBy().applyInPandas grouped-map (the reference's DocInfo.run
    as a UDF) — per-doc token count + modal word."""
    return U.doc_top_word(load_table(spark, sf_dir, "documents"))
