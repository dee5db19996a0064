"""Streaming query registrations (streaming.pipeline).

Session-gap constant mirrors queries.relational_queries.SESSION_GAP_US.

Each callable runs a real Structured Streaming job (availableNow
trigger → memory sink) to completion and returns the result table, so
the driver's oracle compare checks stream/batch parity: the oracle is
plain batch SQL over the same events parquet.
"""

from __future__ import annotations

from wikipedia_data_pipeline_spark.functions import sql_dec_sum
from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.streaming import pipeline as P


@register(
    "streaming_hourly_rollup",
    oracle=f"""
SELECT (epoch_us(ts) // 3600000000) * 3600 AS bucket_s, event_type,
       count(*) AS n_events,
       {sql_dec_sum('value', 'total_value')}
FROM events GROUP BY 1, 2
""",
)
def streaming_hourly_rollup(spark, sf_dir):
    """Tumbling-window streaming agg; must equal the batch SQL."""
    return P.run_hourly_rollup(spark, sf_dir).select(
        "bucket_s", "event_type", "n_events", "total_value"
    )


@register(
    "streaming_sliding_rollup",
    oracle=f"""
SELECT ws, event_type, count(*) AS n_events,
       {sql_dec_sum('value', 'total_value')}
FROM (
  SELECT (epoch_us(ts) // 1800000000) * 1800 AS ws, event_type, value
  FROM events
  UNION ALL
  SELECT ((epoch_us(ts) // 1800000000) - 1) * 1800 AS ws, event_type, value
  FROM events
) GROUP BY ws, event_type
""",
)
def streaming_sliding_rollup(spark, sf_dir):
    """Sliding-window (1h/30min) streaming agg; equals the batch twin."""
    return P.run_sliding_rollup(spark, sf_dir)


@register(
    "streaming_session_window",
    oracle="""
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts)) AS prev_t
  FROM events
),
flagged AS (
  SELECT user_id, t,
         CASE WHEN prev_t IS NULL OR t - prev_t >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sessions AS (
  SELECT user_id, t,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY t
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT user_id, min(t) AS session_start_us,
       max(t) + 1800000000 AS session_end_us,
       count(*) AS n_events
FROM sessions GROUP BY user_id, session_id
""",
)
def streaming_session_window(spark, sf_dir):
    """Streaming session_window (complete mode); equals the batch
    gaps-and-islands sessionization exactly."""
    return P.run_session_window(spark, sf_dir)


@register(
    "streaming_dedup_watermark",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
)
def streaming_dedup_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark over a self-unioned stream (every
    event duplicated) — must reproduce the original table exactly."""
    return P.run_dedup_within_watermark(spark, sf_dir)


@register(
    "streaming_stateful_user_stats",
    oracle="""
SELECT user_id, count(*) AS n_events,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY user_id
""",
)
def streaming_stateful_user_stats(spark, sf_dir):
    """applyInPandasWithState custom stateful operator; order-free
    aggregates make it exactly comparable to batch SQL."""
    return P.run_stateful_user_stats(spark, sf_dir)
