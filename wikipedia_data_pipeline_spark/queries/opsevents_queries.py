"""Operational event analytics & incremental maintenance: SCD2
history, latest-per-key, incremental materialized views (agg + join
forms), multi-touch attribution, rolling active users, event-path
signatures, point-in-time joins, burst detection, lateness audits,
integrity checksums / Merkle segments, and MATCH_RECOGNIZE-style
pattern matching. Split out of profiling_queries (round 12) before the
2,000-line threshold; registry keys and oracles unchanged — the
driver's correctness window addresses queries BY NAME via
registry._PINNED/_ROTATION, never by import order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators.sampling import SQL_DET_HASH
from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table


@register(
    "scd2_customer_order_history",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS valid_from,
       CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
            AS DATE) AS valid_to,
       lead(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) IS NULL
         AS is_current
FROM orders
""",
)
def scd2_customer_order_history(spark, sf_dir):
    """SCD2-style temporal build: each order's validity interval per
    customer — [order date, next order date), open-ended for the
    latest. One lead window partitioned by the key; the standard shape
    for turning a change log into a point-in-time dimension."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F2

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F2.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F2.col("o_orderdate").cast("date").alias("valid_from"),
        nxt.cast("date").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "events_latest_per_key",
    oracle="""
SELECT user_id, event_type, event_id AS last_event_id,
       epoch_us(ts) AS last_ts, value AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def events_latest_per_key(spark, sf_dir):
    """CDC latest-wins compaction: the newest event per (user, type) by
    (ts, event_id) — the MERGE-free upsert shape a log-structured
    ingest pipeline runs before serving. One row_number window on the
    compaction key."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F2

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F2.desc("ts"), F2.desc("event_id")
    )
    return (
        ev.withColumn("rn", F2.row_number().over(w))
        .filter(F2.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F2.col("event_id").alias("last_event_id"),
            F2.col("ts").alias("last_ts"),
            F2.col("value").alias("last_value"),
        )
    )


@register(
    "incremental_mv_orders",
    oracle="""
SELECT o_orderstatus, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg,
       min(o_totalprice) AS min_v,
       max(o_totalprice) AS max_v
FROM orders GROUP BY 1, 2
""",
)
def incremental_mv_orders(spark, sf_dir):
    """Incremental rollup maintenance: the monthly order summary is
    built as base-state (orders before 1996-01-01) merged with a
    delta-state (the rest) — the O(delta) refresh path — and must
    equal the oracle's full recompute. Each state is one hash agg;
    the merge re-aggregates only |keys| rows."""
    from wikipedia_data_pipeline_spark.operators import incremental as I

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        "o_totalprice",
    )
    split = F.lit("1996-01-01").cast("date")
    keys = ["o_orderstatus", "month"]
    base = I.partial_aggregate(
        orders.where(F.col("month") < split), keys, F.col("o_totalprice")
    )
    delta = I.partial_aggregate(
        orders.where(F.col("month") >= split), keys, F.col("o_totalprice")
    )
    return I.finalize(I.merge_partials([base, delta], keys), keys)


@register(
    "events_multi_touch_attribution",
    oracle="""
WITH touches AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
  FROM events WHERE event_type IN ('view', 'click')
),
purchases AS (
  SELECT event_id, user_id, value, epoch_us(ts) AS pus
  FROM events WHERE event_type = 'purchase'
),
pairs AS (
  SELECT t.event_id AS touch_event_id, p.event_id AS purchase_event_id,
         p.user_id, t.event_type AS touch_type, t.tus AS touch_ts,
         p.value
  FROM touches t JOIN purchases p
    ON t.user_id = p.user_id
   AND t.tus < p.pus AND t.tus >= p.pus - 86400000000
)
SELECT touch_event_id, purchase_event_id, user_id, touch_type, touch_ts,
       CAST(value AS DOUBLE)
         / CAST(count(*) OVER (PARTITION BY purchase_event_id) AS DOUBLE)
         AS credit
FROM pairs
""",
)
def events_multi_touch_attribution(spark, sf_dir):
    """Linear multi-touch attribution: each purchase's value splits
    equally across the user's view/click touches in the prior 24h.
    One user_id-keyed range self-join (both sides shuffle on the same
    key, AQE handles user skew) + a count window over the purchase id;
    credit is a single IEEE division per pair, so the result is exact.
    """
    from pyspark.sql import Window
    from wikipedia_data_pipeline_spark.functions import ts_us

    ev = load_table(spark, sf_dir, "events")
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_event_id"),
        "user_id",
        F.col("event_type").alias("touch_type"),
        ts_us().alias("touch_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user_id"),
        "value",
        ts_us().alias("purchase_ts"),
    )
    pairs = touches.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("touch_ts") < F.col("purchase_ts"))
        & (F.col("touch_ts") >= F.col("purchase_ts") - 86_400_000_000),
    )
    n = F.count(F.lit(1)).over(
        Window.partitionBy("purchase_event_id")
    )
    return pairs.select(
        "touch_event_id",
        "purchase_event_id",
        "user_id",
        "touch_type",
        "touch_ts",
        (F.col("value") / n.cast("double")).alias("credit"),
    )


@register(
    "streaming_foreach_batch_compaction",
    oracle="""
SELECT user_id, event_type, event_id AS last_event_id,
       epoch_us(ts) AS last_ts, value AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def streaming_foreach_batch_compaction(spark, sf_dir):
    """foreachBatch exactly-once sink: the event stream merges into a
    versioned latest-per-key store (immutable version per batch id,
    replayed ids no-op), and the newest committed version must equal
    the batch CDC compaction oracle."""
    from wikipedia_data_pipeline_spark.streaming.pipeline import (
        run_foreach_batch_compaction,
    )

    return run_foreach_batch_compaction(spark, sf_dir)


@register(
    "streaming_mv_maintenance",
    oracle="""
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg,
       min(value) AS min_v, max(value) AS max_v
FROM events GROUP BY event_type
""",
)
def streaming_mv_maintenance(spark, sf_dir):
    """Streaming incremental MV: micro-batches fold into the algebraic
    per-event-type state through the versioned exactly-once sink; the
    served view must equal the batch full recompute."""
    from wikipedia_data_pipeline_spark.streaming.pipeline import (
        run_streaming_mv,
    )

    return run_streaming_mv(spark, sf_dir)


@register(
    "events_rolling_active_users",
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day,
       count(DISTINCT u.user_id) AS wau,
       CAST(count(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END)
            AS BIGINT) AS dau
FROM days d JOIN du u
  ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
GROUP BY d.day
""",
)
def events_rolling_active_users(spark, sf_dir):
    """DAU and rolling 7-day WAU per day — rolling DISTINCT counts,
    which no window frame can express exactly. Scale shape: collapse
    the fact table to the tiny distinct (day, user) state first, then
    a bounded 7-day range join against the day spine re-counts
    distinct users per window. The range join fans each state row out
    at most 7x; the fact table is scanned once."""
    ev = load_table(spark, sf_dir, "events")
    return _rolling_active(ev)


def _rolling_active(ev):
    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted

    # tracked (r14): this distinct-(day,user) persist was raw and never
    # unpersisted — every invocation (two registered keys) leaked one
    # fact-derived cached relation and contaminated best-of-N timing
    # (r13 verdict #2)
    du = track_persisted(
        ev.select(
            F.date_trunc("day", F.timestamp_micros(F.col("ts")))
            .cast("date")
            .alias("day"),
            "user_id",
        )
        .distinct()
        .persist()
    )
    days = du.select("day").distinct()
    u = du.select(F.col("day").alias("u_day"), "user_id")
    return (
        days.join(
            u,
            (F.col("u_day") <= F.col("day"))
            & (F.col("u_day") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(
            F.countDistinct("user_id").alias("wau"),
            F.countDistinct(
                F.when(F.col("u_day") == F.col("day"), F.col("user_id"))
            ).cast("long").alias("dau"),
        )
    )


@register(
    "events_rolling_active_users_bucketed",
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day,
       count(DISTINCT u.user_id) AS wau,
       CAST(count(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END)
            AS BIGINT) AS dau
FROM days d JOIN du u
  ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
GROUP BY d.day
""",
    eager=True,
)
def events_rolling_active_users_bucketed(spark, sf_dir):
    """Rolling actives over the BUCKETED events twin — the sixth
    consumer of the maintenance path (sources/maintenance.py), third
    on the user_id key: the only fact-sized exchange in the plain form
    is the distinct over (day, user_id), and HashPartitioning(user_id)
    from the twin's scan satisfies that grouping's clustered
    distribution (user_id is a subset of the keys — all rows of a
    (day, user) pair share a partition), so the distinct aggregates
    in place and the fact table never shuffles. Everything downstream
    (day-spine range join, per-day distinct counts) runs on the
    collapsed day x user state, which is Heaps-small next to the fact.
    Identical results to events_rolling_active_users — same oracle.

    eager=True: construction triggers the lazy first-time twin write
    (sessionization_bucketed note); at 100 TB that write is a
    scheduled maintenance job, priced separately from the query."""
    from wikipedia_data_pipeline_spark.sources.maintenance import (
        ensure_bucketed_twins,
    )

    twins = ensure_bucketed_twins(spark, sf_dir, tables=("events",))
    return _rolling_active(spark.table(twins["events"]))


@register(
    "events_peak_event_per_user",
    oracle="""
SELECT user_id, event_id AS peak_event_id, value AS peak_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY value DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def events_peak_event_per_user(spark, sf_dir):
    """Per-user argmax via max_by aggregation — ONE hash agg with
    map-side partials, the scale-preferred shape for 'row with the
    max' (a row_number window would sort every user's events; max_by
    keeps a single running champion per key). Composite (value,
    event_id) order makes ties deterministic."""
    ev = load_table(spark, sf_dir, "events")
    ord_key = F.struct(
        F.col("value"), F.col("event_id").cast("double")
    )
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", ord_key).alias("peak_event_id"),
        F.max_by("value", ord_key).alias("peak_value"),
    )


@register(
    "events_path_signatures",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
),
paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM seq WHERE rn <= 10 GROUP BY user_id
)
SELECT path, count(*) AS n_users
FROM paths GROUP BY path
""",
)
def events_path_signatures(spark, sf_dir):
    """Behavioral path signatures: each user's first 10 events as an
    ordered type string, counted across users — the journey-mining
    aggregation behind funnel discovery. One window shuffle on
    user_id (rank + truncate), then per-user ordered array_join and a
    signature count; the concat order is declared, so the signature is
    deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 10)
    )
    paths = (
        seq.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "lineitem_point_in_time_join",
    oracle="""
WITH iv AS (
  SELECT o_custkey, o_orderkey AS era_orderkey,
         CAST(o_orderdate AS DATE) AS valid_from,
         CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
              AS DATE) AS valid_to
  FROM orders
),
fact AS (
  SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
         CAST(l.l_shipdate AS DATE) AS ship_d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT f.l_orderkey, f.l_linenumber, f.o_custkey, f.ship_d,
       iv.era_orderkey
FROM fact f JOIN iv
  ON f.o_custkey = iv.o_custkey
 AND f.ship_d >= iv.valid_from
 AND (iv.valid_to IS NULL OR f.ship_d < iv.valid_to)
""",
)
def lineitem_point_in_time_join(spark, sf_dir):
    """Point-in-time (AS OF) join against the SCD2 dimension: each
    shipped line item matched to the order-era its customer was in at
    ship time (intervals from the lead-window SCD2 build; a late
    shipment can land in a LATER era than its own order). The interval
    predicate joins on the customer key plus a range — per-key
    interval lists are small, so the shuffle equi-part dominates and
    the range check is a post-filter, the standard warehouse PIT
    shape."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    iv = orders.select(
        F.col("o_custkey").alias("iv_custkey"),
        F.col("o_orderkey").alias("era_orderkey"),
        F.col("o_orderdate").cast("date").alias("valid_from"),
        F.lead("o_orderdate").over(w).cast("date").alias("valid_to"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("ship_d"),
    )
    fact = li.join(
        orders.select("o_orderkey", "o_custkey"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey", "l_linenumber", "o_custkey", "ship_d")
    return fact.join(
        iv,
        (F.col("o_custkey") == F.col("iv_custkey"))
        & (F.col("ship_d") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ship_d") < F.col("valid_to"))),
    ).select("l_orderkey", "l_linenumber", "o_custkey", "ship_d", "era_orderkey")


@register(
    "events_burst_users",
    oracle="""
WITH mb AS (
  SELECT user_id, epoch_us(ts) // 60000000 AS minute_bucket,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, CAST(max(n) AS BIGINT) AS peak_per_minute,
       CAST(count(*) AS BIGINT) AS n_active_minutes
FROM mb GROUP BY user_id
HAVING max(n) >= 2
""",
)
def events_burst_users(spark, sf_dir):
    """Bot/abuse heuristic: users whose peak per-minute event rate
    crosses a threshold — two stacked integer aggregations (user ×
    minute counts, then per-user peak), both with map-side partials;
    the rate-limit screen an event pipeline runs before modeling."""
    from wikipedia_data_pipeline_spark.functions import ts_us

    ev = load_table(spark, sf_dir, "events")
    mb = (
        ev.select(
            "user_id",
            F.floor(ts_us() / 60_000_000).alias("minute_bucket"),
        )
        .groupBy("user_id", "minute_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        mb.groupBy("user_id")
        .agg(
            F.max("n").alias("peak_per_minute"),
            F.count(F.lit(1)).alias("n_active_minutes"),
        )
        .where(F.col("peak_per_minute") >= 2)
    )


@register(
    "streaming_view_click_left_join",
    oracle="""
WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS view_us
           FROM events WHERE event_type = 'view'),
c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_us
      FROM events WHERE event_type = 'click'),
wm AS (SELECT least((SELECT max(view_us) FROM v),
                    (SELECT max(click_us) FROM c)) - 7200000000 AS w),
pairs AS (
  SELECT v.view_id, c.click_id, v.user_id, v.view_us, c.click_us
  FROM v JOIN c ON v.user_id = c.user_id
   AND c.click_us BETWEEN v.view_us AND v.view_us + 3600000000
)
SELECT * FROM pairs
UNION ALL
SELECT v.view_id, NULL::BIGINT AS click_id, v.user_id, v.view_us,
       NULL::BIGINT AS click_us
FROM v, wm
WHERE v.view_id NOT IN (SELECT view_id FROM pairs)
  AND v.view_us + 3600000000 < wm.w
""",
)
def streaming_view_click_left_join(spark, sf_dir):
    """Watermarked stream-stream LEFT OUTER interval join (views that
    did or did not convert within the hour). The oracle replays
    Structured Streaming's exact emission rule: matched pairs always;
    null-extended views only once their join window has aged below the
    final global watermark, which is min(max event time per input
    stream) − the 2h delay — the multiple-watermark min policy. Views
    still inside that horizon at end-of-stream are withheld, exactly as
    a live stream would withhold them for the next trigger."""
    from wikipedia_data_pipeline_spark.streaming import pipeline as SP

    return SP.run_view_click_left_join(spark, sf_dir)


_LATE_ORACLE = """
WITH lat AS (
  SELECT event_type,
         max(epoch_us(ts)) OVER (ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - epoch_us(ts) AS late_us
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late_1h,
       CAST(sum(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late_10m,
       CAST(max(late_us) AS BIGINT) AS max_late_us
FROM lat GROUP BY event_type
"""


@register("events_lateness_audit", oracle=_LATE_ORACLE)
def events_lateness_audit(spark, sf_dir):
    """Watermark-sizing diagnostic: for each event, its lateness versus
    the maximum event time seen so far in arrival order (the exact
    quantity a streaming watermark compares against), aggregated to
    "how many events would a 10-minute / 1-hour watermark drop?" —
    the batch audit you run BEFORE picking `withWatermark` bounds for
    the §2.8 streaming pipelines.

    Arrival order is the ingest offset (event_id — this testdata's
    synthetic ingest log assigns ids in arrival order). The running
    watermark max(event-time) over that order is computed with
    ``operators.ranks.ordered_scan`` — the hierarchical two-level scan
    — because a bare ``Window.orderBy(...)`` with no partitionBy plans
    as Exchange SinglePartition over the ENTIRE fact table: correct at
    sf0.01, serial at 100 TB. Running MAX is order-insensitive within
    any prefix, so the block decomposition is exact (asserted against
    a one-partition reference on shuffled arrivals in
    tests/test_ranks.py); everything downstream is a conditional
    aggregate with map-side partials.
    """
    from wikipedia_data_pipeline_spark.operators.ranks import ordered_scan

    ev = load_table(spark, sf_dir, "events")
    scanned = ordered_scan(
        ev.select("event_id", "event_type", "ts"),
        ["event_id"],
        running=[("wm_ts", "ts", "max")],
    )
    lat = scanned.select(
        "event_type",
        (F.col("wm_ts") - F.col("ts")).alias("late_us"),
    )
    return lat.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("late_us") > 3_600_000_000, 1).otherwise(0))
        .cast("long")
        .alias("n_late_1h"),
        F.sum(F.when(F.col("late_us") > 600_000_000, 1).otherwise(0))
        .cast("long")
        .alias("n_late_10m"),
        F.max("late_us").cast("long").alias("max_late_us"),
    )


# ---------------------------------------------------------------------------
# Distributed integrity checksum (migration / replication validation)
# ---------------------------------------------------------------------------

_CHECKSUM_ORACLE = f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST({SQL_DET_HASH.format(
           col='(o_orderkey * 31 + o_custkey)')} AS DECIMAL(38,0)))
         AS BIGINT) AS key_checksum,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents_total
FROM orders
"""


@register("orders_integrity_checksum", oracle=_CHECKSUM_ORACLE)
def orders_integrity_checksum(spark, sf_dir):
    """Order-independent table checksum: row count + an associative sum
    of a portable per-row key hash + the exact cents total — the
    cheap "did the copy/migration/replication preserve every row?"
    certificate. Any dropped, duplicated, or key-mutated row moves the
    checksum; summation is associative so any partitioning yields the
    identical value, and the same SQL runs on any engine for
    cross-system reconciliation (exactly how this repo's own driver
    verifies Spark against DuckDB). One scan, 3 counters."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            det_hash(F.col("o_orderkey") * 31 + F.col("o_custkey")).cast(
                "decimal(38,0)"
            )
        )
        .cast("long")
        .alias("key_checksum"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("price_cents_total"),
    )


@register(
    "events_pattern_match",
    oracle="""
WITH paths AS (
  SELECT user_id,
         string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS path
  FROM events GROUP BY user_id
),
pats AS (SELECT unnest(['vc', 'vcp', 'v[^p]*p', 'ee+']) AS pattern)
SELECT p.pattern,
       CAST(sum(len(regexp_extract_all(paths.path, p.pattern)) ) AS BIGINT)
         AS n_matches,
       CAST(sum(CASE WHEN len(regexp_extract_all(paths.path, p.pattern)) > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_users
FROM paths CROSS JOIN pats p
GROUP BY p.pattern
""",
)
def events_pattern_match(spark, sf_dir):
    """Complex-event-processing pattern counts — the MATCH_RECOGNIZE
    surface Spark lacks, emulated the scalable way: each user's full
    event history becomes one ordered type-initial string (one shuffle
    on user_id; per-user state is bounded by per-user activity, the
    same bound any CEP engine needs), then plain regexp_extract_all
    counts non-overlapping occurrences of each pattern. Patterns avoid
    lazy quantifiers so Java regex and RE2 agree: immediate adjacency
    ('vc'), a 3-step adjacency funnel ('vcp'), an eventually-follows
    funnel with no intervening conversion ('v[^p]*p'), and error
    bursts ('ee+'). Deterministic ordering via (ts, event_id);
    array_sort on (ts, event_id, ch) structs gives the same total
    order as the oracle's ORDER BY inside string_agg."""
    ev = load_table(spark, sf_dir, "events")
    paths = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring("event_type", 1, 1).alias("ch"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["ch"]
                ),
                "",
            ).alias("path")
        )
    )
    pats = spark.range(1).select(
        F.explode(
            F.array(
                F.lit("vc"), F.lit("vcp"), F.lit("v[^p]*p"), F.lit("ee+")
            )
        ).alias("pattern")
    )
    hits = F.size(F.regexp_extract_all(F.col("path"), F.col("pattern"), 0))
    return (
        paths.crossJoin(F.broadcast(pats))
        .select("pattern", hits.alias("h"))
        .groupBy("pattern")
        .agg(
            F.sum("h").cast("long").alias("n_matches"),
            F.sum((F.col("h") > 0).cast("int")).cast("long").alias("n_users"),
        )
    )


# --- Incremental JOIN-MV maintenance (round 7) --------------------------


@register(
    "incremental_mv_join_pairs",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, event_id FROM events
  WHERE event_type IN ('view', 'click')
),
mv0 AS (
  SELECT user_id,
         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS nv0,
         CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS nc0
  FROM ev WHERE event_id % 10 < 8 GROUP BY user_id
),
d AS (
  SELECT user_id,
         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS dv,
         CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS dc
  FROM ev WHERE event_id % 10 >= 8 GROUP BY user_id
),
inc AS (
  SELECT coalesce(mv0.user_id, d.user_id) AS user_id,
         coalesce(nv0, 0) * coalesce(nc0, 0)
         + coalesce(nv0, 0) * coalesce(dc, 0)
         + coalesce(dv, 0) * coalesce(nc0, 0)
         + coalesce(dv, 0) * coalesce(dc, 0) AS pairs_incremental
  FROM mv0 FULL OUTER JOIN d ON mv0.user_id = d.user_id
),
full_v AS (
  SELECT user_id,
         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
         * CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
           AS pairs_recomputed
  FROM ev GROUP BY user_id
)
SELECT inc.user_id,
       CAST(pairs_incremental AS BIGINT) AS pairs_incremental,
       pairs_recomputed
FROM inc JOIN full_v ON inc.user_id = full_v.user_id
ORDER BY pairs_incremental DESC, inc.user_id ASC
LIMIT 50
""",
)
def incremental_mv_join_pairs(spark, sf_dir):
    """Incremental maintenance of a JOIN materialized view — the delta
    rule a warehouse applies instead of re-running the join on every
    batch: for MV = A join B, the new batch contributes
    dA join B + A join dB + dA join dB. Here the view is the per-user
    view-x-click pair count (the join-cardinality relation), its
    aggregate form making every term a product of counts:
    (nv0+dv)(nc0+dc) expanded into the four delta terms. The audit
    column recomputes from scratch; the two must agree exactly —
    counts, so integer-exact by construction. Completes the
    incremental family (aggregate MV: incremental_mv_orders; distinct:
    incremental_distinct_users[_kmv]; this is the join shape). Scale:
    both arms are one hash agg + a key-partitioned outer join of
    entity-sized relations — the delta arm touches only |batch| fact
    rows, which is the point of maintenance at 100 TB."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    nv = F.count(F.when(F.col("event_type") == "view", 1)).cast("long")
    nc = F.count(F.when(F.col("event_type") == "click", 1)).cast("long")
    mv0 = (
        ev.filter(F.col("event_id") % 10 < 8)
        .groupBy("user_id")
        .agg(nv.alias("nv0"), nc.alias("nc0"))
    )
    d = (
        ev.filter(F.col("event_id") % 10 >= 8)
        .groupBy("user_id")
        .agg(nv.alias("dv"), nc.alias("dc"))
    )
    z = F.lit(0)
    inc = mv0.join(d, "user_id", "full_outer").select(
        "user_id",
        (
            F.coalesce("nv0", z) * F.coalesce("nc0", z)
            + F.coalesce("nv0", z) * F.coalesce("dc", z)
            + F.coalesce("dv", z) * F.coalesce("nc0", z)
            + F.coalesce("dv", z) * F.coalesce("dc", z)
        )
        .cast("long")
        .alias("pairs_incremental"),
    )
    full_v = ev.groupBy("user_id").agg(
        (nv * nc).cast("long").alias("pairs_recomputed")
    )
    return (
        inc.join(full_v, "user_id")
        .orderBy(F.desc("pairs_incremental"), F.asc("user_id"))
        .limit(50)
        .select("user_id", "pairs_incremental", "pairs_recomputed")
    )


@register(
    "orders_merkle_segments",
    oracle=f"""
SELECT o_orderkey // 8192 AS segment,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(CAST(sum({SQL_DET_HASH.format(col="o_orderkey")}) AS BIGINT)
            AS BIGINT) AS key_checksum,
       CAST(CAST(sum(CAST(round(o_totalprice * 1000000) AS BIGINT))
                 AS BIGINT) AS BIGINT) AS value_checksum_u
FROM orders
GROUP BY 1
""",
)
def orders_merkle_segments(spark, sf_dir):
    """Segment-granular table checksums — the Merkle-style companion to
    orders_integrity_checksum (which certifies the WHOLE table in one
    row): key-range segments each carry a row count, an associative
    portable key-hash sum, and the exact micro-unit money total, so two
    replicas that disagree can binary-search the divergence to an
    8192-key segment instead of re-scanning the table — the
    anti-entropy shape replicated stores run continuously. Every
    checksum is an order-independent integer sum (det_hash <= 2^31 per
    row; micro-units exact by the cents_sum contract), so the relation
    is bit-identical under any partitioning and any engine. One hash
    aggregate, segment-keyed — nothing global."""
    from wikipedia_data_pipeline_spark.functions import cents_units
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    orders = load_table(spark, sf_dir, "orders")
    seg = (
        (F.col("o_orderkey") - F.col("o_orderkey") % 8192)
        .cast("decimal(38,0)") / 8192
    ).cast("long")
    return orders.groupBy(seg.alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(det_hash("o_orderkey")).cast("long").alias("key_checksum"),
        F.sum(cents_units("o_totalprice"))
        .cast("long")
        .alias("value_checksum_u"),
    )
