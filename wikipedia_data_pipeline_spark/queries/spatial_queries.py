"""Spatial + storage-layout operators: grid-cell-bucketed distance
join (the bounded-candidate spatial-join shape) and Z-order/Morton
interleave layout keys with footer-stats pruning evidence. Split out
of profiling_queries (round 7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators import dedup as D
from wikipedia_data_pipeline_spark.operators import profiling as P
from wikipedia_data_pipeline_spark.operators.sampling import SQL_DET_HASH
from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table


def _zvalue_sql(xe: str, ye: str, bits: int = 16) -> str:
    """Unrolled Morton interleave in ANSI/DuckDB bit arithmetic — the
    oracle twin of operators.profiling.zorder_key (bit i of column j at
    position i * n_cols + j, x first)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xe}) >> {i}) & 1) << {2 * i}")
        terms.append(f"((({ye}) >> {i}) & 1) << {2 * i + 1}")
    return " | ".join(f"({t})" for t in terms)


@register(
    "layout_zorder_key_events",
    oracle=f"""
SELECT event_id,
       (user_id & 65535) AS x,
       ((epoch_us(ts) // 3600000000) & 65535) AS y,
       ({_zvalue_sql("user_id & 65535",
                     "(epoch_us(ts) // 3600000000) & 65535")}) AS zval
FROM events
""",
)
def layout_zorder_key_events(spark, sf_dir):
    """Z-value (Morton) clustering key over events on (user_id, event
    hour) — the write-side key a lakehouse OPTIMIZE ZORDER layout sorts
    by so file min/max stay tight on BOTH dimensions. Pure shift/mask
    arithmetic inside whole-stage codegen (no UDF, no shuffle); the
    16-bit masks make the key a pure per-row function so the unrolled
    SQL twin checks the interleave bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("user_id").bitwiseAND(F.lit(65535))
    y = F.expr("(ts div 3600000000) & 65535")
    return ev.select(
        "event_id",
        x.alias("x"),
        y.alias("y"),
        P.zorder_key([x, y], bits=16).alias("zval"),
    )


@register("layout_zorder_pruning_report", eager=True)
def layout_zorder_pruning_report(spark, sf_dir):
    """Data-skipping evidence for the Z-order layout: events written
    round-robin vs linearly sorted by hour vs Z-ordered on (user, hour),
    then each layout's parquet footers are asked how many files a box
    predicate on EACH dimension must read. Expected: round-robin prunes
    nothing, the linear sort prunes only its own column, Z-order prunes
    both. Rows-only by design (file counts depend on the parquet
    writer, asserted directionally in tests/test_profiling.py); EAGER:
    writes 3x16 temp files and reads their footers (metadata only)."""
    import shutil
    import tempfile

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.col("user_id").bitwiseAND(F.lit(65535)).alias("x"),
            F.expr("ts div 3600000000").alias("h"),
            "value",
        )
    )
    lo_hi = ev.agg(
        F.min("h").alias("h0"),
        F.max("h").alias("h1"),
        F.min("x").alias("x0"),
        F.max("x").alias("x1"),
    ).collect()[0]
    hspan = int(lo_hi["h1"] - lo_hi["h0"])
    xspan = int(lo_hi["x1"] - lo_hi["x0"])
    rebased = (
        ev.withColumn("y", (F.col("h") - F.lit(int(lo_hi["h0"]))).cast("long"))
        .select("event_id", "x", "y", "value")
    )
    tmp = tempfile.mkdtemp(prefix="wdp_zorder_")
    try:
        report = P.zorder_skipping_report(
            rebased,
            "x",
            "y",
            (int(lo_hi["x0"]) + xspan // 4, int(lo_hi["x0"]) + xspan // 2),
            (hspan // 4, hspan // 2),
            tmp,
            n_files=16,
        )
        report = report.cache()
        report.count()  # materialize before the temp files are removed
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return report


_GEO_X = f"(({SQL_DET_HASH.format(col='user_id')}) % 1000) / 10.0"
_GEO_Y = f"(({SQL_DET_HASH.format(col='event_id')}) % 1000) / 10.0"


@register(
    "spatial_grid_join_events",
    oracle=f"""
WITH pts AS (
  SELECT event_id, {_GEO_X} AS x, {_GEO_Y} AS y
  FROM events WHERE event_id < 3000
),
cells AS (
  SELECT event_id, x, y,
         CAST(floor(x) AS BIGINT) AS cx, CAST(floor(y) AS BIGINT) AS cy
  FROM pts
),
probes AS (
  SELECT event_id, x, y, cx + dx AS cx, cy + dy AS cy
  FROM cells, (SELECT unnest([-1, 0, 1]) AS dx),
              (SELECT unnest([-1, 0, 1]) AS dy)
)
SELECT a.event_id AS event_a, b.event_id AS event_b,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
FROM probes a JOIN cells b ON a.cx = b.cx AND a.cy = b.cy
WHERE a.event_id < b.event_id
  AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 1.0
""",
)
def spatial_grid_join_events(spark, sf_dir):
    """Spatial self-join by uniform grid — the distance-join shape
    Spark has no native operator for, done the scalable way: quantize
    each point to its r-sized grid cell, expand ONE side to its 3×3
    cell neighborhood (constant fan-out), equi-join on cell id, then
    exact-distance filter — candidate generation is an equi-join a
    shuffle can hash, never a cross join, and per-cell density bounds
    the work per key (the same decomposition LSH uses for cosine and
    the pruning report uses for file skipping). Coordinates are
    synthesized deterministically from the portable hash (0.1-degree
    lattice), so both engines compute bit-identical doubles and the
    pair set replays exactly. The a<b guard dedups the symmetric pair
    and self-match in one shot."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 3000)
        .select("event_id", "user_id")
    )
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    pts = ev.select(
        "event_id",
        ((det_hash("user_id") % 1000) / 10.0).alias("x"),
        ((det_hash("event_id") % 1000) / 10.0).alias("y"),
    )
    cells = pts.select(
        "event_id",
        "x",
        "y",
        F.floor("x").cast("long").alias("cx"),
        F.floor("y").cast("long").alias("cy"),
    )
    offs = spark.range(1).select(
        F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx")
    ).crossJoin(
        spark.range(1).select(
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy")
        )
    )
    probes = cells.crossJoin(F.broadcast(offs)).select(
        F.col("event_id").alias("event_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    d2 = (F.col("xa") - F.col("x")) * (F.col("xa") - F.col("x")) + (
        F.col("ya") - F.col("y")
    ) * (F.col("ya") - F.col("y"))
    return (
        probes.join(cells, ["cx", "cy"])
        .filter(F.col("event_a") < F.col("event_id"))
        .filter(d2 <= 1.0)
        .select(
            "event_a",
            F.col("event_id").alias("event_b"),
            d2.alias("dist2"),
        )
    )
