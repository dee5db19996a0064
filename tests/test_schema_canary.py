"""Schema-drift canary: fail loudly (in seconds) if a testdata
regeneration changes the loaded dtypes the engine depends on.

Round-4 lesson: events.ts silently moved from parquet TIMESTAMP(NANOS)
(read as BIGINT ns) to plain TIMESTAMP µs, breaking 17 queries at once.
``load_table`` now normalizes event time at scan; this test pins BOTH
the normalized engine-facing schema and enumerates the raw encodings
normalization must keep handling.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from wikipedia_data_pipeline_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    normalize_event_time,
)

# engine-facing dtypes per table (post-normalization), the contract every
# query in queries/ is written against
EXPECTED = {
    "region": {
        "r_regionkey": "int",
        "r_name": "string",
    },
    "nation": {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    },
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "bigint",  # epoch-us: THE normalized event-time domain
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


def test_loaded_schemas_match_engine_contract(spark, sf_dir):
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        assert got == EXPECTED[name], (
            f"{name}: loaded schema drifted from engine contract.\n"
            f"  got:      {got}\n  expected: {EXPECTED[name]}\n"
            "If the driver regenerated testdata with new physical types, "
            "extend sources.tables normalization (NOT the 100+ queries)."
        )


def test_events_ts_is_plausible_epoch_us(spark, sf_dir):
    """Magnitude check: a ns-read-as-µs (or µs-read-as-ns) mix-up shifts
    values by 1000× — assert ts lands in [2000-01-01, 2100-01-01) µs."""
    row = (
        load_table(spark, sf_dir, "events")
        .selectExpr("min(ts) AS lo", "max(ts) AS hi")
        .collect()[0]
    )
    lo_bound = 946_684_800_000_000  # 2000-01-01 in epoch-µs
    hi_bound = 4_102_444_800_000_000  # 2100-01-01
    assert lo_bound <= row.lo <= row.hi < hi_bound, (row.lo, row.hi)


def test_normalize_event_time_handles_all_encodings(spark):
    """The dtype dispatch covers every encoding testdata has shipped:
    BIGINT ns, TIMESTAMP_NTZ, TIMESTAMP — all → identical epoch-µs."""
    t = dt.datetime(2024, 1, 1, 12, 34, 56, 789123)
    want = 1_704_112_496_789_123

    ns_df = spark.createDataFrame(
        [(want * 1000,)], T.StructType([T.StructField("ts", T.LongType())])
    )
    ntz_df = spark.createDataFrame(
        [(t,)], T.StructType([T.StructField("ts", T.TimestampNTZType())])
    )
    tz_df = spark.createDataFrame(
        [(t,)], T.StructType([T.StructField("ts", T.TimestampType())])
    )  # session tz is UTC (session.py), so wall clock == epoch clock
    for df in (ns_df, ntz_df, tz_df):
        out = normalize_event_time(df)
        assert out.schema["ts"].dataType.simpleString() == "bigint"
        assert out.collect()[0].ts == want, df.schema
