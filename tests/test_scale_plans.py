"""Plan-shape tests: assert the physical plans carry the properties the
100 TB design depends on — bucketed joins plan without exchanges,
partition pruning reaches the scan, filters/column pruning push into
parquet, small dims broadcast, and top-k avoids full sorts.

These are the `.explain()` checks from the build guidance, frozen as
regressions: a future edit that silently reintroduces a shuffle or
drops a pushdown fails here, not in a cluster bill.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.queries.relational_queries import (
    q1_pricing_summary,
    q3_shipping_priority,
)
from wikipedia_data_pipeline_spark.operators.tfidf import task1_dictionary
from wikipedia_data_pipeline_spark.sources.bucketing import (
    drop_table,
    write_bucketed,
)
from wikipedia_data_pipeline_spark.sources.tables import load_table


def executed_plan(df) -> str:
    df.collect()  # finalize AQE so the plan string is the real one
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_plans_without_shuffle(spark, sf_dir):
    """Both sides bucketed+sorted by the join key → sort-merge join with
    no Exchange and no Sort: the write-time layout replaces the per-query
    shuffle (the fact-fact join strategy at scale)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(o, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_lineitem").join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = executed_plan(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "Bucketed: true" in plan
        # row-level sanity: bucketed join equals the plain join
        n_plain = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == n_plain
    finally:
        drop_table(spark, "b_lineitem")
        drop_table(spark, "b_orders")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitionBy layout → a partition-column predicate is a
    PartitionFilter (directory pruning), never a row filter."""
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").parquet(out)
    got = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = executed_plan(got)
    assert "PartitionFilters" in plan
    assert "(event_type" in plan.split("PartitionFilters")[1].split("]")[0]
    n_expected = ev.filter(F.col("event_type") == "click").count()
    assert got.count() == n_expected


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    """The shipdate predicate must reach the parquet scan and the scan
    must not read columns the query never touches."""
    plan = executed_plan(q1_pricing_summary(spark, sf_dir))
    scan = plan[plan.index("FileScan parquet") :]
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in scan
    read_schema = scan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_comment" not in read_schema
    assert "l_orderkey" not in read_schema  # unused by q1
    assert "l_quantity" in read_schema


def test_q3_broadcasts_filtered_dim(spark, sf_dir):
    """The selective customer dim must broadcast — never shuffle the
    fact side for a dim join."""
    plan = executed_plan(q3_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_task1_topk_avoids_full_sort(spark, sf_dir):
    """orderBy+limit must lower to TakeOrderedAndProject (per-partition
    partial top-k), not a global Sort."""
    docs = load_table(spark, sf_dir, "documents")
    plan = executed_plan(task1_dictionary(docs))
    assert "TakeOrderedAndProject" in plan


def test_events_hourly_rollup_shuffle_budget(spark, sf_dir):
    """The hourly rollup must shuffle exactly twice — the two-phase
    count(DISTINCT user_id) agg — and nowhere else; the window-bucket
    computation is a narrow map. (AQE's toString prints Initial and
    Final sections; count only the final plan.)"""
    from wikipedia_data_pipeline_spark.queries.relational_queries import (
        events_hourly_rollup,
    )

    plan = executed_plan(events_hourly_rollup(spark, sf_dir))
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 2


@pytest.mark.parametrize("query_name", ["q5_region_revenue"])
def test_star_join_no_fact_side_shuffle_for_dims(spark, sf_dir, query_name):
    """Star joins: every dim join is broadcast; the only hash exchanges
    allowed are the fact-fact orderkey join and the final group-by."""
    from wikipedia_data_pipeline_spark import registry

    df = registry.spark_queries()[query_name](spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2
