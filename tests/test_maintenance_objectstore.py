"""Tests for table maintenance (compaction), object-store conf glue,
and poison-record ingestion — the operational surface a 100 TB
deployment leans on."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.sources.io import read_table, write_table
from wikipedia_data_pipeline_spark.sources.maintenance import (
    compact,
    plan_compaction,
)
from wikipedia_data_pipeline_spark.sources.objectstore import (
    configure_object_store,
    s3a_confs,
)


def test_plan_compaction_rounds_up():
    assert plan_compaction(None, 1, 128) == 1
    assert plan_compaction(None, 129, 128) == 2
    assert plan_compaction(None, 0, 128) == 1


def test_compact_reduces_file_count_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    spark.range(10_000).repartition(40).write.parquet(src)
    assert len(glob.glob(os.path.join(src, "part-*"))) == 40
    total = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(src, "part-*"))
    )
    n = compact(spark, src, dest, total_bytes=total, sort_col="id",
                target_file_bytes=total // 3)
    files = glob.glob(os.path.join(dest, "part-*"))
    assert len(files) == n <= 4
    back = read_table(spark, dest)
    assert back.count() == 10_000
    # range-sorted rewrite: an equality predicate prunes to one file's
    # row range — verify disjoint min/max per file via per-file scan
    mins_maxs = []
    for p in sorted(files):
        pf = spark.read.parquet(p).agg(
            F.min("id").alias("lo"), F.max("id").alias("hi")
        ).first()
        mins_maxs.append((pf.lo, pf.hi))
    mins_maxs.sort()
    for (lo1, hi1), (lo2, hi2) in zip(mins_maxs, mins_maxs[1:]):
        assert hi1 < lo2  # disjoint ranges => file-level stat pruning works


def test_s3a_conf_set_contains_no_credentials(spark):
    confs = s3a_confs({"spark.hadoop.fs.s3a.endpoint": "https://example"})
    assert "spark.hadoop.fs.s3a.committer.name" in confs
    forbidden = ("access.key", "secret.key", "session.token")
    assert not any(f in k for k in confs for f in forbidden)
    configure_object_store(spark)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.committer.name") == "magic"
    assert hconf.get("fs.s3a.access.key") is None  # chain, not config


def test_poison_json_records_survive_ingest(spark, tmp_path):
    """PERMISSIVE JSON ingest: malformed rows land in the corrupt-record
    column instead of failing the task — at scale a poison payload must
    never kill the job (same policy as multimodal decode)."""
    p = tmp_path / "rows.json"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "THIS IS NOT JSON\n"
        '{"id": 3, "v": "also ok"}\n'
    )
    df = read_table(
        spark,
        f"file://{p}",
        fmt="json",
        schema="id long, v string, _corrupt string",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt",
    )
    rows = df.cache().collect()
    assert len(rows) == 3
    good = {r.id for r in rows if r._corrupt is None}
    bad = [r for r in rows if r._corrupt is not None]
    assert good == {1, 3}
    assert len(bad) == 1 and "NOT JSON" in bad[0]._corrupt


def test_csv_malformed_rows_dropped_in_dropmalformed(spark, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("1,a\n2,b,EXTRA,COLS,HERE\n3,c\n")
    df = read_table(
        spark,
        f"file://{p}",
        fmt="csv",
        schema="id long, v string",
        mode="DROPMALFORMED",
    )
    assert sorted(map(tuple, df.collect())) == [(1, "a"), (3, "c")]


def test_ensure_bucketed_twins_idempotent(spark, sf_dir):
    """Second call in the same session must be a pure catalog hit (no
    rewrite); the twins carry the full source schema and row counts."""
    import time as _t

    from wikipedia_data_pipeline_spark.sources.maintenance import (
        ensure_bucketed_twins,
    )

    twins = ensure_bucketed_twins(spark, sf_dir)
    t0 = _t.perf_counter()
    again = ensure_bucketed_twins(spark, sf_dir)
    assert again == twins
    assert _t.perf_counter() - t0 < 1.0  # catalog lookup, not a write
    for t, name in twins.items():
        src = read_table(spark, f"{sf_dir}/{t}.parquet")
        twin = spark.table(name)
        assert twin.schema == src.schema
        assert twin.count() == src.count()
