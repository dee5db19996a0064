"""sources.wikidoc: the Python DataSource parses the reference corpus
format, fans out one partition per file, and skips non-doc lines."""

from __future__ import annotations

from wikipedia_data_pipeline_spark.sources.wikidoc import (
    parse_wikidoc_line,
    register_wikidoc,
)


def test_parse_wikidoc_line_semantics():
    assert parse_wikidoc_line(
        '<doc id="42" url="u" title="t">hello <b>bold</b> world</doc>'
    ) == ("42", "hello bold world")
    assert parse_wikidoc_line("no doc tag here") is None
    assert parse_wikidoc_line('<doc id="">empty id</doc>') is None
    # Closing tag never leaks into the text (the reference's
    # "includedoc" artifact is NOT reproduced by the clean parser).
    assert parse_wikidoc_line('<doc id="7" url="u" title="t">tail include</doc>')[1].endswith("include")


def test_wikidoc_source_reads_files_as_partitions(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"part{i}.txt").write_text(
            f'<doc id="{i}" url="u" title="t">doc number {i}</doc>\n'
            "not a doc\n"
        )
    register_wikidoc(spark)
    df = spark.read.format("wikidoc").load(str(tmp_path))
    rows = sorted((r.doc_id, r.text) for r in df.collect())
    assert rows == [("0", "doc number 0"), ("1", "doc number 1"), ("2", "doc number 2")]
    assert df.rdd.getNumPartitions() == 3


def test_wikidoc_stream_incremental_with_checkpoint(spark, tmp_path):
    # File-watch streaming through the Python streaming source API:
    # run 1 ingests the initial files, run 2 (same checkpoint) picks up
    # ONLY the file added in between - exactly-once across restarts.
    import os

    src = tmp_path / "corpus"
    src.mkdir()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    for i in range(2):
        (src / f"f{i}.txt").write_text(
            f'<doc id="{i}" url="u" title="t">doc {i}</doc>\n'
        )
    register_wikidoc(spark)
    sdf = spark.readStream.format("wikidoc").option("path", str(src)).load()

    def run_once():
        q = (
            sdf.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck).outputMode("append")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(out).count() == 2
    (src / "f2.txt").write_text('<doc id="2" url="u" title="t">doc 2</doc>\n')
    run_once()
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got == ["0", "1", "2"]  # no duplicates, new file ingested
