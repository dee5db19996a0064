"""Python DataSource (Spark 4 API) for the reference's raw corpus
format: one pseudo-XML document per line,
``<doc id="429180" url="..." title="...">body text</doc>``.

The reference ingests this format by hand (DocInfo.java:22-26, one
thread per line); here it is a first-class pluggable source —
``spark.read.format("wikidoc").load(dir)`` — so every downstream
operator (tokenize, TF-IDF, dedup) composes with it like any built-in
format. The reader parallelizes one partition per file; at 100 TB the
same reader splits by byte range instead (seek to the next newline),
which is the only change the partition planner would need. Parsing
mirrors operators.text.parse_wiki_lines (clean variant: the closing
``</doc>`` never leaks into the last token).

Python DataSources are the convenience path, not the fast path — rows
cross the Python boundary one batch at a time. The parquet catalog
(sources.tables) remains the production ingest; this exists for format
completeness and as the template for genuinely custom formats.
"""

from __future__ import annotations

import os
import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_ID_RE = re.compile(r'<doc id="([^"]*)"')
_BODY_RE = re.compile(r">(.*)$")
_TAG_RE = re.compile(r"<[^>]*>?")


def parse_wikidoc_line(line: str) -> tuple[str, str] | None:
    """(doc_id, text) of one pseudo-XML line, or None for non-doc lines.
    Same semantics as parse_wiki_lines: id from the doc tag, body =
    everything after the first '>', residual tags stripped, trimmed."""
    m = _ID_RE.search(line)
    if not m or not m.group(1):
        return None
    body = _BODY_RE.search(line)
    text = _TAG_RE.sub("", body.group(1)) if body else ""
    return m.group(1), text.strip()


class WikiDocDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wikidoc"

    def schema(self) -> str:
        return "doc_id string, text string"

    def reader(self, schema) -> "WikiDocReader":
        return WikiDocReader(self.options)


class WikiDocReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wikidoc source requires a path")

    def partitions(self):
        # One partition per file (a directory fans out across the
        # cluster); a single file is one partition.
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith(("_", "."))
            )
        else:
            files = [self.path]
        return [InputPartition(f) for f in files]

    def read(self, partition):
        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                row = parse_wikidoc_line(line.rstrip("\n"))
                if row is not None:
                    yield row


def register_wikidoc(spark) -> None:
    """Idempotent registration of the format with a session."""
    try:
        spark.dataSource.register(WikiDocDataSource)
    except Exception:
        pass  # already registered


class WikiDocStreamReader:
    """SimpleDataSourceStreamReader for the corpus directory: the
    offset is the sorted list of consumed file names, so each
    micro-batch reads exactly the files that appeared since the last
    committed offset — the usual file-watch ingest, expressed through
    the Python streaming source API. readBetweenOffsets makes replay
    deterministic (exactly the files in end minus start), which is
    what gives the source exactly-once semantics under checkpoint
    recovery."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wikidoc stream requires a path")

    def initialOffset(self):
        return {"files": []}

    def _read_files(self, names):
        # Materialized list, not a generator: the runner caches the
        # batch and copy.copy()s the iterator for partition planning,
        # which only list/tuple iterators support.
        rows = []
        for f in names:
            with open(os.path.join(self.path, f), encoding="utf-8") as fh:
                for line in fh:
                    row = parse_wikidoc_line(line.rstrip("\n"))
                    if row is not None:
                        rows.append(row)
        return iter(rows)

    def read(self, start):
        seen = set(start["files"])
        files = sorted(
            f
            for f in os.listdir(self.path)
            if not f.startswith(("_", "."))
        )
        new = [f for f in files if f not in seen]
        return self._read_files(new), {"files": files}

    def readBetweenOffsets(self, start, end):
        seen = set(start["files"])
        return self._read_files(
            [f for f in end["files"] if f not in seen]
        )


# Subclass lazily so importing this module does not require the
# pyspark streaming datasource machinery at import time.
def _stream_reader(options):
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    # WikiDocStreamReader first in the MRO so its implementations
    # override the base class's raising stubs.
    class _Reader(WikiDocStreamReader, SimpleDataSourceStreamReader):
        def __init__(self):
            WikiDocStreamReader.__init__(self, options)

    return _Reader()


def _attach_stream_reader():
    WikiDocDataSource.simpleStreamReader = (
        lambda self, schema: _stream_reader(self.options)
    )


_attach_stream_reader()
