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
