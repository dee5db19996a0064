"""User-extensibility surface (SURVEY.md §2.9): scalar Python UDF,
vectorized pandas UDF, and grouped-map applyInPandas.

The reference has no user extension points; its per-document unit
(DocInfo.run) is behaviorally a grouped-map UDF, reproduced here as
``doc_top_word`` via applyInPandas. Rule of thumb encoded in these
implementations: built-ins > pandas UDF (Arrow-batched) > row-at-a-time
UDF (kept only as a documented slow-path example — ~10-100× slower).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


@F.udf(returnType=LongType())
def py_token_count(text: str) -> int:
    """Row-at-a-time Python UDF — the SLOW path; exists to demonstrate
    the API. Per-row Python round-trip; never use in hot paths."""
    return len(text.split(" ")) if text is not None else 0


@F.pandas_udf(LongType())
def pd_token_count(text: pd.Series) -> pd.Series:
    """Vectorized pandas UDF (Arrow batches): whitespace token count."""
    return text.str.split(" ").str.len().astype("int64")


def token_counts_pandas(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", pd_token_count(F.col("text")).alias("ws_tokens")
    )


def token_counts_python_udf(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", py_token_count(F.col("text")).alias("ws_tokens")
    )


def _top_word(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-document grouped-map: token count + most frequent word
    (ties → lexicographically smallest) — DocInfo.run's job as a UDF."""
    out = []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        toks = text.split(" ")
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        top = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((doc_id, len(toks), top[0], top[1]))
    return pd.DataFrame(
        out, columns=["doc_id", "n_tokens", "top_word", "top_count"]
    )


def doc_top_word(documents: DataFrame) -> DataFrame:
    """groupBy(doc_id).applyInPandas — arbitrary per-group Python with a
    declared output schema. Shuffles once on doc_id; each group is a
    small pandas frame."""
    return documents.select("doc_id", "text").groupBy("doc_id").applyInPandas(
        _top_word,
        schema="doc_id bigint, n_tokens bigint, top_word string, top_count bigint",
    )
