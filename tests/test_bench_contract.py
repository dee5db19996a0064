"""The bench headline set and the query registry are maintained
independently; a rename in either silently drops a bench query
(VERDICT.md round-1 item 10). Pin them together."""

from __future__ import annotations

import bench
from wikipedia_data_pipeline_spark import registry


def test_every_headline_query_is_registered():
    missing = [q for q in bench.HEADLINE if q not in registry.spark_queries()]
    assert not missing, f"bench names not registered: {missing}"


def test_headline_set_spans_engine_areas():
    assert {"tfidf_full", "dedup_minhash_lsh", "ann_cosine_topk_brute"} <= set(
        bench.HEADLINE
    )
