"""Registry invariants the driver contract depends on: the ~50-slot
correctness window must hold only oracle-bearing queries, names must be
unique and stable, and every oracle has a matching query."""

from __future__ import annotations

from wikipedia_data_pipeline_spark import registry


def test_window_prefix_is_fully_oracle_bearing():
    qs = list(registry.spark_queries())
    oracles = registry.oracle_queries()
    window = qs[:50]
    missing = [n for n in window if n not in oracles]
    assert missing == [], (
        "driver correctness window wastes slots on no-oracle queries: "
        f"{missing}"
    )


def test_promoted_event_time_family_leads_the_window():
    qs = list(registry.spark_queries())
    assert qs[: len(registry._WINDOW_PROMOTED)] == registry._WINDOW_PROMOTED


def test_every_oracle_has_a_query_and_names_are_unique():
    qs = registry.spark_queries()
    oracles = registry.oracle_queries()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(set(qs))


def test_no_oracle_entries_sit_at_the_end():
    qs = list(registry.spark_queries())
    oracles = registry.oracle_queries()
    flags = [n in oracles for n in qs]
    # Once the no-oracle tail starts, it never flips back.
    first_no = flags.index(False) if False in flags else len(flags)
    assert all(not f for f in flags[first_no:]) or False not in flags
