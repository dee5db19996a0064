"""q1_pricing_summary_cents — the BIGINT-cents A/B twin of the DECIMAL
q1 (round-6 verdict #2). The two variants take different arithmetic
paths (decimal accumulation vs integer accumulation with a final
division), so values agree to double rounding error, not bit-exactly —
each has its OWN exact cross-engine oracle; this test pins the two
variants to each other."""

from __future__ import annotations

from wikipedia_data_pipeline_spark.queries.relational_queries import (
    q1_pricing_summary,
    q1_pricing_summary_cents,
)


def test_cents_variant_matches_decimal_variant(spark, sf_dir):
    key = lambda r: (r["l_returnflag"], r["l_linestatus"])  # noqa: E731
    dec = {key(r): r.asDict() for r in q1_pricing_summary(spark, sf_dir).collect()}
    cents = {
        key(r): r.asDict()
        for r in q1_pricing_summary_cents(spark, sf_dir).collect()
    }
    assert dec.keys() == cents.keys() and dec
    for k in dec:
        assert dec[k]["count_order"] == cents[k]["count_order"]
        for col in (
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            "avg_qty",
            "avg_price",
            "avg_disc",
        ):
            a, b = dec[k][col], cents[k][col]
            assert abs(a - b) <= 1e-9 * max(abs(a), 1.0), (k, col, a, b)
