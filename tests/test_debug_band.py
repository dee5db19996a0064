import sys
sys.path.insert(0, "/root/repo")


def test_hyp_plan(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(st.integers(min_value=2, max_value=2))
    @settings(max_examples=1, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
    def inner(n_parts):
        from wikipedia_data_pipeline_spark.operators.dedup import hashed_shingles, band_signatures
        docs = spark.createDataFrame(
            [(i, f"alpha beta doc{i}") for i in range(4)], ["doc_id", "text"]
        )
        df = band_signatures(hashed_shingles(docs.repartition(n_parts)))
        print(df._jdf.queryExecution().executedPlan().toString()[:1500])
        df.collect()

    inner()
