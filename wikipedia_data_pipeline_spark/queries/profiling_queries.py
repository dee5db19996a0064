"""Append-only registration tail: every query added from round 5
onward (profiling/layout, runtime filters, incremental maintenance,
text relevance & search, curation & attribution, streaming sinks,
UDF-matrix completion, corpus assembly). This module is imported LAST
by registry._load_all, so new entries append AFTER the driver's
~50-slot correctness window instead of displacing queries that already
carry driver evidence — add new registrations here, at the end.

The profile and skew reports are plain SQL aggregates, so their oracles
are exact. The incremental LSH oracle is the brute-force bipartite
shingle-Jaccard (same construction as the self-dedup oracles in
dedup_queries): LSH candidate generation at these parameters has
false-negative probability < 1e-7 at the 0.5 threshold, and the exact
verify join makes the output a precise subset.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators import dedup as D
from wikipedia_data_pipeline_spark.operators import profiling as P
from wikipedia_data_pipeline_spark.operators.sampling import SQL_DET_HASH
from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table

_PROFILE_COLS = ["doc_id", "lang", "source", "n_chars"]


def _profile_col_sql(col: str) -> str:
    return f"""
SELECT '{col}' AS col_name,
       (SELECT count(*) FROM documents) AS n_rows,
       count({col}) AS n_non_null,
       (SELECT count(*) FROM documents) - count({col}) AS n_nulls,
       count(DISTINCT {col}) AS n_distinct,
       CAST(min({col}) AS VARCHAR) AS min_val,
       CAST(max({col}) AS VARCHAR) AS max_val
FROM documents
"""


@register(
    "profile_documents",
    oracle=" UNION ALL ".join(_profile_col_sql(c) for c in _PROFILE_COLS),
)
def profile_documents(spark, sf_dir):
    """ANALYZE-style column profile of the documents table: one wide
    aggregation pass (nulls, exact distincts, stringified min/max per
    column), unpivoted to a row per column."""
    return P.profile_columns(
        load_table(spark, sf_dir, "documents"), _PROFILE_COLS
    )


@register(
    "key_skew_events",
    oracle="""
SELECT user_id AS key, count(*) AS n,
       CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM events) AS share
FROM events GROUP BY user_id ORDER BY n DESC, key ASC LIMIT 20
""",
)
def key_skew_events(spark, sf_dir):
    """Hottest event keys and their table share — the pre-shuffle skew
    diagnostic. One hash agg; the total rides a window over the tiny
    aggregated relation."""
    return P.key_skew_report(load_table(spark, sf_dir, "events"), "user_id", 20)


@register(
    "dedup_incremental_lsh",
    oracle="""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                 FOR i IN generate_series(1, len(t) - 2)])
              ELSE CAST([] AS VARCHAR[]) END AS s
  FROM tok
)
SELECT a.doc_id AS doc_new, b.doc_id AS doc_old,
       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
FROM sh a JOIN sh b ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
""",
)
def dedup_incremental_lsh(spark, sf_dir):
    """Per-batch incremental near-dup: new docs (doc_id % 10 = 0) vs the
    standing corpus (the rest) through the bipartite LSH bucket join —
    per-batch cost is batch-sized, not corpus-sized. Must equal the
    brute-force bipartite Jaccard oracle exactly."""
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return D.incremental_lsh_pairs(corpus, batch, 0.5)


@register(
    "text_span_dedup_stats",
    oracle="""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
occ AS (
  SELECT doc_id,
         unnest([array_to_string(t[i:i+7], ' ')
                 FOR i IN generate_series(1, len(t) - 7)]) AS g
  FROM tok WHERE len(t) >= 8
),
gd AS (SELECT g, count(DISTINCT doc_id) AS nd FROM occ GROUP BY g)
SELECT o.doc_id, count(*) AS n_spans,
       CAST(sum(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       CAST(sum(CASE WHEN gd.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS dup_ratio
FROM occ o JOIN gd ON o.g = gd.g
GROUP BY o.doc_id
""",
)
def text_span_dedup_stats(spark, sf_dir):
    """Per-document duplicated-span ratio over 8-token grams (the
    exact-substring-dedup signal, Lee et al. 2022). Hash-fingerprinted
    grams keep the shuffles narrow; the oracle recomputes on raw gram
    strings — agreement also demonstrates the fingerprint path is
    collision-clean on this corpus."""
    return D.duplicate_span_stats(load_table(spark, sf_dir, "documents"), 8)


@register(
    "sample_shuffle_order",
    oracle="""
SELECT doc_id,
       (((doc_id % 1000003) * 2654435761 + 12345) % 2147483647) % 64 AS shard,
       CAST(row_number() OVER (
            PARTITION BY (((doc_id % 1000003) * 2654435761 + 12345)
                          % 2147483647) % 64
            ORDER BY md5('0:' || CAST(doc_id AS VARCHAR)), doc_id)
        AS BIGINT) AS shard_pos
FROM documents
""",
)
def sample_shuffle_order(spark, sf_dir):
    """Seeded deterministic training shuffle as (shard, shard_pos):
    md5-keyed pseudo-random order, ranked per shard so no single task
    ever holds a global sort. Byte-identical epoch order across engines
    and reruns."""
    from wikipedia_data_pipeline_spark.operators.sampling import shuffle_order

    return shuffle_order(load_table(spark, sf_dir, "documents"))


@register(
    "text_quality_percentile_gate",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang,
         len(list_distinct(string_split(text, ' ')))
           / len(string_split(text, ' ')) AS ttr
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, ttr,
         percent_rank() OVER (PARTITION BY lang ORDER BY ttr, doc_id) AS pctl
  FROM scored
)
SELECT doc_id, lang, ttr, pctl FROM ranked WHERE pctl >= 0.1
""",
)
def text_quality_percentile_gate(spark, sf_dir):
    """Per-language bottom-decile quality cut on type-token ratio —
    the relative (percentile) curation gate; rank arithmetic is
    integer-derived so the selection is bit-deterministic."""
    from wikipedia_data_pipeline_spark.operators.curation import (
        quality_percentile_gate,
    )

    return quality_percentile_gate(load_table(spark, sf_dir, "documents"), 0.1)


@register(
    "scd2_customer_order_history",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS valid_from,
       CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
            AS DATE) AS valid_to,
       lead(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) IS NULL
         AS is_current
FROM orders
""",
)
def scd2_customer_order_history(spark, sf_dir):
    """SCD2-style temporal build: each order's validity interval per
    customer — [order date, next order date), open-ended for the
    latest. One lead window partitioned by the key; the standard shape
    for turning a change log into a point-in-time dimension."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F2

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F2.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F2.col("o_orderdate").cast("date").alias("valid_from"),
        nxt.cast("date").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "events_latest_per_key",
    oracle="""
SELECT user_id, event_type, event_id AS last_event_id,
       epoch_us(ts) AS last_ts, value AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def events_latest_per_key(spark, sf_dir):
    """CDC latest-wins compaction: the newest event per (user, type) by
    (ts, event_id) — the MERGE-free upsert shape a log-structured
    ingest pipeline runs before serving. One row_number window on the
    compaction key."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F2

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F2.desc("ts"), F2.desc("event_id")
    )
    return (
        ev.withColumn("rn", F2.row_number().over(w))
        .filter(F2.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F2.col("event_id").alias("last_event_id"),
            F2.col("ts").alias("last_ts"),
            F2.col("value").alias("last_value"),
        )
    )


@register(
    "heavy_hitter_tokens",
    oracle="""
WITH w AS (
  SELECT lower(regexp_replace(x, '[^a-zA-Z]', '', 'g')) AS word
  FROM documents, unnest(string_split(text, ' ')) AS u(x)
),
f AS (SELECT word FROM w WHERE length(word) > 0),
tot AS (SELECT count(*) AS n_total FROM f)
SELECT word, count(*) AS n,
       CAST(count(*) AS DOUBLE) / (SELECT CAST(n_total AS DOUBLE) FROM tot) AS share
FROM f GROUP BY word
HAVING count(*) * 200 >= (SELECT n_total FROM tot)
""",
)
def heavy_hitter_tokens(spark, sf_dir):
    """EXACT tokens covering >= 1/200 of all corpus token occurrences,
    via per-partition Misra-Gries candidate generation (no full-histogram
    shuffle) + broadcast-semi exact recount. Two scans; the shuffle
    carries only candidates, not the distinct-token histogram."""
    from wikipedia_data_pipeline_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokenize(docs).select(F.col("word"))
    return P.exact_heavy_hitters(toks, "word", 1, 200)


@register(
    "bloom_prefilter_join_revenue",
    oracle="""
SELECT o.o_orderkey, count(*) AS n_items,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 450000
GROUP BY o.o_orderkey
""",
)
def bloom_prefilter_join_revenue(spark, sf_dir):
    """Revenue of high-value orders via a Bloom-prefiltered join: the
    dim side (filtered orders) builds an m-bit sketch in one tiny
    aggregation, the fact side (lineitem) drops non-matching rows
    before its shuffle, and the final exact join erases false
    positives — same rows as the plain join, a fraction of the shuffle.
    """
    from wikipedia_data_pipeline_spark.functions import dec_sum
    from wikipedia_data_pipeline_spark.operators import runtime_filters as RF

    lineitem = load_table(spark, sf_dir, "lineitem")
    hi = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 450000
    )
    joined = RF.bloom_prefilter_join(
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
        hi.select("o_orderkey"),
        "l_orderkey",
        "o_orderkey",
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        dec_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        ),
    )


@register(
    "text_trigram_commonness",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, ' '),
                     x -> lower(regexp_replace(x, '[^a-zA-Z]', '', 'g'))),
                     w -> length(w) > 0) AS ws
  FROM documents
),
occ AS (
  SELECT doc_id, concat_ws(' ', ws[g], ws[g+1], ws[g+2]) AS ngram
  FROM t, unnest(generate_series(1, len(ws) - 2)) AS u(g)
),
dfq AS (
  SELECT ngram, count(*) AS df FROM (SELECT DISTINCT doc_id, ngram FROM occ)
  GROUP BY ngram
)
SELECT occ.doc_id, count(*) AS n_trigrams,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS common_frac,
       CAST(sum(df) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_df
FROM occ JOIN dfq ON occ.ngram = dfq.ngram
GROUP BY occ.doc_id
""",
)
def text_trigram_commonness(spark, sf_dir):
    """CCNet-style LM-lite quality gate: per-doc corpus-fit from
    trigram document frequencies (integer-exact aggregation, two
    shuffles on the trigram key)."""
    from wikipedia_data_pipeline_spark.operators import textstats as TS2

    return TS2.trigram_commonness(load_table(spark, sf_dir, "documents"))


@register(
    "curation_source_cap",
    oracle="""
SELECT doc_id, lang, source, n_chars FROM (
  SELECT doc_id, lang, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
) WHERE rn <= 10
""",
)
def curation_source_cap(spark, sf_dir):
    """Per-source document cap (crawl-curation anti-domination): keep
    the 10 longest docs per source with a deterministic tiebreak. One
    row_number window on the source key."""
    from wikipedia_data_pipeline_spark.operators import curation as C

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    return C.cap_per_group(
        docs, "source", [F.desc("n_chars"), F.asc("doc_id")], 10
    )


@register(
    "incremental_mv_orders",
    oracle="""
SELECT o_orderstatus, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg,
       min(o_totalprice) AS min_v,
       max(o_totalprice) AS max_v
FROM orders GROUP BY 1, 2
""",
)
def incremental_mv_orders(spark, sf_dir):
    """Incremental rollup maintenance: the monthly order summary is
    built as base-state (orders before 1996-01-01) merged with a
    delta-state (the rest) — the O(delta) refresh path — and must
    equal the oracle's full recompute. Each state is one hash agg;
    the merge re-aggregates only |keys| rows."""
    from wikipedia_data_pipeline_spark.operators import incremental as I

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        "o_totalprice",
    )
    split = F.lit("1996-01-01").cast("date")
    keys = ["o_orderstatus", "month"]
    base = I.partial_aggregate(
        orders.where(F.col("month") < split), keys, F.col("o_totalprice")
    )
    delta = I.partial_aggregate(
        orders.where(F.col("month") >= split), keys, F.col("o_totalprice")
    )
    return I.finalize(I.merge_partials([base, delta], keys), keys)


@register(
    "events_multi_touch_attribution",
    oracle="""
WITH touches AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
  FROM events WHERE event_type IN ('view', 'click')
),
purchases AS (
  SELECT event_id, user_id, value, epoch_us(ts) AS pus
  FROM events WHERE event_type = 'purchase'
),
pairs AS (
  SELECT t.event_id AS touch_event_id, p.event_id AS purchase_event_id,
         p.user_id, t.event_type AS touch_type, t.tus AS touch_ts,
         p.value
  FROM touches t JOIN purchases p
    ON t.user_id = p.user_id
   AND t.tus < p.pus AND t.tus >= p.pus - 86400000000
)
SELECT touch_event_id, purchase_event_id, user_id, touch_type, touch_ts,
       CAST(value AS DOUBLE)
         / CAST(count(*) OVER (PARTITION BY purchase_event_id) AS DOUBLE)
         AS credit
FROM pairs
""",
)
def events_multi_touch_attribution(spark, sf_dir):
    """Linear multi-touch attribution: each purchase's value splits
    equally across the user's view/click touches in the prior 24h.
    One user_id-keyed range self-join (both sides shuffle on the same
    key, AQE handles user skew) + a count window over the purchase id;
    credit is a single IEEE division per pair, so the result is exact.
    """
    from pyspark.sql import Window
    from wikipedia_data_pipeline_spark.functions import ts_us

    ev = load_table(spark, sf_dir, "events")
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_event_id"),
        "user_id",
        F.col("event_type").alias("touch_type"),
        ts_us().alias("touch_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user_id"),
        "value",
        ts_us().alias("purchase_ts"),
    )
    pairs = touches.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("touch_ts") < F.col("purchase_ts"))
        & (F.col("touch_ts") >= F.col("purchase_ts") - 86_400_000_000),
    )
    n = F.count(F.lit(1)).over(
        Window.partitionBy("purchase_event_id")
    )
    return pairs.select(
        "touch_event_id",
        "purchase_event_id",
        "user_id",
        "touch_type",
        "touch_ts",
        (F.col("value") / n.cast("double")).alias("credit"),
    )


@register(
    "text_phrase_search",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, ' '),
                     x -> lower(regexp_replace(x, '[^a-zA-Z]', '', 'g'))),
                     w -> length(w) > 0) AS ws
  FROM documents
)
SELECT doc_id, CAST(g - 1 AS BIGINT) AS start_pos
FROM t, unnest(generate_series(1, len(ws) - 2)) AS u(g)
WHERE ws[g] = 'slow' AND ws[g+1] = 'hash' AND ws[g+2] = 'batch'
""",
)
def text_phrase_search(spark, sf_dir):
    """Exact phrase lookup ('slow hash batch') over the positional
    inverted index: per-term scans (word filter pushed down) joined on
    (doc_id, pos - i). Returns one row per occurrence."""
    from wikipedia_data_pipeline_spark.operators import index as IX

    docs = load_table(spark, sf_dir, "documents")
    postings = IX.positional_postings(docs)
    return IX.phrase_search(postings, ["slow", "hash", "batch"])


@register(
    "streaming_foreach_batch_compaction",
    oracle="""
SELECT user_id, event_type, event_id AS last_event_id,
       epoch_us(ts) AS last_ts, value AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def streaming_foreach_batch_compaction(spark, sf_dir):
    """foreachBatch exactly-once sink: the event stream merges into a
    versioned latest-per-key store (immutable version per batch id,
    replayed ids no-op), and the newest committed version must equal
    the batch CDC compaction oracle."""
    from wikipedia_data_pipeline_spark.streaming.pipeline import (
        run_foreach_batch_compaction,
    )

    return run_foreach_batch_compaction(spark, sf_dir)


# ---- sparse TF-IDF document-similarity join ------------------------------

from wikipedia_data_pipeline_spark.queries.tfidf_queries import DOC_TF_CTES



@register(
    "doc_similarity_tfidf",
    oracle=f"""
WITH {DOC_TF_CTES},
dfreq AS (
    SELECT word, count(*) AS df
    FROM (SELECT DISTINCT doc_id, word FROM toks) GROUP BY word
),
ndocs AS (SELECT count(*) AS n_docs FROM documents),
idf AS (
    SELECT f.word, round(log10(CAST(n_docs AS DOUBLE) / df), 2) AS idf, f.df
    FROM dfreq f, ndocs
    WHERE round(log10(CAST(n_docs AS DOUBLE) / df), 2) > 0
),
vec AS (
    SELECT t.doc_id, t.word, round(t.tf * i.idf, 2) AS tf_idf
    FROM doc_tf t JOIN idf i ON t.word = i.word, ndocs
    WHERE i.df * 10 <= n_docs
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared,
       CAST(sum(CAST(a.tf_idf * b.tf_idf AS DECIMAL(18,6))) AS DOUBLE) AS sim
FROM vec a JOIN vec b ON a.word = b.word AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY sim DESC, doc_a ASC, doc_b ASC
LIMIT 100
""",
)
def doc_similarity_tfidf(spark, sf_dir):
    """Sparse all-pairs document similarity over TF-IDF vectors: the
    inverted-index dot-product join (pairs meet only on shared words),
    with prefix-filter pruning — words present in more than 10% of
    documents are dropped BEFORE the self-join (a scale-relative cap:
    it bounds the worst posting list, and hence the join's
    O(sum df^2) blowup, at every corpus size); high-df words carry
    near-zero idf weight, and the cap is part of the declared
    semantics so the oracle applies it too. Decimal dot-product sums
    keep the result bit-exact; top-100 pairs by similarity with a
    total tiebreak order."""
    from wikipedia_data_pipeline_spark.operators import tfidf as TT

    docs = load_table(spark, sf_dir, "documents")
    # Persist the pruned vectors: both self-join sides reference the
    # same subtree and Spark does not CSE across join inputs, so
    # without this the whole TF-IDF pipeline runs twice. Post-cap the
    # relation is the rare-word postings only (corpus-proportional
    # but a small fraction; the cluster equivalent is checkpointing
    # the vector table between stages).
    vec = (
        TT.tfidf_with_df(docs, df_times_le_ndocs=10)
        .select("doc_id", "word", "tf_idf")
        .persist()
    )
    a = vec.alias("a")
    b = vec.alias("b")
    pairs = a.join(
        b,
        (F.col("a.word") == F.col("b.word"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    return (
        pairs.groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum(
                (F.col("a.tf_idf") * F.col("b.tf_idf")).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(100)
    )


@register(
    "incremental_distinct_users",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY 1
""",
)
def incremental_distinct_users(spark, sf_dir):
    """Exact incremental count-distinct: daily unique users built
    from two membership states (events split at mid-January) merged by
    set union — the non-algebraic aggregate made incremental by
    keeping distinct pairs as state instead of counts."""
    from wikipedia_data_pipeline_spark.operators import incremental as I

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc(
            "day", F.timestamp_micros(F.col("ts"))
        ).cast("date").alias("day"),
        "user_id",
        "ts",
    )
    split_us = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z in epoch-us
    states = [
        I.distinct_state(
            ev.where(F.col("ts") < split_us), ["day"], "user_id"
        ),
        I.distinct_state(
            ev.where(F.col("ts") >= split_us), ["day"], "user_id"
        ),
    ]
    return I.merge_distinct_states(states, ["day"], "user_id")


@register(
    "udtf_doc_sentences",
    oracle="""
SELECT doc_id, CAST(i - 1 AS BIGINT) AS sent_id, trim(parts[i]) AS sentence,
       CAST(len(list_filter(string_split(trim(parts[i]), ' '),
                            w -> length(w) > 0)) AS BIGINT) AS n_words
FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents),
     unnest(generate_series(1, len(parts))) AS u(i)
WHERE length(trim(parts[i])) > 0
""",
)
def udtf_doc_sentences(spark, sf_dir):
    """Python UDTF surface (§2.9 completion): per-document sentence
    explosion through a LATERAL table function — 1 row in, N rows out,
    the shape scalar/pandas UDFs cannot produce."""
    from wikipedia_data_pipeline_spark.operators import udfs as U

    return U.doc_sentences(load_table(spark, sf_dir, "documents"))


@register(
    "source_wikidoc_roundtrip",
    oracle="SELECT doc_id, trim(text) AS text FROM documents",
    eager=True,
)
def source_wikidoc_roundtrip(spark, sf_dir):
    """Custom Python DataSource (Spark 4 API): documents rendered to
    the reference's pseudo-XML corpus format, read back through the
    pluggable `wikidoc` format (one partition per file), must
    round-trip exactly. Covers §2.1's raw-corpus scan as a
    first-class source instead of text-lines + parse."""
    import shutil
    import tempfile

    from wikipedia_data_pipeline_spark.sources.wikidoc import register_wikidoc

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="wdp_wikidoc_")
    out = f"{tmp}/corpus"
    docs.select(
        F.format_string(
            '<doc id="%s" url="file://x" title="d%s">%s</doc>',
            F.col("doc_id"),
            F.col("doc_id"),
            F.col("text"),
        ).alias("value")
    ).write.mode("overwrite").text(out)
    register_wikidoc(spark)
    parsed = (
        spark.read.format("wikidoc")
        .load(out)
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .cache()
    )
    parsed.count()  # materialize before the temp dir is removed
    shutil.rmtree(tmp, ignore_errors=True)
    return parsed


@register(
    "sample_token_budget_cut",
    oracle="""
WITH o AS (
  SELECT doc_id,
         (((doc_id % 1000003) * 2654435761 + 12345) % 2147483647) % 64 AS shard,
         CAST(row_number() OVER (
              PARTITION BY (((doc_id % 1000003) * 2654435761 + 12345)
                            % 2147483647) % 64
              ORDER BY md5('0:' || CAST(doc_id AS VARCHAR)), doc_id)
          AS BIGINT) AS shard_pos
  FROM documents
),
t AS (
  SELECT o.doc_id, o.shard, o.shard_pos,
         CAST(len(list_filter(string_split(d.text, ' '),
                              w -> length(w) > 0)) AS BIGINT) AS n_tokens
  FROM o JOIN documents d ON o.doc_id = d.doc_id
),
c AS (
  SELECT *, CAST(sum(n_tokens) OVER (
        ORDER BY shard_pos, shard
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_tokens
  FROM t
)
SELECT doc_id, shard, shard_pos, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= 25000
""",
)
def sample_token_budget_cut(spark, sf_dir):
    """Token-budget prefix of the deterministic epoch order, via a
    hierarchical (block + within-block) distributed prefix sum — no
    global sort; integer-exact, byte-identical across engines."""
    from wikipedia_data_pipeline_spark.operators.sampling import (
        token_budget_cut,
    )

    return token_budget_cut(
        load_table(spark, sf_dir, "documents"), budget=25_000
    )


@register(
    "curation_funnel_report",
    oracle="""
WITH g AS (
  SELECT doc_id, md5(text) AS h
  FROM documents
  WHERE lang = 'en' AND length(text) >= 20 AND length(text) <= 1000000
),
d AS (SELECT doc_id, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      FROM g),
cls AS (
  SELECT CASE WHEN doc.lang <> 'en' THEN 'lang_rejected'
              WHEN length(doc.text) < 20 THEN 'too_short'
              WHEN length(doc.text) > 1000000 THEN 'too_long'
              WHEN d.rn > 1 THEN 'duplicate'
              ELSE 'kept' END AS reason,
         doc.n_chars
  FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id
)
SELECT reason, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars_total
FROM cls GROUP BY reason
""",
)
def curation_funnel_report(spark, sf_dir):
    """Attributable corpus shrinkage: per-gate rejection counts for
    the curation pipeline (first-gate-wins classification, duplicate
    = non-representative among gate survivors)."""
    from wikipedia_data_pipeline_spark.operators import curation as C

    return C.curation_funnel(load_table(spark, sf_dir, "documents"))


@register(
    "udf_grouped_agg_median",
    oracle="""
SELECT user_id, median(value) AS median_value
FROM events GROUP BY user_id
""",
)
def udf_grouped_agg_median(spark, sf_dir):
    """GROUPED_AGG pandas UDF (the custom-UDAF surface): exact
    per-user median; even-sized groups average the two middle
    elements identically in numpy and SQL median."""
    from wikipedia_data_pipeline_spark.operators import udfs as U

    return U.user_value_medians(load_table(spark, sf_dir, "events"))


@register(
    "udf_arrow_long_words",
    oracle="""
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '),
                            w -> length(w) > 6)) AS BIGINT) AS n_long_words
FROM documents
""",
)
def udf_arrow_long_words(spark, sf_dir):
    """Arrow-optimized scalar Python UDF (useArrow=True) — completes
    the UDF transport matrix (pickled row / Arrow scalar / pandas
    batch / grouped map / grouped agg / UDTF)."""
    from wikipedia_data_pipeline_spark.operators import udfs as U

    return U.arrow_long_words(load_table(spark, sf_dir, "documents"))


@register(
    "training_corpus_build",
    oracle="""
WITH g AS (
  SELECT doc_id, lang, text FROM documents
  WHERE lang = 'en' AND length(text) >= 20 AND length(text) <= 1000000
),
keep AS (
  SELECT doc_id, lang, text FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM g
  ) WHERE rn = 1
),
train AS (
  SELECT * FROM keep
  WHERE (((doc_id % 1000003) * 2654435761 + 12345) % 2147483647) % 100 < 90
),
t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM train
)
SELECT doc_id, lang, n_tok,
       CAST((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
            // 512 AS BIGINT) AS pack_id
FROM t
""",
)
def training_corpus_build(spark, sf_dir):
    """End-to-end training-corpus assembly, the composite the
    individual operators exist for: curate (language/length gates,
    exact-dedup keep, PII scrub) -> deterministic hash split (train
    bucket) -> greedy 512-token sequence packing. One pipeline of the
    verified pieces; the oracle replays every stage in SQL. (The
    synthetic corpus contains no PII, so the scrub is the identity
    here and the oracle counts tokens on the raw text; the scrub
    itself is driver-verified with injected PII in text_pii_scrub.)"""
    from wikipedia_data_pipeline_spark.operators import curation as C
    from wikipedia_data_pipeline_spark.operators import sampling as S

    docs = load_table(spark, sf_dir, "documents")
    cur = C.curate(docs)
    splits = S.assign_splits(docs).select("doc_id", "split")
    train = (
        cur.join(splits, "doc_id")
        .where(F.col("split") == "train")
        .select("doc_id", "lang", F.col("text_clean").alias("text"))
    )
    return S.pack_sequences(train)


@register(
    "streaming_mv_maintenance",
    oracle="""
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS avg,
       min(value) AS min_v, max(value) AS max_v
FROM events GROUP BY event_type
""",
)
def streaming_mv_maintenance(spark, sf_dir):
    """Streaming incremental MV: micro-batches fold into the algebraic
    per-event-type state through the versioned exactly-once sink; the
    served view must equal the batch full recompute."""
    from wikipedia_data_pipeline_spark.streaming.pipeline import (
        run_streaming_mv,
    )

    return run_streaming_mv(spark, sf_dir)


@register(
    "text_collocations",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, ' '),
                     x -> lower(regexp_replace(x, '[^a-zA-Z]', '', 'g'))),
                     w -> length(w) > 0) AS ws
  FROM documents
),
uni AS (
  SELECT w AS word, count(*) AS n_word
  FROM t, unnest(ws) AS u(w) GROUP BY w
),
tot AS (SELECT CAST(sum(n_word) AS BIGINT) AS n_total FROM uni),
bi AS (
  SELECT ws[g] AS w1, ws[g+1] AS w2,
         ws[g] || ' ' || ws[g+1] AS ngram, count(*) AS n_pair
  FROM t, unnest(generate_series(1, len(ws) - 1)) AS u(g)
  GROUP BY 1, 2, 3
)
SELECT ngram, n_pair, u1.n_word AS n_w1, u2.n_word AS n_w2,
       CAST(n_pair * (SELECT n_total FROM tot) AS DOUBLE)
         / CAST(u1.n_word * u2.n_word AS DOUBLE) AS lift
FROM bi JOIN uni u1 ON bi.w1 = u1.word JOIN uni u2 ON bi.w2 = u2.word
ORDER BY lift DESC, ngram ASC
LIMIT 100
""",
)
def text_collocations(spark, sf_dir):
    """Collocation extraction by integer-exact lift (PMI sans log):
    bigram counts joined twice against the broadcast unigram table,
    one portable division per row, TakeOrdered top-100."""
    from wikipedia_data_pipeline_spark.operators import textstats as TS3

    return TS3.collocations(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 10 <> 0
),
new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS fp
  FROM documents WHERE doc_id % 9 <> 0
)
SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old.fp IS NULL THEN 'added'
            WHEN new.fp IS NULL THEN 'removed'
            WHEN old.fp <> new.fp THEN 'changed' END AS change
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
WHERE (CASE WHEN old.fp IS NULL THEN 'added'
            WHEN new.fp IS NULL THEN 'removed'
            WHEN old.fp <> new.fp THEN 'changed' END) IS NOT NULL
""",
)
def corpus_snapshot_diff(spark, sf_dir):
    """Release-to-release corpus diff: two snapshots derived
    deterministically from the documents table (v1 drops doc_id%10=0,
    v2 drops doc_id%9=0 and edits doc_id%7=0), classified
    added/removed/changed by one full outer join on md5 row
    fingerprints."""
    from wikipedia_data_pipeline_spark.operators import curation as C

    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.where(F.col("doc_id") % 10 != 0)
    v2 = docs.where(F.col("doc_id") % 9 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return C.snapshot_diff(v1, v2, "doc_id", ["text"])


@register("text_compression_ratio")  # no SQL oracle: zlib is not SQL-expressible
def text_compression_ratio(spark, sf_dir):
    """zlib compression-ratio quality signal (repetitive text
    compresses suspiciously well). Deterministic but not
    SQL-expressible, so pytest-verified; the driver rows-checks it."""
    from wikipedia_data_pipeline_spark.operators import textstats as TS4

    return TS4.compression_ratio(load_table(spark, sf_dir, "documents"))


@register(
    "text_chunk_documents",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, ' '),
                     x -> lower(regexp_replace(x, '[^a-zA-Z]', '', 'g'))),
                     w -> length(w) > 0) AS ws
  FROM documents
)
SELECT doc_id,
       CAST(s // 48 AS BIGINT) AS chunk_id,
       CAST(s AS BIGINT) AS chunk_start,
       CAST(len(ws[s+1 : least(s + 64, len(ws))]) AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(ws[s+1 : least(s + 64, len(ws))], ' ') AS chunk_text
FROM t, unnest(generate_series(0, len(ws) - 1, 48)) AS u(s)
WHERE len(ws) > 0
""",
)
def text_chunk_documents(spark, sf_dir):
    """Overlapping token chunking (64-token chunks, stride 48) for RAG
    indexing / long-doc training — pure sequence/explode/slice, no
    UDF, no shuffle."""
    from wikipedia_data_pipeline_spark.operators import text as T2

    return T2.chunk_documents(load_table(spark, sf_dir, "documents"))


@register(
    "sample_token_mask",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, ' '),
                     x -> lower(regexp_replace(x, '[^a-zA-Z]', '', 'g'))),
                     w -> length(w) > 0) AS ws
  FROM documents
),
p AS (
  SELECT doc_id, g AS pos, ws[g] AS w
  FROM t, unnest(generate_series(1, len(ws))) AS u(g)
),
m AS (
  SELECT doc_id, pos, w,
         (((((doc_id % 1000003) + (pos - 1)) % 1000003) * 2654435761
           + 12345) % 2147483647) % 5 = 0 AS is_masked
  FROM p
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN is_masked THEN 1 ELSE 0 END) AS BIGINT)
         AS n_masked,
       string_agg(CASE WHEN is_masked THEN '<MASK>' ELSE w END, ' '
                  ORDER BY pos) AS masked_text,
       COALESCE(string_agg(CASE WHEN is_masked THEN w END, ' '
                           ORDER BY pos), '') AS targets
FROM m GROUP BY doc_id
""",
)
def sample_token_mask(spark, sf_dir):
    """Deterministic MLM corruption (1/5 positional mask rate from the
    portable hash, not rand()): identical masks under any partitioning
    or retry — regenerable pretraining data. Narrow map, no shuffle."""
    from wikipedia_data_pipeline_spark.operators.sampling import token_mask

    return token_mask(load_table(spark, sf_dir, "documents"))


@register(
    "sample_contrastive_negatives",
    oracle="""
WITH mx AS (SELECT max(doc_id) AS max_id FROM documents),
cand AS (
  SELECT d.doc_id AS anchor_id, CAST(j AS BIGINT) AS j,
         ((((d.doc_id * 31 + j) % 1000003) * 2654435761 + 12345)
          % 2147483647) % ((SELECT max_id FROM mx) + 1) AS nid
  FROM documents d, unnest(generate_series(0, 3)) AS u(j)
)
SELECT anchor_id, j, nid AS neg_doc_id
FROM cand
WHERE nid IN (SELECT doc_id FROM documents) AND nid <> anchor_id
""",
)
def sample_contrastive_negatives(spark, sf_dir):
    """Deterministic contrastive negative pairs (4 hash-derived
    candidates per anchor, self-hits and id gaps dropped) — the
    reproducible alternative to rand() negatives, with no global
    rank."""
    from wikipedia_data_pipeline_spark.operators.sampling import (
        negative_samples,
    )

    return negative_samples(load_table(spark, sf_dir, "documents"), k=4)


@register(
    "histogram_event_values",
    oracle="""
SELECT CAST(least(floor(value / 5), 19) AS BIGINT) AS bucket,
       CAST(least(floor(value / 5), 19) * 5 AS DOUBLE) AS bucket_lo,
       count(*) AS n,
       min(value) AS min_v, max(value) AS max_v
FROM events GROUP BY 1, 2
""",
)
def histogram_event_values(spark, sf_dir):
    """Fixed-width value histogram (20 buckets of width 5, top bucket
    clamped) — the numeric-distribution profile a pipeline inspects
    before choosing salting/partition bounds. One hash agg; the bucket
    arithmetic is a single exact IEEE division per row."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 5), F.lit(19)).cast("long")
    return (
        ev.withColumn("bucket", bucket)
        .withColumn("bucket_lo", (F.col("bucket") * 5).cast("double"))
        .groupBy("bucket", "bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )


@register(
    "events_winsorized",
    oracle="""
WITH ranked AS (
  SELECT event_id, event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id)
           AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM events
),
p99 AS (
  SELECT event_type, min(value) AS p99_v
  FROM ranked WHERE rn >= CAST(ceil(0.99 * cnt) AS BIGINT)
  GROUP BY event_type
)
SELECT r.event_id, r.event_type, r.value,
       least(r.value, p.p99_v) AS value_capped
FROM ranked r JOIN p99 p ON r.event_type = p.event_type
""",
)
def events_winsorized(spark, sf_dir):
    """Outlier capping at the DISCRETE per-type p99 — the percentile is
    an actual data value picked by rank (ceil(0.99 * n)-th in value
    order), not an interpolation, so it is bit-portable where
    interpolated quantiles are not. One window pass + a broadcast of
    the tiny per-type threshold table."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    cw = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("cnt"),
    )
    p99 = (
        ranked.where(
            F.col("rn") >= F.ceil(0.99 * F.col("cnt")).cast("long")
        )
        .groupBy("event_type")
        .agg(F.min("value").alias("p99_v"))
    )
    return (
        ranked.join(F.broadcast(p99), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.least(F.col("value"), F.col("p99_v")).alias("value_capped"),
        )
    )


@register(
    "events_value_normalized",
    oracle="""
WITH b AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       CASE WHEN b.hi > b.lo
            THEN (e.value - b.lo) / (b.hi - b.lo) END AS value_norm
FROM events e JOIN b ON e.event_type = b.event_type
""",
)
def events_value_normalized(spark, sf_dir):
    """Per-type min-max feature scaling: two IEEE subtractions and one
    division per row over broadcast group bounds — bit-portable
    (unlike mean/std scaling, whose cross-row float sums are not).
    Degenerate groups (hi == lo) yield NULL."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.when(
                F.col("hi") > F.col("lo"),
                (F.col("value") - F.col("lo"))
                / (F.col("hi") - F.col("lo")),
            ).alias("value_norm"),
        )
    )


# ---- eval & sequence analytics --------------------------------------------

from wikipedia_data_pipeline_spark.queries.text_queries import _SCORES


@register(
    "text_langid_confusion",
    oracle=f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, lang, {_SCORES} FROM t),
p AS (
  SELECT lang,
         CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
              WHEN score_de = greatest(score_de, score_en, score_es, score_fr) THEN 'de'
              WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
              WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
              ELSE 'fr' END AS predicted_lang
  FROM s
)
SELECT lang, predicted_lang, count(*) AS n
FROM p GROUP BY lang, predicted_lang
""",
)
def text_langid_confusion(spark, sf_dir):
    """Classifier-eval confusion matrix: metadata language label vs
    the stopword-overlap language-ID prediction, counted per (label,
    prediction) cell — the accuracy report a pipeline runs on every
    heuristic gate. One narrow scoring map + one hash agg."""
    from wikipedia_data_pipeline_spark.operators import textstats as TS5

    return (
        TS5.language_id(load_table(spark, sf_dir, "documents"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "orders_priority_transitions",
    oracle="""
WITH seq AS (
  SELECT o_custkey, o_orderpriority,
         lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
           AS prev_priority
  FROM orders
)
SELECT prev_priority, o_orderpriority AS next_priority, count(*) AS n
FROM seq WHERE prev_priority IS NOT NULL
GROUP BY prev_priority, next_priority
""",
)
def orders_priority_transitions(spark, sf_dir):
    """First-order transition matrix over each customer's order
    priority sequence (lag window per customer + pair counts) — the
    Markov-style sequence profile behind churn/behavior models. One
    window shuffle on the customer key, one hash agg."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderpriority",
            F.lag("o_orderpriority").over(w).alias("prev_priority"),
        )
        .where(F.col("prev_priority").isNotNull())
        .groupBy(
            "prev_priority",
            F.col("o_orderpriority").alias("next_priority"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_word_cooccurrence",
    oracle="""
WITH dw AS (
  SELECT DISTINCT doc_id,
         lower(regexp_replace(x, '[^a-zA-Z]', '', 'g')) AS word
  FROM documents, unnest(string_split(text, ' ')) AS u(x)
  WHERE length(lower(regexp_replace(x, '[^a-zA-Z]', '', 'g'))) > 0
)
SELECT a.word AS w1, b.word AS w2, count(*) AS n_docs
FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.word < b.word
GROUP BY a.word, b.word
""",
)
def text_word_cooccurrence(spark, sf_dir):
    """Document-level word co-occurrence counts (the raw relation
    under PMI embeddings / distributional semantics): distinct
    (doc, word) pairs self-joined on doc_id with w1 < w2. The join
    shuffles on doc_id — bounded per-doc fan-out of |vocab_doc|^2;
    at open-vocabulary scale the same query composes with the df cap
    (prefix filter) the similarity join uses."""
    from wikipedia_data_pipeline_spark.operators import text as T3

    dw = (
        T3.tokenize(load_table(spark, sf_dir, "documents"))
        .distinct()
        .persist()
    )
    a = dw.alias("a")
    b = dw.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .groupBy(
            F.col("a.word").alias("w1"), F.col("b.word").alias("w2")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "customer_rfm_segments",
    oracle="""
WITH agg AS (
  SELECT o_custkey,
         max(CAST(o_orderdate AS DATE)) AS last_order,
         count(*) AS frequency,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
           AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, last_order, frequency, monetary,
       CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS BIGINT)
         AS r_quartile,
       CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT)
         AS f_quartile,
       CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT)
         AS m_quartile
FROM agg
""",
)
def customer_rfm_segments(spark, sf_dir):
    """RFM customer scoring: recency/frequency/monetary per customer,
    quartiled with customer-key tiebreaks (total orders ->
    deterministic quartiles). One hash agg over orders collapses the
    fact table to |customers| rows; each quartile is then
    ``operators.ranks.global_ntile`` — the hierarchical two-level scan
    — instead of an unpartitioned ntile window, because |customers| at
    100 TB is 1e8+ and a global ntile window plans as a
    single-partition sort over the whole entity relation. Three
    independent orders → three range-partitioned passes over the
    customer-sized aggregate (each ~2 shuffles of entity rows — cheap
    next to the fact-table agg, and every pass is fully parallel).
    """
    from wikipedia_data_pipeline_spark.functions import dec_sum
    from wikipedia_data_pipeline_spark.operators.ranks import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        dec_sum("o_totalprice", "monetary"),
    )
    seg = global_ntile(
        agg, [F.desc("last_order"), F.asc("o_custkey")], 4, "r_quartile"
    )
    seg = global_ntile(
        seg, [F.desc("frequency"), F.asc("o_custkey")], 4, "f_quartile"
    )
    seg = global_ntile(
        seg, [F.desc("monetary"), F.asc("o_custkey")], 4, "m_quartile"
    )
    return seg.select(
        "o_custkey",
        "last_order",
        "frequency",
        "monetary",
        "r_quartile",
        "f_quartile",
        "m_quartile",
    )


@register(
    "events_rolling_active_users",
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day,
       count(DISTINCT u.user_id) AS wau,
       CAST(count(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END)
            AS BIGINT) AS dau
FROM days d JOIN du u
  ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
GROUP BY d.day
""",
)
def events_rolling_active_users(spark, sf_dir):
    """DAU and rolling 7-day WAU per day — rolling DISTINCT counts,
    which no window frame can express exactly. Scale shape: collapse
    the fact table to the tiny distinct (day, user) state first, then
    a bounded 7-day range join against the day spine re-counts
    distinct users per window. The range join fans each state row out
    at most 7x; the fact table is scanned once."""
    ev = load_table(spark, sf_dir, "events")
    du = (
        ev.select(
            F.date_trunc("day", F.timestamp_micros(F.col("ts")))
            .cast("date")
            .alias("day"),
            "user_id",
        )
        .distinct()
        .persist()
    )
    days = du.select("day").distinct()
    u = du.select(F.col("day").alias("u_day"), "user_id")
    return (
        days.join(
            u,
            (F.col("u_day") <= F.col("day"))
            & (F.col("u_day") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(
            F.countDistinct("user_id").alias("wau"),
            F.countDistinct(
                F.when(F.col("u_day") == F.col("day"), F.col("user_id"))
            ).cast("long").alias("dau"),
        )
    )


@register(
    "order_ship_delay_histogram",
    oracle="""
SELECT l.l_returnflag,
       CAST(least(greatest(date_diff('day', CAST(o.o_orderdate AS DATE),
                                     CAST(l.l_shipdate AS DATE)), 0) // 7, 20)
            AS BIGINT) AS delay_weeks_bucket,
       count(*) AS n
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
""",
)
def order_ship_delay_histogram(spark, sf_dir):
    """Order-to-ship latency distribution: integer day difference
    bucketed by week (top bucket clamped), grouped by return flag —
    the fulfillment-latency profile over the big fact join. Integer
    arithmetic end-to-end; the join shuffles on the order key with
    map-side partial aggregation after."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", F.col("l_shipdate").cast("date").alias("ship_d")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("order_d")
    )
    # Negative delays (data glitches) clamp to bucket 0 — also keeps
    # the bucket arithmetic on non-negative ints, where floor and
    # truncating division agree across engines.
    bucket = F.least(
        F.floor(
            F.greatest(
                F.datediff(F.col("ship_d"), F.col("order_d")), F.lit(0)
            )
            / 7
        ),
        F.lit(20),
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_returnflag", bucket.alias("delay_weeks_bucket"))
        .groupBy("l_returnflag", "delay_weeks_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_interarrival_histogram",
    oracle="""
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS tus,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_tus
  FROM events
)
SELECT CAST(least((tus - prev_tus) // 60000000 // 10, 20) AS BIGINT)
         AS gap_10min_bucket,
       count(*) AS n
FROM seq WHERE prev_tus IS NOT NULL
GROUP BY 1
""",
)
def events_interarrival_histogram(spark, sf_dir):
    """Inter-event gap distribution per user (lag over the user
    window, gaps bucketed in 10-minute bins, clamped) — the traffic
    profile that calibrates sessionization gaps and state TTLs.
    Integer µs arithmetic; one window shuffle on user_id, one hash
    agg."""
    from pyspark.sql import Window
    from wikipedia_data_pipeline_spark.functions import ts_us

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        ts_us().alias("tus"),
        F.lag(ts_us()).over(w).alias("prev_tus"),
    ).where(F.col("prev_tus").isNotNull())
    gap_bucket = F.least(
        F.floor(F.floor((F.col("tus") - F.col("prev_tus")) / 60_000_000) / 10),
        F.lit(20),
    ).cast("long")
    return (
        seq.select(gap_bucket.alias("gap_10min_bucket"))
        .groupBy("gap_10min_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_peak_event_per_user",
    oracle="""
SELECT user_id, event_id AS peak_event_id, value AS peak_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY value DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def events_peak_event_per_user(spark, sf_dir):
    """Per-user argmax via max_by aggregation — ONE hash agg with
    map-side partials, the scale-preferred shape for 'row with the
    max' (a row_number window would sort every user's events; max_by
    keeps a single running champion per key). Composite (value,
    event_id) order makes ties deterministic."""
    ev = load_table(spark, sf_dir, "events")
    ord_key = F.struct(
        F.col("value"), F.col("event_id").cast("double")
    )
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", ord_key).alias("peak_event_id"),
        F.max_by("value", ord_key).alias("peak_value"),
    )


@register(
    "events_path_signatures",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
),
paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM seq WHERE rn <= 10 GROUP BY user_id
)
SELECT path, count(*) AS n_users
FROM paths GROUP BY path
""",
)
def events_path_signatures(spark, sf_dir):
    """Behavioral path signatures: each user's first 10 events as an
    ordered type string, counted across users — the journey-mining
    aggregation behind funnel discovery. One window shuffle on
    user_id (rank + truncate), then per-user ordered array_join and a
    signature count; the concat order is declared, so the signature is
    deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 10)
    )
    paths = (
        seq.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "lineitem_point_in_time_join",
    oracle="""
WITH iv AS (
  SELECT o_custkey, o_orderkey AS era_orderkey,
         CAST(o_orderdate AS DATE) AS valid_from,
         CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
              AS DATE) AS valid_to
  FROM orders
),
fact AS (
  SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
         CAST(l.l_shipdate AS DATE) AS ship_d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT f.l_orderkey, f.l_linenumber, f.o_custkey, f.ship_d,
       iv.era_orderkey
FROM fact f JOIN iv
  ON f.o_custkey = iv.o_custkey
 AND f.ship_d >= iv.valid_from
 AND (iv.valid_to IS NULL OR f.ship_d < iv.valid_to)
""",
)
def lineitem_point_in_time_join(spark, sf_dir):
    """Point-in-time (AS OF) join against the SCD2 dimension: each
    shipped line item matched to the order-era its customer was in at
    ship time (intervals from the lead-window SCD2 build; a late
    shipment can land in a LATER era than its own order). The interval
    predicate joins on the customer key plus a range — per-key
    interval lists are small, so the shuffle equi-part dominates and
    the range check is a post-filter, the standard warehouse PIT
    shape."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    iv = orders.select(
        F.col("o_custkey").alias("iv_custkey"),
        F.col("o_orderkey").alias("era_orderkey"),
        F.col("o_orderdate").cast("date").alias("valid_from"),
        F.lead("o_orderdate").over(w).cast("date").alias("valid_to"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("ship_d"),
    )
    fact = li.join(
        orders.select("o_orderkey", "o_custkey"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey", "l_linenumber", "o_custkey", "ship_d")
    return fact.join(
        iv,
        (F.col("o_custkey") == F.col("iv_custkey"))
        & (F.col("ship_d") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ship_d") < F.col("valid_to"))),
    ).select("l_orderkey", "l_linenumber", "o_custkey", "ship_d", "era_orderkey")


@register(
    "data_quality_report",
    oracle="""
SELECT 'orphan_lineitems' AS check_name,
       count(*) AS n_violations
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orphan_orders_customer', count(*)
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'nonpositive_extendedprice', count(*)
FROM lineitem WHERE l_extendedprice <= 0
UNION ALL
SELECT 'null_shipdate', count(*)
FROM lineitem WHERE l_shipdate IS NULL
UNION ALL
SELECT 'discount_out_of_range', count(*)
FROM lineitem WHERE l_discount < 0 OR l_discount > 1
""",
)
def data_quality_report(spark, sf_dir):
    """Data-contract validation: referential integrity (anti joins)
    and range checks, one row per check with its violation count —
    the report a pipeline publishes before promoting a batch. Anti
    joins broadcast the key side where small; each check is a
    count-only aggregate so the union is five tiny rows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def count_df(name, df):
        return df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    checks = [
        count_df(
            "orphan_lineitems",
            li.join(
                orders.select("o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ),
        ),
        count_df(
            "orphan_orders_customer",
            orders.join(
                customer.select("c_custkey"),
                orders.o_custkey == F.col("c_custkey"),
                "left_anti",
            ),
        ),
        count_df(
            "nonpositive_extendedprice",
            li.where(F.col("l_extendedprice") <= 0),
        ),
        count_df("null_shipdate", li.where(F.col("l_shipdate").isNull())),
        count_df(
            "discount_out_of_range",
            li.where((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@register(
    "revenue_mom_change",
    oracle="""
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT month, revenue,
       lag(revenue) OVER (ORDER BY month) AS prev_revenue,
       CASE WHEN lag(revenue) OVER (ORDER BY month) IS NOT NULL
            THEN (revenue - lag(revenue) OVER (ORDER BY month))
                 / lag(revenue) OVER (ORDER BY month) END AS mom_change
FROM m
""",
)
def revenue_mom_change(spark, sf_dir):
    """Month-over-month revenue delta: decimal-exact monthly sums,
    then a lag window over the month-sized aggregate with one IEEE
    subtraction and division per row — period-over-period reporting
    with engine-portable numbers."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    from wikipedia_data_pipeline_spark.functions import dec_sum

    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(dec_sum("o_totalprice", "revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        F.when(
            prev.isNotNull(), (F.col("revenue") - prev) / prev
        ).alias("mom_change"),
    )


@register(
    "market_basket_pairs",
    oracle="""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*) AS n_orders
FROM op a JOIN op b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT 100
""",
)
def market_basket_pairs(spark, sf_dir):
    """Frequent co-purchased part pairs (the candidate-generation step
    of market-basket/apriori mining): distinct (order, part) self-join
    on the order key with an ordered-pair predicate — per-order
    fan-out is bounded by basket size squared, so the join scales with
    orders, not parts. Top-100 by support via TakeOrdered."""
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .persist()
    )
    a = op.alias("a")
    b = op.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(100)
    )


@register(
    "revenue_concentration_deciles",
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY o_custkey
),
dec AS (
  SELECT o_custkey, revenue,
         CAST(ntile(10) OVER (ORDER BY revenue DESC, o_custkey)
              AS BIGINT) AS decile
  FROM cust
),
tot AS (
  SELECT CAST(sum(CAST(revenue AS DECIMAL(18,6))) AS DOUBLE) AS total
  FROM dec
)
SELECT decile, count(*) AS n_customers,
       CAST(sum(CAST(revenue AS DECIMAL(18,6))) AS DOUBLE)
         AS revenue_total,
       CAST(sum(CAST(revenue AS DECIMAL(18,6))) AS DOUBLE)
         / (SELECT total FROM tot) AS revenue_share
FROM dec GROUP BY decile
""",
)
def revenue_concentration_deciles(spark, sf_dir):
    """Revenue concentration (whale curve): customers ranked into
    revenue deciles, each decile's share of total — decimal-routed
    sums at every level so the shares are bit-portable. The decile
    assignment is ``operators.ranks.global_ntile`` (hierarchical
    range-partitioned scan over the customer-sized aggregate) — never
    an unpartitioned ntile window, which would serialize 1e8+ entity
    rows through one task at 100 TB."""
    from wikipedia_data_pipeline_spark.functions import dec_sum
    from wikipedia_data_pipeline_spark.operators.ranks import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        dec_sum("o_totalprice", "revenue")
    )
    dec = global_ntile(
        cust, [F.desc("revenue"), F.asc("o_custkey")], 10, "decile"
    )
    total = dec.agg(
        F.sum(F.col("revenue").cast("decimal(18,6)"))
        .cast("double")
        .alias("total")
    )
    return (
        dec.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec_sum("revenue", "revenue_total"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_customers",
            "revenue_total",
            (F.col("revenue_total") / F.col("total")).alias("revenue_share"),
        )
    )


@register(
    "events_burst_users",
    oracle="""
WITH mb AS (
  SELECT user_id, epoch_us(ts) // 60000000 AS minute_bucket,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, CAST(max(n) AS BIGINT) AS peak_per_minute,
       CAST(count(*) AS BIGINT) AS n_active_minutes
FROM mb GROUP BY user_id
HAVING max(n) >= 2
""",
)
def events_burst_users(spark, sf_dir):
    """Bot/abuse heuristic: users whose peak per-minute event rate
    crosses a threshold — two stacked integer aggregations (user ×
    minute counts, then per-user peak), both with map-side partials;
    the rate-limit screen an event pipeline runs before modeling."""
    from wikipedia_data_pipeline_spark.functions import ts_us

    ev = load_table(spark, sf_dir, "events")
    mb = (
        ev.select(
            "user_id",
            F.floor(ts_us() / 60_000_000).alias("minute_bucket"),
        )
        .groupBy("user_id", "minute_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        mb.groupBy("user_id")
        .agg(
            F.max("n").alias("peak_per_minute"),
            F.count(F.lit(1)).alias("n_active_minutes"),
        )
        .where(F.col("peak_per_minute") >= 2)
    )


@register(
    "dedup_cluster_size_histogram",
    oracle="""
WITH g AS (SELECT md5(text) AS h, count(*) AS sz FROM documents GROUP BY 1)
SELECT CAST(least(sz, 10) AS BIGINT) AS cluster_size, count(*) AS n_clusters
FROM g GROUP BY 1
""",
)
def dedup_cluster_size_histogram(spark, sf_dir):
    """Exact-duplicate cluster-size distribution (clamped at 10+) —
    the dedup health metric that says whether duplication is a few
    giant clusters (boilerplate) or a long tail (mirrors). Two stacked
    hash aggs over content fingerprints."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        g.select(F.least(F.col("sz"), F.lit(10)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )


@register(
    "part_brand_return_rates",
    oracle="""
SELECT p.p_brand,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returned,
       CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS return_rate
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
)
def part_brand_return_rates(spark, sf_dir):
    """Return rate per part brand: the fact table joins the broadcast
    part dimension, one hash agg, a single IEEE division per brand —
    the product-quality report over the biggest join in the schema."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias(
                "n_returned"
            ),
        )
        .select(
            "p_brand",
            "n_lines",
            "n_returned",
            (
                F.col("n_returned").cast("double")
                / F.col("n_lines").cast("double")
            ).alias("return_rate"),
        )
    )


@register(
    "window_rank_variants",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist() OVER w AS cdist
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
""",
)
def window_rank_variants(spark, sf_dir):
    """The full ranking-function family in one pass: rank, dense_rank,
    percent_rank, cume_dist per nation (total order via the key
    tiebreak; the two ratio functions are integer-over-integer
    divisions, so they compare bit-exactly). One window shuffle."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "window_value_picks",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_price,
       nth_value(o_totalprice, 2) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_value_picks(spark, sf_dir):
    """first_value / last_value / nth_value with explicit full-frame
    bounds (the default frame silently truncates last/nth at the
    current row — the classic window gotcha, stated explicitly here
    and in the oracle). One window shuffle on the customer key."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    full = base.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.first("o_totalprice").over(base).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
    )


@register("incremental_distinct_users_hll")  # approximate by design: no oracle
def incremental_distinct_users_hll(spark, sf_dir):
    """HLL-sketch twin of incremental_distinct_users: per-day sketches
    built on two event slices, union-merged, estimate served. The
    sketch state is bounded-size per key at any cardinality — the
    100 TB path where the exact membership state outgrows the data.
    Approximate, so driver rows-checks it; pytest bounds the error
    against the exact path."""
    from wikipedia_data_pipeline_spark.operators import incremental as I

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.timestamp_micros(F.col("ts")))
        .cast("date")
        .alias("day"),
        "user_id",
        "ts",
    )
    split_us = 1_705_276_800_000_000
    states = [
        I.hll_distinct_state(
            ev.where(F.col("ts") < split_us), ["day"], "user_id"
        ),
        I.hll_distinct_state(
            ev.where(F.col("ts") >= split_us), ["day"], "user_id"
        ),
    ]
    return I.merge_hll_states(states, ["day"])


from wikipedia_data_pipeline_spark.queries.similarity_queries import COS_SQL


@register(
    "embedding_centroid_distances",
    oracle=f"""
WITH comp AS (
  SELECT label, g - 1 AS pos,
         CAST(sum(CAST(CAST(embedding[g] AS DOUBLE) AS DECIMAL(18,6)))
              AS DOUBLE) / count(*) AS mean_x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(g)
  GROUP BY label, pos
),
cent AS (
  SELECT label, list(mean_x ORDER BY pos) AS c FROM comp GROUP BY label
)
SELECT a.label AS label_a, b.label AS label_b,
       {COS_SQL.format(a='a.c', b='b.c')} AS cos
FROM cent a JOIN cent b ON a.label < b.label
""",
)
def embedding_centroid_distances(spark, sf_dir):
    """Label-centroid separation matrix: decimal-exact centroid
    components (the label_centroids construction) assembled into
    ordered arrays, then pairwise cosine via the deterministic
    sequential fold — the cluster-separability report behind embedding
    QA. The pair join runs over |labels| rows; everything heavy is the
    one component aggregation."""
    from wikipedia_data_pipeline_spark.functions import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    comp = (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(
            (
                F.sum(F.col("x").cast("double").cast("decimal(18,6)"))
                .cast("double")
                / F.count("*")
            ).alias("mean_x")
        )
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean_x"))),
            lambda s: s["mean_x"],
        ).alias("c")
    )
    a = cent.select(
        F.col("label").alias("label_a"), F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("label_b"), F.col("c").alias("cb")
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            cosine_similarity(F.col("ca"), F.col("cb")).alias("cos"),
        )
    )


# --- Graph family (round 5): fixed-point PageRank + degree profile ------

_PR_EDGES_SQL = """
  SELECT DISTINCT 'p:' || CAST(l_partkey AS VARCHAR) AS src,
                  's:' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM lineitem
"""


def _pagerank_oracle(iterations: int = 3) -> str:
    """Unrolled-CTE DuckDB twin of operators.graph.pagerank_fixed_point
    (scale 1e6, damping 85%). Kept programmatic so the Spark loop and
    the SQL unrolling can't drift on iteration count."""
    ctes = [
        f"edges AS ({_PR_EDGES_SQL})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT n.node,
         CAST(150000 + COALESCE((85 * s.mass) // 100, 0) AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(sum(r.pr // o.outdeg) AS BIGINT) AS mass
    FROM edges e
    JOIN r{i - 1} r ON e.src = r.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s ON n.node = s.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, pr AS pr_rank FROM r{iterations}"
        "\nORDER BY pr_rank DESC, node ASC"
    )


@register("graph_pagerank_partsupp", oracle=_pagerank_oracle(3))
def graph_pagerank_partsupp(spark, sf_dir):
    """Fixed-point PageRank (3 iterations, damping 0.85) over the
    directed part→supplier purchase graph distilled from lineitem.
    Integer-scaled ranks make the iteration bit-reproducible under any
    partitioning — the property that lets an iterative graph algorithm
    carry an exact SQL oracle at all. Edges are shuffled on src once
    and persisted; each iteration joins the node-sized rank relation
    against that layout (see operators/graph.py for the cost model)."""
    from wikipedia_data_pipeline_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()
    ranks = G.pagerank_fixed_point(edges, iterations=3)
    return ranks.select("node", F.col("rank").alias("pr_rank")).orderBy(
        F.desc("pr_rank"), F.asc("node")
    )


@register(
    "graph_degree_profile",
    oracle=f"""
WITH edges AS ({_PR_EDGES_SQL}),
o AS (SELECT src AS node, count(*) AS out_degree FROM edges GROUP BY src),
i AS (SELECT dst AS node, count(*) AS in_degree FROM edges GROUP BY dst)
SELECT COALESCE(o.node, i.node) AS node,
       COALESCE(out_degree, 0) AS out_degree,
       COALESCE(in_degree, 0) AS in_degree
FROM o FULL OUTER JOIN i ON o.node = i.node
ORDER BY node
""",
)
def graph_degree_profile(spark, sf_dir):
    """Per-node in/out degree of the part→supplier graph — the skew
    diagnostic run before any iterative graph job (a hot dst node
    predicts a hot reducer in every PageRank aggregate)."""
    from wikipedia_data_pipeline_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()
    return G.degree_profile(edges).orderBy("node")


# --- LM-quality scoring, temporal split, outlier screen (round 5) -------

@register(
    "text_unigram_surprisal",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(list_transform(string_split(text, ' '),
           x -> lower(regexp_replace(x, '[^a-zA-Z]', '', 'g'))),
           w -> length(w) > 0)) AS word
  FROM documents
),
vocab AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
ws AS (
  SELECT word,
         CAST(round(log2(CAST(total AS DOUBLE) / CAST(cnt AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS surp
  FROM vocab, tot
)
SELECT t.doc_id, count(*) AS n_tokens,
       round(CAST(sum(surp) AS DOUBLE) / count(*), 6) AS bits_per_token
FROM toks t JOIN ws USING (word)
GROUP BY t.doc_id
""",
)
def text_unigram_surprisal(spark, sf_dir):
    """Mean unigram surprisal per document (bits/token) under the
    corpus unigram LM — the perplexity-lite corpus quality gate. See
    operators/textstats.py:unigram_surprisal for the cost model."""
    from wikipedia_data_pipeline_spark.operators import textstats as TS2

    return TS2.unigram_surprisal(load_table(spark, sf_dir, "documents"))


_US_PER_DAY = 86_400_000_000


@register(
    "sample_time_split_events",
    oracle=f"""
WITH t0 AS (SELECT min(epoch_us(ts)) AS ts0 FROM events)
SELECT event_id, user_id,
       (epoch_us(ts) - ts0) // {_US_PER_DAY} AS day_idx,
       CASE WHEN (epoch_us(ts) - ts0) // {_US_PER_DAY} < 24 THEN 'train'
            WHEN (epoch_us(ts) - ts0) // {_US_PER_DAY} < 27 THEN 'val'
            ELSE 'test' END AS split
FROM events, t0
""",
)
def sample_time_split_events(spark, sf_dir):
    """Temporal train/val/test split of the event stream: day index
    from the stream's own epoch start, first 24 days train / next 3
    val / rest test. For forecasting-style models a HASH split leaks
    the future into training — the cut must be on time. The global min
    is a 1-row aggregate broadcast onto a narrow map; integer-µs
    arithmetic keeps the assignment exact and engine-portable."""
    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min("ts").alias("ts0"))
    day_idx = F.expr(f"(ts - ts0) div {_US_PER_DAY}")
    return ev.crossJoin(F.broadcast(t0)).select(
        "event_id",
        "user_id",
        day_idx.alias("day_idx"),
        F.when(day_idx < 24, "train")
        .when(day_idx < 27, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "events_user_value_outliers",
    oracle="""
WITH s AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
              AS DOUBLE) AS s2
  FROM events GROUP BY user_id
)
SELECT event_id, e.user_id, value, n
FROM events e JOIN s ON e.user_id = s.user_id
WHERE 100 * (value * n - s1) * (value * n - s1) > 625 * (n * s2 - s1 * s1)
""",
)
def events_user_value_outliers(spark, sf_dir):
    """Per-user z-score outlier screen (|x − μ| > 2.5σ) without ever
    computing μ or σ: the predicate is cross-multiplied to
    (x·n − Σx)² · 100 > 625 · (n·Σx² − (Σx)²), so the only aggregates
    are decimal-exact (Σx, Σx², n) and every remaining operation is a
    single deterministic IEEE op on identical scalars in both engines
    — sqrt-free variance screening that is also bit-reproducible
    across cluster sizes. One shuffle for the per-user moments (tiny),
    then a broadcast join back onto the stream."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    s = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    j = ev.join(F.broadcast(s), "user_id")
    dev = F.col("value") * F.col("n") - F.col("s1")
    return j.filter(
        100 * dev * dev
        > 625 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
    ).select("event_id", "user_id", "value", "n")


@register(
    "streaming_view_click_left_join",
    oracle="""
WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS view_us
           FROM events WHERE event_type = 'view'),
c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_us
      FROM events WHERE event_type = 'click'),
wm AS (SELECT least((SELECT max(view_us) FROM v),
                    (SELECT max(click_us) FROM c)) - 7200000000 AS w),
pairs AS (
  SELECT v.view_id, c.click_id, v.user_id, v.view_us, c.click_us
  FROM v JOIN c ON v.user_id = c.user_id
   AND c.click_us BETWEEN v.view_us AND v.view_us + 3600000000
)
SELECT * FROM pairs
UNION ALL
SELECT v.view_id, NULL::BIGINT AS click_id, v.user_id, v.view_us,
       NULL::BIGINT AS click_us
FROM v, wm
WHERE v.view_id NOT IN (SELECT view_id FROM pairs)
  AND v.view_us + 3600000000 < wm.w
""",
)
def streaming_view_click_left_join(spark, sf_dir):
    """Watermarked stream-stream LEFT OUTER interval join (views that
    did or did not convert within the hour). The oracle replays
    Structured Streaming's exact emission rule: matched pairs always;
    null-extended views only once their join window has aged below the
    final global watermark, which is min(max event time per input
    stream) − the 2h delay — the multiple-watermark min policy. Views
    still inside that horizon at end-of-stream are withheld, exactly as
    a live stream would withhold them for the next trigger."""
    from wikipedia_data_pipeline_spark.streaming import pipeline as SP

    return SP.run_view_click_left_join(spark, sf_dir)


# --- Count-Min sketch + TF-IDF text search (round 5) --------------------

from wikipedia_data_pipeline_spark.queries.tfidf_queries import (  # noqa: E402
    DOC_TF_CTES,
    TOKS_CTE,
)


@register(
    "sketch_count_min_words",
    oracle=f"""
WITH {TOKS_CTE},
{P.sql_cms_estimates('toks', width=16)}
SELECT word, n_exact, n_cms FROM cms
ORDER BY n_exact DESC, word ASC
""",
)
def sketch_count_min_words(spark, sf_dir):
    """Count-Min sketch (d=4, w=16) of corpus word frequencies probed
    with the vocabulary itself: (word, exact count, CMS estimate). The
    deliberately narrow width forces collisions so the report SHOWS the
    CMS property (n_cms ≥ n_exact, equality where no collision) —
    operators/profiling.py:cms_estimates documents the mergeable d×w
    construction that makes this the bounded-memory frequency sketch
    for streams and shuffles at any corpus size."""
    from wikipedia_data_pipeline_spark.operators.text import tokenize

    toks = tokenize(load_table(spark, sf_dir, "documents"))
    vocab = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    return P.cms_estimates(vocab, width=16).orderBy(
        F.desc("n_exact"), F.asc("word")
    )


_SEARCH_TERMS = ["hash", "join", "spark", "dup"]


@register(
    "text_search_tfidf",
    oracle=f"""
WITH {DOC_TF_CTES},
dfreq AS (
    SELECT word, count(*) AS df
    FROM (SELECT DISTINCT doc_id, word FROM toks) GROUP BY word
),
ndocs AS (SELECT count(*) AS n_docs FROM documents),
idf AS (
    SELECT word, round(log10(CAST(n_docs AS DOUBLE) / df), 2) AS idf
    FROM dfreq, ndocs
    WHERE round(log10(CAST(n_docs AS DOUBLE) / df), 2) > 0
),
tfidf AS (
    SELECT t.doc_id, t.word, round(t.tf * i.idf, 2) AS tf_idf
    FROM doc_tf t JOIN idf i ON t.word = i.word
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_terms_hit,
       CAST(sum(CAST(tf_idf AS DECIMAL(18,6))) AS DOUBLE) AS score
FROM tfidf
WHERE word IN ({", ".join(f"'{w}'" for w in _SEARCH_TERMS)})
GROUP BY doc_id
ORDER BY score DESC, n_terms_hit DESC, doc_id ASC
LIMIT 20
""",
)
def text_search_tfidf(spark, sf_dir):
    """Ranked keyword search over the TF-IDF index: score(doc) =
    Σ tf_idf of the query terms it contains, top-20 by score. The
    query-term filter is a constant IN-set pushed below the index join,
    so the scan touches only the postings of the query's words — the
    searcher's cost is proportional to posting-list length, not corpus
    size (and the final top-k is a TakeOrdered, no global sort)."""
    from wikipedia_data_pipeline_spark.functions import dec_sum
    from wikipedia_data_pipeline_spark.operators import tfidf as T

    docs = load_table(spark, sf_dir, "documents")
    hits = T.tfidf(docs).filter(F.col("word").isin(_SEARCH_TERMS))
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            dec_sum("tf_idf", "score"),
        )
        .orderBy(F.desc("score"), F.desc("n_terms_hit"), F.asc("doc_id"))
        .limit(20)
    )


def _lpa_oracle(iterations: int = 2) -> str:
    """Unrolled-CTE twin of operators.graph.label_propagation."""
    ctes = [
        f"edges AS ({_PR_EDGES_SQL})",
        """und AS (
  SELECT src AS node, dst AS nbr FROM edges
  UNION
  SELECT dst AS node, src AS nbr FROM edges
)""",
        "l0 AS (SELECT DISTINCT node, node AS label FROM und)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""l{i} AS (
  SELECT node, label FROM (
    SELECT u.node, l.label, count(*) AS n,
           row_number() OVER (PARTITION BY u.node
                              ORDER BY count(*) DESC, l.label ASC) AS rn
    FROM und u JOIN l{i - 1} l ON u.nbr = l.node
    GROUP BY u.node, l.label
  ) WHERE rn = 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, label FROM l{iterations} ORDER BY node"
    )


@register("graph_label_propagation", oracle=_lpa_oracle(2))
def graph_label_propagation(spark, sf_dir):
    """Deterministic majority-label propagation (2 synchronous rounds,
    smallest-label tie-break) over the undirected part–supplier graph —
    the community-detection companion to PageRank. See
    operators/graph.py:label_propagation for why the tie-break and the
    fixed round count are what make a graph heuristic reproducible at
    cluster scale."""
    from wikipedia_data_pipeline_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()
    return G.label_propagation(edges, iterations=2).orderBy("node")


# --- Exact prefix-filter similarity join (round 5) ----------------------

from wikipedia_data_pipeline_spark.queries.dedup_queries import (  # noqa: E402
    SHINGLE_PAIRS_SQL,
)


@register("dedup_prefix_filter", oracle=SHINGLE_PAIRS_SQL)
def dedup_prefix_filter(spark, sf_dir):
    """AllPairs/PPJoin prefix-filtered EXACT Jaccard ≥ 0.5 join — zero
    false negatives by construction (unlike LSH's probabilistic
    guarantee), candidates bounded by rare-shingle postings. Shares the
    brute-force oracle with dedup_minhash_lsh: all three near-dup paths
    must produce the identical pair set."""
    return D.prefix_filter_pairs(
        load_table(spark, sf_dir, "documents"), 0.5
    )


# --- ML feature prep + privacy screen (round 5) -------------------------

_FH_DIM = 64


@register(
    "features_hash_encoded",
    oracle=f"""
WITH feats AS (
  SELECT doc_id, 'lang:' || lang AS f FROM documents
  UNION ALL
  SELECT doc_id, 'source:' || source AS f FROM documents
)
SELECT doc_id,
       CAST((({P.sql_cms_word_key('f')} % {P.CMS_PRE_MOD})
             * {P.CMS_SEEDS[0][0]} + {P.CMS_SEEDS[0][1]})
            % {P.CMS_HASH_MOD} % {_FH_DIM} AS BIGINT) AS feature_idx,
       CAST(count(*) AS BIGINT) AS feature_val
FROM feats
GROUP BY 1, 2
""",
)
def features_hash_encoded(spark, sf_dir):
    """The hashing trick (Weinberger et al. 2009): categorical columns
    → a fixed-width sparse feature space via a portable hash of
    'column:value', collisions summing — the encoder that needs NO
    vocabulary pass, no fit/transform state, and no driver-side
    dictionary, which is why it's the default categorical encoder at
    100 TB (a one-pass narrow map; new category values never change
    the schema). Output is the sparse (row, feature_idx, value)
    relation."""
    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id", F.concat(F.lit("lang:"), F.col("lang")).alias("f")
    ).unionAll(
        docs.select(
            "doc_id", F.concat(F.lit("source:"), F.col("source")).alias("f")
        )
    )
    mult, add = P.CMS_SEEDS[0]
    idx = (
        (P.cms_word_key(F.col("f")) % P.CMS_PRE_MOD) * F.lit(mult) + F.lit(add)
    ) % P.CMS_HASH_MOD % _FH_DIM
    return (
        feats.select("doc_id", idx.cast("long").alias("feature_idx"))
        .groupBy("doc_id", "feature_idx")
        .agg(F.count(F.lit(1)).alias("feature_val"))
    )


@register(
    "features_target_encode_loo",
    oracle="""
WITH s AS (
  SELECT o_orderpriority,
         count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS tot
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderkey, o.o_orderpriority,
       CASE WHEN n > 1
            THEN CAST(tot - CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE)
                 / (n - 1) END AS loo_target_mean
FROM orders o JOIN s ON o.o_orderpriority = s.o_orderpriority
""",
)
def features_target_encode_loo(spark, sf_dir):
    """Leave-one-out target encoding of a categorical column (category
    → mean target over the OTHER rows of the category — the standard
    leakage guard for target encoding). (Σ−y)/(n−1) needs only the
    per-category decimal-exact (n, Σ) broadcast back onto the fact
    rows: no window, no per-row re-aggregation, bit-reproducible."""
    orders = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,6)")
    s = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum(dec).alias("tot")
    )
    return orders.join(F.broadcast(s), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        F.when(
            F.col("n") > 1,
            (F.col("tot") - dec).cast("double") / (F.col("n") - 1),
        ).alias("loo_target_mean"),
    )


@register(
    "privacy_k_anonymity",
    oracle="""
SELECT lang, source, n_chars // 100 AS len_bucket,
       count(*) AS group_size,
       count(*) < 5 AS reidentification_risk
FROM documents
GROUP BY 1, 2, 3
ORDER BY group_size ASC, lang, source, len_bucket
""",
)
def privacy_k_anonymity(spark, sf_dir):
    """k-anonymity audit over the quasi-identifier tuple (lang, source,
    length bucket): any equivalence class smaller than k=5 is a
    re-identification risk the release pipeline must generalize or
    suppress. One hash aggregate over the quasi-identifiers — the
    audit costs one scan at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "lang",
            "source",
            F.expr("n_chars div 100").alias("len_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
        .withColumn("reidentification_risk", F.col("group_size") < 5)
        .orderBy(
            F.asc("group_size"), F.asc("lang"), F.asc("source"), F.asc("len_bucket")
        )
    )


# --- Salted-join evidence + exact quantile table (round 5) --------------

@register(
    "join_salted_user_enrich",
    oracle="""
WITH s AS (
  SELECT user_id,
         count(*) AS n_user_events,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS user_total
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.event_type, s.n_user_events, s.user_total
FROM events e JOIN s ON e.user_id = s.user_id
""",
)
def join_salted_user_enrich(spark, sf_dir):
    """The skew-salting recipe carried end-to-end as a query: the event
    stream (hot user keys — see key_skew_events) joined to its per-user
    stats through operators.skew.salted_join, which scatters each hot
    key over 16 content-hash salts so no single reducer owns a hot
    user. Salting must be result-invariant — the oracle is the PLAIN
    join, which is the whole point."""
    from wikipedia_data_pipeline_spark.functions import dec_sum
    from wikipedia_data_pipeline_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy(F.col("user_id").alias("s_user")).agg(
        F.count(F.lit(1)).alias("n_user_events"),
        dec_sum("value", "user_total"),
    )
    out = salted_join(
        ev.select("event_id", "user_id", "event_type"),
        stats,
        "user_id",
        "s_user",
        num_salts=16,
    )
    return out.select(
        "event_id", "user_id", "event_type", "n_user_events", "user_total"
    )


@register(
    "events_quantile_table",
    oracle="""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
qs AS (
  SELECT event_type, q,
         CASE q WHEN 'p50' THEN (n + 1) // 2
                WHEN 'p90' THEN (9 * n + 9) // 10
                ELSE (99 * n + 99) // 100 END AS pos,
         rn, value
  FROM ranked, unnest(['p50', 'p90', 'p99']) AS t(q)
)
SELECT event_type, q, value AS quantile_value
FROM qs WHERE rn = pos
ORDER BY event_type, q
""",
)
def events_quantile_table(spark, sf_dir):
    """Exact per-group quantile table (p50/p90/p99) by discrete rank
    selection — percentile_disc semantics, integer-exact positions
    (ceil(q·n) = (q·n + denom−1) div denom), no interpolation, so the
    report is a row VALUE that exists in the data and is bit-portable
    across engines. One window pass per group partition; groups are
    event types, so the sort is per-type and parallel."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    qs = ranked.select(
        "event_type",
        "value",
        "rn",
        F.explode(
            F.array(
                F.struct(
                    F.lit("p50").alias("q"),
                    F.expr("(n + 1) div 2").alias("pos"),
                ),
                F.struct(
                    F.lit("p90").alias("q"),
                    F.expr("(9 * n + 9) div 10").alias("pos"),
                ),
                F.struct(
                    F.lit("p99").alias("q"),
                    F.expr("(99 * n + 99) div 100").alias("pos"),
                ),
            )
        ).alias("qp"),
    )
    return (
        qs.filter(F.col("rn") == F.col("qp.pos"))
        .select(
            "event_type",
            F.col("qp.q").alias("q"),
            F.col("value").alias("quantile_value"),
        )
        .orderBy("event_type", "q")
    )


@register(
    "embedding_int8_quantize",
    oracle="""
WITH s AS (
  SELECT vec_id,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS qscale,
         embedding
  FROM embeddings
)
SELECT vec_id, qscale,
       CASE WHEN qscale > 0
            THEN list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 127 / qscale, 0)
                             AS INTEGER))
            ELSE list_transform(embedding, x -> 0) END AS qvec
FROM s ORDER BY vec_id
""",
)
def embedding_int8_quantize(spark, sf_dir):
    """Per-vector symmetric int8 quantization (qᵢ = round(127·xᵢ/max|x|)
    plus the one float scale) — the 4× compression applied to embedding
    corpora before ANN serving. A narrow higher-order-function map, no
    shuffle, no UDF: at 100 TB this halves-twice the bytes every
    downstream similarity scan reads, which is usually worth more than
    any CPU optimization. Zero vectors quantize to zeros (guarded
    division)."""
    emb = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    qscale = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(xd(x))))
    s = emb.select("vec_id", qscale.alias("qscale"), "embedding")
    qvec = F.when(
        F.col("qscale") > 0,
        F.transform(
            F.col("embedding"),
            lambda x: F.round(xd(x) * 127 / F.col("qscale"), 0).cast("int"),
        ),
    ).otherwise(F.transform(F.col("embedding"), lambda x: F.lit(0)))
    return s.select("vec_id", "qscale", qvec.alias("qvec")).orderBy("vec_id")


@register(
    "dedup_containment",
    oracle="""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                 FOR i IN generate_series(1, len(t) - 2)])
              ELSE CAST([] AS VARCHAR[]) END AS s
  FROM tok
)
SELECT a.doc_id AS doc_sub, b.doc_id AS doc_super,
       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s)
         AS containment
FROM sh a JOIN sh b ON a.doc_id != b.doc_id
WHERE len(a.s) > 0
  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) >= 0.8
""",
)
def dedup_containment(spark, sf_dir):
    """Directed shingle containment ≥ 0.8 — subset-duplication
    detection (a doc embedded inside a larger host), which symmetric
    Jaccard structurally misses. One-sided prefix filtering keeps the
    candidate join bounded by rare-shingle postings; the oracle is the
    exact all-pairs restatement, so the filter must be lossless. See
    operators/dedup.py:containment_pairs."""
    return D.containment_pairs(load_table(spark, sf_dir, "documents"), 0.8)


@register(
    "text_infer_stopwords",
    oracle=f"""
WITH {TOKS_CTE},
dfreq AS (
  SELECT word, count(*) AS df
  FROM (SELECT DISTINCT doc_id, word FROM toks) GROUP BY word
),
nd AS (SELECT count(*) AS n_docs FROM documents)
SELECT word, df, CAST(df AS DOUBLE) / n_docs AS df_frac
FROM dfreq, nd
WHERE CAST(df AS DOUBLE) / n_docs >= 0.8
ORDER BY df DESC, word ASC
""",
)
def text_infer_stopwords(spark, sf_dir):
    """Corpus-driven stopword inference: words whose document frequency
    covers ≥ 80% of the corpus. Curated stopword lists don't transfer
    across domains or languages — at corpus scale you infer the list
    from the data itself (one distinct + one vocab-sized aggregate) and
    feed it to the tokenizer, the inverted index's posting pruning, and
    the quality gates."""
    from wikipedia_data_pipeline_spark.operators.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = (
        tokenize(docs)
        .select("doc_id", "word")
        .distinct()
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return (
        dfreq.crossJoin(F.broadcast(n_docs))
        .withColumn("df_frac", F.col("df").cast("double") / F.col("n_docs"))
        .filter(F.col("df_frac") >= 0.8)
        .select("word", "df", "df_frac")
        .orderBy(F.desc("df"), F.asc("word"))
    )


# --- Bigram LM scoring + robust MAD outliers (round 5) ------------------

@register(
    "text_bigram_surprisal",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, ' '),
                     x -> lower(regexp_replace(x, '[^a-zA-Z]', '', 'g'))),
                     w -> length(w) > 0) AS ws
  FROM documents
),
bg AS (
  SELECT doc_id, ws[g] AS w1, ws[g+1] AS w2
  FROM t, unnest(generate_series(1, len(ws) - 1)) AS u(g)
  WHERE len(ws) >= 2
),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
uc AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1),
vsz AS (SELECT count(DISTINCT w2) AS v FROM bc),
probs AS (
  SELECT bc.w1, bc.w2,
         CAST(round(log2(CAST(c1 + v AS DOUBLE) / (c12 + 1)), 6)
              AS DECIMAL(18,6)) AS surp
  FROM bc JOIN uc ON bc.w1 = uc.w1, vsz
)
SELECT bg.doc_id, count(*) AS n_bigrams,
       round(CAST(sum(surp) AS DOUBLE) / count(*), 6) AS bits_per_bigram
FROM bg JOIN probs ON bg.w1 = probs.w1 AND bg.w2 = probs.w2
GROUP BY bg.doc_id
""",
)
def text_bigram_surprisal(spark, sf_dir):
    """Per-doc mean surprisal under an add-one-smoothed BIGRAM LM
    trained on the corpus itself — one step up the n-gram-LM ladder
    from text_unigram_surprisal, and the score that actually separates
    scrambled text from fluent text (unigram surprisal is identical
    under any token permutation; bigram surprisal is exactly the
    word-order signal). Same determinism recipe: probabilities are
    integer ratios, log2 is taken ONCE per bigram type and rounded,
    per-doc sums ride DECIMAL. The bigram table is vocab²-bounded and
    the doc-side join hits it on (w1, w2) — one shuffle each side."""
    from wikipedia_data_pipeline_spark.operators.text import ngrams

    docs = load_table(spark, sf_dir, "documents")
    bg = ngrams(docs, n=2).select(
        "doc_id",
        F.split_part(F.col("ngram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("ngram"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uc = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vsz = bc.agg(F.countDistinct("w2").alias("v"))
    probs = (
        bc.join(uc, "w1")
        .crossJoin(F.broadcast(vsz))
        .select(
            "w1",
            "w2",
            F.round(
                F.log2(
                    (F.col("c1") + F.col("v")).cast("double")
                    / (F.col("c12") + 1)
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("surp"),
        )
    )
    return (
        bg.join(probs, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("surp").alias("surp_dec"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.col("surp_dec").cast("double") / F.col("n_bigrams"), 6
            ).alias("bits_per_bigram"),
        )
    )


@register(
    "events_mad_outliers",
    oracle="""
WITH r1 AS (
  SELECT event_id, event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (SELECT event_type, value AS med FROM r1 WHERE rn = (n + 1) // 2),
d AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         abs(e.value - m.med) AS dev
  FROM events e JOIN med m ON e.event_type = m.event_type
),
r2 AS (
  SELECT event_type, dev,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY dev ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
SELECT d.event_id, d.event_type, d.value, d.med, mad.mad
FROM d JOIN mad ON d.event_type = mad.event_type
WHERE d.dev > 3 * mad.mad
""",
)
def events_mad_outliers(spark, sf_dir):
    """Robust outlier screen: |x − median| > 3·MAD per event type. The
    z-score screen (events_user_value_outliers) breaks down exactly
    when outliers are present — they inflate the σ they are judged
    against; median/MAD have a 50% breakdown point. Both statistics
    are discrete rank selections (median = value at rank ⌈n/2⌉), so
    every number in the predicate is an actual data value and the
    whole screen is bit-portable — no mean, no sqrt, no interpolation.
    Two window passes partitioned by event type plus two broadcast
    joins of the 5-row statistics."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")

    def rank_select(df, order_col, out_name):
        w = Window.partitionBy("event_type").orderBy(
            F.asc(order_col), F.asc("event_id")
        )
        wn = Window.partitionBy("event_type")
        return (
            df.select(
                "event_type",
                F.col(order_col),
                F.row_number().over(w).alias("rn"),
                F.count(F.lit(1)).over(wn).alias("n"),
            )
            .filter(F.col("rn") == F.expr("(n + 1) div 2"))
            .select("event_type", F.col(order_col).alias(out_name))
        )

    med = rank_select(ev, "value", "med")
    d = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    mad = rank_select(d, "dev", "mad")
    return (
        d.join(F.broadcast(mad), "event_type")
        .filter(F.col("dev") > 3 * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
    )


@register(
    "graph_triangle_census",
    oracle="""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      FROM op x JOIN op y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
  ) GROUP BY node
),
c AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM e e1 JOIN e e2 ON e1.b = e2.a
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       3 * CAST(n_triangles AS DOUBLE) / n_wedges AS clustering_coeff
FROM c, t, ne
""",
)
def graph_triangle_census(spark, sf_dir):
    """Triangle count + global clustering coefficient of the part
    co-purchase graph (parts sharing an order). Oriented two-hop join
    counts each triangle once; wedges come from the degree aggregate,
    never enumerated — see operators/graph.py:triangle_stats for the
    degree-orientation note that keeps this O(m^1.5) at web scale."""
    from wikipedia_data_pipeline_spark.operators import graph as G

    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    x = op.alias("x")
    y = op.alias("y")
    edges = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(
            F.col("x.l_partkey").alias("src"),
            F.col("y.l_partkey").alias("dst"),
        )
        .distinct()
    )
    return G.triangle_stats(edges)


# --- Interval sweep, growth accounting, weighted PageRank (round 5) -----

@register(
    "orders_open_backlog_daily",
    oracle="""
WITH iv AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS d0,
         CAST(max(l.l_shipdate) AS DATE) AS d1
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
),
deltas AS (
  SELECT d0 AS day, 1 AS delta FROM iv
  UNION ALL
  SELECT d1 + 1 AS day, -1 AS delta FROM iv
),
byday AS (SELECT day, CAST(sum(delta) AS BIGINT) AS delta FROM deltas GROUP BY day),
bounds AS (SELECT min(d0) AS lo, max(d1) AS hi FROM iv),
spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds)
SELECT s.day,
       CAST(sum(COALESCE(b.delta, 0))
            OVER (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS BIGINT) AS open_orders
FROM spine s LEFT JOIN byday b ON s.day = b.day
ORDER BY s.day
""",
)
def orders_open_backlog_daily(spark, sf_dir):
    """Daily open-order backlog (orders placed but not fully shipped)
    by INTERVAL SWEEP: each order contributes +1 at its start day and
    −1 after its last ship day; the daily curve is the running sum over
    the calendar spine. This is the scale pattern for "how many
    intervals cover each point" — the naive day×order range join is
    O(days·orders), the sweep is one aggregate over 2 deltas per order
    plus a window over the day-sized spine (the only single-partition
    step, bounded by calendar length, not data volume)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("ship_ts"))
        .select(
            F.col("o_orderdate").cast("date").alias("d0"),
            F.col("ship_ts").cast("date").alias("d1"),
        )
    )
    deltas = iv.select(F.col("d0").alias("day"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.date_add("d1", 1).alias("day"), F.lit(-1).alias("delta"))
    )
    byday = deltas.groupBy("day").agg(F.sum("delta").alias("delta"))
    bounds = iv.agg(F.min("d0").alias("lo"), F.max("d1").alias("hi"))
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(byday, "day", "left")
        .select("day", F.coalesce("delta", F.lit(0)).alias("delta"))
        .select(
            "day", F.sum("delta").over(w).cast("long").alias("open_orders")
        )
        .orderBy("day")
    )


@register(
    "events_cumulative_new_users",
    oracle=f"""
WITH t0 AS (SELECT min(epoch_us(ts)) AS ts0 FROM events),
first_seen AS (
  SELECT user_id,
         min((epoch_us(ts) - ts0) // {_US_PER_DAY}) AS day_idx
  FROM events, t0 GROUP BY user_id
),
byday AS (SELECT day_idx, count(*) AS n_new_users FROM first_seen GROUP BY day_idx)
SELECT day_idx, n_new_users,
       CAST(sum(n_new_users) OVER (ORDER BY day_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM byday ORDER BY day_idx
""",
)
def events_cumulative_new_users(spark, sf_dir):
    """Growth accounting: users by FIRST-seen day and the cumulative
    acquisition curve. First-seen is one min-aggregate on the user key
    (the only data-sized shuffle); the running sum rides the day-sized
    relation — integer-µs day arithmetic, engine-portable."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min("ts").alias("ts0"))
    first_seen = (
        ev.crossJoin(F.broadcast(t0))
        .groupBy("user_id")
        .agg(F.min(F.expr(f"(ts - ts0) div {_US_PER_DAY}")).alias("day_idx"))
    )
    byday = first_seen.groupBy("day_idx").agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    w = Window.orderBy("day_idx").rowsBetween(Window.unboundedPreceding, 0)
    return byday.select(
        "day_idx",
        "n_new_users",
        F.sum("n_new_users").over(w).cast("long").alias("cum_users"),
    ).orderBy("day_idx")


_PR_WEDGES_SQL = """
  SELECT 'p:' || CAST(l_partkey AS VARCHAR) AS src,
         's:' || CAST(l_suppkey AS VARCHAR) AS dst,
         count(*) AS w
  FROM lineitem GROUP BY 1, 2
"""


def _pagerank_weighted_oracle(iterations: int = 3) -> str:
    """Unrolled-CTE twin of the weighted fixed-point PageRank."""
    ctes = [
        f"edges AS ({_PR_WEDGES_SQL})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "outdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS outdeg"
        " FROM edges GROUP BY src)",
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT n.node,
         CAST(150000 + COALESCE((85 * s.mass) // 100, 0) AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(sum((r.pr * e.w) // o.outdeg) AS BIGINT) AS mass
    FROM edges e
    JOIN r{i - 1} r ON e.src = r.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s ON n.node = s.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, pr AS pr_rank FROM r{iterations}"
        "\nORDER BY pr_rank DESC, node ASC"
    )


@register("graph_pagerank_weighted", oracle=_pagerank_weighted_oracle(3))
def graph_pagerank_weighted(spark, sf_dir):
    """Weighted fixed-point PageRank: mass splits proportionally to the
    purchase count on each part→supplier edge ((rank·w) div Σw, still
    exact integer arithmetic). The variant real link graphs need —
    uniform splitting treats a one-off purchase like a thousand-unit
    relationship."""
    from wikipedia_data_pipeline_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.groupBy(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).agg(F.count(F.lit(1)).alias("w"))
    ranks = G.pagerank_fixed_point(edges, iterations=3, weight="w")
    return ranks.select("node", F.col("rank").alias("pr_rank")).orderBy(
        F.desc("pr_rank"), F.asc("node")
    )


# --- Corpus-statistics diagnostics: Zipf fit, Heaps growth (round 5) ----

@register(
    "corpus_zipf_fit",
    oracle=f"""
WITH {TOKS_CTE},
counts AS (SELECT word, count(*) AS n FROM toks GROUP BY word),
ranked AS (
  SELECT word, n,
         row_number() OVER (ORDER BY n DESC, word ASC) AS rnk
  FROM counts
),
pts AS (
  SELECT rnk, n,
         CAST(round(log2(CAST(rnk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
         CAST(round(log2(CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
  FROM ranked
),
s AS (
  SELECT count(*) AS m,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 6)
                       AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 6)
                       AS DECIMAL(18,6))) AS DOUBLE) AS sxx
  FROM pts
)
SELECT m AS n_vocab,
       round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS zipf_slope
FROM s
""",
)
def corpus_zipf_fit(spark, sf_dir):
    """Zipf rank-frequency diagnostic: least-squares slope of
    log2(count) against log2(rank) over the vocabulary (natural text ≈
    −1; token spam, boilerplate floods, and truncated corpora all bend
    it — a one-number corpus health check). Determinism recipe as
    everywhere: logs and products are computed once per VOCAB entry and
    rounded, the regression moments are decimal sums, and the final
    slope is one IEEE expression over exact moments. The rank is
    assigned over the vocab relation (corpus-bounded dictionary, not
    the corpus) with ``operators.ranks.ordered_scan`` — web-scale
    vocabularies run to 1e8+ n-grams, so even the dictionary must not
    flow through a single-partition rank window."""
    from wikipedia_data_pipeline_spark.operators.ranks import ordered_scan
    from wikipedia_data_pipeline_spark.operators.text import tokenize

    toks = tokenize(load_table(spark, sf_dir, "documents"))
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    ranked = ordered_scan(
        counts, [F.desc("n"), F.asc("word")], rank_col="rnk"
    )
    dec = "decimal(18,6)"
    pts = ranked.select(
        F.round(F.log2(F.col("rnk").cast("double")), 6).cast(dec).alias("x"),
        F.round(F.log2(F.col("n").cast("double")), 6).cast(dec).alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(
            F.round(F.col("x").cast("double") * F.col("y").cast("double"), 6).cast(dec)
        )
        .cast("double")
        .alias("sxy"),
        F.sum(
            F.round(F.col("x").cast("double") * F.col("x").cast("double"), 6).cast(dec)
        )
        .cast("double")
        .alias("sxx"),
    )
    return s.select(
        F.col("m").alias("n_vocab"),
        F.round(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    )


@register(
    "corpus_heaps_growth",
    oracle=f"""
WITH {TOKS_CTE},
first_doc AS (SELECT word, min(doc_id) AS doc_id FROM toks GROUP BY word),
new_words AS (SELECT doc_id, count(*) AS n_new FROM first_doc GROUP BY doc_id),
docs AS (SELECT DISTINCT doc_id FROM toks)
SELECT d.doc_id, COALESCE(n_new, 0) AS n_new_words,
       CAST(sum(COALESCE(n_new, 0)) OVER (ORDER BY d.doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS vocab_size
FROM docs d LEFT JOIN new_words n ON d.doc_id = n.doc_id
ORDER BY d.doc_id
""",
)
def corpus_heaps_growth(spark, sf_dir):
    """Heaps'-law vocabulary growth: distinct-word count as the corpus
    accumulates in doc_id order. Computed without any cumulative
    distinct state: each word charges its FIRST document (a min
    aggregate on the word key — the only data-sized shuffle), and the
    curve is a running sum over the doc-sized relation — via
    ``operators.ranks.ordered_scan``, because |docs| at 100 TB is
    billions and an unpartitioned running-sum window would serialize
    the corpus spine through one task. Sub-linear growth is healthy
    text; near-linear growth means unique-token spam (ids, hashes)
    inflating the vocabulary."""
    from wikipedia_data_pipeline_spark.operators.ranks import ordered_scan
    from wikipedia_data_pipeline_spark.operators.text import tokenize

    toks = tokenize(load_table(spark, sf_dir, "documents"))
    first_doc = toks.groupBy("word").agg(F.min("doc_id").alias("doc_id"))
    new_words = first_doc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    docs = toks.select("doc_id").distinct()
    spine = docs.join(new_words, "doc_id", "left").select(
        "doc_id", F.coalesce("n_new", F.lit(0)).alias("n_new_words")
    )
    return (
        ordered_scan(
            spine,
            ["doc_id"],
            running=[("vocab_size", "n_new_words", "sum")],
        )
        .select(
            "doc_id",
            "n_new_words",
            F.col("vocab_size").cast("long").alias("vocab_size"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_drift_tokens",
    oracle=f"""
WITH {TOKS_CTE},
half AS (
  SELECT word, CASE WHEN doc_id < 250 THEN 'a' ELSE 'b' END AS h FROM toks
),
c AS (
  SELECT word,
         CAST(sum(CASE WHEN h = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN h = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM half GROUP BY word
),
tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb FROM c)
SELECT word, n_a, n_b,
       abs(CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb) AS share_gap
FROM c, tot
ORDER BY share_gap DESC, word ASC
LIMIT 20
""",
)
def corpus_drift_tokens(spark, sf_dir):
    """Token-distribution drift between two corpus slices (here: first
    vs second half of the doc_id range — in production, yesterday's
    crawl vs today's): per-word share gap, top offenders first. The
    drift monitor a continuously-fed training pipeline runs before a
    new slice is admitted; one conditional aggregate over the token
    stream plus a 1-row totals broadcast, TakeOrdered top-k. Counts are
    integers and each share is a single IEEE division, so the report is
    bit-portable."""
    from wikipedia_data_pipeline_spark.operators.text import tokenize

    toks = tokenize(load_table(spark, sf_dir, "documents"))
    c = toks.groupBy("word").agg(
        F.sum(F.when(F.col("doc_id") < 250, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("doc_id") >= 250, 1).otherwise(0)).alias("n_b"),
    )
    tot = c.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "word",
            "n_a",
            "n_b",
            F.abs(
                F.col("n_a").cast("double") / F.col("ta")
                - F.col("n_b").cast("double") / F.col("tb")
            ).alias("share_gap"),
        )
        .orderBy(F.desc("share_gap"), F.asc("word"))
        .limit(20)
    )


@register("embedding_pca_project")  # eigensolver output: no SQL oracle
def embedding_pca_project(spark, sf_dir):
    """Distributed PCA to 2 components: Arrow-batch NumPy partials →
    d²-row aggregate → driver-side eigh on the model-sized covariance →
    broadcast-literal projection map. See operators/similarity.py:
    pca_project for the moments/solve/broadcast boundary."""
    from wikipedia_data_pipeline_spark.operators.similarity import pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_project(emb, k=2).orderBy("vec_id")


# --- NULL-semantics certificate (round 5) -------------------------------

@register(
    "semantics_null_suite",
    oracle="""
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'O' THEN NULL
              ELSE o_totalprice END AS a,
         CASE WHEN o_orderpriority LIKE '1%' THEN NULL
              ELSE o_totalprice END AS b
  FROM orders
),
eq AS (
  SELECT count(*) AS n_rows,
         CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_eq,
         CAST(sum(CASE WHEN a IS NOT DISTINCT FROM b THEN 1 ELSE 0 END)
              AS BIGINT) AS n_eq_nullsafe,
         CAST(count(a) AS BIGINT) AS n_a_nonnull
  FROM t
),
probe AS (SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL
                      ELSE o_custkey END AS k FROM orders),
complement AS (
  SELECT
    (SELECT count(*) FROM customer
     WHERE c_custkey NOT IN (SELECT k FROM probe)) AS n_not_in,
    (SELECT count(*) FROM customer c
     WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = c.c_custkey))
      AS n_not_exists
)
SELECT * FROM eq, complement
""",
)
def semantics_null_suite(spark, sf_dir):
    """One-row NULL-semantics certificate over derived nullable
    columns: plain `=` vs null-safe `<=>` match counts, and the
    NOT IN / NOT EXISTS divergence — `NOT IN` against a set containing
    a NULL is three-valued-logic-empty (n_not_in = 0) while NOT EXISTS
    counts the real complement. These are the semantics that silently
    corrupt pipelines when an upstream column goes nullable; pinning
    them against the oracle certifies the engine agrees with ANSI on
    every branch."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    t = o.select(
        F.when(F.col("o_orderstatus") == "O", None)
        .otherwise(F.col("o_totalprice"))
        .alias("a"),
        F.when(F.col("o_orderpriority").startswith("1"), None)
        .otherwise(F.col("o_totalprice"))
        .alias("b"),
    )
    eq = t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0)).alias("n_eq"),
        F.sum(F.when(F.expr("a <=> b"), 1).otherwise(0)).alias(
            "n_eq_nullsafe"
        ),
        F.count("a").alias("n_a_nonnull"),
    )
    probe = o.select(
        F.when(F.col("o_orderkey") % 2 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("k")
    )
    # NOT IN with a NULL in the probe set: ANSI three-valued logic makes
    # the predicate never-true. Spark's left_anti join is NULL-AWARE
    # only through the SQL NOT IN form, so express it as SQL.
    o.createOrReplaceTempView("wdp_ns_orders")
    probe.createOrReplaceTempView("wdp_ns_probe")
    c.createOrReplaceTempView("wdp_ns_customer")
    spark_ = o.sparkSession
    n_not_in = spark_.sql(
        "SELECT count(*) AS n_not_in FROM wdp_ns_customer "
        "WHERE c_custkey NOT IN (SELECT k FROM wdp_ns_probe)"
    )
    n_not_exists = c.join(
        probe, c["c_custkey"] == probe["k"], "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_not_exists"))
    return eq.crossJoin(n_not_in).crossJoin(n_not_exists)


@register(
    "order_by_nulls_placement",
    oracle="""
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'O' THEN NULL
              ELSE o_totalprice END AS a
  FROM orders
)
SELECT o_orderkey, a FROM t
ORDER BY a ASC NULLS FIRST, o_orderkey ASC
LIMIT 10
""",
)
def order_by_nulls_placement(spark, sf_dir):
    """Explicit NULLS FIRST ordering — pinned because the DEFAULTS
    disagree across engines (Spark ascends nulls-first, DuckDB/ANSI
    implementations commonly nulls-last): any ordered sink consumed by
    another system must declare placement or the handoff is
    nondeterministic."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", None)
        .otherwise(F.col("o_totalprice"))
        .alias("a"),
    )
    return t.orderBy(
        F.col("a").asc_nulls_first(), F.col("o_orderkey").asc()
    ).limit(10)


# --- Time-weighted windows: TWAP + drawdown (round 5) -------------------

@register(
    "events_time_weighted_avg",
    oracle="""
WITH seq AS (
  SELECT user_id, value, epoch_us(ts) AS us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS next_us
  FROM events
),
iv AS (SELECT user_id, value, next_us - us AS dur FROM seq WHERE next_us IS NOT NULL)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       round(CAST(sum(CAST(value AS DECIMAL(18,6)) * dur) AS DOUBLE)
             / CAST(sum(dur) AS DOUBLE), 6) AS twap
FROM iv GROUP BY user_id
""",
)
def events_time_weighted_avg(spark, sf_dir):
    """Time-weighted average value per user (TWAP): each reading is
    held until the next one, so it's weighted by its holding duration
    — the correct average for irregularly-sampled series, where the
    plain mean over-weights bursts. Duration from one lead() window in
    the integer-µs domain; the weighted sum is DECIMAL×BIGINT, exact
    under any partitioning. The final quotient is rounded to 6
    decimals: the exact decimal sum exceeds 2^63 in raw units, and
    int128-decimal→double conversion is double-rounded on some engines
    — rounding absorbs that last-ulp platform difference."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        "ts",
        F.lead("ts").over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    iv = seq.select(
        "user_id", "value", (F.col("next_us") - F.col("ts")).alias("dur")
    )
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)") * F.col("dur")).cast(
                "double"
            )
            / F.sum("dur").cast("double"),
            6,
        ).alias("twap"),
    )


@register(
    "events_user_max_drawdown",
    oracle="""
WITH c AS (
  SELECT user_id, event_id,
         sum(CAST(value AS DECIMAL(18,6)))
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM events
),
r AS (
  SELECT user_id, cum,
         max(cum) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS runmax
  FROM (SELECT * FROM c ORDER BY user_id, event_id)
)
SELECT user_id, CAST(max(runmax - cum) AS DOUBLE) AS max_drawdown
FROM r GROUP BY user_id
""",
)
def events_user_max_drawdown(spark, sf_dir):
    """Maximum drawdown of each user's cumulative value series
    (largest drop from a running peak) — the canonical
    path-dependent window metric: running DECIMAL sum, running max
    over it, max gap. Everything is exact decimal arithmetic until the
    final cast, so the answer is identical under any partitioning —
    a metric whose float version famously differs run-to-run on
    parallel engines. Two stacked frames in ONE window pass per user
    partition."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(wcum).alias("cum"),
    )
    wmax = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = c.select(
        "user_id", "cum", F.max("cum").over(wmax).alias("runmax")
    )
    return r.groupBy("user_id").agg(
        F.max(F.col("runmax") - F.col("cum")).cast("double").alias("max_drawdown")
    )


# --- Fuzzy matching + ABC classification (round 5) ----------------------

@register(
    "dedup_fuzzy_levenshtein",
    oracle="""
WITH k AS (
  SELECT doc_id,
         string_split(text, ' ')[1] AS block_key,
         substring(text, 1, 40) AS head
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
FROM k a JOIN k b
  ON a.block_key = b.block_key AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= 5
""",
)
def dedup_fuzzy_levenshtein(spark, sf_dir):
    """Fuzzy near-match detection by edit distance — the entity-
    resolution primitive shingle methods miss (they need shared exact
    n-grams; edit distance tolerates character-level noise like OCR
    errors and typos). Levenshtein is O(len²) per PAIR, so the scale
    discipline is all in candidate generation: block on a cheap exact
    key (first token) and bound the compared prefix (40 chars), so
    cost is Σ block² × 40², never corpus². Both engines implement
    textbook Levenshtein — the distance is integer-exact."""
    docs = load_table(spark, sf_dir, "documents")
    k = docs.select(
        "doc_id",
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("block_key"),
        F.substring("text", 1, 40).alias("head"),
    )
    a = k.select(
        F.col("doc_id").alias("doc_a"),
        F.col("block_key"),
        F.col("head").alias("head_a"),
    )
    b = k.select(
        F.col("doc_id").alias("doc_b"),
        F.col("block_key"),
        F.col("head").alias("head_b"),
    )
    return (
        a.join(b, "block_key")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("head_a", "head_b").cast("long").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 5)
    )


@register(
    "parts_abc_classification",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT l_partkey, revenue,
         CAST(sum(CAST(revenue AS DECIMAL(18,6)))
              OVER (ORDER BY revenue DESC, l_partkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) AS cum_rev,
         CAST(sum(CAST(revenue AS DECIMAL(18,6))) OVER () AS DOUBLE)
           AS total_rev
  FROM rev
)
SELECT l_partkey, revenue,
       CASE WHEN cum_rev <= 0.8 * total_rev THEN 'A'
            WHEN cum_rev <= 0.95 * total_rev THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
""",
)
def parts_abc_classification(spark, sf_dir):
    """ABC inventory classification: parts ranked by discounted
    revenue; the running share cuts A (first 80% of revenue) / B (next
    15%) / C (tail). The running sum is DECIMAL-routed end to end
    (both engines), so it — and therefore every class boundary — is
    exact and identical under ANY block decomposition; that exactness
    is what licenses computing it with the hierarchical
    ``operators.ranks.ordered_scan`` instead of an unpartitioned
    running-sum window (|parts| at 100 TB is 1e8+ — a global window
    would serialize the part relation through one task). The grand
    total comes from the scan's blocks relation for free (no second
    aggregate pass). The whale-curve complement to
    revenue_concentration_deciles."""
    from wikipedia_data_pipeline_spark.functions import dec_sum
    from wikipedia_data_pipeline_spark.operators.ranks import ordered_scan

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        dec_sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
            "revenue",
        )
    )
    sc = ordered_scan(
        rev,
        [F.desc("revenue"), F.asc("l_partkey")],
        running=[("cum_dec", F.col("revenue").cast("decimal(18,6)"), "sum")],
        with_totals=True,
    )
    ranked = sc.select(
        "l_partkey",
        "revenue",
        F.col("cum_dec").cast("double").alias("cum_rev"),
        F.col("cum_dec_total").cast("double").alias("total_rev"),
    )
    return ranked.select(
        "l_partkey",
        "revenue",
        F.when(F.col("cum_rev") <= 0.8 * F.col("total_rev"), "A")
        .when(F.col("cum_rev") <= 0.95 * F.col("total_rev"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled-CTE twin of operators.graph.kcore_peel."""
    ctes = [
        f"edges AS ({_PR_EDGES_SQL})",
        """e0 AS (
  SELECT src AS node, dst AS nbr FROM edges
  UNION
  SELECT dst AS node, src AS nbr FROM edges
)""",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""k{i} AS (
  SELECT node FROM (SELECT node, count(*) AS deg FROM e{i - 1} GROUP BY node)
  WHERE deg >= {k}
),
e{i} AS (
  SELECT e.node, e.nbr FROM e{i - 1} e
  JOIN k{i} a ON e.node = a.node
  JOIN k{i} b ON e.nbr = b.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, CAST(count(*) AS BIGINT) AS degree"
        f"\nFROM e{rounds} GROUP BY node ORDER BY node"
    )


@register("graph_kcore_peel", oracle=_kcore_oracle(25, 3), eager=True)
def graph_kcore_peel(spark, sf_dir):
    """k-core peeling (k=25, 3 rounds) of the part–supplier graph:
    nodes below degree 25 are dropped with their edges each round, and
    the degree loss cascades to their neighbors — the density filter
    used to find the engaged core of interaction graphs (and to prune
    fringe vertices before expensive graph algorithms run). See
    operators/graph.py:kcore_peel."""
    from wikipedia_data_pipeline_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()
    return G.kcore_peel(edges, k=25, rounds=3).orderBy("node")


# --- Experimentation + entity-level splits (round 5) --------------------

@register(
    "events_ab_test_lift",
    oracle="""
WITH u AS (
  SELECT user_id, user_id % 2 AS variant,
         CASE WHEN sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) >= 15
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
s AS (
  SELECT variant, count(*) AS n,
         CAST(sum(converted) AS BIGINT) AS conv
  FROM u GROUP BY variant
),
w AS (
  SELECT
    (SELECT n FROM s WHERE variant = 0) AS n_a,
    (SELECT conv FROM s WHERE variant = 0) AS conv_a,
    (SELECT n FROM s WHERE variant = 1) AS n_b,
    (SELECT conv FROM s WHERE variant = 1) AS conv_b
)
SELECT n_a, conv_a, n_b, conv_b,
       CAST(conv_a AS DOUBLE) / n_a AS rate_a,
       CAST(conv_b AS DOUBLE) / n_b AS rate_b,
       CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a AS lift,
       (CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
         / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                * (1.0 / n_a + 1.0 / n_b)) AS z_score
FROM w
""",
)
def events_ab_test_lift(spark, sf_dir):
    """Two-proportion A/B readout (variant = user parity, conversion =
    ≥15 clicks — a non-saturated engagement bar on this stream): per-variant user counts, conversion rates, lift, and
    the pooled z-statistic. Every input is an integer aggregate, and
    the statistic uses only IEEE ops that are CORRECTLY-ROUNDED by the
    standard (+ − × ÷ sqrt), so even the z-score is bit-identical
    across engines with no rounding crutch. One user-keyed aggregate
    (the only data shuffle), then arithmetic on a 2-row relation."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            >= 15,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select((F.col("user_id") % 2).alias("variant"), "converted")
    s = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    a = s.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = s.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    w = a.crossJoin(b)
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    return w.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        (rate_b - rate_a).alias("lift"),
        (
            (rate_b - rate_a)
            / F.sqrt(
                pooled
                * (1 - pooled)
                * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
            )
        ).alias("z_score"),
    )


@register(
    "sample_holdout_users",
    oracle=f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
assign AS (
  SELECT user_id,
         {SQL_DET_HASH.format(col='user_id')} % 100 AS bucket
  FROM u
)
SELECT e.event_id, e.user_id,
       CASE WHEN bucket < 80 THEN 'train' ELSE 'holdout' END AS split
FROM events e JOIN assign a ON e.user_id = a.user_id
""",
)
def sample_holdout_users(spark, sf_dir):
    """ENTITY-level holdout: the split key is the user, not the event —
    splitting event rows directly leaks every held-out user's behavior
    into training through their other events. Same portable arithmetic
    hash as the document splits, assigned once per user and joined
    back (broadcast: the user relation is cardinality-bounded)."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events")
    assign = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id", (det_hash("user_id") % 100).alias("bucket")
        )
    )
    return ev.join(F.broadcast(assign), "user_id").select(
        "event_id",
        "user_id",
        F.when(F.col("bucket") < 80, "train")
        .otherwise("holdout")
        .alias("split"),
    )


# --- BM25 ranked search + fixed-depth BFS (round 5) ---------------------

_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "text_search_bm25",
    oracle=f"""
WITH {TOKS_CTE},
tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word),
dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
stats AS (
  SELECT CAST(sum(len) AS DOUBLE) / count(*) AS avglen,
         count(*) AS n_docs
  FROM dl
),
dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
widf AS (
  SELECT word,
         CAST(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1), 6)
              AS DECIMAL(18,6)) AS idf
  FROM dfreq, stats
),
scored AS (
  SELECT t.doc_id, t.word,
         CAST(round(CAST(idf AS DOUBLE) * (t.tf * ({_BM25_K1} + 1))
               / (t.tf + {_BM25_K1} * (1 - {_BM25_B}
                  + {_BM25_B} * d.len / avglen)), 6)
              AS DECIMAL(18,6)) AS s
  FROM tf t
  JOIN dl d ON t.doc_id = d.doc_id
  JOIN widf ON t.word = widf.word, stats
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_terms_hit,
       CAST(sum(s) AS DOUBLE) AS score
FROM scored
WHERE word IN ({", ".join(f"'{w}'" for w in _SEARCH_TERMS)})
GROUP BY doc_id
ORDER BY score DESC, n_terms_hit DESC, doc_id ASC
LIMIT 20
""",
)
def text_search_bm25(spark, sf_dir):
    """BM25 ranked retrieval (k1=1.2, b=0.75, the Lucene-style
    +1-inside-the-log idf so no term scores negative) — the standard
    keyword-search ranking, with raw term frequency saturating and
    document-length normalization, which plain TF-IDF summing lacks.
    Determinism: idf is rounded once per VOCAB word, the per-posting
    score once per (doc, word) — every input to those expressions
    (tf, len ints; avglen one exact division) is identical on both
    engines, and the doc-level sum rides DECIMAL. Same pushdown shape
    as text_search_tfidf: the IN-set prunes postings before scoring at
    the final filter, top-k is TakeOrdered."""
    from wikipedia_data_pipeline_spark.operators.text import tokenize

    toks = tokenize(load_table(spark, sf_dir, "documents"))
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
    stats = dl.agg(
        (F.sum("len").cast("double") / F.count(F.lit(1))).alias("avglen"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    widf = dfreq.crossJoin(F.broadcast(stats)).select(
        "word",
        F.round(
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("idf"),
    )
    scored = (
        tf.filter(F.col("word").isin(_SEARCH_TERMS))
        .join(dl, "doc_id")
        .join(F.broadcast(widf), "word")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.col("idf").cast("double")
                * (F.col("tf") * (_BM25_K1 + 1))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (
                        1
                        - _BM25_B
                        + _BM25_B * F.col("len") / F.col("avglen")
                    )
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum("s").cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), F.desc("n_terms_hit"), F.asc("doc_id"))
        .limit(20)
    )


def _bfs_oracle(seed: str, max_hops: int) -> str:
    """Unrolled-CTE twin of operators.graph.bfs_hops."""
    ctes = [
        f"edges AS ({_PR_EDGES_SQL})",
        """und AS (
  SELECT src AS node, dst AS nbr FROM edges
  UNION
  SELECT dst AS node, src AS nbr FROM edges
)""",
        f"v0 AS (SELECT '{seed}' AS node, 0 AS hops)",
    ]
    for i in range(1, max_hops + 1):
        ctes.append(
            f"""v{i} AS (
  SELECT * FROM v{i - 1}
  UNION ALL
  SELECT nxt.node, {i} AS hops FROM (
    SELECT DISTINCT u.nbr AS node
    FROM und u JOIN v{i - 1} f ON u.node = f.node
  ) nxt
  WHERE nxt.node NOT IN (SELECT node FROM v{i - 1})
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, CAST(hops AS BIGINT) AS hops FROM v{max_hops}"
        "\nORDER BY hops, node"
    )


@register("graph_bfs_reachability", oracle=_bfs_oracle("p:1", 3), eager=True)
def graph_bfs_reachability(spark, sf_dir):
    """3-hop BFS neighborhood of part p:1 in the part–supplier graph
    with minimum hop distances — the related-items / blast-radius
    traversal. Level-synchronous frontier expansion (join + anti-join
    per level) against the once-shuffled edge relation; see
    operators/graph.py:bfs_hops."""
    from wikipedia_data_pipeline_spark.operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()
    out = G.bfs_hops(edges, ["p:1"], max_hops=3)
    return out.select("node", F.col("hops").cast("long").alias("hops")).orderBy(
        "hops", "node"
    )


# --- Recommendations + count anomalies (round 5) ------------------------

@register(
    "recs_item_item_cosine",
    oracle="""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ic AS (SELECT l_partkey, count(*) AS n FROM op GROUP BY l_partkey),
co AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS c
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT pa, pb, c AS n_co,
       c / sqrt(CAST(ia.n AS DOUBLE) * ib.n) AS cosine
FROM co JOIN ic ia ON co.pa = ia.l_partkey
        JOIN ic ib ON co.pb = ib.l_partkey
WHERE c >= 3
ORDER BY cosine DESC, pa ASC, pb ASC
LIMIT 100
""",
)
def recs_item_item_cosine(spark, sf_dir):
    """Item-item collaborative filtering: cosine similarity over
    co-purchase incidence, sim(a,b) = |A∩B| / √(|A|·|B|) — the
    classical neighborhood recommender (Amazon-style item-to-item CF).
    Candidate pairs come from the per-basket self-join (bounded by
    basket size², not catalog²); the support floor (co-count ≥ 3)
    prunes noise pairs BEFORE ranking. Integer counts + one
    correctly-rounded sqrt/divide ⇒ bit-portable scores; top-100 by
    TakeOrdered."""
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .persist()
    )
    ic = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = op.alias("a")
    b = op.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 3)
    )
    ia = ic.select(F.col("l_partkey").alias("pa"), F.col("n").alias("na"))
    ib = ic.select(F.col("l_partkey").alias("pb"), F.col("n").alias("nb"))
    return (
        co.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .select(
            "pa",
            "pb",
            F.col("c").alias("n_co"),
            (
                F.col("c")
                / F.sqrt(F.col("na").cast("double") * F.col("nb"))
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("pa"), F.asc("pb"))
        .limit(100)
    )


@register(
    "events_daily_count_anomalies",
    oracle=f"""
WITH t0 AS (SELECT min(epoch_us(ts)) AS ts0 FROM events),
byday AS (
  SELECT (epoch_us(ts) - ts0) // {_US_PER_DAY} AS day_idx,
         count(*) AS n
  FROM events, t0 GROUP BY 1
),
m AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS mean_n FROM byday)
SELECT day_idx, n, mean_n,
       n > mean_n + 3 * sqrt(mean_n) AS is_spike,
       n < mean_n - 3 * sqrt(mean_n) AS is_drop
FROM byday, m
ORDER BY day_idx
""",
)
def events_daily_count_anomalies(spark, sf_dir):
    """Day-level volume anomalies under the Poisson model: a day is a
    spike/drop when its count leaves mean ± 3·√mean (the variance of a
    Poisson IS its mean — no second moment needed, which is why this is
    the standard first monitor on event volumes). The mean is one
    exact division and sqrt is correctly-rounded IEEE, so flags are
    bit-portable. Day counts: one aggregate in the integer-µs domain;
    the stats ride a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min("ts").alias("ts0"))
    byday = (
        ev.crossJoin(F.broadcast(t0))
        .groupBy(F.expr(f"(ts - ts0) div {_US_PER_DAY}").alias("day_idx"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = byday.agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mean_n")
    )
    return (
        byday.crossJoin(F.broadcast(m))
        .select(
            "day_idx",
            "n",
            "mean_n",
            (F.col("n") > F.col("mean_n") + 3 * F.sqrt("mean_n")).alias(
                "is_spike"
            ),
            (F.col("n") < F.col("mean_n") - 3 * F.sqrt("mean_n")).alias(
                "is_drop"
            ),
        )
        .orderBy("day_idx")
    )


@register(
    "events_user_entropy",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type
),
tot AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY user_id),
terms AS (
  SELECT c.user_id,
         CAST(round(-(CAST(n AS DOUBLE) / nt)
                    * log2(CAST(n AS DOUBLE) / nt), 9)
              AS DECIMAL(18,9)) AS term
  FROM c JOIN tot ON c.user_id = tot.user_id
)
SELECT user_id, CAST(sum(term) AS DOUBLE) AS entropy_bits
FROM terms GROUP BY user_id
""",
)
def events_user_entropy(spark, sf_dir):
    """Per-user behavioral entropy over the event-type distribution
    (H = −Σ p·log₂p): the diversity score that separates single-action
    bots (H≈0) from organic users (H near log₂|types|) — a standard
    bot/abuse screen. Each term is computed once per (user, type) and
    rounded; the per-user sum rides DECIMAL so partial-aggregation
    order can't flip bits."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.groupBy("user_id").agg(F.sum("n").alias("nt"))
    p = F.col("n").cast("double") / F.col("nt")
    terms = c.join(tot, "user_id").select(
        "user_id",
        F.round(-p * F.log2(p), 9).cast("decimal(18,9)").alias("term"),
    )
    return terms.groupBy("user_id").agg(
        F.sum("term").cast("double").alias("entropy_bits")
    )


@register(
    "text_readability_scores",
    oracle="""
WITH t AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         greatest(len(regexp_split_to_array(text, '[.!?]+')) - 1, 1)
           AS n_sentences,
         len(regexp_split_to_array(lower(text), '[aeiouy]+')) - 1
           AS n_vowel_groups
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_vowel_groups,
       CAST(n_words AS DOUBLE) / n_sentences AS words_per_sentence,
       CAST(n_vowel_groups AS DOUBLE) / n_words AS syllables_per_word
FROM t
""",
)
def text_readability_scores(spark, sf_dir):
    """Flesch-style readability inputs: words per sentence and a
    vowel-group syllable proxy per word — the complexity gate that
    complements the length/stopword quality scores (legalese and
    machine-generated run-ons fail words-per-sentence long before they
    fail length filters). Pure regex counting, one narrow map; counts
    are integers and each ratio one exact IEEE division."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    n_sentences = F.greatest(
        F.size(F.split(F.col("text"), "[.!?]+")) - 1, F.lit(1)
    )
    n_vowels = F.size(F.split(F.lower(F.col("text")), "[aeiouy]+")) - 1
    t = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sentences.cast("long").alias("n_sentences"),
        n_vowels.cast("long").alias("n_vowel_groups"),
    )
    return t.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_vowel_groups",
        (F.col("n_words").cast("double") / F.col("n_sentences")).alias(
            "words_per_sentence"
        ),
        (F.col("n_vowel_groups").cast("double") / F.col("n_words")).alias(
            "syllables_per_word"
        ),
    )


# ---------------------------------------------------------------------------
# Population Stability Index — distribution drift between period halves
# ---------------------------------------------------------------------------
# Term sums over buckets are quantized to BIGINT nano-units before the
# final aggregate (same discipline as the Naive-Bayes micro-nat scores):
# integer sums are associative, so the result is identical under any
# partitioning; each term itself is a fixed IEEE expression of exact
# Laplace-smoothed count ratios.

_PSI_ORACLE = """
WITH b AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi,
         max(value) AS vmax
  FROM events
),
tagged AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) * 2 <= lo + hi THEN 0 ELSE 1 END AS half,
         CAST(least(floor(value / (vmax / 10.0)), 9.0) AS BIGINT) AS bucket
  FROM events, b
),
spine AS (
  SELECT event_type, bucket
  FROM (SELECT DISTINCT event_type FROM tagged),
       (SELECT unnest(generate_series(0, 9)) AS bucket)
),
cnt AS (
  SELECT spine.event_type, spine.bucket,
         coalesce(sum(CASE WHEN half = 0 THEN 1 END), 0) AS ca,
         coalesce(sum(CASE WHEN half = 1 THEN 1 END), 0) AS cb
  FROM spine LEFT JOIN tagged
    ON spine.event_type = tagged.event_type
   AND spine.bucket = tagged.bucket
  GROUP BY spine.event_type, spine.bucket
),
tot AS (
  SELECT event_type, bucket, ca, cb,
         sum(ca) OVER (PARTITION BY event_type) AS ta,
         sum(cb) OVER (PARTITION BY event_type) AS tb
  FROM cnt
),
terms AS (
  SELECT event_type, ta, tb,
         CAST(round(
           ((CAST(ca + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE))
            - (CAST(cb + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE)))
           * ln((CAST(ca + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE))
                / (CAST(cb + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE)))
           * 1000000000.0
         ) AS BIGINT) AS term_nano
  FROM tot
)
SELECT event_type,
       CAST(max(ta) AS BIGINT) AS n_first_half,
       CAST(max(tb) AS BIGINT) AS n_second_half,
       CAST(sum(term_nano) AS BIGINT) AS psi_nano
FROM terms GROUP BY event_type
"""


@register("events_psi_drift", oracle=_PSI_ORACLE)
def events_psi_drift(spark, sf_dir):
    """Population Stability Index of the value distribution, first half
    of the observation window vs. second, per event type — the standard
    "did my feature distribution drift?" monitor (PSI > 0.2 = act).

    10 equal-width value buckets (bounds derived from one 1-row min/max
    agg, broadcast), Laplace-smoothed shares so empty buckets stay
    finite, and per-bucket PSI terms quantized to BIGINT nano-units so
    the cross-bucket sum is associative — reproducible on any cluster.
    Heavy lineage: one scan + one (type, bucket) aggregate over a dense
    10-row-per-type spine; everything after is window math on ≤ 50
    rows.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    b = ev.agg(
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
        F.max("value").alias("vmax"),
    )
    tagged = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(F.col("ts") * 2 <= F.col("lo") + F.col("hi"), 0)
        .otherwise(1)
        .alias("half"),
        F.least(
            F.floor(F.col("value") / (F.col("vmax") / 10.0)), F.lit(9.0)
        )
        .cast("long")
        .alias("bucket"),
    )
    spine = (
        tagged.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                ev.sparkSession.range(0, 10).select(
                    F.col("id").alias("bucket")
                )
            )
        )
    )
    cnt = (
        spine.join(tagged, ["event_type", "bucket"], "left")
        .groupBy("event_type", "bucket")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("half") == 0, 1)), F.lit(0)
            ).alias("ca"),
            F.coalesce(
                F.sum(F.when(F.col("half") == 1, 1)), F.lit(0)
            ).alias("cb"),
        )
    )
    w = Window.partitionBy("event_type")
    tot = cnt.select(
        "event_type",
        "ca",
        "cb",
        F.sum("ca").over(w).alias("ta"),
        F.sum("cb").over(w).alias("tb"),
    )
    pa = (F.col("ca") + 1).cast("double") / (F.col("ta") + 10).cast("double")
    pb = (F.col("cb") + 1).cast("double") / (F.col("tb") + 10).cast("double")
    terms = tot.select(
        "event_type",
        "ta",
        "tb",
        F.round((pa - pb) * F.log(pa / pb) * 1_000_000_000.0)
        .cast("long")
        .alias("term_nano"),
    )
    return terms.groupBy("event_type").agg(
        F.max("ta").cast("long").alias("n_first_half"),
        F.max("tb").cast("long").alias("n_second_half"),
        F.sum("term_nano").cast("long").alias("psi_nano"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit screen
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH digits AS (
  SELECT event_type,
         CAST(floor(value / power(10.0, floor(log10(value)))) AS BIGINT)
           AS d
  FROM events WHERE value > 0
),
spine AS (
  SELECT event_type, d
  FROM (SELECT DISTINCT event_type FROM digits),
       (SELECT unnest(generate_series(1, 9)) AS d)
),
cnt AS (
  SELECT spine.event_type, spine.d,
         coalesce(count(digits.d), 0) AS obs
  FROM spine LEFT JOIN digits
    ON spine.event_type = digits.event_type AND spine.d = digits.d
  GROUP BY spine.event_type, spine.d
),
tot AS (
  SELECT event_type, d, obs,
         sum(obs) OVER (PARTITION BY event_type) AS n
  FROM cnt
),
terms AS (
  SELECT event_type, n,
         CAST(round(
           (CAST(obs AS DOUBLE)
            - CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))
           * (CAST(obs AS DOUBLE)
              - CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))
           / (CAST(n AS DOUBLE) * log10(1.0 + 1.0 / CAST(d AS DOUBLE)))
           * 1000000.0
         ) AS BIGINT) AS term_micro
  FROM tot
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_values,
       CAST(sum(term_micro) AS BIGINT) AS chi2_micro
FROM terms GROUP BY event_type
"""


@register("events_benford_screen", oracle=_BENFORD_ORACLE)
def events_benford_screen(spark, sf_dir):
    """Benford's-law first-digit screen: χ² distance between the
    observed leading-digit distribution of event values and the Benford
    expectation log10(1+1/d) — the classic fabricated-data / broken-
    instrumentation detector.

    The digit extraction is a fixed double expression (log10/power of
    the same IEEE input on both engines); per-digit χ² terms are
    quantized to BIGINT micro-units before summing so the 9-term
    reduction is associative. Dense digit spine (types × 1..9) keeps
    zero-observation digits in the statistic. One scan + one small
    aggregate; the value > 0 predicate pushes to parquet.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    digits = ev.filter(F.col("value") > 0).select(
        "event_type",
        F.floor(
            F.col("value") / F.pow(F.lit(10.0), F.floor(F.log10("value")))
        )
        .cast("long")
        .alias("d"),
    )
    spine = (
        digits.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                ev.sparkSession.range(1, 10).select(F.col("id").alias("d"))
            )
        )
    )
    cnt = (
        spine.alias("s")
        .join(
            digits.alias("g"),
            (F.col("s.event_type") == F.col("g.event_type"))
            & (F.col("s.d") == F.col("g.d")),
            "left",
        )
        .groupBy(F.col("s.event_type").alias("event_type"), F.col("s.d").alias("d"))
        .agg(F.count(F.col("g.d")).alias("obs"))
    )
    w = Window.partitionBy("event_type")
    tot = cnt.select(
        "event_type", "d", "obs", F.sum("obs").over(w).alias("n")
    )
    exp = F.col("n").cast("double") * F.log10(
        1.0 + 1.0 / F.col("d").cast("double")
    )
    dev = F.col("obs").cast("double") - exp
    terms = tot.select(
        "event_type",
        "n",
        F.round(dev * dev / exp * 1_000_000.0).cast("long").alias(
            "term_micro"
        ),
    )
    return terms.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_values"),
        F.sum("term_micro").cast("long").alias("chi2_micro"),
    )


# ---------------------------------------------------------------------------
# Exact two-sample tests between A/B variants (KS and Mann-Whitney)
# ---------------------------------------------------------------------------
# Both tests reduce to cumulative counts over the DISTINCT-value
# relation: every statistic is integer until one final fixed-form
# double expression, so the result is bit-reproducible under any
# partitioning. The cumulative window is global, but it runs on the
# collapsed distinct-value relation (not the fact table); at cluster
# scale the same prefix-sum runs over a repartitionByRange + running
# per-partition offsets — the plan below is the sf-appropriate form.

_KS_ORACLE = """
WITH v AS (
  SELECT value,
         sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS ca_v,
         sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS cb_v
  FROM events GROUP BY value
),
c AS (
  SELECT sum(ca_v) OVER (ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS ca,
         sum(cb_v) OVER (ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cb,
         sum(ca_v) OVER () AS na,
         sum(cb_v) OVER () AS nb
  FROM v
)
SELECT CAST(max(na) AS BIGINT) AS n_a,
       CAST(max(nb) AS BIGINT) AS n_b,
       CAST(max(abs(ca * max_nb - cb * max_na)) AS BIGINT) AS d_num,
       CAST(max(abs(ca * max_nb - cb * max_na)) AS DOUBLE)
         / (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE)) AS ks_stat
FROM (SELECT ca, cb, na, nb,
             max(na) OVER () AS max_na, max(nb) OVER () AS max_nb
      FROM c)
"""


@register("events_ks_test_ab", oracle=_KS_ORACLE)
def events_ks_test_ab(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov statistic between the A/B
    variants' value distributions (variant = user_id % 2, as in
    `events_ab_test_lift`): D = max |F_a − F_b| with the CDF gap kept
    as the INTEGER |ca·n_b − cb·n_a| until one final division.

    Lineage: one hash-agg collapses the fact table to per-distinct-
    value A/B counts; the cumulative window and the max then run over
    that collapsed relation. Integer cross-multiplication avoids the
    per-row double division a naive CDF comparison would do — and makes
    the max deterministic (no float ties).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    is_a = (F.col("user_id") % 2 == 0).cast("long")
    v = ev.groupBy("value").agg(
        F.sum(is_a).alias("ca_v"),
        F.sum(1 - is_a).alias("cb_v"),
    )
    run = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    allw = Window.partitionBy()
    c = v.select(
        F.sum("ca_v").over(run).alias("ca"),
        F.sum("cb_v").over(run).alias("cb"),
        F.sum("ca_v").over(allw).alias("na"),
        F.sum("cb_v").over(allw).alias("nb"),
    )
    gap = F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
    return c.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.max(gap).cast("long").alias("d_num"),
        (
            F.max(gap).cast("double")
            / (F.max("na").cast("double") * F.max("nb").cast("double"))
        ).alias("ks_stat"),
    )


_MWU_ORACLE = """
WITH v AS (
  SELECT value,
         sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS ca_v,
         sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS cb_v
  FROM events GROUP BY value
),
r AS (
  SELECT ca_v, cb_v, ca_v + cb_v AS t,
         coalesce(sum(ca_v + cb_v) OVER (ORDER BY value
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM v
),
s AS (
  SELECT CAST(sum(ca_v) AS BIGINT) AS na,
         CAST(sum(cb_v) AS BIGINT) AS nb,
         CAST(sum(ca_v * (2 * cum_before + t + 1)) AS BIGINT) AS s2a,
         sum(CAST(t * t * t - t AS DECIMAL(38,0))) AS tie3
  FROM r
)
SELECT na, nb,
       s2a - na * (na + 1) AS u2_a,
       (CAST(s2a - na * (na + 1) AS DOUBLE) - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
       / (2.0 * sqrt(
            CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
            * (CAST(na + nb + 1 AS DOUBLE)
               - CAST(tie3 AS DOUBLE)
                 / (CAST(na + nb AS DOUBLE) * CAST(na + nb - 1 AS DOUBLE)))
          )) AS z_stat
FROM s
"""


@register("events_mannwhitney_ab", oracle=_MWU_ORACLE)
def events_mannwhitney_ab(spark, sf_dir):
    """Exact Mann-Whitney U between the A/B variants — the rank-based
    (distribution-free) companion to the mean-based z-test in
    `events_ab_test_lift`, robust to the heavy tails that
    `events_skew_kurtosis` diagnoses.

    Tie-averaged ranks are kept integral by working in DOUBLED rank
    units: a tied run of t values starting after cum_before rows has
    average 2×rank = 2·cum_before + t + 1, so U arrives as the exact
    BIGINT u2_a = 2·U_a. The tie-corrected normal approximation is one
    fixed double expression over (na, nb, u2_a, Σt³−t). Same collapsed
    distinct-value lineage as the KS test: one hash-agg + prefix sums
    over the distinct-value relation.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    is_a = (F.col("user_id") % 2 == 0).cast("long")
    v = ev.groupBy("value").agg(
        F.sum(is_a).alias("ca_v"),
        F.sum(1 - is_a).alias("cb_v"),
    )
    before = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1
    )
    t = F.col("ca_v") + F.col("cb_v")
    r = v.select(
        "ca_v",
        "cb_v",
        t.alias("t"),
        F.coalesce(F.sum(t).over(before), F.lit(0)).alias("cum_before"),
    )
    s = r.agg(
        F.sum("ca_v").cast("long").alias("na"),
        F.sum("cb_v").cast("long").alias("nb"),
        F.sum(
            F.col("ca_v") * (2 * F.col("cum_before") + F.col("t") + 1)
        )
        .cast("long")
        .alias("s2a"),
        F.sum(
            (F.col("t") * F.col("t") * F.col("t") - F.col("t")).cast(
                "decimal(38,0)"
            )
        ).alias("tie3"),
    )
    na, nb = F.col("na"), F.col("nb")
    u2a = F.col("s2a") - na * (na + 1)
    nad, nbd = na.cast("double"), nb.cast("double")
    z = (u2a.cast("double") - nad * nbd) / (
        2.0
        * F.sqrt(
            nad * nbd / 12.0
            * (
                (na + nb + 1).cast("double")
                - F.col("tie3").cast("double")
                / ((na + nb).cast("double") * (na + nb - 1).cast("double"))
            )
        )
    )
    return s.select(
        "na",
        "nb",
        u2a.alias("u2_a"),
        z.alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Deterministic distributed bootstrap (Poissonized resampling)
# ---------------------------------------------------------------------------
# The scale-canonical bootstrap: instead of materializing R resamples,
# each row carries a Poisson(1) weight per replicate (the Poissonized /
# "Bag of Little Bootstraps" trick — one scan, R weighted sums). The
# Poisson draw is the fixed inverse-CDF table below applied to a
# uniform derived from the engine's portable det_hash — so the whole
# procedure is reproducible across engines, runs, and cluster sizes,
# and the DuckDB oracle can replay it exactly.

_BOOT_REPS = 100
# Poisson(1) CDF × 1e6, capped at weight 4 (P(W>4) ≈ 0.37%).
_POIS_CUM = [367879, 735759, 919699, 981012]


def _pois_w_sql(u: str) -> str:
    return (
        f"CASE WHEN {u} < {_POIS_CUM[0]} THEN 0"
        f" WHEN {u} < {_POIS_CUM[1]} THEN 1"
        f" WHEN {u} < {_POIS_CUM[2]} THEN 2"
        f" WHEN {u} < {_POIS_CUM[3]} THEN 3"
        f" ELSE 4 END"
    )


_BOOT_ORACLE = f"""
WITH expanded AS (
  SELECT rep,
         CAST(round(value * 100) AS BIGINT) AS y,
         {SQL_DET_HASH.format(col='(event_id * 101 + rep)')} % 1000000 AS u6
  FROM events,
       (SELECT unnest(generate_series(0, {_BOOT_REPS - 1})) AS rep)
),
reps AS (
  SELECT rep,
         CAST(sum({_pois_w_sql('u6')}) AS BIGINT) AS sw,
         CAST(sum({_pois_w_sql('u6')} * y) AS BIGINT) AS swy
  FROM expanded GROUP BY rep
),
means AS (
  SELECT rep, CAST(swy AS DOUBLE) / CAST(sw AS DOUBLE) AS m,
         row_number() OVER (ORDER BY CAST(swy AS DOUBLE) / CAST(sw AS DOUBLE),
                            rep) AS rn
  FROM reps WHERE sw > 0
),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS mean_scaled
  FROM events
)
SELECT base.n, base.mean_scaled,
       (SELECT m FROM means WHERE rn = 3) AS ci_lo_scaled,
       (SELECT m FROM means WHERE rn = 98) AS ci_hi_scaled,
       CAST({_BOOT_REPS} AS BIGINT) AS n_reps
FROM base
"""


@register("events_bootstrap_ci", oracle=_BOOT_ORACLE)
def events_bootstrap_ci(spark, sf_dir):
    """95% bootstrap CI for the mean event value via deterministic
    Poissonized resampling: each row carries a Poisson(1) weight per
    replicate, drawn by inverse-CDF from the portable hash of
    (event_id, rep) — R=100 resamples in ONE scan, no data
    materialization, fully reproducible (same CI on any cluster).

    This is the production form of the bootstrap at 100 TB: the naive
    version materializes R copies of the data; the Poissonized version
    is a single explode×R (row-local) followed by an R-group hash-agg
    of two BIGINT counters each — shuffle volume is R rows, not R
    datasets. Replicate means order by (mean, rep) for a total order;
    the percentile pick is exact rank 3/98 of 100.
    """
    ev = load_table(spark, sf_dir, "events")
    reps = F.explode(F.sequence(F.lit(0), F.lit(_BOOT_REPS - 1))).alias("rep")
    y = F.round(F.col("value") * 100).cast("long")
    expanded = ev.select(y.alias("y"), "event_id", reps)
    key = F.col("event_id") * 101 + F.col("rep")
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    u6 = (det_hash(key) % 1_000_000).alias("u6")
    expanded = expanded.select("rep", "y", u6)
    w = (
        F.when(F.col("u6") < _POIS_CUM[0], 0)
        .when(F.col("u6") < _POIS_CUM[1], 1)
        .when(F.col("u6") < _POIS_CUM[2], 2)
        .when(F.col("u6") < _POIS_CUM[3], 3)
        .otherwise(4)
    )
    rep_sums = (
        expanded.select("rep", w.alias("w"), "y")
        .groupBy("rep")
        .agg(
            F.sum("w").cast("long").alias("sw"),
            F.sum(F.col("w") * F.col("y")).cast("long").alias("swy"),
        )
        .filter(F.col("sw") > 0)
    )
    from pyspark.sql import Window

    m = (F.col("swy").cast("double") / F.col("sw").cast("double")).alias("m")
    rn = F.row_number().over(
        Window.orderBy(
            F.col("swy").cast("double") / F.col("sw").cast("double"),
            F.col("rep"),
        )
    )
    means = rep_sums.select(m, rn.alias("rn"))
    lo = means.filter(F.col("rn") == 3).select(
        F.col("m").alias("ci_lo_scaled")
    )
    hi = means.filter(F.col("rn") == 98).select(
        F.col("m").alias("ci_hi_scaled")
    )
    base = ev.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(y).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("mean_scaled"),
    )
    return (
        base.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .withColumn("n_reps", F.lit(_BOOT_REPS).cast("long"))
    )


# ---------------------------------------------------------------------------
# Watermark lateness audit (batch diagnostic for streaming configs)
# ---------------------------------------------------------------------------

_LATE_ORACLE = """
WITH lat AS (
  SELECT event_type,
         max(epoch_us(ts)) OVER (ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - epoch_us(ts) AS late_us
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late_1h,
       CAST(sum(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late_10m,
       CAST(max(late_us) AS BIGINT) AS max_late_us
FROM lat GROUP BY event_type
"""


@register("events_lateness_audit", oracle=_LATE_ORACLE)
def events_lateness_audit(spark, sf_dir):
    """Watermark-sizing diagnostic: for each event, its lateness versus
    the maximum event time seen so far in arrival order (the exact
    quantity a streaming watermark compares against), aggregated to
    "how many events would a 10-minute / 1-hour watermark drop?" —
    the batch audit you run BEFORE picking `withWatermark` bounds for
    the §2.8 streaming pipelines.

    Arrival order is the ingest offset (event_id — this testdata's
    synthetic ingest log assigns ids in arrival order). The running
    watermark max(event-time) over that order is computed with
    ``operators.ranks.ordered_scan`` — the hierarchical two-level scan
    — because a bare ``Window.orderBy(...)`` with no partitionBy plans
    as Exchange SinglePartition over the ENTIRE fact table: correct at
    sf0.01, serial at 100 TB. Running MAX is order-insensitive within
    any prefix, so the block decomposition is exact (asserted against
    a one-partition reference on shuffled arrivals in
    tests/test_ranks.py); everything downstream is a conditional
    aggregate with map-side partials.
    """
    from wikipedia_data_pipeline_spark.operators.ranks import ordered_scan

    ev = load_table(spark, sf_dir, "events")
    scanned = ordered_scan(
        ev.select("event_id", "event_type", "ts"),
        ["event_id"],
        running=[("wm_ts", "ts", "max")],
    )
    lat = scanned.select(
        "event_type",
        (F.col("wm_ts") - F.col("ts")).alias("late_us"),
    )
    return lat.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("late_us") > 3_600_000_000, 1).otherwise(0))
        .cast("long")
        .alias("n_late_1h"),
        F.sum(F.when(F.col("late_us") > 600_000_000, 1).otherwise(0))
        .cast("long")
        .alias("n_late_10m"),
        F.max("late_us").cast("long").alias("max_late_us"),
    )


# ---------------------------------------------------------------------------
# Ordered array aggregation — per-nation monthly revenue sparklines
# ---------------------------------------------------------------------------

_SPARK_ORACLE = """
WITH m AS (
  SELECT n_name,
         year(o_orderdate) * 12 + month(o_orderdate) AS mth,
         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, year(o_orderdate) * 12 + month(o_orderdate)
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_months,
       list(mth ORDER BY mth) AS months,
       list(CAST(rev_dec AS DOUBLE) ORDER BY mth) AS revenues
FROM m GROUP BY n_name
"""


@register("nation_revenue_sparklines", oracle=_SPARK_ORACLE)
def nation_revenue_sparklines(spark, sf_dir):
    """Ordered array aggregation: each nation's monthly revenue series
    collected into aligned (months[], revenues[]) arrays — the
    "sparkline per entity" readout BI layers and feature stores both
    want (a series as one row, not 80).

    Spark's collect_list is partition-order-nondeterministic, so the
    engine collects (mth, rev) STRUCTS and sort_array's them — struct
    ordering is lexicographic on fields, and mth is unique per group,
    giving a declared total order; the aligned arrays are then
    projected out with transform(). Same month-key ordering as
    DuckDB's list(... ORDER BY mth).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    m = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
                "mth"
            ),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias(
                "rev_dec"
            )
        )
    )
    pairs = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("mth").alias("mth"),
                F.col("rev_dec").cast("double").alias("rev"),
            )
        )
    )
    return m.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.transform(pairs, lambda p: p["mth"]).alias("months"),
        F.transform(pairs, lambda p: p["rev"]).alias("revenues"),
    )


# ---------------------------------------------------------------------------
# Distributed integrity checksum (migration / replication validation)
# ---------------------------------------------------------------------------

_CHECKSUM_ORACLE = f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST({SQL_DET_HASH.format(
           col='(o_orderkey * 31 + o_custkey)')} AS DECIMAL(38,0)))
         AS BIGINT) AS key_checksum,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents_total
FROM orders
"""


@register("orders_integrity_checksum", oracle=_CHECKSUM_ORACLE)
def orders_integrity_checksum(spark, sf_dir):
    """Order-independent table checksum: row count + an associative sum
    of a portable per-row key hash + the exact cents total — the
    cheap "did the copy/migration/replication preserve every row?"
    certificate. Any dropped, duplicated, or key-mutated row moves the
    checksum; summation is associative so any partitioning yields the
    identical value, and the same SQL runs on any engine for
    cross-system reconciliation (exactly how this repo's own driver
    verifies Spark against DuckDB). One scan, 3 counters."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            det_hash(F.col("o_orderkey") * 31 + F.col("o_custkey")).cast(
                "decimal(38,0)"
            )
        )
        .cast("long")
        .alias("key_checksum"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("price_cents_total"),
    )


# ---------------------------------------------------------------------------
# Single-pass feature correlation matrix
# ---------------------------------------------------------------------------

_CORR_EXPR = (
    "(nd * {sab} - {sa} * {sb})"
    " / (sqrt(nd * {saa} - {sa} * {sa})"
    "    * sqrt(nd * {sbb} - {sb} * {sb}))"
)

_CORRM_ORACLE = f"""
WITH p AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         (epoch_us(ts) // 3600000000) % 24 AS hod,
         (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
  FROM events
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(v AS DECIMAL(38,0))) AS sv,
         sum(CAST(hod AS DECIMAL(38,0))) AS sh,
         sum(CAST(dow AS DECIMAL(38,0))) AS sd,
         sum(CAST(v * v AS DECIMAL(38,0))) AS svv,
         sum(CAST(hod * hod AS DECIMAL(38,0))) AS shh,
         sum(CAST(dow * dow AS DECIMAL(38,0))) AS sdd,
         sum(CAST(v * hod AS DECIMAL(38,0))) AS svh,
         sum(CAST(v * dow AS DECIMAL(38,0))) AS svd,
         sum(CAST(hod * dow AS DECIMAL(38,0))) AS shd
  FROM p
),
d AS (
  SELECT n, CAST(n AS DOUBLE) AS nd,
         CAST(sv AS DOUBLE) AS dv, CAST(sh AS DOUBLE) AS dh,
         CAST(sd AS DOUBLE) AS dd, CAST(svv AS DOUBLE) AS dvv,
         CAST(shh AS DOUBLE) AS dhh, CAST(sdd AS DOUBLE) AS ddd,
         CAST(svh AS DOUBLE) AS dvh, CAST(svd AS DOUBLE) AS dvd,
         CAST(shd AS DOUBLE) AS dhd
  FROM s
)
SELECT 'value' AS feat_a, 'hour_of_day' AS feat_b,
       {_CORR_EXPR.format(sab='dvh', sa='dv', sb='dh', saa='dvv', sbb='dhh')}
         AS corr FROM d
UNION ALL
SELECT 'value', 'day_of_week',
       {_CORR_EXPR.format(sab='dvd', sa='dv', sb='dd', saa='dvv', sbb='ddd')}
       FROM d
UNION ALL
SELECT 'hour_of_day', 'day_of_week',
       {_CORR_EXPR.format(sab='dhd', sa='dh', sb='dd', saa='dhh', sbb='ddd')}
       FROM d
"""


@register("events_feature_corr_matrix", oracle=_CORRM_ORACLE)
def events_feature_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix of derived event features
    (value, hour-of-day, day-of-week) in ONE scan: all 10 moment sums
    ride a single aggregate, so adding features widens the row instead
    of adding passes — the feature-screening shape that matters when
    the input is 100 TB (k features = one pass, k² counters, not k²
    passes).

    Same exactness discipline as `events_autocorr_lag1`: integer-scaled
    features, DECIMAL moment sums, fixed IEEE Pearson finale shared
    with the oracle text.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("v"),
        ((F.col("ts") / 3_600_000_000).cast("long") % 24).alias("hod"),
        ((F.col("ts") / 86_400_000_000).cast("long") + 4) .alias("_d"),
    ).select("v", "hod", (F.col("_d") % 7).alias("dow"))
    dec = "decimal(38,0)"
    s = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("sv"),
        F.sum(F.col("hod").cast(dec)).alias("sh"),
        F.sum(F.col("dow").cast(dec)).alias("sd"),
        F.sum((F.col("v") * F.col("v")).cast(dec)).alias("svv"),
        F.sum((F.col("hod") * F.col("hod")).cast(dec)).alias("shh"),
        F.sum((F.col("dow") * F.col("dow")).cast(dec)).alias("sdd"),
        F.sum((F.col("v") * F.col("hod")).cast(dec)).alias("svh"),
        F.sum((F.col("v") * F.col("dow")).cast(dec)).alias("svd"),
        F.sum((F.col("hod") * F.col("dow")).cast(dec)).alias("shd"),
    )
    d = s.selectExpr(
        "cast(n as double) AS nd",
        "cast(sv as double) AS dv",
        "cast(sh as double) AS dh",
        "cast(sd as double) AS dd",
        "cast(svv as double) AS dvv",
        "cast(shh as double) AS dhh",
        "cast(sdd as double) AS ddd",
        "cast(svh as double) AS dvh",
        "cast(svd as double) AS dvd",
        "cast(shd as double) AS dhd",
    )
    pairs = [
        ("value", "hour_of_day", "dvh", "dv", "dh", "dvv", "dhh"),
        ("value", "day_of_week", "dvd", "dv", "dd", "dvv", "ddd"),
        ("hour_of_day", "day_of_week", "dhd", "dh", "dd", "dhh", "ddd"),
    ]
    outs = [
        d.selectExpr(
            f"'{a}' AS feat_a",
            f"'{b}' AS feat_b",
            _CORR_EXPR.format(sab=sab, sa=sa, sb=sb, saa=saa, sbb=sbb)
            + " AS corr",
        )
        for a, b, sab, sa, sb, saa, sbb in pairs
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# Weighted median (quantity-weighted price per brand)
# ---------------------------------------------------------------------------

_WMED_ORACLE = """
WITH w AS (
  SELECT p_brand,
         CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT)
           AS unit_cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
g AS (
  SELECT p_brand, unit_cents, sum(qty) AS qty
  FROM w GROUP BY p_brand, unit_cents
),
c AS (
  SELECT p_brand, unit_cents,
         sum(qty) OVER (PARTITION BY p_brand ORDER BY unit_cents
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum,
         sum(qty) OVER (PARTITION BY p_brand) AS tot
  FROM g
)
SELECT p_brand,
       CAST(min(CASE WHEN cum * 2 >= tot THEN unit_cents END) AS BIGINT)
         AS weighted_median_cents,
       CAST(max(tot) AS BIGINT) AS total_qty
FROM c GROUP BY p_brand
"""


@register("lineitem_weighted_median_price", oracle=_WMED_ORACLE)
def lineitem_weighted_median_price(spark, sf_dir):
    """Quantity-weighted median unit price per brand — the volume-
    representative "typical price" (an unweighted median over line
    items lets many tiny orders outvote one large one).

    Weighted percentile has no builtin in either engine; the engine
    spells it as the textbook definition: collapse to (group, value,
    Σweight), prefix-sum the weights in value order, and take the first
    value whose cumulative weight reaches half the total (discrete
    selection — no interpolation, so the result is an actual observed
    price and bit-portable). The 2× cross-multiplication keeps the
    crossing test integral. Lineage: one broadcast dim join + one
    hash-agg collapse; the windows run per-brand over collapsed
    distinct prices.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    w = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand",
        F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100)
        .cast("long")
        .alias("unit_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    g = w.groupBy("p_brand", "unit_cents").agg(F.sum("qty").alias("qty"))
    run = (
        Window.partitionBy("p_brand")
        .orderBy("unit_cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("p_brand")
    c = g.select(
        "p_brand",
        "unit_cents",
        F.sum("qty").over(run).alias("cum"),
        F.sum("qty").over(tot_w).alias("tot"),
    )
    return c.groupBy("p_brand").agg(
        F.min(
            F.when(F.col("cum") * 2 >= F.col("tot"), F.col("unit_cents"))
        )
        .cast("long")
        .alias("weighted_median_cents"),
        F.max("tot").cast("long").alias("total_qty"),
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration index
# ---------------------------------------------------------------------------

_HHI_ORACLE = """
WITH rev AS (
  SELECT n_name, o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS DECIMAL(38,0)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, o_custkey
),
s AS (
  SELECT n_name,
         CAST(count(*) AS BIGINT) AS n_customers,
         sum(cents * cents) AS sq,
         sum(cents) AS tot
  FROM rev GROUP BY n_name
)
SELECT n_name, n_customers,
       CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
         AS hhi
FROM s
"""


@register("nation_revenue_hhi", oracle=_HHI_ORACLE)
def nation_revenue_hhi(spark, sf_dir):
    """Herfindahl-Hirschman concentration of customer revenue within
    each nation: Σ share² — "is this market a few whales or a long
    tail?" (1/n = perfectly even, 1.0 = single customer). The
    identity Σ(cᵢ/T)² = Σcᵢ²/T² lets every term stay integral: cents
    totals, DECIMAL squares and sums, ONE double division at the end —
    no per-customer share division at all.

    Two hash-aggs that share the customer key ordering (per-customer
    cents, then per-nation moments); dims broadcast.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("decimal(38,0)")
            .alias("cents")
        )
    )
    s = rev.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("cents") * F.col("cents")).alias("sq"),
        F.sum("cents").alias("tot"),
    )
    return s.select(
        "n_name",
        "n_customers",
        (
            F.col("sq").cast("double")
            / (F.col("tot").cast("double") * F.col("tot").cast("double"))
        ).alias("hhi"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve (customer lifetime, right-censored)
# ---------------------------------------------------------------------------
# The product Π(1 − dᵢ/nᵢ) is evaluated as exp(Σ ln(·)) with the log
# terms quantized to BIGINT nano-nats — the associative-sum discipline
# that makes every multiplicative statistic in this engine
# partitioning-proof.

_KM_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         min(year(o_orderdate) * 12 + month(o_orderdate)) AS first_m,
         max(year(o_orderdate) * 12 + month(o_orderdate)) AS last_m
  FROM orders GROUP BY o_custkey
),
bounds AS (SELECT max(last_m) AS data_end FROM cust),
obs AS (
  SELECT last_m - first_m AS duration_m,
         CASE WHEN data_end - last_m > 6 THEN 1 ELSE 0 END AS churned
  FROM cust, bounds
),
at_t AS (
  SELECT duration_m,
         CAST(sum(churned) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM obs GROUP BY duration_m
),
risk AS (
  SELECT duration_m, d,
         CAST((SELECT count(*) FROM obs)
           - coalesce(sum(c) OVER (ORDER BY duration_m
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS BIGINT)
           AS n_at_risk
  FROM at_t
),
terms AS (
  SELECT duration_m, d, n_at_risk,
         CASE WHEN d < n_at_risk
              THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE)
                                     / CAST(n_at_risk AS DOUBLE))
                              * 1000000000.0) AS BIGINT)
              ELSE NULL END AS lg_nano
  FROM risk WHERE d > 0
)
SELECT duration_m, d AS n_churned, n_at_risk,
       CASE WHEN min(CASE WHEN lg_nano IS NULL THEN 0 ELSE 1 END)
                 OVER (ORDER BY duration_m
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) = 0
            THEN NULL
            ELSE CAST(sum(lg_nano) OVER (ORDER BY duration_m
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS BIGINT)
       END AS log_survival_nano
FROM terms
"""


@register("orders_survival_curve", oracle=_KM_ORACLE)
def orders_survival_curve(spark, sf_dir):
    """Kaplan-Meier customer-lifetime curve: duration = months between
    first and last order, churn = no order within 6 months of dataset
    end (later customers are right-CENSORED — they leave the risk set
    without counting as deaths, the distinction naive retention math
    gets wrong).

    S(t) = Π(1−dᵢ/nᵢ) rides as a prefix sum of nano-nat log terms
    (associative → cluster-size-proof), shipped as the exact integer
    log_survival_nano (S = exp(·/1e9); a NULL marks the d=n collapse
    to S=0). The
    fact scan collapses to one row per customer, then one row per
    distinct duration — the windows never see raw orders.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    mth = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    cust = o.groupBy("o_custkey").agg(
        F.min(mth).alias("first_m"), F.max(mth).alias("last_m")
    )
    bounds = cust.agg(F.max("last_m").alias("data_end"))
    obs = cust.crossJoin(F.broadcast(bounds)).select(
        (F.col("last_m") - F.col("first_m")).alias("duration_m"),
        F.when(F.col("data_end") - F.col("last_m") > 6, 1)
        .otherwise(0)
        .alias("churned"),
    )
    n_total = obs.agg(F.count(F.lit(1)).alias("n_total"))
    at_t = obs.groupBy("duration_m").agg(
        F.sum("churned").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    before = Window.orderBy("duration_m").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = at_t.crossJoin(F.broadcast(n_total)).select(
        "duration_m",
        "d",
        (
            F.col("n_total")
            - F.coalesce(F.sum("c").over(before), F.lit(0))
        ).alias("n_at_risk"),
    )
    lg = F.when(
        F.col("d") < F.col("n_at_risk"),
        F.round(
            F.log(
                1.0 - F.col("d").cast("double") / F.col("n_at_risk").cast("double")
            )
            * 1_000_000_000.0
        ).cast("long"),
    )
    terms = risk.filter(F.col("d") > 0).select(
        "duration_m", "d", "n_at_risk", lg.alias("lg_nano")
    )
    run = Window.orderBy("duration_m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    alive = F.min(
        F.when(F.col("lg_nano").isNull(), 0).otherwise(1)
    ).over(run)
    # The readout is the EXACT integer nano-nat log-survival (a NULL
    # marks the S=0 collapse where d reached n). S(t) itself is
    # exp(log_survival_nano/1e9) — left to the consumer because exp()
    # differs by 1 ULP between Java's and libm's implementations, and
    # this engine only ships bit-reproducible columns.
    surv = F.when(alive == 0, F.lit(None).cast("long")).otherwise(
        F.sum("lg_nano").over(run).cast("long")
    )
    return terms.select(
        "duration_m",
        F.col("d").alias("n_churned"),
        "n_at_risk",
        surv.alias("log_survival_nano"),
    )


# ---------------------------------------------------------------------------
# Mutual information (event_type ; value bucket)
# ---------------------------------------------------------------------------

_MI_ORACLE = """
WITH b AS (SELECT max(value) AS vmax FROM events),
cells AS (
  SELECT event_type AS x,
         CAST(least(floor(value / (vmax / 10.0)), 9.0) AS BIGINT) AS y,
         count(*) AS nxy
  FROM events, b GROUP BY event_type,
       CAST(least(floor(value / (vmax / 10.0)), 9.0) AS BIGINT)
),
m AS (
  SELECT x, y, nxy,
         sum(nxy) OVER (PARTITION BY x) AS nx,
         sum(nxy) OVER (PARTITION BY y) AS ny,
         sum(nxy) OVER () AS n
  FROM cells
),
terms AS (
  SELECT n,
         CAST(round(
           (CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
           * ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
                / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))
           * 1000000000.0) AS BIGINT) AS term_nano
  FROM m
)
SELECT CAST(max(n) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(term_nano) AS BIGINT) AS mi_nano
FROM terms
"""


@register("events_mutual_information", oracle=_MI_ORACLE)
def events_mutual_information(spark, sf_dir):
    """Mutual information I(event_type ; value-bucket) — the model-free
    "is this feature informative about that label?" screen feature
    selection runs before training (correlation only sees linear
    dependence; MI sees any).

    All probabilities stay as ratios of the BIGINT contingency counts;
    each cell's p·ln(pN²/(nx·ny)) term quantizes to nano-nats so the
    cross-cell sum is associative. The contingency table is one
    hash-agg (≤ 50 cells); the marginals are windows over it.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.max("value").alias("vmax"))
    cells = (
        ev.crossJoin(F.broadcast(b))
        .select(
            F.col("event_type").alias("x"),
            F.least(
                F.floor(F.col("value") / (F.col("vmax") / 10.0)), F.lit(9.0)
            )
            .cast("long")
            .alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("nxy"))
    )
    m = cells.select(
        "nxy",
        F.sum("nxy").over(Window.partitionBy("x")).alias("nx"),
        F.sum("nxy").over(Window.partitionBy("y")).alias("ny"),
        F.sum("nxy").over(Window.partitionBy()).alias("n"),
    )
    p = F.col("nxy").cast("double") / F.col("n").cast("double")
    ratio = (
        F.col("nxy").cast("double")
        * F.col("n").cast("double")
        / (F.col("nx").cast("double") * F.col("ny").cast("double"))
    )
    terms = m.select(
        "n",
        F.round(p * F.log(ratio) * 1_000_000_000.0)
        .cast("long")
        .alias("term_nano"),
    )
    return terms.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("term_nano").cast("long").alias("mi_nano"),
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition lite (trend / seasonal / residual, monthly)
# ---------------------------------------------------------------------------
# Every component is derived from DECIMAL-exact monthly sums; to keep
# the seasonal means order-proof, deviations stay in the ×13 decimal
# domain (13·rev − Σ₁₃rev is exact) and only the final /13-style
# ratios are IEEE.

_DECOMP_ORACLE = """
WITH m AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mth,
         month(o_orderdate) AS moy,
         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
  FROM orders GROUP BY 1, 2
),
ma AS (
  SELECT mth, moy, rev_dec,
         CASE WHEN count(*) OVER w13 = 13
              THEN sum(rev_dec) OVER w13 END AS sum13_dec
  FROM m
  WINDOW w13 AS (ORDER BY mth ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
),
dev AS (
  SELECT mth, moy, rev_dec, sum13_dec,
         13 * rev_dec - sum13_dec AS dev13_dec
  FROM ma
),
seas AS (
  SELECT moy,
         CAST(sum(dev13_dec) AS DOUBLE) / (13.0 * count(dev13_dec))
           AS seasonal
  FROM dev WHERE dev13_dec IS NOT NULL GROUP BY moy
)
SELECT dev.mth,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(sum13_dec AS DOUBLE) / 13.0 AS trend,
       seas.seasonal,
       CASE WHEN sum13_dec IS NOT NULL
            THEN CAST(rev_dec AS DOUBLE)
                 - CAST(sum13_dec AS DOUBLE) / 13.0
                 - seas.seasonal END AS residual
FROM dev JOIN seas ON dev.moy = seas.moy
"""


@register("orders_seasonal_decompose", oracle=_DECOMP_ORACLE)
def orders_seasonal_decompose(spark, sf_dir):
    """Classical additive decomposition of monthly revenue into trend
    (centered 13-month moving average), month-of-year seasonal index
    (mean deviation from trend), and residual — the pre-model read
    every forecasting pipeline does first.

    Order-proofing: monthly revenue is DECIMAL-summed; the 13-month MA
    stays a DECIMAL window sum; deviations live in the exact ×13
    decimal domain (13·rev − Σ₁₃) so the per-month seasonal MEANS are
    decimal sums too — IEEE enters only in the final fixed ratios.
    Edge months (< 13-wide window) carry NULL trend/residual rather
    than a truncated average. All windows run over the ~one-row-per-
    month aggregate, never the fact table.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mth"),
        F.month("o_orderdate").alias("moy"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_dec"))
    w13 = Window.orderBy("mth").rowsBetween(-6, 6)
    ma = m.select(
        "mth",
        "moy",
        "rev_dec",
        F.when(
            F.count(F.lit(1)).over(w13) == 13, F.sum("rev_dec").over(w13)
        ).alias("sum13_dec"),
    )
    dev = ma.withColumn(
        "dev13_dec", F.lit(13) * F.col("rev_dec") - F.col("sum13_dec")
    )
    seas = (
        dev.filter(F.col("dev13_dec").isNotNull())
        .groupBy("moy")
        .agg(
            (
                F.sum("dev13_dec").cast("double")
                / (13.0 * F.count("dev13_dec"))
            ).alias("seasonal")
        )
    )
    out = dev.join(F.broadcast(seas), "moy")
    trend = F.col("sum13_dec").cast("double") / 13.0
    return out.select(
        "mth",
        F.col("rev_dec").cast("double").alias("revenue"),
        trend.alias("trend"),
        "seasonal",
        F.when(
            F.col("sum13_dec").isNotNull(),
            F.col("rev_dec").cast("double") - trend - F.col("seasonal"),
        ).alias("residual"),
    )


# ---------------------------------------------------------------------------
# XYZ demand-variability classes (companion to ABC revenue classes)
# ---------------------------------------------------------------------------

_XYZ_ORACLE = """
WITH pm AS (
  SELECT l_partkey, year(o_orderdate) * 12 + month(o_orderdate) AS mth,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_partkey, year(o_orderdate) * 12 + month(o_orderdate)
),
s AS (
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS n_months,
         sum(CAST(qty AS DECIMAL(38,0))) AS sq,
         sum(CAST(qty * qty AS DECIMAL(38,0))) AS sqq
  FROM pm GROUP BY l_partkey
),
cv AS (
  SELECT l_partkey, n_months,
         sqrt(CAST(n_months AS DOUBLE) * CAST(sqq AS DOUBLE)
              - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
         / CAST(sq AS DOUBLE) AS cv
  FROM s WHERE sq > 0 AND n_months > 1
)
SELECT l_partkey, n_months, cv,
       CASE WHEN cv < 0.5 THEN 'X' WHEN cv < 1.0 THEN 'Y'
            ELSE 'Z' END AS xyz_class
FROM cv
"""


@register("parts_xyz_variability", oracle=_XYZ_ORACLE)
def parts_xyz_variability(spark, sf_dir):
    """XYZ demand-variability classification per part — the companion
    axis to `parts_abc_classification` (ABC = how much value, XYZ = how
    predictable): coefficient of variation of monthly demand, cut at
    the standard 0.5 / 1.0 boundaries.

    CV = √(n·Σq² − (Σq)²) / Σq on DECIMAL-exact integer moments —
    algebraically equal to std/mean but computed entirely from
    associative sums, with one fixed IEEE finale (the √n factor
    cancels in the class boundaries' scale — boundaries stated in the
    population-std convention). Two hash-aggs, both keyed on partkey.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    pm = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "l_partkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
                "mth"
            ),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    dec = "decimal(38,0)"
    s = pm.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum(F.col("qty").cast(dec)).alias("sq"),
        F.sum((F.col("qty") * F.col("qty")).cast(dec)).alias("sqq"),
    )
    nd = F.col("n_months").cast("double")
    sq, sqq = F.col("sq").cast("double"), F.col("sqq").cast("double")
    cv = F.sqrt(nd * sqq - sq * sq) / sq
    out = s.filter((F.col("sq") > 0) & (F.col("n_months") > 1)).select(
        "l_partkey",
        "n_months",
        cv.alias("cv"),
    )
    return out.withColumn(
        "xyz_class",
        F.when(F.col("cv") < 0.5, "X")
        .when(F.col("cv") < 1.0, "Y")
        .otherwise("Z"),
    )


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction (supplier-part bipartite projection)
# ---------------------------------------------------------------------------

_AA_ORACLE = """
WITH e AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
),
deg AS (
  SELECT p, CAST(count(*) AS BIGINT) AS d
  FROM e GROUP BY p HAVING count(*) > 1
),
wt AS (
  SELECT p, CAST(round(1000000000.0 / ln(CAST(d AS DOUBLE))) AS BIGINT)
           AS w_nano
  FROM deg WHERE d > 1
),
pairs AS (
  SELECT a.s AS s1, b.s AS s2, e1.w_nano
  FROM e a JOIN e b ON a.p = b.p AND a.s < b.s
  JOIN wt e1 ON e1.p = a.p
)
SELECT s1, s2,
       CAST(count(*) AS BIGINT) AS n_common,
       CAST(sum(w_nano) AS BIGINT) AS aa_nano
FROM pairs GROUP BY s1, s2
HAVING count(*) >= 3
"""


@register("graph_adamic_adar", oracle=_AA_ORACLE)
def graph_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction between suppliers sharing parts:
    AA(u,v) = Σ_{common part p} 1/ln(deg(p)) — common neighbors
    weighted by rarity (sharing a niche part says more than sharing a
    commodity), the standard upgrade over `graph_jaccard_suppliers`'
    raw overlap.

    The 1/ln(deg) weight is quantized to nano-units ONCE per part
    (vocabulary level — the Naive-Bayes discipline), so per-pair scores
    are associative BIGINT sums, reproducible under any partitioning.
    Candidate pairs come from the same co-neighbor equi-join as the
    Jaccard query (bounded by per-part supplier counts); degree-1 parts
    predict nothing and are pruned before the join (ln 1 = 0 would
    blow up the weight — the HAVING is semantic, not defensive).
    """
    li = load_table(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    deg = e.groupBy("p").agg(F.count(F.lit(1)).alias("d")).filter(
        F.col("d") > 1
    )
    wt = deg.select(
        "p",
        F.round(1_000_000_000.0 / F.log(F.col("d").cast("double")))
        .cast("long")
        .alias("w_nano"),
    )
    a, b = e.alias("a"), e.alias("b")
    wt2 = F.broadcast(wt.withColumnRenamed("p", "wp"))
    pairs = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .join(wt2, F.col("a.p") == F.col("wp"))
        .select(
            F.col("a.s").alias("s1"),
            F.col("b.s").alias("s2"),
            "w_nano",
        )
    )
    return (
        pairs.groupBy("s1", "s2")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum("w_nano").cast("long").alias("aa_nano"),
        )
        .filter(F.col("n_common") >= 3)
    )


# ---------------------------------------------------------------------------
# Gini coefficient of per-user value totals
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id
),
r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, user_id) AS i
  FROM u
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(cents AS DECIMAL(38,0))) AS tot,
         sum(CAST(i * cents AS DECIMAL(38,0))) AS weighted
  FROM r
)
SELECT n,
       CAST(tot AS BIGINT) AS total_cents,
       2.0 * CAST(weighted AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
       - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
FROM s
"""


@register("events_value_gini", oracle=_GINI_ORACLE)
def events_value_gini(spark, sf_dir):
    """Gini coefficient of per-user spend — the inequality readout
    (0 = everyone equal, →1 = one whale) that complements
    `nation_revenue_hhi` (HHI weighs squared shares; Gini weighs the
    whole Lorenz curve).

    The rank formulation G = 2Σi·xᵢ/(nΣx) − (n+1)/n needs one global
    sort of the per-user totals — a row_number with a declared
    (cents, user_id) total order so ties are deterministic — then two
    DECIMAL sums and one fixed IEEE finale. The fact table collapses
    to |users| rows before any rank is assigned, and the rank itself
    is ``operators.ranks.ordered_scan`` — the hierarchical range-
    partitioned scan — because |users| at 100 TB is 1e8+: an
    unpartitioned row_number window would serialize the entity
    relation through one task.
    """
    from wikipedia_data_pipeline_spark.operators.ranks import ordered_scan

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    r = ordered_scan(u, ["cents", "user_id"], rank_col="i").select(
        "cents", "i"
    )
    dec = "decimal(38,0)"
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("tot"),
        F.sum((F.col("i") * F.col("cents")).cast(dec)).alias("weighted"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "n",
        F.col("tot").cast("long").alias("total_cents"),
        (
            2.0
            * F.col("weighted").cast("double")
            / (nd * F.col("tot").cast("double"))
            - (nd + 1.0) / nd
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Day-of-week × hour-of-day activity heatmap with independence lift
# ---------------------------------------------------------------------------

_HEATMAP_ORACLE = """
WITH c AS (
  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         (epoch_us(ts) // 3600000000) % 24 AS hod,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT dow, hod, n_events,
       CAST(n_events AS DOUBLE)
         * CAST(sum(n_events) OVER () AS DOUBLE)
         / (CAST(sum(n_events) OVER (PARTITION BY dow) AS DOUBLE)
            * CAST(sum(n_events) OVER (PARTITION BY hod) AS DOUBLE))
         AS lift
FROM c
"""


@register("events_dow_hod_heatmap", oracle=_HEATMAP_ORACLE)
def events_dow_hod_heatmap(spark, sf_dir):
    """Day-of-week × hour-of-day traffic heatmap with independence
    lift: cell count over the count expected if weekday and hour were
    independent (lift > 1 = that slot is hotter than its marginals
    predict — the capacity-planning readout a plain histogram hides).

    One hash-agg collapses the fact table to ≤ 168 cells; the three
    marginal windows run over those cells. Lift is a ratio of BIGINT
    counts in one fixed expression. Weekday from epoch-day (d+4) mod 7,
    immune to engine locale/dayofweek disagreements.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        (((F.col("ts") / 86_400_000_000).cast("long") + 4) % 7).alias("dow"),
        ((F.col("ts") / 3_600_000_000).cast("long") % 24).alias("hod"),
    ).groupBy("dow", "hod").agg(F.count(F.lit(1)).alias("n_events"))
    tot = F.sum("n_events").over(Window.partitionBy())
    by_dow = F.sum("n_events").over(Window.partitionBy("dow"))
    by_hod = F.sum("n_events").over(Window.partitionBy("hod"))
    return c.select(
        "dow",
        "hod",
        "n_events",
        (
            F.col("n_events").cast("double")
            * tot.cast("double")
            / (by_dow.cast("double") * by_hod.cast("double"))
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# Repeat-purchase conversion curve (time to second order)
# ---------------------------------------------------------------------------

_REPEAT_ORACLE = """
WITH ranked AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS mth,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
gaps AS (
  SELECT f.o_custkey, s.mth - f.mth AS gap_m
  FROM ranked f LEFT JOIN ranked s
    ON f.o_custkey = s.o_custkey AND s.rn = 2
  WHERE f.rn = 1
),
tot AS (SELECT count(*) AS n_customers FROM gaps)
SELECT gap_m,
       CAST(count(*) AS BIGINT) AS n_customers_at_gap,
       CAST(sum(count(*)) OVER (ORDER BY gap_m NULLS LAST
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT)
         AS cum_converted,
       CAST(sum(count(*)) OVER (ORDER BY gap_m NULLS LAST
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS DOUBLE)
         / CAST((SELECT n_customers FROM tot) AS DOUBLE)
         AS cum_conversion
FROM gaps
WHERE gap_m IS NOT NULL
GROUP BY gap_m
"""


@register("orders_repeat_purchase_curve", oracle=_REPEAT_ORACLE)
def orders_repeat_purchase_curve(spark, sf_dir):
    """Time-to-second-order conversion curve: for each month gap g, how
    many customers placed their second order exactly g months after
    their first, and the cumulative share of ALL first-time customers
    converted by then — the repeat-purchase funnel (distinct from
    `cohort_value_curves`, which accumulates value, not conversion).

    One window ranks orders per customer; first and second orders meet
    in a key-local self-join (rn pushed as a predicate); the curve is a
    running sum over the ≤ |months| grouped gaps. Never-converting
    customers count in the denominator — dropping them is the classic
    conversion-rate inflation bug.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    mth = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    ranked = o.select(
        "o_custkey",
        mth.alias("mth"),
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("rn"),
    )
    firsts = ranked.filter(F.col("rn") == 1).select(
        "o_custkey", F.col("mth").alias("m1")
    )
    seconds = ranked.filter(F.col("rn") == 2).select(
        "o_custkey", F.col("mth").alias("m2")
    )
    gaps = firsts.join(seconds, "o_custkey", "left").select(
        (F.col("m2") - F.col("m1")).alias("gap_m")
    )
    # denominator as a 1-row broadcast, not a driver-side .count() —
    # the plan stays fully lazy/declarative
    tot = gaps.agg(F.count(F.lit(1)).alias("n_customers"))
    g = (
        gaps.filter(F.col("gap_m").isNotNull())
        .groupBy("gap_m")
        .agg(F.count(F.lit(1)).alias("n_customers_at_gap"))
        .crossJoin(F.broadcast(tot))
    )
    run = Window.orderBy("gap_m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("n_customers_at_gap").over(run)
    return g.select(
        "gap_m",
        "n_customers_at_gap",
        cum.cast("long").alias("cum_converted"),
        (cum.cast("double") / F.col("n_customers").cast("double")).alias(
            "cum_conversion"
        ),
    )


# ---------------------------------------------------------------------------
# Cross-supplier price dispersion per part
# ---------------------------------------------------------------------------

_DISPERSION_ORACLE = """
WITH sup AS (
  SELECT l_partkey, l_suppkey,
         CAST(min(round(l_extendedprice / l_quantity * 100)) AS BIGINT)
           AS unit_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
s AS (
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(min(unit_cents) AS BIGINT) AS min_cents,
         CAST(max(unit_cents) AS BIGINT) AS max_cents
  FROM sup GROUP BY l_partkey HAVING count(*) >= 3
)
SELECT l_partkey, n_suppliers, min_cents, max_cents,
       CAST(max_cents - min_cents AS DOUBLE) / CAST(min_cents AS DOUBLE)
         AS dispersion
FROM s WHERE min_cents > 0
"""


@register("lineitem_price_dispersion", oracle=_DISPERSION_ORACLE)
def lineitem_price_dispersion(spark, sf_dir):
    """Cross-supplier price dispersion per part: each supplier's BEST
    unit price, then the (max−min)/min spread across suppliers — the
    procurement arbitrage signal ("are we overpaying for parts that
    several suppliers sell?").

    Two hash-aggs on the same (partkey, suppkey) → partkey key path —
    Catalyst plans the second as a partial re-use of the first
    shuffle's partitioning. Integer cents throughout; one fixed ratio
    at output. Parts with < 3 suppliers are noise and pruned in the
    aggregate's HAVING.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100)
        )
        .cast("long")
        .alias("unit_cents")
    )
    s = (
        sup.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.min("unit_cents").cast("long").alias("min_cents"),
            F.max("unit_cents").cast("long").alias("max_cents"),
        )
        .filter(F.col("n_suppliers") >= 3)
    )
    return s.filter(F.col("min_cents") > 0).select(
        "l_partkey",
        "n_suppliers",
        "min_cents",
        "max_cents",
        (
            (F.col("max_cents") - F.col("min_cents")).cast("double")
            / F.col("min_cents").cast("double")
        ).alias("dispersion"),
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier) query
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH p AS (
  SELECT p_partkey, p_size,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         max(p_size) OVER (ORDER BY CAST(round(p_retailprice * 100) AS BIGINT),
                                    p_size DESC, p_partkey
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS best_size_cheaper
  FROM part
)
SELECT p_partkey, p_size, price_cents
FROM p
WHERE best_size_cheaper IS NULL OR p_size > best_size_cheaper
"""


@register("parts_skyline_price_size", oracle=_SKYLINE_ORACLE)
def parts_skyline_price_size(spark, sf_dir):
    """Skyline (Pareto frontier) over parts: minimize price, maximize
    size — a part survives iff no strictly-cheaper-or-equal part has
    size ≥ its own. The multi-criteria shortlist operator (product
    search, supplier selection) that a plain ORDER BY cannot express.

    The classic nested-loop dominance test is O(n²); sorted by (price,
    size DESC, key), a part is dominated exactly when the running max
    size over its predecessors reaches its size — ONE sort + ONE
    running pass, the textbook sort-filter skyline. The (size DESC,
    key) tie-break makes equal-price groups self-dominating in
    deterministic order. The exclusive prefix max runs through
    ``operators.ranks.ordered_scan`` (range-partition by price →
    per-block prefix maxima → block carry-in), never a
    single-partition window: |parts| at 100 TB is 1e8+.
    """
    from wikipedia_data_pipeline_spark.operators.ranks import ordered_scan

    p = load_table(spark, sf_dir, "part")
    price = F.round(F.col("p_retailprice") * 100).cast("long")
    staged = ordered_scan(
        p.select("p_partkey", "p_size", price.alias("price_cents")),
        ["price_cents", F.desc("p_size"), F.asc("p_partkey")],
        running=[("best_size_cheaper", "p_size", "max", "exclusive")],
    )
    return staged.filter(
        F.col("best_size_cheaper").isNull()
        | (F.col("p_size") > F.col("best_size_cheaper"))
    ).select("p_partkey", "p_size", "price_cents")


# ---------------------------------------------------------------------------
# Per-customer spend-trend regression fleet
# ---------------------------------------------------------------------------

_CUST_TREND_ORACLE = """
WITH m AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) - 24000 AS x,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
),
s AS (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(x AS DECIMAL(38,0))) AS sx,
         sum(CAST(y AS DECIMAL(38,0))) AS sy,
         sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
         sum(CAST(x * x AS DECIMAL(38,0))) AS sxx
  FROM m GROUP BY o_custkey
)
SELECT o_custkey, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         AS slope_cents_per_month
FROM s
WHERE n >= 3
  AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
"""


@register("customer_spend_trend", oracle=_CUST_TREND_ORACLE)
def customer_spend_trend(spark, sf_dir):
    """A regression FLEET: per-customer OLS slope of order value vs.
    calendar month — thousands of independent model fits in ONE
    aggregate pass (the "is each account growing or shrinking?"
    screen). This is the scale shape that matters: fitting per-entity
    models via groupBy moments costs the same shuffle as a count —
    fitting them one-by-one driver-side costs |customers| jobs.

    Same exactness discipline as `events_linear_trend` (integer-scaled
    y, centered integer x, DECIMAL moments, fixed IEEE finale), keyed
    per customer; degenerate fits (single month, n < 3) filtered in
    the aggregate domain.
    """
    o = load_table(spark, sf_dir, "orders")
    x = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 24000).alias(
        "x"
    )
    y = F.round(F.col("o_totalprice") * 100).cast("long").alias("y")
    dec = "decimal(38,0)"
    s = (
        o.select("o_custkey", x, y)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast(dec)).alias("sx"),
            F.sum(F.col("y").cast(dec)).alias("sy"),
            F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
            F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        )
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    denom = nd * sxx - sx * sx
    return (
        s.filter((F.col("n") >= 3) & (denom > 0))
        .select(
            "o_custkey",
            "n",
            ((nd * sxy - sx * sy) / denom).alias("slope_cents_per_month"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding label-outlier screen (mislabeled-data candidates)
# ---------------------------------------------------------------------------

from wikipedia_data_pipeline_spark.queries.similarity_queries import COS_SQL

_LABEL_OUTLIER_ORACLE = f"""
WITH comp AS (
  SELECT label, g - 1 AS pos,
         CAST(sum(CAST(CAST(embedding[g] AS DOUBLE) AS DECIMAL(18,6)))
              AS DOUBLE) / count(*) AS mean_x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(g)
  GROUP BY label, pos
),
cent AS (
  SELECT label, list(mean_x ORDER BY pos) AS c FROM comp GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label,
         {COS_SQL.format(a='e.embedding', b='cent.c')} AS cos_to_centroid,
         row_number() OVER (
           PARTITION BY e.label
           ORDER BY {COS_SQL.format(a='e.embedding', b='cent.c')}, e.vec_id
         ) AS rn
  FROM embeddings e JOIN cent ON e.label = cent.label
)
SELECT vec_id, label, cos_to_centroid, CAST(rn AS BIGINT) AS outlier_rank
FROM scored WHERE rn <= 3
"""


@register("embedding_label_outliers", oracle=_LABEL_OUTLIER_ORACLE)
def embedding_label_outliers(spark, sf_dir):
    """Mislabeled-data screen: the 3 vectors per label FARTHEST from
    their own label centroid (lowest cosine) — the embedding-QA
    worklist human review starts from (a vector far from its class
    center is a labeling error, an outlier, or a class in need of
    splitting).

    Centroids use the decimal-exact component construction shared with
    `embedding_label_centroids`; each vector's cosine runs as the
    deterministic sequential fold (JVM higher-order functions, no
    UDF), and the per-label ranking breaks ties by vec_id. The
    centroid relation is |labels|-sized and broadcast; one scan of the
    vectors scores everything.
    """
    from pyspark.sql import Window

    from wikipedia_data_pipeline_spark.functions import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    comp = (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(
            (
                F.sum(F.col("x").cast("double").cast("decimal(18,6)"))
                .cast("double")
                / F.count("*")
            ).alias("mean_x")
        )
    )
    cent = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean_x"))),
            lambda s: s["mean_x"],
        ).alias("c")
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        cosine_similarity(F.col("embedding"), F.col("c")).alias(
            "cos_to_centroid"
        ),
    )
    w = Window.partitionBy("label").orderBy("cos_to_centroid", "vec_id")
    return (
        scored.withColumn("outlier_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("outlier_rank") <= 3)
    )


# ---------------------------------------------------------------------------
# Trade-flow matrix (supplier nation × customer nation)
# ---------------------------------------------------------------------------

_FLOW_ORACLE = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
GROUP BY sn.n_name, cn.n_name
"""


@register("trade_flow_matrix", oracle=_FLOW_ORACLE)
def trade_flow_matrix(spark, sf_dir):
    """Supplier-nation × customer-nation revenue matrix — the
    generalization of Q7 (which picks two nations) to the complete
    trade-flow readout behind geo dashboards and routing decisions
    (one cell per trading nation pair; ≤ 25×25).

    One pass over lineitem: supplier/nation/customer dims broadcast
    (nation joined TWICE under different aliases — the dual-alias dim
    shape), orders joined on the fact key, then a 625-cell hash-agg
    with map-side partials. Revenue rides DECIMAL.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Per-user KL divergence from the global behavior mix
# ---------------------------------------------------------------------------

_KL_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_ut
  FROM events GROUP BY user_id, event_type
),
m AS (
  SELECT user_id, event_type, n_ut,
         sum(n_ut) OVER (PARTITION BY user_id) AS n_u,
         sum(n_ut) OVER (PARTITION BY event_type) AS n_t,
         sum(n_ut) OVER () AS n
  FROM c
),
terms AS (
  SELECT user_id, n_u,
         CAST(round(
           (CAST(n_ut AS DOUBLE) / CAST(n_u AS DOUBLE))
           * ln((CAST(n_ut AS DOUBLE) / CAST(n_u AS DOUBLE))
                / (CAST(n_t AS DOUBLE) / CAST(n AS DOUBLE)))
           * 1000000000.0) AS BIGINT) AS term_nano
  FROM m
)
SELECT user_id,
       CAST(max(n_u) AS BIGINT) AS n_events,
       CAST(sum(term_nano) AS BIGINT) AS kl_nano
FROM terms GROUP BY user_id
"""


@register("events_kl_user_vs_global", oracle=_KL_ORACLE)
def events_kl_user_vs_global(spark, sf_dir):
    """Per-user KL divergence of the user's event-type mix from the
    global mix — the relative counterpart to `events_user_entropy`:
    entropy flags low-variety users, KL flags users whose variety is
    *unlike everyone else's* (scripted traffic has both signatures).

    Every probability is a ratio of BIGINT contingency counts; each
    (user, type) term quantizes to nano-nats so the per-user sum is
    associative. Absent types contribute 0 (the Σ p·ln(p/q) convention
    for p=0), so no dense spine is needed.

    Marginal shapes, chosen per cardinality: the per-USER marginal is
    a window partitioned by user_id (1e8+ partitions — fully
    parallel); the per-TYPE and GRAND totals must NOT be windows over
    the (user, type) relation (|types| partitions would funnel 1e8
    rows through a handful of tasks; the grand total through one), so
    they come from a separate |types|-row aggregate of the fact table
    — broadcast back, grand total derived from those 5 rows for free.
    Cost: a second 2-column scan of events with map-side partials,
    instead of serializing the entity relation.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_ut")
    )
    per_type = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    totals = per_type.crossJoin(
        F.broadcast(per_type.select(F.sum("n_t").alias("n")))
    )
    m = c.withColumn(
        "n_u", F.sum("n_ut").over(Window.partitionBy("user_id"))
    ).join(F.broadcast(totals), "event_type")
    p = F.col("n_ut").cast("double") / F.col("n_u").cast("double")
    q = F.col("n_t").cast("double") / F.col("n").cast("double")
    terms = m.select(
        "user_id",
        "n_u",
        F.round(p * F.log(p / q) * 1_000_000_000.0)
        .cast("long")
        .alias("term_nano"),
    )
    return terms.groupBy("user_id").agg(
        F.max("n_u").cast("long").alias("n_events"),
        F.sum("term_nano").cast("long").alias("kl_nano"),
    )


# ---------------------------------------------------------------------------
# Cross-language vocabulary overlap
# ---------------------------------------------------------------------------

_VOCABJ_ORACLE = """
WITH v AS (
  SELECT DISTINCT lang, lower(w) AS w
  FROM documents, unnest(string_split(text, ' ')) AS u(w)
  WHERE len(w) > 0
),
sizes AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_words FROM v GROUP BY lang),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM v a JOIN v b ON a.w = b.w AND a.lang < b.lang
  GROUP BY a.lang, b.lang
)
SELECT lang_a, lang_b, n_common,
       sa.n_words AS n_words_a, sb.n_words AS n_words_b,
       CAST(n_common AS DOUBLE)
         / CAST(sa.n_words + sb.n_words - n_common AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON lang_a = sa.lang
JOIN sizes sb ON lang_b = sb.lang
"""


@register("documents_vocab_overlap_langs", oracle=_VOCABJ_ORACLE)
def documents_vocab_overlap_langs(spark, sf_dir):
    """Vocabulary Jaccard between language slices of the corpus — the
    contamination/quality probe for the language gate: high overlap
    between two "languages" means the lang labels are unreliable (or
    the corpus is code-switched), and that langid-dependent curation
    (stratified sampling, per-lang quotas) is built on sand.

    Distinct (lang, word) vocabularies collapse the corpus once;
    intersections come from the word-keyed equi-join of that collapsed
    relation (shuffle on word — the scale-safe key: join fan-out is
    bounded by words shared across languages, and the |langs|²-row
    result joins back to broadcast sizes). Integer counts → one double
    ratio.
    """
    d = load_table(spark, sf_dir, "documents")
    v = (
        d.select(
            "lang",
            F.explode(F.split(F.col("text"), " ")).alias("w"),
        )
        .filter(F.length("w") > 0)
        .select("lang", F.lower(F.col("w")).alias("w"))
        .distinct()
    )
    sizes = v.groupBy("lang").agg(F.count(F.lit(1)).alias("n_words"))
    a = v.select(F.col("lang").alias("lang_a"), "w")
    b = v.select(F.col("lang").alias("lang_b"), "w")
    inter = (
        a.join(b, ["w"])
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("lang").alias("lang_a"), F.col("n_words").alias("n_words_a")
    )
    sb = sizes.select(
        F.col("lang").alias("lang_b"), F.col("n_words").alias("n_words_b")
    )
    return (
        inter.join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "n_common",
            "n_words_a",
            "n_words_b",
            (
                F.col("n_common").cast("double")
                / (
                    F.col("n_words_a")
                    + F.col("n_words_b")
                    - F.col("n_common")
                ).cast("double")
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Interarrival burstiness index per user
# ---------------------------------------------------------------------------

_BURSTINESS_ORACLE = """
WITH g AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000
           AS gap_ms
  FROM events
),
s AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_gaps,
         sum(CAST(gap_ms AS DECIMAL(38,0))) AS sg,
         sum(CAST(gap_ms * gap_ms AS DECIMAL(38,0))) AS sgg
  FROM g WHERE gap_ms IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_gaps,
       (sqrt(CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
             - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
        - CAST(sg AS DOUBLE))
       / (sqrt(CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
               - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
          + CAST(sg AS DOUBLE)) AS burstiness
FROM s WHERE n_gaps > 1 AND sg > 0
"""


@register("events_burstiness_index", oracle=_BURSTINESS_ORACLE)
def events_burstiness_index(spark, sf_dir):
    """Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of per-user interarrival
    gaps: −1 = metronome (bot heartbeat), 0 = Poisson (organic), →1 =
    extreme bursts — the temporal-signature screen that complements
    the value-based `events_autocorr_lag1` and mix-based KL/entropy
    screens.

    σ and μ both come from two DECIMAL-exact integer moment sums in
    the MILLISECOND domain (µs gaps square past 2⁶³; ms keeps Σgap² —
    maximal when one gap spans the window — inside int64 for spans up
    to ~49 days, so the decimal→double casts are single correctly-
    rounded conversions on both engines; a year-scale window would
    drop to seconds or use the three-word split). The √n scale factor
    cancels in the ratio; B is one fixed IEEE expression per user. One
    lag window + one aggregate, both keyed on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        "user_id",
        F.expr(
            "(ts - lag(ts) OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id)) div 1000"
        ).alias("gap_ms"),
    ).filter(F.col("gap_ms").isNotNull())
    dec = "decimal(38,0)"
    s = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("gap_ms").cast(dec)).alias("sg"),
        F.sum((F.col("gap_ms") * F.col("gap_ms")).cast(dec)).alias("sgg"),
    )
    nd = F.col("n_gaps").cast("double")
    sg, sgg = F.col("sg").cast("double"), F.col("sgg").cast("double")
    sd_n = F.sqrt(nd * sgg - sg * sg)  # = n·σ... shares scale with sg = n·μ
    return (
        s.filter((F.col("n_gaps") > 1) & (F.col("sg") > 0))
        .select(
            "user_id",
            "n_gaps",
            ((sd_n - sg) / (sd_n + sg)).alias("burstiness"),
        )
    )


# ---------------------------------------------------------------------------
# Log-normal fit of document lengths
# ---------------------------------------------------------------------------

_LOGNORM_ORACLE = """
WITH distinct_len AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS cnt
  FROM documents WHERE n_chars > 0 GROUP BY n_chars
),
q AS (
  SELECT cnt,
         CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1000000000.0) AS BIGINT)
           AS l_nano
  FROM distinct_len
),
s AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         sum(CAST(cnt * l_nano AS DECIMAL(38,0))) AS sl,
         sum(CAST(cnt AS DECIMAL(38,0))
             * CAST(l_nano AS DECIMAL(38,0))
             * CAST(l_nano AS DECIMAL(38,0))) AS sll
  FROM q
)
SELECT n,
       CAST(sl AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000.0) AS mu_ln,
       sqrt(CAST(n AS DOUBLE) * CAST(sll AS DOUBLE)
            - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE))
         / (CAST(n AS DOUBLE) * 1000000000.0) AS sigma_ln
FROM s
"""


@register("documents_length_lognormal_fit", oracle=_LOGNORM_ORACLE)
def documents_length_lognormal_fit(spark, sf_dir):
    """Log-normal MLE fit (μ, σ of ln length) for document lengths —
    natural text lengths are approximately log-normal, so a corpus
    whose fitted σ drifts between snapshots has changed its mix
    (boilerplate floods narrow it; concatenation bugs widen it).

    The transcendental ln is quantized ONCE per distinct length (the
    vocabulary-level discipline — lengths are integers, so the
    quantized log table is exact and engine-portable); the weighted
    moment sums are then pure DECIMAL integer arithmetic, and μ/σ are
    fixed IEEE finales. One tiny distinct-length aggregate does all
    the math — the corpus scan only counts.
    """
    d = load_table(spark, sf_dir, "documents")
    dl = (
        d.filter(F.col("n_chars") > 0)
        .groupBy("n_chars")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = dl.select(
        "cnt",
        F.round(F.log(F.col("n_chars").cast("double")) * 1_000_000_000.0)
        .cast("long")
        .alias("l_nano"),
    )
    dec = "decimal(38,0)"
    s = q.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum((F.col("cnt") * F.col("l_nano")).cast(dec)).alias("sl"),
        F.sum(
            F.col("cnt").cast(dec)
            * F.col("l_nano").cast(dec)
            * F.col("l_nano").cast(dec)
        ).alias("sll"),
    )
    nd = F.col("n").cast("double")
    sl, sll = F.col("sl").cast("double"), F.col("sll").cast("double")
    return s.select(
        "n",
        (sl / (nd * 1_000_000_000.0)).alias("mu_ln"),
        (F.sqrt(nd * sll - sl * sl) / (nd * 1_000_000_000.0)).alias(
            "sigma_ln"
        ),
    )


# ---------------------------------------------------------------------------
# Trailing-twelve-months revenue
# ---------------------------------------------------------------------------

_TTM_ORACLE = """
WITH m AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mth,
         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
  FROM orders GROUP BY 1
)
SELECT mth,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(sum(rev_dec) OVER (ORDER BY mth
                               ROWS BETWEEN 11 PRECEDING
                               AND CURRENT ROW) AS DOUBLE) AS ttm_revenue,
       CAST(count(*) OVER (ORDER BY mth
                           ROWS BETWEEN 11 PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS n_months_in_window
FROM m
"""


@register("orders_ttm_revenue", oracle=_TTM_ORACLE)
def orders_ttm_revenue(spark, sf_dir):
    """Trailing-twelve-months revenue per month — the smoothed growth
    line every finance dashboard leads with (the ROWS-12 sliding
    DECIMAL window; n_months_in_window exposes the warm-up period the
    first 11 months spend below a full window, rather than silently
    reporting partial TTMs as if complete).

    The fact table collapses to one row per month before the window;
    the DECIMAL sum stays exact through the frame and casts once.
    Calendar months collapse to integers, so a month with zero orders
    would shorten the frame — at this data density every month is
    present, and the n_months readout makes any gap visible.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mth")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_dec"))
    w = Window.orderBy("mth").rowsBetween(-11, Window.currentRow)
    return m.select(
        "mth",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("ttm_revenue"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_months_in_window"),
    )


# ---------------------------------------------------------------------------
# Exact distributed percentiles (order-statistic selection, no sketch)
# ---------------------------------------------------------------------------

@register(
    "lineitem_exact_percentiles",
    oracle="""
WITH r AS (
  SELECT l_extendedprice AS value,
         row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                            l_linenumber) AS rnk,
         count(*) OVER () AS n
  FROM lineitem
)
SELECT CAST(p AS DOUBLE) AS p, value, CAST(rnk AS BIGINT) AS rank_n
FROM r JOIN (VALUES (0.5), (0.9), (0.99)) t(p)
  ON rnk = CAST(ceil(p * n) AS BIGINT)
""",
)
def lineitem_exact_percentiles(spark, sf_dir):
    """EXACT p50/p90/p99 of lineitem price by distributed order-statistic
    selection — not approx_percentile (whose sketch error is
    configuration-dependent and engine-specific, so it can never be
    oracle-checked exactly). The global rank over (value, orderkey,
    linenumber) — a total order, so the selected row is unique — comes
    from ``operators.ranks.ordered_scan``; the quantile definition is
    the lower order statistic at rank ceil(p·N), computed with the same
    expression in both engines. At 100 TB this is two fact-sized
    shuffles (range + by-block) and a 3-row broadcast probe — the
    exact-selection alternative when a sketch's error bars are not
    acceptable (billing, SLA attestation)."""
    from wikipedia_data_pipeline_spark.operators.ranks import ordered_scan

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("value"), "l_orderkey", "l_linenumber"
    )
    r = ordered_scan(
        li,
        ["value", "l_orderkey", "l_linenumber"],
        rank_col="rnk",
        with_totals=True,
    )
    ps = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("p")
    )
    return (
        r.join(
            F.broadcast(ps),
            F.col("rnk")
            == F.ceil(F.col("p") * F.col("rnk_total")).cast("long"),
        )
        .select("p", "value", F.col("rnk").alias("rank_n"))
    )


def _zvalue_sql(xe: str, ye: str, bits: int = 16) -> str:
    """Unrolled Morton interleave in ANSI/DuckDB bit arithmetic — the
    oracle twin of operators.profiling.zorder_key (bit i of column j at
    position i * n_cols + j, x first)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xe}) >> {i}) & 1) << {2 * i}")
        terms.append(f"((({ye}) >> {i}) & 1) << {2 * i + 1}")
    return " | ".join(f"({t})" for t in terms)


@register(
    "layout_zorder_key_events",
    oracle=f"""
SELECT event_id,
       (user_id & 65535) AS x,
       ((epoch_us(ts) // 3600000000) & 65535) AS y,
       ({_zvalue_sql("user_id & 65535",
                     "(epoch_us(ts) // 3600000000) & 65535")}) AS zval
FROM events
""",
)
def layout_zorder_key_events(spark, sf_dir):
    """Z-value (Morton) clustering key over events on (user_id, event
    hour) — the write-side key a lakehouse OPTIMIZE ZORDER layout sorts
    by so file min/max stay tight on BOTH dimensions. Pure shift/mask
    arithmetic inside whole-stage codegen (no UDF, no shuffle); the
    16-bit masks make the key a pure per-row function so the unrolled
    SQL twin checks the interleave bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("user_id").bitwiseAND(F.lit(65535))
    y = F.expr("(ts div 3600000000) & 65535")
    return ev.select(
        "event_id",
        x.alias("x"),
        y.alias("y"),
        P.zorder_key([x, y], bits=16).alias("zval"),
    )


@register("layout_zorder_pruning_report", eager=True)
def layout_zorder_pruning_report(spark, sf_dir):
    """Data-skipping evidence for the Z-order layout: events written
    round-robin vs linearly sorted by hour vs Z-ordered on (user, hour),
    then each layout's parquet footers are asked how many files a box
    predicate on EACH dimension must read. Expected: round-robin prunes
    nothing, the linear sort prunes only its own column, Z-order prunes
    both. Rows-only by design (file counts depend on the parquet
    writer, asserted directionally in tests/test_profiling.py); EAGER:
    writes 3x16 temp files and reads their footers (metadata only)."""
    import shutil
    import tempfile

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.col("user_id").bitwiseAND(F.lit(65535)).alias("x"),
            F.expr("ts div 3600000000").alias("h"),
            "value",
        )
    )
    lo_hi = ev.agg(
        F.min("h").alias("h0"),
        F.max("h").alias("h1"),
        F.min("x").alias("x0"),
        F.max("x").alias("x1"),
    ).collect()[0]
    hspan = int(lo_hi["h1"] - lo_hi["h0"])
    xspan = int(lo_hi["x1"] - lo_hi["x0"])
    rebased = (
        ev.withColumn("y", (F.col("h") - F.lit(int(lo_hi["h0"]))).cast("long"))
        .select("event_id", "x", "y", "value")
    )
    tmp = tempfile.mkdtemp(prefix="wdp_zorder_")
    try:
        report = P.zorder_skipping_report(
            rebased,
            "x",
            "y",
            (int(lo_hi["x0"]) + xspan // 4, int(lo_hi["x0"]) + xspan // 2),
            (hspan // 4, hspan // 2),
            tmp,
            n_files=16,
        )
        report = report.cache()
        report.count()  # materialize before the temp files are removed
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return report


@register(
    "sketch_quantile_summary_events",
    oracle="""
WITH ev AS (SELECT event_id, value FROM events),
nrel AS (SELECT count(*) AS n FROM ev),
blk AS (
  SELECT event_id, value,
         row_number() OVER (PARTITION BY event_id % 32
                            ORDER BY value, event_id) AS r,
         count(*) OVER (PARTITION BY event_id % 32) AS m
  FROM ev
),
st AS (SELECT *, greatest(1, CAST(floor(m * 0.02) AS BIGINT)) AS s FROM blk),
keep AS (
  SELECT value, event_id,
         CASE WHEN r % s = 0 THEN s ELSE m % s END AS weight
  FROM st WHERE r % s = 0 OR r = m
),
scan AS (
  SELECT value, event_id, weight,
         sum(weight) OVER (ORDER BY value, event_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM keep
),
tgt AS (
  SELECT p, CAST(ceil(p * nrel.n) AS BIGINT) AS target_rank, nrel.n
  FROM (SELECT unnest([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS p), nrel
),
ecum AS (
  SELECT t.p, t.target_rank, t.n, min(s.cum) AS cum
  FROM tgt t JOIN scan s ON s.cum >= t.target_rank
  GROUP BY t.p, t.target_rank, t.n
),
est AS (
  SELECT e.p, e.target_rank, e.n, s.value AS est_value,
         s.event_id AS est_id
  FROM ecum e JOIN scan s ON s.cum = e.cum
),
tr AS (
  SELECT est.p, count(*) AS true_rank
  FROM est JOIN ev
    ON ev.value < est.est_value
       OR (ev.value = est.est_value AND ev.event_id <= est.est_id)
  GROUP BY est.p
)
SELECT est.p, est.est_value, est.target_rank, tr.true_rank,
       abs(tr.true_rank - est.target_rank) AS rank_err,
       est.n AS n_rows
FROM est JOIN tr ON est.p = tr.p
""",
)
def sketch_quantile_summary_events(spark, sf_dir):
    """One-pass mergeable quantile summary over events.value
    (operators.profiling.quantile_summary: per-block rank striding,
    s = ⌊m·ε⌋, ε = 0.02, 32 deterministic blocks) queried at 7 probe
    quantiles, each estimate audited against its TRUE global rank — the
    output carries the realized rank error, which the summary bounds by
    ε·N + blocks. The summary cumsum rides the hierarchical
    ordered_scan (no single-partition window over data-sized input);
    the estimate lookup and the true-rank audit are broadcast theta
    joins of a 7-row relation. The whole construction is relational, so
    the SQL twin replays it bit-for-bit — same reason the CMS sketch is
    exactly checkable."""
    from wikipedia_data_pipeline_spark.operators.ranks import ordered_scan

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    summary = P.quantile_summary(ev, "value", "event_id", blocks=32, eps=0.02)
    scan = ordered_scan(
        summary, ["value", "event_id"], running=[("cum", "weight", "sum")]
    )
    nrel = ev.agg(F.count(F.lit(1)).alias("n"))
    tgt = (
        spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(p) for p in
                          (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)])
            ).alias("p")
        )
        .crossJoin(F.broadcast(nrel))
        .withColumn(
            "target_rank", F.ceil(F.col("p") * F.col("n")).cast("long")
        )
    )
    ecum = (
        scan.join(F.broadcast(tgt), F.col("cum") >= F.col("target_rank"))
        .groupBy("p", "target_rank", "n")
        .agg(F.min("cum").alias("cum"))
    )
    est = scan.join(F.broadcast(ecum), "cum").select(
        "p",
        "target_rank",
        "n",
        F.col("value").alias("est_value"),
        F.col("event_id").alias("est_id"),
    )
    tr = (
        ev.join(
            F.broadcast(est),
            (F.col("value") < F.col("est_value"))
            | (
                (F.col("value") == F.col("est_value"))
                & (F.col("event_id") <= F.col("est_id"))
            ),
        )
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("true_rank"))
    )
    return est.join(tr, "p").select(
        "p",
        "est_value",
        "target_rank",
        "true_rank",
        F.abs(F.col("true_rank") - F.col("target_rank")).alias("rank_err"),
        F.col("n").alias("n_rows"),
    )


_KMV_K = 32
_KMV_HASH = SQL_DET_HASH.format(col="user_id")


@register(
    "sketch_kmv_distinct_users",
    oracle=f"""
WITH ev AS (SELECT event_type, user_id FROM events),
hsh AS (SELECT DISTINCT event_type, {_KMV_HASH} AS h FROM ev),
rk AS (SELECT event_type, h,
              row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
       FROM hsh),
sk AS (SELECT event_type, h FROM rk WHERE rk <= {_KMV_K}),
pertype AS (SELECT event_type, count(*) AS cnt, max(h) AS hk
            FROM sk GROUP BY event_type),
exact_t AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
            FROM ev GROUP BY event_type),
t_rows AS (
  SELECT p.event_type AS segment, e.n_exact,
         CASE WHEN p.cnt < {_KMV_K} THEN CAST(p.cnt AS DOUBLE)
              ELSE (CAST({_KMV_K - 1} AS BIGINT) * 2147483647) / p.hk END AS est_kmv
  FROM pertype p JOIN exact_t e USING (event_type)
),
uh AS (SELECT DISTINCT h FROM hsh),
urk AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM uh),
usk AS (SELECT h FROM urk WHERE rk <= {_KMV_K}),
u_est AS (SELECT count(*) AS cnt, max(h) AS hk FROM usk),
u_exact AS (SELECT count(DISTINCT user_id) AS n FROM ev),
u_row AS (
  SELECT '__union_all__' AS segment, u_exact.n AS n_exact,
         CASE WHEN u_est.cnt < {_KMV_K} THEN CAST(u_est.cnt AS DOUBLE)
              ELSE (CAST({_KMV_K - 1} AS BIGINT) * 2147483647) / u_est.hk END AS est_kmv
  FROM u_est, u_exact
),
va AS (SELECT h FROM sk WHERE event_type = 'view'),
cb AS (SELECT h FROM sk WHERE event_type = 'click'),
ta AS (SELECT CASE WHEN count(*) >= {_KMV_K} THEN max(h)
              ELSE 2147483647 END AS th FROM va),
tb AS (SELECT CASE WHEN count(*) >= {_KMV_K} THEN max(h)
              ELSE 2147483647 END AS th FROM cb),
th AS (SELECT least(ta.th, tb.th) AS theta FROM ta, tb),
common AS (SELECT count(*) AS c FROM va JOIN cb ON va.h = cb.h
           CROSS JOIN th WHERE va.h < th.theta),
i_exact AS (SELECT count(*) AS n FROM (
  SELECT user_id FROM ev WHERE event_type = 'view'
  INTERSECT
  SELECT user_id FROM ev WHERE event_type = 'click') q),
i_row AS (
  SELECT '__intersect_view_click__' AS segment, i_exact.n AS n_exact,
         CAST(common.c AS DOUBLE) * CAST(2147483647 AS BIGINT) / th.theta AS est_kmv
  FROM common, th, i_exact
),
donly AS (SELECT count(*) AS c FROM va CROSS JOIN th
          WHERE va.h < th.theta
            AND va.h NOT IN (SELECT h FROM cb)),
d_exact AS (SELECT count(*) AS n FROM (
  SELECT user_id FROM ev WHERE event_type = 'view'
  EXCEPT
  SELECT user_id FROM ev WHERE event_type = 'click') q),
d_row AS (
  SELECT '__view_minus_click__' AS segment, d_exact.n AS n_exact,
         CAST(donly.c AS DOUBLE) * CAST(2147483647 AS BIGINT) / th.theta AS est_kmv
  FROM donly, th, d_exact
)
SELECT * FROM t_rows
UNION ALL SELECT * FROM u_row
UNION ALL SELECT * FROM i_row
UNION ALL SELECT * FROM d_row
""",
)
def sketch_kmv_distinct_users(spark, sf_dir):
    """KMV/theta distinct-count sketch audit over event users: per
    event type, the bottom-32 hash sketch's estimate next to the exact
    distinct count, plus the two compositions HLL cannot do exactly —
    a UNION estimate merged from the per-type sketches and a
    theta-threshold INTERSECTION estimate for view∩click users. Hashes
    ride the portable det_hash so the SQL twin replays every estimate
    bit-for-bit (the engine-native one-shot counterpart is
    approx_count_distinct, whose HLL registers no oracle can replay —
    see agg_approx_distinct). Sketches are exact two-phase min-k
    (operators.profiling.kmv_min_hashes); every relation past the
    distinct is ≤ types × k rows, so the audit joins are broadcasts."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    K, MOD = _KMV_K, (1 << 31) - 1
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    hsh = ev.select(
        "event_type", det_hash("user_id").alias("h")
    )
    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted

    # Persisted: the sketch feeds five downstream branches (per-type
    # agg, union bottom-k, two thetas, the overlap join) — tracked so
    # ranks.unpersist_all releases it like every plan-internal cache.
    sk = track_persisted(
        P.kmv_min_hashes(hsh, "event_type", "h", k=K).cache()
    )
    pertype = sk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("h").alias("hk")
    )
    exact_t = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    est = F.when(
        F.col("cnt") < K, F.col("cnt").cast("double")
    ).otherwise(F.lit((K - 1) * MOD) / F.col("hk"))
    t_rows = (
        pertype.join(exact_t, "event_type")
        .select(
            F.col("event_type").alias("segment"),
            "n_exact",
            est.alias("est_kmv"),
        )
    )
    # Union sketch: bottom-k of the combined per-type sketches (the
    # mergeability property) — tiny input, sort+limit, no window.
    usk = (
        sk.select("h").distinct().orderBy("h").limit(K)
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("h").alias("hk"))
    )
    u_exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    u_row = (
        usk.crossJoin(F.broadcast(u_exact))
        .select(
            F.lit("__union_all__").alias("segment"),
            "n_exact",
            est.alias("est_kmv"),
        )
    )
    # Theta intersection: below min(theta_a, theta_b) both sketches are
    # COMPLETE hash sets, so the overlap count there is exact and
    # scales by 1/theta.
    def theta_of(t):
        return (
            sk.filter(F.col("event_type") == t)
            .agg(
                F.when(F.count(F.lit(1)) >= K, F.max("h"))
                .otherwise(F.lit(MOD))
                .alias("th")
            )
        )

    th = (
        theta_of("view").crossJoin(theta_of("click").withColumnRenamed("th", "th2"))
        .select(F.least("th", "th2").alias("theta"))
    )
    va = sk.filter(F.col("event_type") == "view").select("h")
    cb = sk.filter(F.col("event_type") == "click").select("h")
    common = (
        va.join(cb, "h")
        .crossJoin(F.broadcast(th))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    i_exact = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "view").cast("int")).alias("v"),
            F.max((F.col("event_type") == "click").cast("int")).alias("c"),
        )
        .filter((F.col("v") == 1) & (F.col("c") == 1))
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    i_row = (
        common.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(i_exact))
        .select(
            F.lit("__intersect_view_click__").alias("segment"),
            "n_exact",
            (
                F.col("c").cast("double") * F.lit(MOD) / F.col("theta")
            ).alias("est_kmv"),
        )
    )
    # A-not-B completes the theta set algebra: below theta, A's sketch
    # is A's complete hash set and B's sketch is B's, so membership
    # tests are exact and the difference count scales by 1/theta too.
    donly = (
        va.join(cb, "h", "left_anti")
        .crossJoin(F.broadcast(th))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d_exact = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "view").cast("int")).alias("v"),
            F.max((F.col("event_type") == "click").cast("int")).alias("c"),
        )
        .filter((F.col("v") == 1) & (F.col("c") == 0))
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    d_row = (
        donly.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(d_exact))
        .select(
            F.lit("__view_minus_click__").alias("segment"),
            "n_exact",
            (
                F.col("c").cast("double") * F.lit(MOD) / F.col("theta")
            ).alias("est_kmv"),
        )
    )
    return (
        t_rows.unionByName(u_row).unionByName(i_row).unionByName(d_row)
    )


_AMS_D = 128


def _ams_sign_sql(i: int, dialect: str) -> str:
    """±1 sign hash for AMS sketch row i: two rounds of multiply-xor
    mixing in the 32-bit ring, reduced to parity. A plain multiplicative
    parity has NO avalanche — on near-uniform per-key counts the signs
    correlate and the signed sums cancel (rel_err ~0.94 observed), so
    real bit mixing is load-bearing here, not hygiene. Identical
    arithmetic in both dialects; only the XOR spelling differs."""
    xor = (lambda a, b: f"xor({a}, {b})") if dialect == "duckdb" else (
        lambda a, b: f"({a} ^ {b})"
    )
    h0 = f"(user_id + {12345 + i * 7919})"
    h1 = f"(({h0} * 2654435761) % 4294967296)"
    h2 = xor(h1, f"({h1} >> 16)")
    h3 = f"((({h2}) * 49979693) % 4294967296)"
    h4 = xor(h3, f"({h3} >> 13)")
    return f"(1 - 2 * (({h4}) % 2))"


# Sum of squares via list aggregation: a 128-term left-nested addition
# chain exceeds DuckDB's binder recursion depth, and an integer sum is
# order-insensitive anyway.
_AMS_LIST = ", ".join(f"z{i}" for i in range(_AMS_D))


@register(
    "sketch_ams_f2_users",
    oracle=f"""
WITH z AS (
  SELECT {", ".join(f"sum({_ams_sign_sql(i, 'duckdb')}) AS z{i}"
                    for i in range(_AMS_D))},
         count(*) AS n_rows
  FROM events
),
exact AS (
  SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact
  FROM (SELECT count(*) AS c FROM events GROUP BY user_id) g
),
sq AS (
  SELECT n_rows,
         (SELECT sum(v * v) FROM unnest([{_AMS_LIST}]) AS t(v)) AS sqsum
  FROM z
)
SELECT sq.n_rows, exact.f2_exact,
       sq.sqsum / {_AMS_D} AS f2_ams,
       abs(sq.sqsum / {_AMS_D} - f2_exact) / f2_exact AS rel_err
FROM sq, exact
""",
)
def sketch_ams_f2_users(spark, sf_dir):
    """AMS second-moment (F2) sketch over event users: the self-join
    size Σ cnt_k² — the quantity a join planner wants BEFORE shuffling —
    estimated WITHOUT any per-key grouping. Each of the 128 sketch rows
    is one signed sum Σ s_i(key) over raw rows (s_i = ±1 from a
    two-round multiply-xor mix; see _ams_sign_sql for why avalanche is
    load-bearing): a single wide aggregate, partial-aggregated
    map-side, mergeable across partitions/streams by addition. The
    estimate is the mean of the squared sums, audited in-query against
    the exact group-by F2. Integer signed sums square exactly in BIGINT
    at test scale (at petabyte row counts the squares move to DOUBLE);
    the explicit left-to-right addition chain makes the DuckDB twin
    bit-identical. (Production AMS wants 4-wise independent signs; the
    fixed mix here trades that for exact cross-engine replay.)"""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    z = ev.agg(
        *[
            F.sum(F.expr(_ams_sign_sql(i, "spark")).cast("long")).alias(
                f"z{i}"
            )
            for i in range(_AMS_D)
        ],
        F.count(F.lit(1)).alias("n_rows"),
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"))
    )
    sq = F.aggregate(
        F.array(*[F.col(f"z{i}") for i in range(_AMS_D)]),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v * v,
    )
    return (
        z.crossJoin(F.broadcast(exact))
        .select(
            "n_rows",
            "f2_exact",
            (sq / F.lit(_AMS_D)).alias("f2_ams"),
            (
                F.abs(sq / F.lit(_AMS_D) - F.col("f2_exact"))
                / F.col("f2_exact")
            ).alias("rel_err"),
        )
    )


@register(
    "events_pattern_match",
    oracle="""
WITH paths AS (
  SELECT user_id,
         string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS path
  FROM events GROUP BY user_id
),
pats AS (SELECT unnest(['vc', 'vcp', 'v[^p]*p', 'ee+']) AS pattern)
SELECT p.pattern,
       CAST(sum(len(regexp_extract_all(paths.path, p.pattern)) ) AS BIGINT)
         AS n_matches,
       CAST(sum(CASE WHEN len(regexp_extract_all(paths.path, p.pattern)) > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_users
FROM paths CROSS JOIN pats p
GROUP BY p.pattern
""",
)
def events_pattern_match(spark, sf_dir):
    """Complex-event-processing pattern counts — the MATCH_RECOGNIZE
    surface Spark lacks, emulated the scalable way: each user's full
    event history becomes one ordered type-initial string (one shuffle
    on user_id; per-user state is bounded by per-user activity, the
    same bound any CEP engine needs), then plain regexp_extract_all
    counts non-overlapping occurrences of each pattern. Patterns avoid
    lazy quantifiers so Java regex and RE2 agree: immediate adjacency
    ('vc'), a 3-step adjacency funnel ('vcp'), an eventually-follows
    funnel with no intervening conversion ('v[^p]*p'), and error
    bursts ('ee+'). Deterministic ordering via (ts, event_id);
    array_sort on (ts, event_id, ch) structs gives the same total
    order as the oracle's ORDER BY inside string_agg."""
    ev = load_table(spark, sf_dir, "events")
    paths = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring("event_type", 1, 1).alias("ch"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["ch"]
                ),
                "",
            ).alias("path")
        )
    )
    pats = spark.range(1).select(
        F.explode(
            F.array(
                F.lit("vc"), F.lit("vcp"), F.lit("v[^p]*p"), F.lit("ee+")
            )
        ).alias("pattern")
    )
    hits = F.size(F.regexp_extract_all(F.col("path"), F.col("pattern"), 0))
    return (
        paths.crossJoin(F.broadcast(pats))
        .select("pattern", hits.alias("h"))
        .groupBy("pattern")
        .agg(
            F.sum("h").cast("long").alias("n_matches"),
            F.sum((F.col("h") > 0).cast("int")).cast("long").alias("n_users"),
        )
    )


@register(
    "incremental_distinct_users_kmv",
    oracle=f"""
WITH ev AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         {SQL_DET_HASH.format(col="user_id")} AS h
  FROM events
),
dh AS (SELECT DISTINCT day, h FROM ev),
rk AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rk
       FROM dh),
sk AS (SELECT day, h FROM rk WHERE rk <= 32),
agg AS (SELECT day, count(*) AS cnt, max(h) AS hk FROM sk GROUP BY day)
SELECT day,
       CASE WHEN cnt < 32 THEN CAST(cnt AS DOUBLE)
            ELSE (CAST(31 AS BIGINT) * 2147483647) / hk END AS est_kmv,
       cnt AS sketch_rows
FROM agg
""",
)
def incremental_distinct_users_kmv(spark, sf_dir):
    """KMV twin of incremental_distinct_users: per-day bottom-32
    sketches built independently on the two event-time slices, merged
    by taking the bottom-32 of their union, estimate served per day.
    Same bounded-state-per-key story as the HLL twin — but where HLL
    registers are opaque to any oracle (that query is rows-only by
    design), deterministic bottom-k on the portable det_hash makes the
    merged sketch EQUAL the sketch of all the data, so the incremental
    path is exactly SQL-checkable end to end. The merge window runs on
    ≤ 2k rows per day by construction."""
    from pyspark.sql import Window

    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    K, MOD = 32, (1 << 31) - 1
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.timestamp_micros(F.col("ts")))
        .cast("date")
        .alias("day"),
        det_hash("user_id").alias("h"),
        "ts",
    )
    split_us = 1_705_276_800_000_000  # same slice point as the exact twin
    slices = [
        P.kmv_min_hashes(
            ev.where(F.col("ts") < split_us), "day", "h", k=K
        ),
        P.kmv_min_hashes(
            ev.where(F.col("ts") >= split_us), "day", "h", k=K
        ),
    ]
    merged = (
        slices[0].select("day", "h")
        .unionByName(slices[1].select("day", "h"))
        .distinct()
    )
    w = Window.partitionBy("day").orderBy("h")
    sk = (
        merged.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
    )
    agg = sk.groupBy("day").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("h").alias("hk")
    )
    return agg.select(
        "day",
        F.when(F.col("cnt") < K, F.col("cnt").cast("double"))
        .otherwise(F.lit((K - 1) * MOD) / F.col("hk"))
        .alias("est_kmv"),
        F.col("cnt").cast("long").alias("sketch_rows"),
    )


@register(
    "sketch_quantile_by_type_events",
    oracle="""
WITH ev AS (SELECT event_type, event_id, value FROM events),
nrel AS (SELECT event_type, count(*) AS n FROM ev GROUP BY event_type),
blk AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type, event_id % 8
                            ORDER BY value, event_id) AS r,
         count(*) OVER (PARTITION BY event_type, event_id % 8) AS m
  FROM ev
),
st AS (SELECT *, greatest(1, CAST(floor(m * 0.02) AS BIGINT)) AS s FROM blk),
keep AS (
  SELECT event_type, value, event_id,
         CASE WHEN r % s = 0 THEN s ELSE m % s END AS weight
  FROM st WHERE r % s = 0 OR r = m
),
scan AS (
  SELECT event_type, value, event_id, weight,
         sum(weight) OVER (PARTITION BY event_type
                           ORDER BY value, event_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM keep
),
tgt AS (
  SELECT n.event_type, p, CAST(ceil(p * n.n) AS BIGINT) AS target_rank, n.n
  FROM (SELECT unnest([0.25, 0.5, 0.9]) AS p), nrel n
),
ecum AS (
  SELECT t.event_type, t.p, t.target_rank, t.n, min(s.cum) AS cum
  FROM tgt t JOIN scan s
    ON s.event_type = t.event_type AND s.cum >= t.target_rank
  GROUP BY t.event_type, t.p, t.target_rank, t.n
),
est AS (
  SELECT e.event_type, e.p, e.target_rank, e.n,
         s.value AS est_value, s.event_id AS est_id
  FROM ecum e JOIN scan s
    ON s.event_type = e.event_type AND s.cum = e.cum
),
tr AS (
  SELECT est.event_type, est.p, count(*) AS true_rank
  FROM est JOIN ev
    ON ev.event_type = est.event_type
   AND (ev.value < est.est_value
        OR (ev.value = est.est_value AND ev.event_id <= est.est_id))
  GROUP BY est.event_type, est.p
)
SELECT est.event_type, est.p, est.est_value, est.target_rank,
       tr.true_rank,
       abs(tr.true_rank - est.target_rank) AS rank_err,
       est.n AS n_rows
FROM est JOIN tr
  ON est.event_type = tr.event_type AND est.p = tr.p
""",
)
def sketch_quantile_by_type_events(spark, sf_dir):
    """Per-key quantile sketches: one bounded ε-summary of value per
    event type (quantile_summary with group_cols — 8 blocks, ε = 0.02),
    three probe quantiles each, every estimate audited against its true
    within-group rank. This is the sketch-state-per-key shape streaming
    percentile maintenance keeps; the per-group cumsum window runs over
    the bounded per-group summary (~blocks/ε rows), never the data."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    summary = P.quantile_summary(
        ev, "value", "event_id", blocks=8, eps=0.02,
        group_cols=("event_type",),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scan = summary.withColumn("cum", F.sum("weight").over(w))
    nrel = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    tgt = (
        nrel.crossJoin(
            spark.range(1).select(
                F.explode(
                    F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9))
                ).alias("p")
            )
        )
        .withColumn(
            "target_rank", F.ceil(F.col("p") * F.col("n")).cast("long")
        )
    )
    ecum = (
        scan.join(
            F.broadcast(tgt),
            ["event_type"],
        )
        .filter(F.col("cum") >= F.col("target_rank"))
        .groupBy("event_type", "p", "target_rank", "n")
        .agg(F.min("cum").alias("cum"))
    )
    est = scan.join(F.broadcast(ecum), ["event_type", "cum"]).select(
        "event_type",
        "p",
        "target_rank",
        "n",
        F.col("value").alias("est_value"),
        F.col("event_id").alias("est_id"),
    )
    tr = (
        ev.join(
            F.broadcast(est.select("event_type", "p", "est_value", "est_id")),
            ["event_type"],
        )
        .filter(
            (F.col("value") < F.col("est_value"))
            | (
                (F.col("value") == F.col("est_value"))
                & (F.col("event_id") <= F.col("est_id"))
            )
        )
        .groupBy("event_type", "p")
        .agg(F.count(F.lit(1)).alias("true_rank"))
    )
    return est.join(tr, ["event_type", "p"]).select(
        "event_type",
        "p",
        "est_value",
        "target_rank",
        "true_rank",
        F.abs(F.col("true_rank") - F.col("target_rank")).alias("rank_err"),
        F.col("n").alias("n_rows"),
    )


@register(
    "events_rolling_distinct_kmv",
    oracle=f"""
WITH ev AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         {SQL_DET_HASH.format(col="user_id")} AS h
  FROM events
),
dh AS (SELECT DISTINCT day, h FROM ev),
rk AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rk
       FROM dh),
sk AS (SELECT day, h FROM rk WHERE rk <= 32),
days AS (SELECT DISTINCT day FROM ev),
win AS (
  SELECT d.day, s.h
  FROM days d JOIN sk s
    ON s.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY d.day, s.h
),
wrk AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rk
        FROM win),
wsk AS (SELECT day, h FROM wrk WHERE rk <= 32),
agg AS (SELECT day, count(*) AS cnt, max(h) AS hk FROM wsk GROUP BY day)
SELECT day,
       CASE WHEN cnt < 32 THEN CAST(cnt AS DOUBLE)
            ELSE (CAST(31 AS BIGINT) * 2147483647) / hk END AS est_kmv,
       cnt AS sketch_rows
FROM agg
""",
)
def events_rolling_distinct_kmv(spark, sf_dir):
    """Rolling 7-day distinct users from DAILY sketches: each day keeps
    one bottom-32 sketch; a window's estimate is the bottom-32 of the
    union of its 7 daily sketches (mergeability again — the window
    never rescans events). This is the sketch-algebra answer to rolling
    COUNT(DISTINCT), the aggregation no window frame expresses: state
    per day is k hashes, window merge cost is 7k rows per day, and the
    whole path stays exactly SQL-replayable on the portable hash
    (the exact twin, events_rolling_active_users, pays a bounded range
    join against full daily membership instead). Bounded windows: the
    per-day rank runs over ≤ 7k rows."""
    from pyspark.sql import Window

    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    K, MOD = 32, (1 << 31) - 1
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.timestamp_micros(F.col("ts")))
        .cast("date")
        .alias("day"),
        det_hash("user_id").alias("h"),
    )
    sk = P.kmv_min_hashes(ev, "day", "h", k=K)
    days = ev.select("day").distinct()
    win = (
        days.select(F.col("day").alias("d"))
        .join(
            sk,
            (F.col("day") >= F.date_sub(F.col("d"), 6))
            & (F.col("day") <= F.col("d")),
        )
        .select(F.col("d").alias("day"), "h")
        .distinct()
    )
    w = Window.partitionBy("day").orderBy("h")
    wsk = (
        win.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
    )
    agg = wsk.groupBy("day").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("h").alias("hk")
    )
    return agg.select(
        "day",
        F.when(F.col("cnt") < K, F.col("cnt").cast("double"))
        .otherwise(F.lit((K - 1) * MOD) / F.col("hk"))
        .alias("est_kmv"),
        F.col("cnt").cast("long").alias("sketch_rows"),
    )


@register(
    "privacy_l_diversity",
    oracle="""
WITH g AS (
  SELECT lang, source, count(*) AS group_size,
         count(DISTINCT event_cnt_bucket) AS l_distinct
  FROM (
    SELECT d.lang, d.source, d.doc_id,
           d.n_chars // 200 AS event_cnt_bucket
    FROM documents d
  ) q
  GROUP BY lang, source
)
SELECT lang, source, group_size, l_distinct,
       l_distinct < 3 AS homogeneity_risk
FROM g
ORDER BY l_distinct ASC, group_size ASC, lang, source
""",
)
def privacy_l_diversity(spark, sf_dir):
    """l-diversity audit, the companion check k-anonymity misses: an
    equivalence class over the quasi-identifiers (lang, source) whose
    SENSITIVE attribute (length bucket standing in for one) takes
    fewer than l=3 distinct values is vulnerable to homogeneity
    attacks even when the class itself is large. One aggregate with a
    distinct count per class — same one-scan cost envelope as the
    k-anonymity audit it pairs with."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            "source",
            F.expr("n_chars div 200").alias("event_cnt_bucket"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("event_cnt_bucket").alias("l_distinct"),
        )
        .withColumn("homogeneity_risk", F.col("l_distinct") < 3)
        .orderBy(
            F.asc("l_distinct"),
            F.asc("group_size"),
            F.asc("lang"),
            F.asc("source"),
        )
    )


@register(
    "events_theil_sen_trend",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         epoch(CAST(date_trunc('day', ts) AS DATE)) // 86400 AS d,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT (b.n - a.n) / (b.d - a.d) AS slope
  FROM daily a JOIN daily b ON a.d < b.d
)
SELECT median(slope) AS ts_slope,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs
""",
)
def events_theil_sen_trend(spark, sf_dir):
    """Theil-Sen slope of the daily event count — the robust companion
    to events_linear_trend's OLS fit (a single corrupted day moves OLS
    arbitrarily; the median of pairwise slopes has a 29% breakdown
    point). The pairwise self-join runs on the DAY-sized aggregate
    (30 days → 435 pairs at any corpus size), so the robustness costs
    O(days²) on a driver-tiny relation, never O(rows). Slopes are
    single double divisions and the median of an odd/even pair count
    interpolates identically in both engines, so the oracle replays
    the estimate bit-for-bit."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", F.timestamp_micros(F.col("ts")))
            .cast("date")
            .alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            (F.unix_date(F.col("day"))).cast("long").alias("d"),
            "n",
        )
    )
    b = daily.select(
        F.col("d").alias("d2"), F.col("n").alias("n2")
    )
    pairs = daily.join(b, F.col("d") < F.col("d2")).select(
        ((F.col("n2") - F.col("n")) / (F.col("d2") - F.col("d"))).alias(
            "slope"
        )
    )
    return pairs.agg(
        F.median("slope").alias("ts_slope"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )


@register(
    "events_mann_kendall_trend",
    oracle="""
WITH daily AS (
  SELECT epoch(CAST(date_trunc('day', ts) AS DATE)) // 86400 AS d,
         count(*) AS n
  FROM events GROUP BY 1
),
pairs AS (
  SELECT CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b ON a.d < b.d
),
stats AS (
  SELECT CAST(sum(sgn) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n_pairs,
         (SELECT count(*) FROM daily) AS n_days
  FROM pairs
)
SELECT s, n_pairs, n_days,
       CAST(s AS DOUBLE) / n_pairs AS kendall_tau_a,
       s > 0 AS increasing
FROM stats
""",
)
def events_mann_kendall_trend(spark, sf_dir):
    """Mann-Kendall monotonic-trend test statistic S = Σ sign(n_j−n_i)
    over day pairs, with Kendall's τ-a — the nonparametric yes/no
    companion to the Theil-Sen slope magnitude (no distributional
    assumption, ties contribute zero). Same scale shape: the pairwise
    join runs on the day-sized aggregate, integer sign sums are exact
    in any order, and the one double division replays identically."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", F.timestamp_micros(F.col("ts")))
            .cast("date")
            .alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_date(F.col("day")).cast("long").alias("d"), "n")
    )
    b = daily.select(F.col("d").alias("d2"), F.col("n").alias("n2"))
    pairs = daily.join(b, F.col("d") < F.col("d2")).select(
        F.when(F.col("n2") > F.col("n"), 1)
        .when(F.col("n2") < F.col("n"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    n_days = daily.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        pairs.agg(
            F.sum("sgn").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
        .crossJoin(F.broadcast(n_days))
        .select(
            "s",
            "n_pairs",
            "n_days",
            (F.col("s").cast("double") / F.col("n_pairs")).alias(
                "kendall_tau_a"
            ),
            (F.col("s") > 0).alias("increasing"),
        )
    )


@register(
    "events_chi2_type_dow",
    oracle="""
WITH cells AS (
  SELECT event_type,
         (epoch(CAST(date_trunc('day', ts) AS DATE)) // 86400) % 7 AS dow,
         count(*) AS o
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT c.event_type, c.dow, c.o,
         sum(c.o) OVER (PARTITION BY c.event_type) AS rt,
         sum(c.o) OVER (PARTITION BY c.dow) AS ct,
         sum(c.o) OVER () AS n
  FROM cells c
)
SELECT CAST(sum(CAST(
         (o - CAST(rt * ct AS DOUBLE) / n)
         * (o - CAST(rt * ct AS DOUBLE) / n)
         / (CAST(rt * ct AS DOUBLE) / n) AS DECIMAL(18, 6)))
       AS DOUBLE) AS chi2,
       CAST((count(DISTINCT event_type) - 1)
            * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
       CAST(max(n) AS BIGINT) AS n_events
FROM m
""",
)
def events_chi2_type_dow(spark, sf_dir):
    """Chi-square independence audit of event type × day-of-week — the
    drift screen for 'does traffic mix depend on weekday'. All heavy
    work is one hash aggregate to the 35-cell contingency table;
    margins ride windows over that tiny relation. The weekday bucket
    is epoch-day mod 7 (engine-free arithmetic, not locale-dependent
    dayofweek functions), and per-cell terms round through
    DECIMAL(18,6) before summing so the statistic is bit-identical
    under any parallel addition order."""
    cells = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (
                F.unix_date(
                    F.date_trunc(
                        "day", F.timestamp_micros(F.col("ts"))
                    ).cast("date")
                ).cast("long")
                % 7
            ).alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    from pyspark.sql import Window

    m = (
        cells.withColumn(
            "rt", F.sum("o").over(Window.partitionBy("event_type"))
        )
        .withColumn("ct", F.sum("o").over(Window.partitionBy("dow")))
        .withColumn(
            "n",
            F.sum("o").over(
                Window.partitionBy()
            ),
        )
    )
    e = (F.col("rt") * F.col("ct")).cast("double") / F.col("n")
    term = ((F.col("o") - e) * (F.col("o") - e) / e).cast("decimal(18,6)")
    return m.agg(
        F.sum(term).cast("double").alias("chi2"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("dow") - 1)
        )
        .cast("long")
        .alias("dof"),
        F.max("n").cast("long").alias("n_events"),
    )


@register(
    "sketch_kmv_jaccard_matrix",
    oracle=f"""
WITH ev AS (SELECT DISTINCT event_type, user_id FROM events),
hsh AS (SELECT DISTINCT event_type,
               {SQL_DET_HASH.format(col="user_id")} AS h FROM ev),
rk AS (SELECT event_type, h,
              row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
       FROM hsh),
sk AS (SELECT event_type, h FROM rk WHERE rk <= 32),
pertype AS (
  SELECT event_type, count(*) AS cnt, max(h) AS hk,
         CASE WHEN count(*) >= 32 THEN max(h) ELSE 2147483647 END AS th
  FROM sk GROUP BY event_type
),
prs AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         least(a.th, b.th) AS theta
  FROM pertype a JOIN pertype b ON a.event_type < b.event_type
),
common AS (
  SELECT p.ta, p.tb, count(*) AS c
  FROM prs p JOIN sk a ON a.event_type = p.ta
             JOIN sk b ON b.event_type = p.tb AND b.h = a.h
  WHERE a.h < p.theta
  GROUP BY p.ta, p.tb
),
uh AS (
  SELECT p.ta, p.tb, s.h
  FROM prs p JOIN sk s ON s.event_type IN (p.ta, p.tb)
  GROUP BY p.ta, p.tb, s.h
),
urk AS (SELECT ta, tb, h,
               row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rk
        FROM uh),
usk AS (SELECT ta, tb, count(*) AS ucnt, max(h) AS uhk
        FROM urk WHERE rk <= 32 GROUP BY ta, tb),
est AS (
  SELECT p.ta, p.tb,
         CAST(COALESCE(c.c, 0) AS DOUBLE)
           * CAST(2147483647 AS BIGINT) / p.theta AS e_inter,
         CASE WHEN u.ucnt < 32 THEN CAST(u.ucnt AS DOUBLE)
              ELSE (CAST(31 AS BIGINT) * 2147483647) / u.uhk
         END AS e_union
  FROM prs p
  LEFT JOIN common c ON c.ta = p.ta AND c.tb = p.tb
  JOIN usk u ON u.ta = p.ta AND u.tb = p.tb
),
exact AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         count(*) AS inter,
         (SELECT count(*) FROM ev x WHERE x.event_type = a.event_type)
         + (SELECT count(*) FROM ev y WHERE y.event_type = b.event_type)
         - count(*) AS uni
  FROM ev a JOIN ev b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT est.ta AS type_a, est.tb AS type_b,
       CAST(exact.inter AS DOUBLE) / exact.uni AS j_exact,
       est.e_inter / est.e_union AS j_kmv
FROM est JOIN exact ON exact.ta = est.ta AND exact.tb = est.tb
""",
)
def sketch_kmv_jaccard_matrix(spark, sf_dir):
    """Audience-overlap (Jaccard) matrix across all event-type pairs,
    estimated purely from the per-type bottom-32 sketches: intersection
    via the theta threshold, union via the merged bottom-k — k-row
    math per pair regardless of audience sizes, next to the exact
    distinct-user Jaccard for the audit. The pairwise relations never
    exceed |types|²·k rows; every join off the sketches is broadcast-
    sized. Deterministic hashing keeps all 10 estimates exactly
    SQL-replayable."""
    from pyspark.sql import Window

    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    K, MOD = 32, (1 << 31) - 1
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    hsh = ev.select("event_type", det_hash("user_id").alias("h"))
    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted

    sk = track_persisted(
        P.kmv_min_hashes(hsh, "event_type", "h", k=K).cache()
    )
    pertype = sk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("h").alias("hk")
    ).withColumn(
        "th",
        F.when(F.col("cnt") >= K, F.col("hk")).otherwise(F.lit(MOD)),
    )
    a = pertype.select(
        F.col("event_type").alias("ta"), F.col("th").alias("th_a")
    )
    b = pertype.select(
        F.col("event_type").alias("tb"), F.col("th").alias("th_b")
    )
    prs = (
        a.join(b, F.col("ta") < F.col("tb"))
        .select("ta", "tb", F.least("th_a", "th_b").alias("theta"))
    )
    ska = sk.select(F.col("event_type").alias("ta"), "h")
    skb = sk.select(F.col("event_type").alias("tb"), "h")
    common = (
        F.broadcast(prs)
        .join(ska, "ta")
        .join(skb, ["tb", "h"])
        .filter(F.col("h") < F.col("theta"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    uh = (
        F.broadcast(prs.select("ta", "tb"))
        .join(
            sk,
            (F.col("event_type") == F.col("ta"))
            | (F.col("event_type") == F.col("tb")),
        )
        .select("ta", "tb", "h")
        .distinct()
    )
    w = Window.partitionBy("ta", "tb").orderBy("h")
    usk = (
        uh.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("ucnt"), F.max("h").alias("uhk"))
    )
    est = (
        prs.join(common, ["ta", "tb"], "left")
        .join(usk, ["ta", "tb"])
        .select(
            "ta",
            "tb",
            (
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                * F.lit(MOD)
                / F.col("theta")
            ).alias("e_inter"),
            F.when(F.col("ucnt") < K, F.col("ucnt").cast("double"))
            .otherwise(F.lit((K - 1) * MOD) / F.col("uhk"))
            .alias("e_union"),
        )
    )
    na = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("nu"))
    ea = ev.select(F.col("event_type").alias("ta"), "user_id")
    eb = ev.select(F.col("event_type").alias("tb"), "user_id")
    inter = (
        ea.join(eb, "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    exact = (
        inter.join(
            F.broadcast(na.select(F.col("event_type").alias("ta"),
                                  F.col("nu").alias("na"))), "ta"
        )
        .join(
            F.broadcast(na.select(F.col("event_type").alias("tb"),
                                  F.col("nu").alias("nb"))), "tb"
        )
        .select(
            "ta",
            "tb",
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("j_exact"),
        )
    )
    return (
        est.join(exact, ["ta", "tb"])
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "j_exact",
            (F.col("e_inter") / F.col("e_union")).alias("j_kmv"),
        )
    )


_GEO_X = f"(({SQL_DET_HASH.format(col='user_id')}) % 1000) / 10.0"
_GEO_Y = f"(({SQL_DET_HASH.format(col='event_id')}) % 1000) / 10.0"


@register(
    "spatial_grid_join_events",
    oracle=f"""
WITH pts AS (
  SELECT event_id, {_GEO_X} AS x, {_GEO_Y} AS y
  FROM events WHERE event_id < 3000
),
cells AS (
  SELECT event_id, x, y,
         CAST(floor(x) AS BIGINT) AS cx, CAST(floor(y) AS BIGINT) AS cy
  FROM pts
),
probes AS (
  SELECT event_id, x, y, cx + dx AS cx, cy + dy AS cy
  FROM cells, (SELECT unnest([-1, 0, 1]) AS dx),
              (SELECT unnest([-1, 0, 1]) AS dy)
)
SELECT a.event_id AS event_a, b.event_id AS event_b,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
FROM probes a JOIN cells b ON a.cx = b.cx AND a.cy = b.cy
WHERE a.event_id < b.event_id
  AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 1.0
""",
)
def spatial_grid_join_events(spark, sf_dir):
    """Spatial self-join by uniform grid — the distance-join shape
    Spark has no native operator for, done the scalable way: quantize
    each point to its r-sized grid cell, expand ONE side to its 3×3
    cell neighborhood (constant fan-out), equi-join on cell id, then
    exact-distance filter — candidate generation is an equi-join a
    shuffle can hash, never a cross join, and per-cell density bounds
    the work per key (the same decomposition LSH uses for cosine and
    the pruning report uses for file skipping). Coordinates are
    synthesized deterministically from the portable hash (0.1-degree
    lattice), so both engines compute bit-identical doubles and the
    pair set replays exactly. The a<b guard dedups the symmetric pair
    and self-match in one shot."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 3000)
        .select("event_id", "user_id")
    )
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    pts = ev.select(
        "event_id",
        ((det_hash("user_id") % 1000) / 10.0).alias("x"),
        ((det_hash("event_id") % 1000) / 10.0).alias("y"),
    )
    cells = pts.select(
        "event_id",
        "x",
        "y",
        F.floor("x").cast("long").alias("cx"),
        F.floor("y").cast("long").alias("cy"),
    )
    offs = spark.range(1).select(
        F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx")
    ).crossJoin(
        spark.range(1).select(
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy")
        )
    )
    probes = cells.crossJoin(F.broadcast(offs)).select(
        F.col("event_id").alias("event_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
    )
    d2 = (F.col("xa") - F.col("x")) * (F.col("xa") - F.col("x")) + (
        F.col("ya") - F.col("y")
    ) * (F.col("ya") - F.col("y"))
    return (
        probes.join(cells, ["cx", "cy"])
        .filter(F.col("event_a") < F.col("event_id"))
        .filter(d2 <= 1.0)
        .select(
            "event_a",
            F.col("event_id").alias("event_b"),
            d2.alias("dist2"),
        )
    )


@register(
    "ml_eval_auc_events",
    oracle=f"""
WITH scored AS (
  SELECT event_id, value AS score,
         CAST(({SQL_DET_HASH.format(col="user_id")}) % 2 AS BIGINT) AS label
  FROM events
),
rk AS (
  SELECT label,
         row_number() OVER (ORDER BY score, event_id) AS r
  FROM scored
),
s AS (
  SELECT CAST(sum(CASE WHEN label = 1 THEN r ELSE 0 END) AS BIGINT) AS rpos,
         CAST(sum(label) AS BIGINT) AS n_pos,
         CAST(count(*) - sum(label) AS BIGINT) AS n_neg
  FROM rk
),
topk AS (
  SELECT CAST(sum(label) AS BIGINT) AS hits
  FROM (SELECT label FROM scored ORDER BY score DESC, event_id LIMIT 100) q
)
SELECT s.n_pos, s.n_neg,
       CAST(s.rpos - s.n_pos * (s.n_pos + 1) // 2 AS DOUBLE)
         / (s.n_pos * s.n_neg) AS auc,
       CAST(topk.hits AS DOUBLE) / 100 AS precision_at_100
FROM s, topk
""",
)
def ml_eval_auc_events(spark, sf_dir):
    """Exact large-scale model-evaluation metrics — the audit a quality
    classifier over a 100 TB corpus needs without sampling: AUC from
    the Mann-Whitney rank-sum identity (positives' global rank sum,
    ranks via the hierarchical ordered_scan — no single-partition sort
    of the score column) and precision@100 via TakeOrderedAndProject.
    Scores are the event values, labels a deterministic hash parity
    (so AUC ≈ 0.5 by construction — it's the machinery under audit,
    not the model). Ties resolved by the (score, event_id) total
    order, making every rank — and therefore the statistic — integer-
    exact and bit-identical in both engines. The n_pos(n_pos+1)/2
    correction is computed with exact integer division (ranks.py's idiv
    discipline; DuckDB `//`) BEFORE the double cast — rpos and the
    triangular term individually exceed 2^53 near 1e8 rows, so only the
    difference (bounded by n_pos*n_neg) may safely become a double."""
    from wikipedia_data_pipeline_spark.operators.ranks import ordered_scan
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    scored = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("value").alias("score"),
        (det_hash("user_id") % 2).cast("long").alias("label"),
    )
    rk = ordered_scan(scored, ["score", "event_id"], rank_col="r")
    s = rk.agg(
        F.sum(F.when(F.col("label") == 1, F.col("r")).otherwise(0))
        .cast("long")
        .alias("rpos"),
        F.sum("label").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("n_neg"),
    )
    topk = (
        scored.orderBy(F.desc("score"), F.asc("event_id"))
        .limit(100)
        .agg(F.sum("label").cast("long").alias("hits"))
    )
    # exact triangular number: n_pos*(n_pos+1) is always even, so the
    # idiv (via DECIMAL(38,0), like ranks.global_ntile) is lossless;
    # the rpos - tri difference is <= n_pos*n_neg, double-safe.
    prod = F.col("n_pos") * (F.col("n_pos") + 1)
    tri = ((prod - prod % 2).cast("decimal(38,0)") / 2).cast("long")
    return (
        s.crossJoin(F.broadcast(topk))
        .select(
            "n_pos",
            "n_neg",
            (
                (F.col("rpos") - tri).cast("double")
                / (F.col("n_pos") * F.col("n_neg")).cast("double")
            ).alias("auc"),
            (F.col("hits").cast("double") / 100).alias("precision_at_100"),
        )
    )


@register(
    "ml_eval_gains_table",
    oracle=f"""
WITH scored AS (
  SELECT event_id, value AS score,
         CAST(({SQL_DET_HASH.format(col="user_id")}) % 2 AS BIGINT) AS label
  FROM events
),
deciled AS (
  SELECT label,
         ntile(10) OVER (ORDER BY score DESC, event_id) AS decile
  FROM scored
),
per AS (
  SELECT decile, count(*) AS n, CAST(sum(label) AS BIGINT) AS n_pos
  FROM deciled GROUP BY decile
),
tot AS (SELECT sum(n) AS nn, sum(n_pos) AS np FROM per)
SELECT p.decile, CAST(p.n AS BIGINT) AS n, p.n_pos,
       CAST(sum(p.n_pos) OVER (ORDER BY p.decile
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_pos,
       CAST(sum(p.n_pos) OVER (ORDER BY p.decile ROWS UNBOUNDED PRECEDING)
            AS DOUBLE) / t.np AS gain,
       (CAST(p.n_pos AS DOUBLE) / p.n)
         / (CAST(t.np AS DOUBLE) / t.nn) AS lift
FROM per p, tot t
""",
)
def ml_eval_gains_table(spark, sf_dir):
    """Decile gains/lift table for a score column — the campaign-
    targeting companion to ml_eval_auc_events: rows ranked by score
    fall into 10 equal tiles via global_ntile (the hierarchical NTILE —
    no single-partition window over the scored corpus), then per-tile
    capture and lift are pure integer/count arithmetic. The cumulative
    window runs over the 10-row decile relation. Hash-parity labels
    again: the machinery is under audit, so gain≈decile/10 and lift≈1
    are the expected fixed points."""
    from wikipedia_data_pipeline_spark.operators.ranks import global_ntile
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash
    from pyspark.sql import Window

    scored = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("value").alias("score"),
        (det_hash("user_id") % 2).cast("long").alias("label"),
    )
    deciled = global_ntile(
        scored, [F.desc("score"), F.asc("event_id")], 10, "decile"
    )
    per = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("label").cast("long").alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n").alias("nn"), F.sum("n_pos").alias("np")
    )
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("cum_pos", F.sum("n_pos").over(w).cast("long"))
        .select(
            "decile",
            "n",
            "n_pos",
            "cum_pos",
            (F.col("cum_pos").cast("double") / F.col("np")).alias("gain"),
            (
                (F.col("n_pos").cast("double") / F.col("n"))
                / (F.col("np").cast("double") / F.col("nn"))
            ).alias("lift"),
        )
    )
