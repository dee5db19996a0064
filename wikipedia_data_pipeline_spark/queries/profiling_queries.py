"""Data profiling, curation, incremental maintenance, and operational
screens — the remainder of the former round-5+ registration tail after
the round-7 family split (stats / finance / graph / privacy / spatial /
ml-eval / sketch / textcorpus now live in their like-named sibling
modules; same registry keys, same oracles). New registrations go in
whichever family module fits, or here for true profiling/ops queries —
placement is cosmetic: the driver's ~50-slot correctness window is
addressed BY NAME via registry._PINNED/_ROTATION, never by import
order.

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
    "text_duplicate_spans_extract",
    oracle="""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
occ AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS g
  FROM tok, unnest(generate_series(1, len(t) - 7)) AS u(i)
  WHERE len(t) >= 8
),
gd AS (SELECT g, count(DISTINCT doc_id) AS nd FROM occ GROUP BY g),
dup AS (
  SELECT o.doc_id, o.pos FROM occ o JOIN gd ON o.g = gd.g WHERE gd.nd >= 2
),
runs AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dup
),
spans AS (
  SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         CAST(count(*) + 7 AS BIGINT) AS span_len_tokens
  FROM runs GROUP BY doc_id, grp
)
SELECT s.doc_id, s.span_start, s.span_len_tokens,
       array_to_string(
         t[s.span_start:s.span_start + s.span_len_tokens - 1], ' ')
         AS span_text
FROM spans s JOIN tok USING (doc_id)
""",
)
def text_duplicate_spans_extract(spark, sf_dir):
    """Exact-substring dedup, stage 2 (Lee et al. 2022): the maximal
    duplicated substrings themselves — (doc_id, span_start,
    span_len_tokens, span_text), one row per maximal run of 8-token
    grams that also occur in another document. text_span_dedup_stats
    measures HOW duplicated a document is; this is the relation that
    CUTS the duplicated text out. Hash-fingerprinted grams keep the
    corpus-wide exchange at 8 bytes/key; run reconstruction (islands
    trick) is a doc-partitioned window; the oracle replays the same
    grams on raw strings, so agreement re-proves the fingerprint path
    collision-clean."""
    return D.duplicate_spans_extract(
        load_table(spark, sf_dir, "documents"), 8
    )


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


# --- Incremental JOIN-MV maintenance (round 7) --------------------------


@register(
    "incremental_mv_join_pairs",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, event_id FROM events
  WHERE event_type IN ('view', 'click')
),
mv0 AS (
  SELECT user_id,
         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS nv0,
         CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS nc0
  FROM ev WHERE event_id % 10 < 8 GROUP BY user_id
),
d AS (
  SELECT user_id,
         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS dv,
         CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS dc
  FROM ev WHERE event_id % 10 >= 8 GROUP BY user_id
),
inc AS (
  SELECT coalesce(mv0.user_id, d.user_id) AS user_id,
         coalesce(nv0, 0) * coalesce(nc0, 0)
         + coalesce(nv0, 0) * coalesce(dc, 0)
         + coalesce(dv, 0) * coalesce(nc0, 0)
         + coalesce(dv, 0) * coalesce(dc, 0) AS pairs_incremental
  FROM mv0 FULL OUTER JOIN d ON mv0.user_id = d.user_id
),
full_v AS (
  SELECT user_id,
         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
         * CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
           AS pairs_recomputed
  FROM ev GROUP BY user_id
)
SELECT inc.user_id,
       CAST(pairs_incremental AS BIGINT) AS pairs_incremental,
       pairs_recomputed
FROM inc JOIN full_v ON inc.user_id = full_v.user_id
ORDER BY pairs_incremental DESC, inc.user_id ASC
LIMIT 50
""",
)
def incremental_mv_join_pairs(spark, sf_dir):
    """Incremental maintenance of a JOIN materialized view — the delta
    rule a warehouse applies instead of re-running the join on every
    batch: for MV = A join B, the new batch contributes
    dA join B + A join dB + dA join dB. Here the view is the per-user
    view-x-click pair count (the join-cardinality relation), its
    aggregate form making every term a product of counts:
    (nv0+dv)(nc0+dc) expanded into the four delta terms. The audit
    column recomputes from scratch; the two must agree exactly —
    counts, so integer-exact by construction. Completes the
    incremental family (aggregate MV: incremental_mv_orders; distinct:
    incremental_distinct_users[_kmv]; this is the join shape). Scale:
    both arms are one hash agg + a key-partitioned outer join of
    entity-sized relations — the delta arm touches only |batch| fact
    rows, which is the point of maintenance at 100 TB."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    nv = F.count(F.when(F.col("event_type") == "view", 1)).cast("long")
    nc = F.count(F.when(F.col("event_type") == "click", 1)).cast("long")
    mv0 = (
        ev.filter(F.col("event_id") % 10 < 8)
        .groupBy("user_id")
        .agg(nv.alias("nv0"), nc.alias("nc0"))
    )
    d = (
        ev.filter(F.col("event_id") % 10 >= 8)
        .groupBy("user_id")
        .agg(nv.alias("dv"), nc.alias("dc"))
    )
    z = F.lit(0)
    inc = mv0.join(d, "user_id", "full_outer").select(
        "user_id",
        (
            F.coalesce("nv0", z) * F.coalesce("nc0", z)
            + F.coalesce("nv0", z) * F.coalesce("dc", z)
            + F.coalesce("dv", z) * F.coalesce("nc0", z)
            + F.coalesce("dv", z) * F.coalesce("dc", z)
        )
        .cast("long")
        .alias("pairs_incremental"),
    )
    full_v = ev.groupBy("user_id").agg(
        (nv * nc).cast("long").alias("pairs_recomputed")
    )
    return (
        inc.join(full_v, "user_id")
        .orderBy(F.desc("pairs_incremental"), F.asc("user_id"))
        .limit(50)
        .select("user_id", "pairs_incremental", "pairs_recomputed")
    )


@register(
    "orders_merkle_segments",
    oracle=f"""
SELECT o_orderkey // 8192 AS segment,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(CAST(sum({SQL_DET_HASH.format(col="o_orderkey")}) AS BIGINT)
            AS BIGINT) AS key_checksum,
       CAST(CAST(sum(CAST(round(o_totalprice * 1000000) AS BIGINT))
                 AS BIGINT) AS BIGINT) AS value_checksum_u
FROM orders
GROUP BY 1
""",
)
def orders_merkle_segments(spark, sf_dir):
    """Segment-granular table checksums — the Merkle-style companion to
    orders_integrity_checksum (which certifies the WHOLE table in one
    row): key-range segments each carry a row count, an associative
    portable key-hash sum, and the exact micro-unit money total, so two
    replicas that disagree can binary-search the divergence to an
    8192-key segment instead of re-scanning the table — the
    anti-entropy shape replicated stores run continuously. Every
    checksum is an order-independent integer sum (det_hash <= 2^31 per
    row; micro-units exact by the cents_sum contract), so the relation
    is bit-identical under any partitioning and any engine. One hash
    aggregate, segment-keyed — nothing global."""
    from wikipedia_data_pipeline_spark.functions import cents_units
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    orders = load_table(spark, sf_dir, "orders")
    seg = (
        (F.col("o_orderkey") - F.col("o_orderkey") % 8192)
        .cast("decimal(38,0)") / 8192
    ).cast("long")
    return orders.groupBy(seg.alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(det_hash("o_orderkey")).cast("long").alias("key_checksum"),
        F.sum(cents_units("o_totalprice"))
        .cast("long")
        .alias("value_checksum_u"),
    )


@register(
    "curation_mixture_weights",
    oracle="""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS chars_s
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(chars_s) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS nsrc
  FROM per
),
w AS (
  SELECT source, n_docs, chars_s, total,
         CAST(round(least(4.0, CAST(total AS DOUBLE)
                               / CAST(chars_s * nsrc AS DOUBLE))
                    * 1000000000) AS BIGINT) AS wq
  FROM per, tot
),
den AS (
  SELECT CAST(sum(CAST(wq AS DECIMAL(19,0)) * CAST(chars_s AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS d
  FROM w
)
SELECT source, n_docs, chars_s,
       CAST(chars_s AS DOUBLE) / total AS raw_share,
       CAST(wq AS DOUBLE) / 1000000000 AS weight,
       CAST(CAST(wq AS DECIMAL(19,0)) * CAST(chars_s AS DECIMAL(19,0))
            AS DOUBLE) / CAST(den.d AS DOUBLE) AS effective_share
FROM w, den
ORDER BY source
""",
)
def curation_mixture_weights(spark, sf_dir):
    """Domain-mixture reweighting — the data-mixing step a pretraining
    pipeline runs before sampling: per-source character shares, the
    up/down-sampling weight that steers the mixture toward the uniform
    target (capped at 4x so no tiny domain is over-amplified), and the
    effective post-reweight share the capped weights actually achieve.
    The DoReMi-class knob reduced to its deterministic skeleton:
    weight_s = min(cap, target_share / actual_share).

    Exactness: shares and the raw weight are single fixed-order
    divisions of exact BIGINT character sums; the weight is then
    quantized to nano-units ONCE, so the renormalized effective share
    is a ratio of exact DECIMAL(38,0) integer products — both engines
    emit identical bits (the ml_eval_rater_kappa product discipline).

    Scale shape: one scan -> |sources| rows; everything after is
    driver-tiny arithmetic. Pairs with curation_source_cap (hard
    per-source cap) and sample_weighted_mixture (applying weights)."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_s"),
    )
    # |sources| rows consumed by three branches (total, weights, the
    # renormalizer) — persist so the corpus agg runs once
    from pyspark import StorageLevel

    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted

    per = track_persisted(per.persist(StorageLevel.MEMORY_AND_DISK))
    tot = per.agg(
        F.sum("chars_s").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("nsrc"),
    )
    w = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "chars_s",
        "total",
        F.round(
            F.least(
                F.lit(4.0),
                F.col("total").cast("double")
                / (F.col("chars_s") * F.col("nsrc")).cast("double"),
            )
            * F.lit(1_000_000_000)
        )
        .cast("long")
        .alias("wq"),
    )
    dec = "decimal(19,0)"
    den = w.agg(
        F.sum(F.col("wq").cast(dec) * F.col("chars_s").cast(dec))
        .cast("decimal(38,0)")
        .alias("d")
    )
    return (
        w.crossJoin(F.broadcast(den))
        .select(
            "source",
            "n_docs",
            "chars_s",
            (F.col("chars_s").cast("double") / F.col("total")).alias(
                "raw_share"
            ),
            (F.col("wq").cast("double") / F.lit(1_000_000_000)).alias(
                "weight"
            ),
            (
                (F.col("wq").cast(dec) * F.col("chars_s").cast(dec)).cast(
                    "double"
                )
                / F.col("d").cast("double")
            ).alias("effective_share"),
        )
        .orderBy("source")
    )
