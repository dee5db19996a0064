"""Relational sketches with EXACT oracles (deterministic SQL-replayable
hashing): Count-Min, eps-quantile summaries (global and per-key),
KMV/theta distinct (union, intersection, A-not-B, Jaccard matrix,
rolling-window merges, incremental corpus+batch), AMS F2, HLL
incremental (approximate, rows-only), and the Bloom runtime prefilter
join. Split out of profiling_queries (round 7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.operators import dedup as D
from wikipedia_data_pipeline_spark.operators import profiling as P
from wikipedia_data_pipeline_spark.operators.sampling import SQL_DET_HASH
from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table


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
    exactly checkable.

    r14 (AB_QUANTILE_NREL_r14: 6.63 → 4.57 s best-of-3 at 100×): the
    summary's weights sum to the EXACT row count by construction
    (every stride row carries s, the block's last row carries the
    m % s remainder), so N is read off the persisted summary instead
    of a second full fact scan — 3 fact passes become 2 (the
    result-pinned per-block sort + the true-rank audit). A GK/KLL
    merge-tree for the remaining sort was ruled out structurally: the
    output's est_value/est_id rows are summary points of THIS
    striding (oracle-replayed); a different compaction returns
    different estimates — a different query, not an optimization."""
    from pyspark import StorageLevel

    from wikipedia_data_pipeline_spark.operators.ranks import (
        ordered_scan,
        track_persisted,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    summary = track_persisted(
        P.quantile_summary(
            ev, "value", "event_id", blocks=32, eps=0.02
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    scan = ordered_scan(
        summary, ["value", "event_id"], running=[("cum", "weight", "sum")]
    )
    nrel = summary.agg(F.sum("weight").cast("long").alias("n"))
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
    distinct is ≤ types × k rows, so the audit joins are broadcasts.

    Shape (round-11 flip): the sketch AND every exact-audit branch
    route through ONE persisted distinct (type, user) pair relation,
    and the three whole-population audits (union count, view∩click,
    view∖click) come from a single per-user flags aggregate — one
    fact-table pass + one pair-relation exchange total, vs the prior
    multipass form's four independent fact scans. Adjudicated by an
    interleaved same-process best-of-3 A/B at the 100× replica
    (AB_KMV_r11.json: 2.45 s vs 3.32 s, a 26% win beyond the measured
    20% noise band) after r9 and r10 sequential probes disagreed; the
    multipass form stays probed as
    sketch_kmv_distinct_users__multipass_baseline."""
    from pyspark import StorageLevel

    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    K, MOD = _KMV_K, (1 << 31) - 1
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted

    # ONE distinct over the (type, user) pairs — the only fact-sized
    # exchange in the query; every audit and the sketch read it.
    d = track_persisted(
        ev.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    )
    hsh = d.select("event_type", det_hash("user_id").alias("h"))
    # Persisted: the sketch feeds five downstream branches (per-type
    # agg, union bottom-k, two thetas, the overlap join) — tracked so
    # ranks.unpersist_all releases it like every plan-internal cache.
    sk = track_persisted(
        P.kmv_min_hashes(hsh, "event_type", "h", k=K).cache()
    )
    pertype = sk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("h").alias("hk")
    )
    # pairs are already distinct, so the exact audit is a plain count
    exact_t = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_exact")
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
    # One per-user flags pass over the distinct pairs yields ALL THREE
    # whole-population exact audits (union / intersect / difference).
    flags = d.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("v"),
        F.max((F.col("event_type") == "click").cast("int")).alias("c"),
    )
    audits = track_persisted(
        flags.agg(
            F.count(F.lit(1)).alias("n_union"),
            F.sum(F.col("v") * F.col("c")).cast("long").alias("n_vc"),
            F.sum(F.col("v") * (1 - F.col("c")))
            .cast("long")
            .alias("n_vnc"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )
    u_row = (
        usk.crossJoin(F.broadcast(audits))
        .select(
            F.lit("__union_all__").alias("segment"),
            F.col("n_union").alias("n_exact"),
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
    i_row = (
        common.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(audits))
        .select(
            F.lit("__intersect_view_click__").alias("segment"),
            F.col("n_vc").alias("n_exact"),
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
    d_row = (
        donly.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(audits))
        .select(
            F.lit("__view_minus_click__").alias("segment"),
            F.col("n_vnc").alias("n_exact"),
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
    ≤ 2k rows per day by construction.

    SINGLE-SCAN form (r12 s4): the per-slice sketches come from ONE
    composite-group kmv_min_hashes over (slice, day) instead of two
    separate fact scans — identical result relation (min-k within
    (slice, day) is min-k regardless of how the slices were scanned),
    one scan + one distinct instead of two of each. Interleaved A/B at
    the 100× replica: 3.05 s vs the two-scan form's 9.31 s best-of-3
    (AB_KMV_INCR_r12.json, results asserted identical)."""
    from pyspark.sql import Window

    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    K, MOD = 32, (1 << 31) - 1
    split_us = 1_705_276_800_000_000  # same slice point as the exact twin
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("ts") >= split_us).cast("int").alias("slice"),
        F.date_trunc("day", F.timestamp_micros(F.col("ts")))
        .cast("date")
        .alias("day"),
        det_hash("user_id").alias("h"),
    )
    sk_slices = P.kmv_min_hashes(ev, ["slice", "day"], "h", k=K)
    merged = sk_slices.select("day", "h").distinct()
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


# --- Join-cardinality estimation from a hash key sample (round 7) -------
#
# The optimizer-statistics shape: estimate |A join B on k| without
# running the join, by summing per-key frequency products over a
# deterministic hash sample of the key domain and scaling by the
# inverse sampling rate (end-biased sampling a la Flajolet; the same
# sketch family cost-based optimizers feed on). det_hash makes the
# sample — and therefore the estimate — bit-identical in both engines.

_JC_T = 1 << 27  # keys with h < T are sampled: p = T / (2^31 - 1) ~ 1/16
_JC_MOD = (1 << 31) - 1


@register(
    "sketch_join_cardinality_events",
    oracle=f"""
WITH per AS (
  SELECT user_id,
         CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS nv,
         CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS nc
  FROM events
  WHERE event_type IN ('view', 'click')
  GROUP BY user_id
),
exact AS (SELECT CAST(sum(nv * nc) AS BIGINT) AS exact_join_card FROM per),
sam AS (
  SELECT CAST(count(*) AS BIGINT) AS sampled_keys,
         CAST(coalesce(sum(nv * nc), 0) AS BIGINT) AS s_pairs
  FROM per
  WHERE ({SQL_DET_HASH.format(col="user_id")}) < {_JC_T}
)
SELECT sam.sampled_keys,
       CAST(sam.s_pairs AS DOUBLE) * {_JC_MOD} / {_JC_T} AS est_join_card,
       exact.exact_join_card
FROM sam, exact
""",
)
def sketch_join_cardinality_events(spark, sf_dir):
    """Equi-join cardinality estimate for the view-x-click self-join on
    user_id — the statistic a cost-based optimizer wants BEFORE
    committing to a join strategy, computed without executing the join:
    per-key frequency products summed over a ~1/16 deterministic hash
    sample of the key domain, scaled by the inverse rate. One hash agg
    over the fact table (map-side partial), then two 1-row aggregates —
    at 100 TB the whole estimator costs one shuffle of |keys| rows,
    versus the join's |A|+|B| shuffle plus its (possibly exploding)
    output. The exact cardinality rides along as the audit column;
    det_hash keeps the sample replayable so the DuckDB twin matches
    bit-for-bit rather than statistically."""
    from wikipedia_data_pipeline_spark.operators.sampling import det_hash

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    per = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1))
        .cast("long")
        .alias("nv"),
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("long")
        .alias("nc"),
    )
    exact = per.agg(
        F.sum(F.col("nv") * F.col("nc")).cast("long").alias("exact_join_card")
    )
    sam = per.filter(det_hash("user_id") < _JC_T).agg(
        F.count(F.lit(1)).cast("long").alias("sampled_keys"),
        F.coalesce(F.sum(F.col("nv") * F.col("nc")), F.lit(0))
        .cast("long")
        .alias("s_pairs"),
    )
    return sam.crossJoin(F.broadcast(exact)).select(
        "sampled_keys",
        (F.col("s_pairs").cast("double") * _JC_MOD / _JC_T).alias(
            "est_join_card"
        ),
        "exact_join_card",
    )
