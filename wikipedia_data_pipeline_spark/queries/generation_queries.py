"""Generation-eval metrics over candidate/reference text pairs:
corpus BLEU-4 and ROUGE-N recall. Fixture: candidate = each document's
first 80% of space-split tokens, reference = the full document — a
deterministic pair set that exercises clipping, sub-1 precisions, and
the brevity penalty (the machinery-under-audit discipline of
ml_eval_auc_events). Split from mleval_queries at the 2,000-line
threshold (round 11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipedia_data_pipeline_spark.registry import register
from wikipedia_data_pipeline_spark.sources.tables import load_table

_BLEU_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
d AS (
  SELECT doc_id, toks,
         greatest((len(toks) * 4) // 5, 1) AS clen, len(toks) AS rlen
  FROM t
),
cg AS (
  SELECT doc_id, n, array_to_string(toks[i : i + n - 1], ' ') AS g,
         count(*) AS c_cnt
  FROM (
    SELECT d.doc_id, d.toks, nn.n,
           unnest(range(1, greatest(d.clen - nn.n + 2, 1))) AS i
    FROM d CROSS JOIN (VALUES (1), (2), (3), (4)) AS nn(n)
  )
  GROUP BY doc_id, n, g
),
rg AS (
  SELECT doc_id, n, array_to_string(toks[i : i + n - 1], ' ') AS g,
         count(*) AS r_cnt
  FROM (
    SELECT d.doc_id, d.toks, nn.n,
           unnest(range(1, greatest(d.rlen - nn.n + 2, 1))) AS i
    FROM d CROSS JOIN (VALUES (1), (2), (3), (4)) AS nn(n)
  )
  GROUP BY doc_id, n, g
),
m AS (
  SELECT cg.n,
         CAST(sum(least(cg.c_cnt, COALESCE(rg.r_cnt, 0))) AS BIGINT)
           AS matches
  FROM cg LEFT JOIN rg
    ON rg.doc_id = cg.doc_id AND rg.n = cg.n AND rg.g = cg.g
  GROUP BY cg.n
),
tot AS (
  SELECT CAST(sum(greatest(clen - 1 + 1, 0)) AS BIGINT) AS t1,
         CAST(sum(greatest(clen - 2 + 1, 0)) AS BIGINT) AS t2,
         CAST(sum(greatest(clen - 3 + 1, 0)) AS BIGINT) AS t3,
         CAST(sum(greatest(clen - 4 + 1, 0)) AS BIGINT) AS t4,
         CAST(sum(clen) AS BIGINT) AS cand_tokens,
         CAST(sum(rlen) AS BIGINT) AS ref_tokens
  FROM d
),
mp AS (
  SELECT CAST(max(CASE WHEN n = 1 THEN matches END) AS BIGINT) AS m1,
         CAST(max(CASE WHEN n = 2 THEN matches END) AS BIGINT) AS m2,
         CAST(max(CASE WHEN n = 3 THEN matches END) AS BIGINT) AS m3,
         CAST(max(CASE WHEN n = 4 THEN matches END) AS BIGINT) AS m4
  FROM m
),
fin AS (
  SELECT mp.m1, mp.m2, mp.m3, mp.m4,
         tot.t1, tot.t2, tot.t3, tot.t4,
         tot.cand_tokens, tot.ref_tokens,
         CAST(round(1000000000 * (CASE
             WHEN tot.cand_tokens >= tot.ref_tokens THEN 1.0
             ELSE exp(1.0 - CAST(tot.ref_tokens AS DOUBLE)
                            / CAST(tot.cand_tokens AS DOUBLE)) END))
           AS BIGINT) AS bp_nano,
         CASE WHEN mp.m1 > 0 AND mp.m2 > 0 AND mp.m3 > 0 AND mp.m4 > 0
           THEN CAST(round(1000000000 * (CASE
             WHEN tot.cand_tokens >= tot.ref_tokens THEN 1.0
             ELSE exp(1.0 - CAST(tot.ref_tokens AS DOUBLE)
                            / CAST(tot.cand_tokens AS DOUBLE)) END)
             * exp(0.25 * (ln(CAST(mp.m1 AS DOUBLE) / CAST(tot.t1 AS DOUBLE))
                         + ln(CAST(mp.m2 AS DOUBLE) / CAST(tot.t2 AS DOUBLE))
                         + ln(CAST(mp.m3 AS DOUBLE) / CAST(tot.t3 AS DOUBLE))
                         + ln(CAST(mp.m4 AS DOUBLE) / CAST(tot.t4 AS DOUBLE)))))
           AS BIGINT)
           ELSE 0 END AS bleu_nano
  FROM mp, tot
)
SELECT m1, m2, m3, m4, t1, t2, t3, t4, cand_tokens, ref_tokens,
       CAST(bp_nano AS DOUBLE) / 1000000000 AS brevity_penalty,
       CAST(bleu_nano AS DOUBLE) / 1000000000 AS bleu4
FROM fin
"""


@register("ml_eval_bleu_corpus", oracle=_BLEU_ORACLE)
def ml_eval_bleu_corpus(spark, sf_dir):
    """Corpus BLEU-4 (Papineni et al. 2002) — the generation-eval
    metric an LLM pipeline reports for translation/summarization runs:
    modified (clipped) n-gram precision for n=1..4 aggregated over the
    corpus, times the brevity penalty. Candidate/reference pairs are a
    deterministic fixture (candidate = each document's first 80% of
    space-split tokens, reference = the full document), so clipping,
    the <1 precisions, and BP are all exercised non-trivially — the
    machinery is under audit, as in ml_eval_auc_events.

    Exactness: every clipped-match and total count is a BIGINT; the
    two transcendentals (BP's exp, the ¼Σln geometric mean) run ONCE
    on corpus-level scalars and are quantized to nano-units
    (privacy_dp_release_counts discipline) — engines never compare
    unrounded libm bits across more than one row.

    Scale shape: token arrays build per-row in the JVM (higher-order
    functions, no UDF); the only shuffles are the two (doc, n, gram)
    hash aggregations and their equi-join — linear in corpus size,
    gram keys are doc-scoped so no global hot key exists. The totals
    side collapses in one pass over per-doc lengths."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.greatest(
            F.expr("(size(split(text, ' ')) * 4) div 5"), F.lit(1)
        ).alias("clen"),
        F.size(toks).alias("rlen"),
    )

    def grams(limit_col, n):
        # gram windows [i, i+n-1] fully inside the first `limit_col`
        # tokens; empty when the span is shorter than n
        return F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.col(limit_col) - (n - 1), F.lit(0)),
            ),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(
                    " ",
                    *[
                        F.element_at(F.col("toks"), (i + j).cast("int"))
                        for j in range(n)
                    ],
                ).alias("g"),
            ),
        )

    def gram_counts(limit_col, out):
        exploded = d.select(
            "doc_id",
            F.explode(
                F.flatten(
                    F.array(*[grams(limit_col, n) for n in (1, 2, 3, 4)])
                )
            ).alias("s"),
        ).select("doc_id", F.col("s.n").alias("n"), F.col("s.g").alias("g"))
        return exploded.groupBy("doc_id", "n", "g").agg(
            F.count(F.lit(1)).alias(out)
        )

    cg = gram_counts("clen", "c_cnt")
    rg = gram_counts("rlen", "r_cnt")
    m = (
        cg.join(rg, ["doc_id", "n", "g"], "left")
        .groupBy("n")
        .agg(
            F.sum(
                F.least(F.col("c_cnt"), F.coalesce(F.col("r_cnt"), F.lit(0)))
            )
            .cast("long")
            .alias("matches")
        )
    )
    tot = d.agg(
        *[
            F.sum(F.greatest(F.col("clen") - (n - 1), F.lit(0)))
            .cast("long")
            .alias(f"t{n}")
            for n in (1, 2, 3, 4)
        ],
        F.sum("clen").cast("long").alias("cand_tokens"),
        F.sum("rlen").cast("long").alias("ref_tokens"),
    )
    mp = m.agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("matches")))
            .cast("long")
            .alias(f"m{n}")
            for n in (1, 2, 3, 4)
        ]
    )
    c_d = F.col("cand_tokens").cast("double")
    r_d = F.col("ref_tokens").cast("double")
    bp = F.when(
        F.col("cand_tokens") >= F.col("ref_tokens"), F.lit(1.0)
    ).otherwise(F.exp(F.lit(1.0) - r_d / c_d))
    bp_nano = F.round(F.lit(1_000_000_000) * bp).cast("long")
    lp = [
        F.log(F.col(f"m{n}").cast("double") / F.col(f"t{n}").cast("double"))
        for n in (1, 2, 3, 4)
    ]
    bleu_nano = F.when(
        (F.col("m1") > 0)
        & (F.col("m2") > 0)
        & (F.col("m3") > 0)
        & (F.col("m4") > 0),
        F.round(
            F.lit(1_000_000_000)
            * bp
            * F.exp(F.lit(0.25) * (((lp[0] + lp[1]) + lp[2]) + lp[3]))
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return mp.crossJoin(F.broadcast(tot)).select(
        "m1",
        "m2",
        "m3",
        "m4",
        "t1",
        "t2",
        "t3",
        "t4",
        "cand_tokens",
        "ref_tokens",
        (bp_nano.cast("double") / 1_000_000_000).alias("brevity_penalty"),
        (bleu_nano.cast("double") / 1_000_000_000).alias("bleu4"),
    )


_ROUGE_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
d AS (
  SELECT doc_id, toks,
         greatest((len(toks) * 4) // 5, 1) AS clen, len(toks) AS rlen
  FROM t
),
cg AS (
  SELECT doc_id, n, array_to_string(toks[i : i + n - 1], ' ') AS g,
         count(*) AS c_cnt
  FROM (
    SELECT d.doc_id, d.toks, nn.n,
           unnest(range(1, greatest(d.clen - nn.n + 2, 1))) AS i
    FROM d CROSS JOIN (VALUES (1), (2)) AS nn(n)
  )
  GROUP BY doc_id, n, g
),
rg AS (
  SELECT doc_id, n, array_to_string(toks[i : i + n - 1], ' ') AS g,
         count(*) AS r_cnt
  FROM (
    SELECT d.doc_id, d.toks, nn.n,
           unnest(range(1, greatest(d.rlen - nn.n + 2, 1))) AS i
    FROM d CROSS JOIN (VALUES (1), (2)) AS nn(n)
  )
  GROUP BY doc_id, n, g
),
m AS (
  SELECT rg.n,
         CAST(sum(least(rg.r_cnt, COALESCE(cg.c_cnt, 0))) AS BIGINT)
           AS matches,
         CAST(sum(rg.r_cnt) AS BIGINT) AS total_ref
  FROM rg LEFT JOIN cg
    ON cg.doc_id = rg.doc_id AND cg.n = rg.n AND cg.g = rg.g
  GROUP BY rg.n
)
SELECT CAST(n AS BIGINT) AS n, matches, total_ref,
       CAST(matches AS DOUBLE) / CAST(total_ref AS DOUBLE) AS rouge_n_recall
FROM m
ORDER BY n
"""


@register("ml_eval_rouge_n", oracle=_ROUGE_ORACLE)
def ml_eval_rouge_n(spark, sf_dir):
    """Corpus ROUGE-N recall (Lin 2004) for n=1,2 — BLEU's
    recall-oriented twin for summarization eval: clipped n-gram
    overlap divided by the total REFERENCE n-grams. Shares
    ml_eval_bleu_corpus's deterministic fixture (candidate = first 80%
    of tokens, reference = full document), so recall < 1 by
    construction and the clip path is exercised. Pure rational output
    (BIGINT counts, one final double division) — no transcendentals at
    all, bit-identical across engines. Same linear scale shape as the
    BLEU query: per-row gram arrays in the JVM, two doc-scoped hash
    aggregations and their equi-join."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.greatest(
            F.expr("(size(split(text, ' ')) * 4) div 5"), F.lit(1)
        ).alias("clen"),
        F.size(toks).alias("rlen"),
    )

    def grams(limit_col, n):
        return F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.col(limit_col) - (n - 1), F.lit(0))
            ),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(
                    " ",
                    *[
                        F.element_at(F.col("toks"), (i + j).cast("int"))
                        for j in range(n)
                    ],
                ).alias("g"),
            ),
        )

    def gram_counts(limit_col, out):
        exploded = d.select(
            "doc_id",
            F.explode(
                F.flatten(F.array(*[grams(limit_col, n) for n in (1, 2)]))
            ).alias("s"),
        ).select("doc_id", F.col("s.n").alias("n"), F.col("s.g").alias("g"))
        return exploded.groupBy("doc_id", "n", "g").agg(
            F.count(F.lit(1)).alias(out)
        )

    cg = gram_counts("clen", "c_cnt")
    rg = gram_counts("rlen", "r_cnt")
    m = (
        rg.join(cg, ["doc_id", "n", "g"], "left")
        .groupBy("n")
        .agg(
            F.sum(
                F.least(F.col("r_cnt"), F.coalesce(F.col("c_cnt"), F.lit(0)))
            )
            .cast("long")
            .alias("matches"),
            F.sum("r_cnt").cast("long").alias("total_ref"),
        )
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        "matches",
        "total_ref",
        (
            F.col("matches").cast("double")
            / F.col("total_ref").cast("double")
        ).alias("rouge_n_recall"),
    ).orderBy("n")
