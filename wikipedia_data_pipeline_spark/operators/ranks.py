"""Distributed global-ordering primitives (rank / running aggregates /
ntile over a TOTAL order) without a single-partition window.

Why this module exists: ``Window.orderBy(...)`` with no ``partitionBy``
plans as ``Exchange SinglePartition -> Window`` — every input row flows
through ONE task. That is fine on driver-sized relations (a month
spine, a 32-row block table) but a scale-killer on entity-sized ones:
at 100 TB, |users|, |parts| and |vocab| are 1e8+ rows, and a global
rank over them must not serialize through one core.

The decomposition here is the textbook two-level (hierarchical) scan,
the same shape ``operators.sampling.token_budget_cut`` uses for its
prefix sum:

1. ``repartitionByRange`` on the total order: partition *i* holds a
   contiguous key range ≤ partition *i+1*'s range, so the physical
   partition id IS the block id of a sorted blocking of the relation.
2. Per-block running aggregates via a window **partitioned by** the
   block id — all blocks in parallel, no task sees more than one block.
3. Per-block totals form a blocks relation with ONE row per partition
   (~``num_partitions`` rows — driver-sized by construction, so its own
   exclusive-prefix window may legally run single-partition), broadcast
   back and added as carry-in.

Exactness: every carried quantity here is order-insensitive (COUNT,
MAX, and integer/DECIMAL SUM), so the two-level answer is bit-identical
to the one-pass answer under ANY choice of block boundaries — which is
also why callers routing money through these scans must pass DECIMAL
(not DOUBLE) running-sum sources, exactly like the engine's ``dec_sum``
convention.

Plan shape (asserted in tests/test_scale_plans.py): two shuffles over
the data (range exchange + hash-by-block for the window), one broadcast
of the blocks relation; the only SinglePartition exchange in the plan
feeds the blocks-relation window ABOVE a per-block aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ordered_scan",
    "global_ntile",
    "ntile_by_cuts",
    "exact_quantiles",
    "grouped_exact_quantiles",
    "track_persisted",
    "unpersist_all",
]

# Every ordered_scan pins one blocked+ranked relation (see the persist
# comment in ordered_scan for why that persist is load-bearing).
# MEMORY_AND_DISK storage is evicted LRU under executor memory pressure
# and dropped at session shutdown, so leaving them cached degrades
# gracefully — but a long-lived service that builds many scans can
# release them deterministically here.
_PERSISTED: list[DataFrame] = []


def track_persisted(df: DataFrame) -> DataFrame:
    """Register an operator-persisted relation for ``unpersist_all`` —
    the engine's SINGLE release point for plan-internal caches. Every
    ``.persist()``/``.cache()`` in the package must route through here
    (or release explicitly in-function) — enforced by
    tests/test_round14.py::test_no_untracked_persists. A raw persist is
    worse than a leak: Spark's CacheManager matches relations by
    canonicalized logical plan, so an identical re-run silently reads
    the prior run's cache, corrupting best-of-N timing (r13 verdict #1)."""
    _PERSISTED.append(df)
    return df


def unpersist_all() -> int:
    """Release every relation ordered_scan has persisted this session.
    Safe while results are still referenced — Spark recomputes evicted
    cache partitions from lineage (same bounds: the RDD's partitioner
    is fixed at materialization). Returns the number released."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n

# Internal column names — prefixed to avoid user-column collisions.
_PID = "_os_pid"
_LRANK = "_os_lrank"


def _sort_cols(order_by) -> list:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def ordered_scan(
    df: DataFrame,
    order_by,
    rank_col: str | None = None,
    running=(),
    with_totals: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append global ordered-scan columns over a TOTAL order.

    Parameters
    ----------
    order_by : sequence of column names / sort Columns (``F.desc(...)``
        allowed) that define a *total* order — include a unique
        tie-break key, as every ranked query in this engine already
        does, or ranks are nondeterministic.
    rank_col : if set, append a global 1-based BIGINT row_number.
    running : iterable of ``(out_col, source, kind)`` with ``kind`` in
        {"sum", "max"}; appends the running (inclusive-prefix)
        aggregate of ``source`` over the total order. Sums should be
        integer or DECIMAL typed for bit-portability (see module doc).
        A 4th element ``"exclusive"`` switches the frame to
        (unbounded preceding, 1 preceding) — SQL's exclusive prefix,
        NULL on the global first row — supported for ``max`` only (an
        exclusive SUM's empty-frame NULL cannot be told apart from a
        legitimate zero after the block carry-in is added).
    with_totals : additionally append ``{rank_col}_total`` (global row
        count) and ``{out_col}_total`` per running agg — computed from
        the blocks relation for free (no second scan of ``df``).
    num_partitions : range-partition count; defaults to the session's
        ``spark.sql.shuffle.partitions``.
    """
    running = [
        (r[0], r[1], r[2], r[3] if len(r) > 3 else "inclusive")
        for r in running
    ]
    for out, _src, kind, frame in running:
        if frame not in ("inclusive", "exclusive"):
            raise ValueError(f"bad frame {frame!r} for {out!r}")
        if frame == "exclusive" and kind != "max":
            raise ValueError("exclusive frame is supported for max only")
    if rank_col is None and not running:
        raise ValueError("nothing to compute: set rank_col and/or running")
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sort = _sort_cols(order_by)

    # (1) contiguous range blocks; the physical partition index is the
    # block id (AQE only ever merges ADJACENT shuffle partitions, which
    # preserves both contiguity and block ordering).
    part = df.repartitionByRange(num_partitions, *sort).withColumn(
        _PID, F.spark_partition_id()
    )

    # (2) per-block running aggregates — parallel across blocks.
    w_rank = Window.partitionBy(_PID).orderBy(*sort)
    w_run = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    w_excl = w_rank.rowsBetween(Window.unboundedPreceding, -1)
    local = part.withColumn(_LRANK, F.row_number().over(w_rank).cast("long"))
    for out, src, kind, frame in running:
        fn = {"sum": F.sum, "max": F.max}[kind]
        frame_w = w_excl if frame == "exclusive" else w_run
        local = local.withColumn(f"_os_run_{out}", fn(src).over(frame_w))

    # LOAD-BEARING persist: the blocks relation below and the final
    # probe side are two plan branches over this same subtree. Without
    # a shared materialization, Catalyst prunes different column sets
    # into each branch, the canonical subtrees stop matching, exchange
    # reuse does NOT fire, and each branch re-executes the range
    # exchange — whose partition bounds are SAMPLED per execution. Two
    # executions sample different bounds, the two branches disagree on
    # which rows belong to which block id, and the carry-ins join
    # against the wrong blocks (observed: nondeterministic, wildly
    # wrong running aggregates). Persisting pins ONE materialization —
    # one sampling pass, one block assignment — which both branches
    # read. Storage cost: the PROJECTED input (sort keys + running
    # sources + payload) once — the same order of magnitude as the
    # range exchange's own shuffle files sitting next to it, so even on
    # a fact-sized input (events_lateness_audit) the persist roughly
    # doubles that stage's disk footprint rather than adding a new cost
    # class; it is the distributed analogue of checkpointing between
    # stages. MEMORY_AND_DISK spills/evicts LRU; release explicitly via
    # ``unpersist_all()``.
    from pyspark import StorageLevel

    local = track_persisted(local.persist(StorageLevel.MEMORY_AND_DISK))

    # (3) blocks relation: one row per block. Its exclusive prefix runs
    # single-partition BY DESIGN — ~num_partitions rows, driver-sized.
    aggs = [F.max(_LRANK).alias("_cnt")]
    for out, src, kind, _frame in running:
        # block totals aggregate the SOURCE over the FULL block (sum of
        # running values would be a triangular over-count) — correct
        # for the exclusive frame too, since every row of an earlier
        # block strictly precedes every row of a later one.
        fn = {"sum": F.sum, "max": F.max}[kind]
        aggs.append(fn(src).alias(f"_tot_{out}"))
    blk = local.groupBy(_PID).agg(*aggs)
    bw = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    bw_all = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [
        F.col(_PID),
        F.coalesce(F.sum("_cnt").over(bw), F.lit(0)).alias("_off_rank"),
    ]
    if with_totals:
        off_cols.append(F.sum("_cnt").over(bw_all).alias("_gtot_rank"))
    for out, _src, kind, _frame in running:
        if kind == "sum":
            prior = F.sum(f"_tot_{out}").over(bw)
            # typed zero so the carry-in keeps the source's exact type
            zero = F.lit(0).cast(dict(blk.dtypes)[f"_tot_{out}"])
            off_cols.append(F.coalesce(prior, zero).alias(f"_off_{out}"))
            if with_totals:
                off_cols.append(
                    F.sum(f"_tot_{out}").over(bw_all).alias(f"_gtot_{out}")
                )
        else:  # max: carry-in may be NULL for the first block
            off_cols.append(F.max(f"_tot_{out}").over(bw).alias(f"_off_{out}"))
            if with_totals:
                off_cols.append(
                    F.max(f"_tot_{out}").over(bw_all).alias(f"_gtot_{out}")
                )
    offsets = blk.select(*off_cols)

    out_df = local.join(F.broadcast(offsets), _PID)
    proj = [F.col(c) for c in df.columns]
    if rank_col is not None:
        proj.append((F.col("_off_rank") + F.col(_LRANK)).alias(rank_col))
        if with_totals:
            proj.append(F.col("_gtot_rank").alias(f"{rank_col}_total"))
    for out, _src, kind, _frame in running:
        run_c = F.col(f"_os_run_{out}")
        if kind == "sum":
            proj.append((F.col(f"_off_{out}") + run_c).alias(out))
        else:
            # greatest() skips NULLs: first block's carry-in is NULL →
            # the local running max passes through unchanged.
            proj.append(F.greatest(F.col(f"_off_{out}"), run_c).alias(out))
        if with_totals:
            proj.append(F.col(f"_gtot_{out}").alias(f"{out}_total"))
    return out_df.select(*proj)


def global_ntile(
    df: DataFrame,
    order_by,
    n: int,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """SQL ``ntile(n) OVER (ORDER BY ...)`` without a single-partition
    window: derived arithmetically from the hierarchical global rank.

    Standard ntile semantics (what Spark and DuckDB both implement):
    with N rows and n tiles, q = N div n and r = N mod n, tiles 1..r
    hold q+1 rows and tiles r+1..n hold q rows. Bucket of the 1-based
    rank i is therefore

        i <= r*(q+1)  ->  ceil(i / (q+1))
        else          ->  r + ceil((i - r*(q+1)) / q)

    All-integer arithmetic (ceil(a/b) = (a+b-1) div b) so the result is
    exact at any N; when N < n the first branch covers every row, so
    the q=0 division never evaluates.
    """
    r = ordered_scan(
        df,
        order_by,
        rank_col="_os_i",
        with_totals=True,
        num_partitions=num_partitions,
    )
    i = F.col("_os_i")
    big_n = F.col("_os_i_total")

    # integer div via (a - a % b) / b: the numerator is exactly
    # divisible, and routing the division through DECIMAL(38,0) keeps
    # it exact at any rank magnitude (a bare `/` is DOUBLE division,
    # which silently rounds above 2^53)
    def idiv(a, b):
        return ((a - a % b).cast("decimal(38,0)") / b).cast("long")

    q = idiv(big_n, F.lit(n))
    rmd = big_n % n
    big = (q + 1).cast("long")
    first = rmd * big  # rows covered by the (q+1)-sized tiles
    bucket = (
        F.when(i <= first, idiv(i + q, big))
        .otherwise(rmd + idiv(i - first + q - 1, q))
        .cast("long")
        .alias(out_col)
    )
    return r.select(*[F.col(c) for c in df.columns], bucket)


def exact_quantiles(
    df: DataFrame,
    order_by,
    ranks_rel: DataFrame,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact order-statistic SELECTION: return the rows at the global
    ranks given in ``ranks_rel`` (columns: arbitrary payload + ``k``,
    the 1-based target rank — a tiny relation, e.g. 3 quantile probes)
    WITHOUT ranking the whole relation.

    Where ``ordered_scan`` materializes a rank for every row (right
    when the caller consumes all of them), selection needs only
    ``|ranks_rel|`` rows, so this does the two-pass classic instead:

    1. range-partition on the total order and PIN the blocking (same
       load-bearing persist as ordered_scan — range bounds are sampled
       per execution, so both passes must read ONE materialization);
       per-block COUNTS (no sort) locate each target rank's block and
       local offset — a driver-sized computation on the blocks
       relation;
    2. re-read ONLY the target blocks from the pinned relation,
       sort locally within each (a |targets|/num_partitions fraction
       of the data), and pick the row at ``k - block_offset``.

    Duplicate ``k`` values in ``ranks_rel`` are legal (e.g. two probes
    that resolve to the same rank when N is small): selection runs once
    per DISTINCT rank, then the payload re-joins on ``k``, so each
    duplicate gets its own output row sharing the selected values.

    ``ranks_rel`` is read in two independent plan subtrees (the
    distinct-k probe and the final payload join), so it is pinned with
    the same persist that guards the fact side: a nondeterministic
    probe relation (sample/limit-derived) re-evaluated differently per
    subtree would silently drop rows at the inner join. ``k`` is a
    reserved name — it must appear in ``ranks_rel`` and must not appear
    in ``df``, and no other column name may be shared between the two
    (the final select emits both column sets side by side); violations
    raise ValueError up front instead of yielding ambiguous columns.

    Cost vs ordered_scan at 60M rows / 3 probes: drops the global
    per-block window sort and the fact-sized rank join — measured
    ~2x on lineitem_exact_percentiles at the 100x replica. Exactness:
    counts and offsets are integers; the local sort uses the same total
    order, so the selected rows are identical to the rank-everything
    route."""
    from pyspark import StorageLevel

    if "k" not in ranks_rel.columns:
        raise ValueError("exact_quantiles: ranks_rel must have a 'k' column")
    if "k" in df.columns:
        raise ValueError(
            "exact_quantiles: 'k' is reserved for ranks_rel's target rank; "
            "rename df's 'k' column before calling"
        )
    overlap = set(df.columns) & set(ranks_rel.columns)
    if overlap:
        raise ValueError(
            "exact_quantiles: df and ranks_rel share column name(s) "
            f"{sorted(overlap)}; the output carries both sets side by side, "
            "so every name must be unique — rename one side"
        )

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sort = _sort_cols(order_by)

    part = df.repartitionByRange(num_partitions, *sort).withColumn(
        _PID, F.spark_partition_id()
    )
    part = track_persisted(part.persist(StorageLevel.MEMORY_AND_DISK))
    # pin the probe relation too: it feeds two subtrees (ks_unique and
    # the payload join), which must see ONE materialization
    ranks_rel = track_persisted(ranks_rel.persist(StorageLevel.MEMORY_AND_DISK))

    blk = part.groupBy(_PID).agg(F.count(F.lit(1)).alias("_cnt"))
    bw = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = blk.select(
        F.col(_PID),
        F.coalesce(F.sum("_cnt").over(bw), F.lit(0)).alias("_off"),
        F.col("_cnt"),
    )
    # Select each DISTINCT rank once. The local window below partitions
    # by (block, k); if duplicate k values reached it, the copies would
    # share one row_number sequence and interleave (each copy would see
    # every other copy's rows), selecting wrong rows — so dedupe here
    # and re-attach the per-target payload by joining on k at the end.
    ks_unique = ranks_rel.select("k").distinct()
    # one row per target: which block holds rank k, and the local rank
    targets = (
        offsets.join(
            F.broadcast(ks_unique),
            (F.col("k") > F.col("_off"))
            & (F.col("k") <= F.col("_off") + F.col("_cnt")),
        )
        .select(
            F.col(_PID).alias("_t_pid"),
            (F.col("k") - F.col("_off")).alias("_lk"),
            F.col("k"),
        )
    )
    cand = part.join(
        F.broadcast(targets), F.col(_PID) == F.col("_t_pid")
    )
    w_local = Window.partitionBy(_PID, "k").orderBy(*sort)
    selected = (
        cand.withColumn("_lr", F.row_number().over(w_local).cast("long"))
        .filter(F.col("_lr") == F.col("_lk"))
        .drop(_PID, "_t_pid", "_lk", "_lr")
    )
    # restore payload columns (and duplicate-k multiplicity): one output
    # row per ranks_rel row, carrying the selected values for its rank
    return selected.join(F.broadcast(ranks_rel), "k").select(
        *[c for c in df.columns], *[c for c in ranks_rel.columns]
    )


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    order_by,
    fractions: list[tuple[str, int, int]],
    tag_col: str = "tag",
    num_partitions: int | None = None,
) -> DataFrame:
    """PER-GROUP exact order-statistic selection: for every group, pick
    the rows at ranks ``ceil(num·n/den)`` of the group's n rows, one
    probe per ``(tag, num, den)`` in ``fractions`` — WITHOUT a
    per-group window over the whole relation.

    Why not ``Window.partitionBy(*group_cols).orderBy(...)``: that plan
    sorts each group in ONE task, so with few huge groups (5 event
    types over 100 TB of events) every task sorts |df|/5 rows — the
    same serialization ``ordered_scan`` exists to avoid globally, just
    sharded 5 ways. Here the data is range-partitioned on
    ``(group, order)``: each partition holds a contiguous slice, a big
    group spans MANY partitions, and selection needs only

    1. per-(block, group) COUNTS (no sort; map-side combinable) — a
       blocks relation of <= num_partitions + |groups| - 1 rows (ranges
       are contiguous, so at most one group straddles each boundary);
    2. per-group exclusive prefix offsets + totals over that small
       relation (window partitioned BY GROUP over blocks — parallel,
       driver-sized per group);
    3. target ranks k = ceil(num·n/den) = (num·n + den - 1) div den in
       exact integer arithmetic, one row per (group, distinct k);
    4. a local sort of ONLY the target blocks of the pinned relation,
       selecting local rank k - block_offset, then re-attaching tags
       (duplicate-k probes legal, same discipline as exact_quantiles).

    Output: one row per (group, tag) — all of ``df``'s columns from the
    selected row plus ``tag_col``. Requirements: ``order_by`` must be a
    total order WITHIN each group (tie-break to uniqueness, e.g. a row
    id) — equal keys may straddle a range boundary otherwise;
    ``tag_col`` must not collide with ``df``'s columns. Designed for
    FEW huge groups: the offsets/targets relations are ~|groups| rows
    and broadcast — with millions of tiny groups the plain per-group
    window is already parallel and cheaper.

    Exactness: counts, offsets and rank targets are integers; the local
    sort uses the same within-group order, so selected rows are
    identical to the window formulation's rank-match rows (asserted in
    tests/test_ranks.py::test_grouped_exact_quantiles_matches_window).
    """
    from pyspark import StorageLevel

    if not group_cols:
        raise ValueError("grouped_exact_quantiles: group_cols is empty")
    if tag_col in df.columns:
        raise ValueError(
            f"grouped_exact_quantiles: tag_col {tag_col!r} collides with a "
            "df column; pass a different tag_col"
        )
    # same up-front collision discipline as exact_quantiles: a df
    # column matching an internal working name would yield ambiguous-
    # column errors (or silently wrong joins) deep in the plan
    reserved = {"_gq_k", "_gq_tag", "_gq_n", "_p", "_off", "_cnt",
                "_lk", "_lr", "_t_pid", _PID}
    reserved |= {f"_t_g{i}" for i in range(len(group_cols))}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            "grouped_exact_quantiles: df column(s) "
            f"{sorted(clash)} collide with internal working names; "
            "rename them before calling"
        )
    seen_tags = set()
    for tag, num, den in fractions:
        if num <= 0 or den <= 0:
            raise ValueError(
                f"grouped_exact_quantiles: probe {tag!r} has non-positive "
                f"fraction {num}/{den}"
            )
        if num > den:
            raise ValueError(
                f"grouped_exact_quantiles: probe {tag!r} fraction "
                f"{num}/{den} > 1 targets a rank past the group's end — "
                "its row would silently vanish; fractions must be <= 1"
            )
        if tag in seen_tags:
            raise ValueError(
                f"grouped_exact_quantiles: duplicate tag {tag!r} in "
                "fractions — each probe's tag must be unique, else the "
                "final tag re-join duplicates rows"
            )
        seen_tags.add(tag)

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sort = _sort_cols(order_by)
    gcols = [F.col(g) for g in group_cols]

    part = df.repartitionByRange(num_partitions, *gcols, *sort).withColumn(
        _PID, F.spark_partition_id()
    )
    part = track_persisted(part.persist(StorageLevel.MEMORY_AND_DISK))

    blk = part.groupBy(_PID, *group_cols).agg(F.count(F.lit(1)).alias("_cnt"))
    bw = (
        Window.partitionBy(*group_cols)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = blk.select(
        *group_cols,
        F.col(_PID),
        F.coalesce(F.sum("_cnt").over(bw), F.lit(0)).alias("_off"),
        F.col("_cnt"),
    )
    totals = blk.groupBy(*group_cols).agg(F.sum("_cnt").alias("_gq_n"))

    # one row per (group, probe): exact integer ceil(num*n/den)
    probe_structs = [
        F.struct(
            F.lit(tag).alias("_gq_tag"),
            F.expr(f"({num} * _gq_n + {den - 1}) div {den}").alias("_gq_k"),
        )
        for tag, num, den in fractions
    ]
    ks = totals.select(
        *group_cols,
        F.explode(F.array(*probe_structs)).alias("_p"),
    ).select(
        *group_cols,
        F.col("_p._gq_tag").alias("_gq_tag"),
        F.col("_p._gq_k").alias("_gq_k"),
    )
    # select each DISTINCT (group, k) once; tags re-join at the end
    # (two probes can resolve to the same rank at small n — the same
    # duplicate-target interleaving hazard exact_quantiles dedupes)
    ksu = ks.select(
        *[F.col(g).alias(f"_t_g{i}") for i, g in enumerate(group_cols)],
        F.col("_gq_k"),
    ).distinct()

    t_eq = [
        offsets[g] == ksu[f"_t_g{i}"] for i, g in enumerate(group_cols)
    ]
    in_block = (F.col("_gq_k") > F.col("_off")) & (
        F.col("_gq_k") <= F.col("_off") + F.col("_cnt")
    )
    cond = t_eq[0] & in_block
    for e in t_eq[1:]:
        cond = cond & e
    targets = offsets.join(F.broadcast(ksu), cond).select(
        F.col(_PID).alias("_t_pid"),
        *[F.col(f"_t_g{i}") for i in range(len(group_cols))],
        (F.col("_gq_k") - F.col("_off")).alias("_gq_lk"),
        F.col("_gq_k"),
    )
    c_eq = [
        part[g] == targets[f"_t_g{i}"] for i, g in enumerate(group_cols)
    ]
    ccond = (F.col(_PID) == F.col("_t_pid")) & c_eq[0]
    for e in c_eq[1:]:
        ccond = ccond & e
    cand = part.join(F.broadcast(targets), ccond)
    w_local = Window.partitionBy(_PID, *group_cols, "_gq_k").orderBy(*sort)
    selected = (
        cand.withColumn("_lr", F.row_number().over(w_local).cast("long"))
        .filter(F.col("_lr") == F.col("_gq_lk"))
        .select(*[F.col(c) for c in df.columns], F.col("_gq_k"))
    )
    return selected.join(
        F.broadcast(ks), on=[*group_cols, "_gq_k"]
    ).select(
        *[F.col(c) for c in df.columns],
        F.col("_gq_tag").alias(tag_col),
    )


def ntile_by_cuts(
    df: DataFrame,
    order_spec,
    n: int,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY ...)`` via boundary SELECTION instead
    of ranking every row: pick the n-1 tile-boundary rows with
    ``exact_quantiles`` (per-block counts + a local sort of only the
    boundary blocks), fold them into ONE broadcast row, and assign each
    row's bucket as ``1 + #(boundaries strictly before it)`` in a pure
    map pass — no per-row window, no rank join.

    Identical to SQL ntile under a TOTAL order: tile i ends at global
    rank i*q + min(i, r) (q = N div n, r = N mod n); a row is in tile i
    iff exactly i-1 boundary rows precede it, and "precedes" is the
    same lexicographic order the ranks were computed under, so the two
    definitions coincide row-for-row (asserted against the built-in in
    tests/test_ranks.py::test_ntile_by_cuts_matches_builtin, which
    parametrizes n above and below N).

    When N < n the boundary ranks i*q + min(i, r) collapse to
    min(i, N), duplicating rank N for every i >= N; duplicates are
    dropped before selection — a cut AT rank N is the last row, which
    strictly precedes nothing, so each distinct boundary is needed at
    most once and the duplicates contribute zero to every bucket count.

    Parameters
    ----------
    order_spec : list of ``name`` (asc) or ``(name, "asc"|"desc")``
        defining a total order over NON-NULL keys. Explicit tuples, not
        ``F.desc(...)`` columns, because the lexicographic comparator
        below needs each key's direction, which a resolved sort Column
        no longer exposes.
    n : tile count, capped at 4096 — the boundary tuples ride in one
        collect_list row (same bounded-fold discipline as
        FOLD_MAX_CENTROIDS in operators.similarity).

    Cost vs ``global_ntile`` on the same input: drops the per-block
    window sort and the blocks-relation broadcast join back over every
    row, keeping one slim range exchange (sort keys only) plus a
    map-side comparison against n-1 literals. The input is scanned
    twice (count + final map) — persist it at the call site when it is
    itself expensive to produce, as customer_rfm_segments does.
    """
    from functools import reduce
    from operator import and_, or_

    if n > 4096:
        raise ValueError(
            f"ntile_by_cuts folds n-1 boundary rows into one broadcast "
            f"row; n={n} exceeds the 4096 cap — use global_ntile"
        )
    spec = [
        (s, "asc") if isinstance(s, str) else (s[0], s[1])
        for s in order_spec
    ]
    for _name, d in spec:
        if d not in ("asc", "desc"):
            raise ValueError(f"bad direction {d!r}")
    names = [s[0] for s in spec]
    order_cols = [
        F.asc(c) if d == "asc" else F.desc(c) for c, d in spec
    ]
    spark = df.sparkSession

    # boundary ranks: end of tile i (i = 1..n-1) = i*q + min(i, r).
    # Integer-exact at any N via the same DECIMAL(38,0) idiv discipline
    # as global_ntile.
    nrow = df.agg(F.count(F.lit(1)).alias("_N"))
    big_n = F.col("_N")
    q = ((big_n - big_n % n).cast("decimal(38,0)") / n).cast("long")
    ks = (
        spark.range(1, n)
        .select(F.col("id").alias("_i"))
        .crossJoin(F.broadcast(nrow))
        .select(
            "_i",
            (F.col("_i") * q + F.least(F.col("_i"), big_n % n)).alias(
                "k"
            ),
        )
        .filter(F.col("k") >= 1)  # N = 0: no boundaries, 1 bucket
        .select("k")
        .distinct()  # N < n duplicates rank N — see docstring
    )

    # the n-1 boundary key tuples, folded into one broadcast row
    cut_struct = F.struct(
        *[F.col(c).alias(f"c{j}") for j, c in enumerate(names)]
    )
    cuts_one = (
        exact_quantiles(
            df.select(*names), order_cols, ks, num_partitions
        )
        .select(cut_struct.alias("_cut"))
        .agg(F.collect_list("_cut").alias("_cuts"))
    )

    def _before(cut):
        # cut strictly precedes the current row in the total order —
        # lexicographic with per-key direction; keys must be non-null
        conds, eqs = [], []
        for j, (name, d) in enumerate(spec):
            cj, rj = cut[f"c{j}"], F.col(name)
            lt = (cj > rj) if d == "desc" else (cj < rj)
            conds.append(reduce(and_, eqs + [lt]))
            eqs.append(cj == rj)
        return reduce(or_, conds)

    bucket = F.lit(1) + F.aggregate(
        F.col("_cuts"),
        F.lit(0),
        lambda acc, c: acc + F.when(_before(c), 1).otherwise(0),
    )
    return df.crossJoin(F.broadcast(cuts_one)).select(
        *[F.col(c) for c in df.columns],
        bucket.cast("long").alias(out_col),
    )
