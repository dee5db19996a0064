#!/usr/bin/env python
"""Interleaved A/B: registered curation_coreset_facility_location vs a
precomputed-similarity-matrix form (guide §4.2 + §5, r13 verdict #4).

The registered greedy loop runs k = 4 corpus scans, each evaluating
|pool| Catalyst higher-order cosine folds (zip_with + aggregate —
interpreted lambda evaluation, ~pool x 64 multiply-adds per row) over
the cover relation, re-persisting a grown lineage per step. The
candidate observes that the POOL IS FIXED (vec_id < 16): every
quantity the greedy loop ever needs is a function of the per-row
quantized cosine vector (q_0..q_{m-1}), so

1. ONE Arrow-batched NumPy pass computes all |pool| cosines per row —
   products and sums via ``np.add.accumulate`` (strictly sequential,
   bit-identical to the registered ``F.aggregate`` left fold; the
   ann_dim_truncation_recall precedent) — and the JVM applies the
   registered quantization ``round(cos * 1e9) AS BIGINT`` unchanged;
2. the (vec_id, q_0..q_{m-1}) relation is persisted (tracked);
3. each greedy step is ONE tiny aggregate over the cached matrix:
   cov = greatest(0, q_selected...) per row, gain_c = sum(greatest(q_c,
   cov) - cov) — all-integer, same values as the registered step, so
   the argmax (gain DESC, cid ASC) walks the identical greedy path.

Usage: python tools/ab_coreset_matrix.py [rounds]  (default 3)
Writes AB_CORESET_MATRIX_r14.json. Flip iff >20% at the 100x replica.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_K = 4
_CAND_MAX = 16
_UNIT = 1_000_000_000.0


def coreset_matrix_variant(spark, sf_dir):
    import numpy as np
    from pyspark import StorageLevel

    from wikipedia_data_pipeline_spark.operators.ranks import track_persisted
    from wikipedia_data_pipeline_spark.sources.tables import fan_out, load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cand_rows = sorted(
        emb.filter(F.col("vec_id") < _CAND_MAX)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    if any(r["embedding"] is None for r in cand_rows):
        raise ValueError("null candidate embedding")
    cids = [int(r["vec_id"]) for r in cand_rows]
    C = np.array([r["embedding"] for r in cand_rows], dtype=np.float64)
    # sqrt(na) with na = sequential left fold of cemb_i^2 (registered order)
    c_norm = np.sqrt(np.add.accumulate(C * C, axis=1)[:, -1])
    m = len(cids)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.shape[0] == 0:
                continue
            if pdf["embedding"].isna().any():
                raise ValueError(
                    "null corpus embedding (precondition: non-null)"
                )
            vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            E = np.stack(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            sq_nb = np.sqrt(np.add.accumulate(E * E, axis=1)[:, -1])
            cols = {"vec_id": vids}
            for j in range(m):
                dot = np.add.accumulate(E * C[j], axis=1)[:, -1]
                cols[f"s{j}"] = dot / (c_norm[j] * sq_nb)
            yield pd.DataFrame(cols)

    schema = "vec_id long, " + ", ".join(f"s{j} double" for j in range(m))
    smat = (
        fan_out(emb).select("vec_id", "embedding").mapInPandas(kernel, schema)
    )
    qmat = track_persisted(
        smat.select(
            "vec_id",
            *[
                F.round(F.col(f"s{j}") * _UNIT).cast("long").alias(f"q{j}")
                for j in range(m)
            ],
        ).persist(StorageLevel.MEMORY_AND_DISK)
    )

    sel_idx: list[int] = []
    out: list[tuple[int, int, int, int]] = []
    total = 0
    for step in range(1, _K + 1):
        cov = (
            F.greatest(
                F.lit(0).cast("long"), *[F.col(f"q{j}") for j in sel_idx]
            )
            if sel_idx
            else F.lit(0).cast("long")
        )
        rem = [j for j in range(m) if j not in sel_idx]
        row = qmat.agg(
            *[
                F.sum(F.greatest(F.col(f"q{j}"), cov) - cov)
                .cast("long")
                .alias(f"g{j}")
                for j in rem
            ]
        ).collect()[0]
        best_j = sorted(rem, key=lambda j: (-row[f"g{j}"], cids[j]))[0]
        gain = int(row[f"g{best_j}"])
        sel_idx.append(best_j)
        total += gain
        out.append((step, cids[best_j], gain, total))
    return spark.createDataFrame(
        out, "step long, vec_id long, gain_nano long, coverage_nano long"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import SparkSession

    from tools.make_benchdata import ensure
    from wikipedia_data_pipeline_spark import registry
    from wikipedia_data_pipeline_spark.operators import ranks

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-coreset-matrix")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.spark_queries()
    reg = queries["curation_coreset_facility_location"]

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        a, b = _rows(reg(spark, sf)), _rows(coreset_matrix_variant(spark, sf))
        ranks.unpersist_all()
        assert a == b, f"variant diverges at {sf}:\n{a}\nvs\n{b}"
        print(f"equivalence at {sf}: OK (exact, {len(a)} rows)")

    dir100 = ensure(
        "/root/testdata/sf0.1",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchdata",
            "sf10r",
        ),
        100,
    )

    def timed(fn):
        # both forms are EAGER (greedy jobs at construction): the timer
        # starts before construction
        t0 = time.perf_counter()
        df = fn(spark, dir100)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        ranks.unpersist_all()
        return round(dt, 2)

    timed(coreset_matrix_variant)
    timed(reg)  # warmups
    times: dict[str, list] = {"registered": [], "matrix_one_pass": []}
    for _ in range(rounds):
        times["registered"].append(timed(reg))
        times["matrix_one_pass"].append(timed(coreset_matrix_variant))
        print("round:", times, flush=True)

    out = {
        "metric": "ab_coreset_matrix_100x_r14",
        "times": times,
        "best": {k: min(v) for k, v in times.items()},
        "note": (
            "both arms eager (timer includes construction = the greedy "
            "jobs); post-r14 persist tracking, so every iteration is "
            "honest-cold"
        ),
    }
    print(json.dumps(out))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "AB_CORESET_MATRIX_r14.json",
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
