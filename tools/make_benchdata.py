#!/usr/bin/env python
"""Materialize the amortized-scale bench dataset: an N-way replica of a
driver sf dir (default /root/testdata/sf0.1 x 10 -> ~sf1-equivalent
fact-table cardinalities) under benchdata/sf1r.

Why a replica and not synthetic data: the bench's 2x-of-DuckDB bar is
unprovable at sf0.1, where every sub-second Spark query pays a
~0.2-0.3s scheduling floor that dominates the measurement (round-5
verdict). Replicating the DRIVER'S OWN testdata 10x keeps every value
distribution, join relationship, and oracle-twin comparable while
making the per-query work large enough to amortize the floor — no new
data is invented, only primary keys are shifted so fact-table joins
keep their multiplicity:

  * orders.o_orderkey and lineitem.l_orderkey shift together by
    replica x (max_orderkey + 1) — the orders<->lineitem join stays
    1:N instead of exploding 10x10;
  * events.event_id, documents.doc_id, embeddings.vec_id shift the
    same way (unique PKs, stable ingest-order semantics);
  * dimension tables (region, nation, customer, supplier, part) copy
    unchanged — fact rows reference them 10x more often, which is
    exactly what a bigger fact table does to a dimension at scale.

CAVEAT — per-key group sizes scale with the replica count. Non-shifted
attributes (user_id, doc text, lang, ...) repeat verbatim, so per-user
event-sequence lengths, duplicate-text group sizes, and per-key
densities all grow Nx rather than staying fixed. Value DISTRIBUTIONS
are comparable; GROUP SIZES are not. For queries whose cost is
superlinear in group size (CEP path strings, dedup's pair contract,
per-user windows) the replica measures an N x-denser-key workload —
read those timings as a stress view, not a same-shape scale-up. Keys
could be shifted per-replica to preserve group sizes, but then
duplicate-detection relations would find NO cross-replica pairs and
the dedup family would measure an artificially pair-free corpus — the
verbatim copy is the chosen trade.

Row groups are written at 2^18 rows so Spark's parquet splits fan out
across cores instead of arriving as one block.

Usage: python tools/make_benchdata.py [src_sf_dir] [out_dir] [n_replicas]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_TABLES = ["region", "nation", "customer", "supplier", "part"]
# fine-grained so Spark's byte-range splits can actually take effect
# (splits never subdivide a row group): 6M-row lineitem -> ~46 groups
ROW_GROUP = 1 << 17


def replicate(src: str, out: str, n: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    for t in COPY_TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(
            tab, os.path.join(out, f"{t}.parquet"), row_group_size=ROW_GROUP
        )
    # orders/lineitem must share the orderkey offset
    offsets: dict[str, int] = {}
    o = pq.read_table(os.path.join(src, "orders.parquet"))
    offsets["o_orderkey"] = pc.max(o["o_orderkey"]).as_py() + 1
    offsets["l_orderkey"] = offsets["o_orderkey"]
    for t, keys in SHIFT_KEYS.items():
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        for key in keys:
            offsets.setdefault(key, pc.max(tab[key]).as_py() + 1)
        parts = []
        for i in range(n):
            rep = tab
            for key in keys:
                idx = rep.schema.get_field_index(key)
                shifted = pc.add(rep[key], pa.scalar(i * offsets[key]))
                rep = rep.set_column(idx, rep.schema.field(idx), shifted)
            parts.append(rep)
        pq.write_table(
            pa.concat_tables(parts),
            os.path.join(out, f"{t}.parquet"),
            row_group_size=ROW_GROUP,
        )


def ensure(src: str, out: str, n: int = 10) -> str:
    """Build once, reuse forever (marker file carries src+n)."""
    marker = os.path.join(out, ".benchdata")
    stamp = f"{src}|{n}|rg{ROW_GROUP}"
    if os.path.exists(marker) and open(marker).read() == stamp:
        return out
    replicate(src, out, n)
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(__file__)), "benchdata", "sf1r")
    )
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    ensure(src, out, n)
    for f in sorted(os.listdir(out)):
        if f.endswith(".parquet"):
            print(f, pq.read_metadata(os.path.join(out, f)).num_rows)
