"""Scale curves for the r9 heavy non-document families (VERDICT r9
ask #6): bootstrap_mean_ci (orders), copurchase_kcore (lineitem),
events_multires_rollup (events), bm25_topk (documents).

`scale_curve.py`'s synthetic tiers only scale the documents table, so
this harness adds a TPC-H-style tier builder: copy k of each table
offsets its keys by k * stride so the copies are structurally
disjoint — kcore sees k disjoint co-purchase graphs (degree work
scales linearly, rounds stay 8), the bootstrap sees k x the orders
(fan-out scales linearly, the grid stays B+1 rows), the multires
cascade sees k x the per-minute traffic over the SAME calendar (cells
constant, cell mass scales), and bm25 reuses scale_curve's
token-remapped document copies (vocabulary and postings scale).

    SPARK_GRAFT_CPUS=32 python scripts/scale_curve_ext.py [sf0.1 syn10x]

Prints one line per (tier, query): wall s (min-of-2 warm), shuffle
bytes, peak stage bytes — the same cell format as scale_curve.py, for
SCALE.md's tier table.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_UI", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from scale_curve import ShuffleMeter, build_syn, time_query  # noqa: E402
from beauty_lakehouse_spark.operators import (  # noqa: E402
    events,
    graph,
    quality,
    text,
)
from beauty_lakehouse_spark.session import get_spark  # noqa: E402

QUERIES = {
    "bootstrap_mean_ci": quality.q_bootstrap_mean_ci,
    "copurchase_kcore": graph.q_copurchase_kcore,
    "events_multires_rollup": events.q_events_multires_rollup,
    "bm25_topk": text.q_bm25_topk,
}

#: key strides: > any key in the sf0.1 fixtures, so copies never collide
STRIDE = 10_000_000


def build_syn_tpch(spark, base_dir: str, out_dir: str, copies: int) -> str:
    """``copies`` key-offset copies of orders/lineitem/events plus
    scale_curve's token-remapped documents, written as one sf_dir."""
    orders = spark.read.parquet(f"{base_dir}/orders.parquet")
    li = spark.read.parquet(f"{base_dir}/lineitem.parquet")
    ev = spark.read.parquet(f"{base_dir}/events.parquet")
    cu = spark.read.parquet(f"{base_dir}/customer.parquet")

    def stack(df, keys):
        parts = []
        for k in range(copies):
            cur = df
            for col in keys:
                cur = cur.withColumn(col, F.col(col) + F.lit(k * STRIDE))
            parts.append(cur)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    stack(orders, ["o_orderkey", "o_custkey"]).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/orders.parquet")
    # l_partkey offset keeps each copy's co-purchase graph disjoint
    stack(li, ["l_orderkey", "l_partkey", "l_suppkey"]).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/lineitem.parquet")
    # events: same calendar (cells constant), disjoint users/ids
    stack(ev, ["event_id", "user_id"]).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )
    # customers: offset in lockstep with o_custkey so dimension joins
    # (segment tests, cohort ops) keep full coverage per copy
    stack(cu, ["c_custkey"]).write.mode("overwrite").parquet(
        f"{out_dir}/customer.parquet"
    )
    # documents: reuse the token-remapped builder (writes into out_dir)
    build_syn(spark, base_dir, out_dir, copies)
    return out_dir


def main() -> None:
    tiers = sys.argv[1:] or ["sf0.1", "syn10x"]
    spark = get_spark("scale-ext")
    meter = ShuffleMeter(spark)
    tmp = tempfile.mkdtemp(prefix="bl_synext_")
    results = []
    for tier in tiers:
        if tier == "sf0.1":
            d = "/root/testdata/sf0.1"
        elif tier == "syn10x":
            d = build_syn_tpch(spark, "/root/testdata/sf0.1", f"{tmp}/t10", 10)
        elif tier == "syn100x":
            d = build_syn_tpch(
                spark, "/root/testdata/sf0.1", f"{tmp}/t100", 100
            )
        else:
            raise SystemExit(f"unknown tier {tier}")
        for name, fn in QUERIES.items():
            t0 = time.perf_counter()
            wall, shuf, peak = time_query(fn, spark, d, meter)
            results.append((tier, name, wall, shuf, peak))
            print(
                f"{tier} {name}: {wall:.2f}s shuffle "
                f"{shuf / 2**20:.1f} MiB peak {peak / 2**20:.1f} MiB "
                f"[cell total {time.perf_counter() - t0:.1f}s]",
                flush=True,
            )
    print("\ntier table rows:")
    for tier, name, wall, shuf, peak in results:
        print(
            f"| {name} | {tier} | {wall:.2f}s | {shuf / 2**20:.1f} MiB "
            f"| {peak / 2**20:.1f} MiB |"
        )


if __name__ == "__main__":
    main()
