"""Scale curves for the fourth r11 batch (the session's later ops):
document-grain CDC chunking, count-sketch, MLM masking, keyness and
Burrows' Delta; order-grain Hill tail index and the Theil-U cube.
Fixed-input / derived-table ops (effective_diameter = the hyperball
profile; page_hinkley_streamed = the batch grid maintained
incrementally) inherit their base entries' cells.

    SPARK_GRAFT_CPUS=32 python scripts/scale_curve_r11d.py [sf0.1 syn10x]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_UI", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_curve import ShuffleMeter, time_query  # noqa: E402
from scale_curve_ext import build_syn_tpch  # noqa: E402
from beauty_lakehouse_spark.operators import (  # noqa: E402
    curation,
    dedup,
    quality,
    text,
    warehouse,
)
from beauty_lakehouse_spark.session import get_spark  # noqa: E402

DOC_TIERED = {
    "cdc_chunks": dedup.q_cdc_chunks,
    "count_sketch_estimates": quality.q_count_sketch_estimates,
    "mlm_masks": curation.q_mlm_masks,
    "keyness_llr": text.q_keyness_llr,
    "burrows_delta": text.q_burrows_delta,
}

#: Orders-grain ops that JOIN the (un-stacked) customer/nation dims:
#: tier with key-offset orders copies that keep o_custkey unchanged
#: (the cramers_v "syn10x-orders" convention) so the dim joins land.
ORD_TIERED = {
    "hill_tail_index": warehouse.q_hill_tail_index,
    "theil_u_matrix": quality.q_theil_u_matrix,
    "cohort_ltv": warehouse.q_cohort_ltv,
}


def build_syn_orders(spark, base_dir: str, out_dir: str, copies: int) -> str:
    """10x orders with o_orderkey offsets only (same customers, same
    dims) + symlinks to every other base table."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    orders = spark.read.parquet(f"{base_dir}/orders.parquet")
    parts = []
    for k in range(copies):
        parts.append(
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(k * 100_000_000)
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    out.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "lineitem", "events", "documents", "embeddings",
    ]:
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{base_dir}/{t}.parquet", dst)
    return out_dir


def main() -> None:
    tiers = sys.argv[1:] or ["sf0.1", "syn10x"]
    spark = get_spark("scale-r11d")
    meter = ShuffleMeter(spark)
    tmp = tempfile.mkdtemp(prefix="bl_synr11d_")
    results = []
    for tier in tiers:
        if tier == "sf0.1":
            d = "/root/testdata/sf0.1"
            d_ord = d
        elif tier == "syn10x":
            d = build_syn_tpch(spark, "/root/testdata/sf0.1", f"{tmp}/t10", 10)
            d_ord = build_syn_orders(
                spark, "/root/testdata/sf0.1", f"{tmp}/t10o", 10
            )
        else:
            raise SystemExit(f"unknown tier {tier}")
        queries = {**DOC_TIERED, **{
            n: (fn, True) for n, fn in ORD_TIERED.items()
        }}
        for name, fn in queries.items():
            use_ord = isinstance(fn, tuple)
            if use_ord:
                fn = fn[0]
            t0 = time.perf_counter()
            wall, shuf, peak = time_query(
                fn, spark, d_ord if use_ord else d, meter
            )
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
