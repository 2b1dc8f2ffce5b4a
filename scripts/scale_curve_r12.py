"""Scale curves for the r12 additions.

Tiered under the syn builder: the order-grain Lorenz deciles and
Hurst R/S (orders stack; the day grid is calendar-bounded so blocks
per scale grow with nothing — the test is that wall/shuffle stay
flat-ish), the events-grain KS test (distinct-value grid constant,
rows 10×), and the JVM rate-cap drain's batch twin is already bench
rows. The document-grain media entries (pHash through the PNG codec,
maintained dedup index) tier under the token-remapped documents
builder.

    SPARK_GRAFT_CPUS=32 python scripts/scale_curve_r12.py [sf0.1 syn10x]
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
    multimodal,
    quality,
    temporal,
    warehouse,
)
from beauty_lakehouse_spark.session import get_spark  # noqa: E402

TIERED = {
    "lorenz_customer_deciles": warehouse.q_lorenz_customer_deciles,
    "ks_two_sample": quality.q_ks_two_sample,
    "hurst_rs": temporal.q_hurst_rs,
    "cliffs_delta": quality.q_cliffs_delta,
    "wilcoxon_signed_rank": quality.q_wilcoxon_signed_rank,
    "holt_linear_forecast": temporal.q_holt_linear_forecast,
    "media_phash_pairs_pngcodec": multimodal.q_media_phash_pairs_pngcodec,
    "media_dedup_maintained": multimodal.q_media_dedup_maintained,
}


def main() -> None:
    tiers = sys.argv[1:] or ["sf0.1", "syn10x"]
    spark = get_spark("scale-r12")
    meter = ShuffleMeter(spark)
    tmp = tempfile.mkdtemp(prefix="bl_synr12_")
    results = []
    for tier in tiers:
        if tier == "sf0.1":
            d = "/root/testdata/sf0.1"
        elif tier == "syn10x":
            d = build_syn_tpch(spark, "/root/testdata/sf0.1", f"{tmp}/t10", 10)
        else:
            raise SystemExit(f"unknown tier {tier}")
        for name, fn in TIERED.items():
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
