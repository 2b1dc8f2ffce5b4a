"""Scale curves for the r11 additions: ExactSubstr maximal-span dedup
(token/window domain scales with the token-remapped document copies),
the URL/domain dedup + mixture stage, DSIR importance weights (gram
domain scales with documents), and the HyperBall neighborhood function
(graph scales with the disjoint lineitem copies). Reuses
scale_curve_ext's tier builder so the cells are directly comparable
with the r9/r10 tables.

    SPARK_GRAFT_CPUS=32 python scripts/scale_curve_r11.py [sf0.1 syn10x]

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

from scale_curve import ShuffleMeter, time_query  # noqa: E402
from scale_curve_ext import build_syn_tpch  # noqa: E402
from beauty_lakehouse_spark.operators import (  # noqa: E402
    curation,
    dedup,
    graph,
)
from beauty_lakehouse_spark.session import get_spark  # noqa: E402

QUERIES = {
    "exactsubstr_spans": dedup.q_exactsubstr_spans,
    "domain_dedup_mixture": curation.q_domain_dedup_mixture,
    "dsir_importance": curation.q_dsir_importance,
    "hyperball_neighborhood": graph.q_hyperball_neighborhood,
}


def main() -> None:
    tiers = sys.argv[1:] or ["sf0.1", "syn10x"]
    spark = get_spark("scale-r11")
    meter = ShuffleMeter(spark)
    tmp = tempfile.mkdtemp(prefix="bl_synr11_")
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
