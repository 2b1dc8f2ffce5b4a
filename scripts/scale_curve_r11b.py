"""Scale curves for the second r11 batch: the k-truss peel (graph
scales with the disjoint lineitem copies), the JSD/Gopher text ops and
the compaction planner (documents/events scale), plus the
embedding-corpus ops and the rank-grid Spearman at sf0.1 (their inputs
— the 5000-vector corpus, the part dimension — do not grow under the
syn tier builder, so the sf0.1 cell is the honest one and the scale
argument is the bounded-domain shape, not a curve). Reuses
scale_curve_ext's tier builder so cells are comparable with r9-r11
tables.

    SPARK_GRAFT_CPUS=32 python scripts/scale_curve_r11b.py [sf0.1 syn10x]
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
    graph,
    quality,
    similarity,
    text,
    warehouse,
)
from beauty_lakehouse_spark.session import get_spark  # noqa: E402

#: Queries whose driving table grows under the syn tier builder.
TIERED = {
    "copurchase_ktruss": graph.q_copurchase_ktruss,
    "js_divergence_sources": text.q_js_divergence_sources,
    "gopher_quality_flags": text.q_gopher_quality_flags,
    "compaction_plan": warehouse.q_compaction_plan,
}

#: Fixed-input queries (embeddings corpus / part dimension): sf0.1 only.
SF01_ONLY = {
    "silhouette_simplified": similarity.q_silhouette_simplified,
    "twonn_intrinsic_dim": similarity.q_twonn_intrinsic_dim,
    "spearman_price_qty": quality.q_spearman_price_qty,
}


def main() -> None:
    tiers = sys.argv[1:] or ["sf0.1", "syn10x"]
    spark = get_spark("scale-r11b")
    meter = ShuffleMeter(spark)
    tmp = tempfile.mkdtemp(prefix="bl_synr11b_")
    results = []
    for tier in tiers:
        if tier == "sf0.1":
            d = "/root/testdata/sf0.1"
            queries = {**TIERED, **SF01_ONLY}
        elif tier == "syn10x":
            d = build_syn_tpch(spark, "/root/testdata/sf0.1", f"{tmp}/t10", 10)
            queries = TIERED
        else:
            raise SystemExit(f"unknown tier {tier}")
        for name, fn in queries.items():
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
