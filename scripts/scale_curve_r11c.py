"""Scale curves for the third r11 batch (this session's operators).

Tiered (driving table grows under the syn builder): the document-
grain ops (FIM transform, bigram richness card, AMS F2 sketch,
query-likelihood LM, TextRank), the order-grain ops (Page-Hinkley,
priority sample, Cochran-Armitage) and the bipartite HITS rounds.
Fixed-input ops (embeddings corpus / customer-dim joins the tier
builder does not stack) run at sf0.1 only: log-rank, isotonic
calibration, hard-negative mining, DP histogram (cell-grain),
effective diameter (cost profile == hyperball_neighborhood's,
already tiered in the r11a table).

    SPARK_GRAFT_CPUS=32 python scripts/scale_curve_r11c.py [sf0.1 syn10x]
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
    events,
    graph,
    quality,
    similarity,
    temporal,
    text,
)
from beauty_lakehouse_spark.session import get_spark  # noqa: E402

TIERED = {
    "fim_transform": curation.q_fim_transform,
    "vocab_richness": text.q_vocab_richness,
    "ams_f2_estimate": quality.q_ams_f2_estimate,
    "query_likelihood_lm": text.q_query_likelihood_lm,
    "textrank_keywords": text.q_textrank_keywords,
    "page_hinkley_drift": temporal.q_page_hinkley_drift,
    "priority_sample": curation.q_priority_sample,
    "cochran_armitage_trend": quality.q_cochran_armitage_trend,
    "hits_hubs_authorities": graph.q_hits_hubs_authorities,
    "dp_event_histogram": quality.q_dp_event_histogram,
}

SF01_ONLY = {
    "logrank_segments": events.q_logrank_segments,
    "isotonic_calibration": similarity.q_isotonic_calibration,
    "hard_negative_mining": similarity.q_hard_negative_mining,
}


def main() -> None:
    tiers = sys.argv[1:] or ["sf0.1", "syn10x"]
    spark = get_spark("scale-r11c")
    meter = ShuffleMeter(spark)
    tmp = tempfile.mkdtemp(prefix="bl_synr11c_")
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
