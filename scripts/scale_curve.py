"""Measured scaling curve for the dedup family (VERDICT r5 ask #6).

Times ``dedup_clusters`` and ``ngram_jaccard_top_pairs`` end-to-end at
three corpus sizes:

- sf0.01  (500 docs)
- sf0.1   (10x the docs of sf0.01, per the fixture generator)
- syn10x  (10x the docs of sf0.1): ten token-remapped copies of the
  sf0.1 documents — copy k suffixes every token with ``_k``, so no
  shingle is ever shared across copies. Per-copy similarity structure
  is IDENTICAL to sf0.1 while volume is 10x, which is the honest
  scaling experiment: candidate counts grow linearly by construction,
  so any superlinear runtime is the engine's, not the workload's.

Prints a markdown table for SCALE.md plus the runtime ratios. Run on a
quiet machine: ``python scripts/scale_curve.py``.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from beauty_lakehouse_spark.catalog import load
from beauty_lakehouse_spark.operators import dedup
from beauty_lakehouse_spark.operators.text import q_winnow_overlap_top as _winnow
from beauty_lakehouse_spark.session import get_spark

QUERIES = {
    "dedup_clusters": dedup.q_dedup_clusters,
    "ngram_jaccard_top_pairs": dedup.q_ngram_jaccard_top_pairs,
    # r7: the linear-output replacement for setsim_prefix_join — runs
    # at ALL tiers (its signature collapse is exactly what makes the
    # duplicate-cluster tier affordable)
    "setsim_clusters": dedup.q_setsim_clusters,
}

#: Measured at sf0.01/sf0.1 only: setsim's OUTPUT is inherently
#: quadratic within genuine duplicate clusters (965k true pairs at
#: sf0.1 — see SCALE.md), so a syn10x run times the result
#: materialization, not the candidate scheme.
SMALL_TIER_QUERIES = {
    "setsim_prefix_join": dedup.q_setsim_prefix_join,
    "winnow_overlap_top": _winnow,
}


def build_syn10x(spark, base_dir: str, out_dir: str) -> str:
    """Ten disjoint-shingle copies of base_dir's documents, written as
    a one-table sf_dir (catalog loads tables lazily, so the dedup
    queries never touch the missing TPC-H tables)."""
    docs = load(spark, base_dir).documents
    copies = None
    for k in range(10):
        c = docs.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            (
                F.concat(
                    F.regexp_replace("text", " ", f"_{k} "), F.lit(f"_{k}")
                )
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        copies = c if copies is None else copies.unionByName(c)
    path = os.path.join(out_dir, "documents.parquet")
    copies.repartition(32).write.mode("overwrite").parquet(path)
    return out_dir


def time_query(fn, spark, sf_dir: str) -> float:
    dedup._COMPONENTS_MEMO.clear()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(2):
        dedup._COMPONENTS_MEMO.clear()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("scale-curve")
    tmp = tempfile.mkdtemp(prefix="bl_syn10x_")
    try:
        syn = build_syn10x(spark, "/root/testdata/sf0.1", tmp)
        tiers = [
            ("sf0.01", "/root/testdata/sf0.01"),
            ("sf0.1", "/root/testdata/sf0.1"),
            ("syn10x", syn),
        ]
        ndocs = {
            name: load(spark, d).documents.count() for name, d in tiers
        }
        results: dict[str, dict[str, float]] = {}
        only = set(sys.argv[1:])
        for name, d in tiers:
            todo = dict(QUERIES)
            if name != "syn10x":
                todo.update(SMALL_TIER_QUERIES)
            if only:
                todo = {k: v for k, v in todo.items() if k in only}
            for qname, fn in todo.items():
                results.setdefault(qname, {})[name] = time_query(
                    fn, spark, d
                )
                print(
                    f"{qname} @ {name} ({ndocs[name]} docs): "
                    f"{results[qname][name]:.2f}s",
                    flush=True,
                )
        print("\n| query | " + " | ".join(n for n, _ in tiers) + " |")
        print("|---|" + "---|" * len(tiers))
        print(
            "| docs | "
            + " | ".join(str(ndocs[n]) for n, _ in tiers)
            + " |"
        )
        for qname in results:
            r = results[qname]
            print(
                f"| {qname} | "
                + " | ".join(f"{r.get(n, float('nan')):.2f}s" for n, _ in tiers)
                + " |"
            )
        for qname in results:
            r = results[qname]
            if "syn10x" not in r:
                print(
                    f"{qname}: sf0.01->sf0.1 ratio "
                    f"{r['sf0.1'] / r['sf0.01']:.1f}x for "
                    f"{ndocs['sf0.1'] / ndocs['sf0.01']:.0f}x docs"
                )
                continue
            print(
                f"{qname}: sf0.01->sf0.1 ratio "
                f"{r['sf0.1'] / r['sf0.01']:.1f}x for "
                f"{ndocs['sf0.1'] / ndocs['sf0.01']:.0f}x docs; "
                f"sf0.1->syn10x ratio {r['syn10x'] / r['sf0.1']:.1f}x "
                f"for {ndocs['syn10x'] / ndocs['sf0.1']:.0f}x docs"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
