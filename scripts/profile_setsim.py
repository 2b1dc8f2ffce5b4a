"""Stage-split profile of `setsim_clusters` (VERDICT r8 ask #1).

The query is the registry's cost ceiling and its per-10x-docs wall
ratio was CLIMBING at the top tiers (1.6 -> 3.9 -> 5.6), meaning fixed
overhead no longer masks the real work — this script attributes the
syn10x / syn100x wall and shuffle to the pipeline's stages so the
optimization effort lands on the dominant one:

  S1 signature-collapse  tok explode -> md5 set signature -> reps
  S2 rep-prefix-join     PPJoin edges over the representative domain
  S3 connected-components pointer-doubling min-label rounds
  S4 label-back          doc -> sig -> rep -> comp + cluster sizes

Stage boundaries are forced materializations (count / eager
localCheckpoint / noop write), mirroring `dedup.setsim_clusters`
exactly (same caches, same geometry — any edit there must be mirrored
here). Shuffle bytes per stage from the status REST API.

    SPARK_GRAFT_CPUS=32 python scripts/profile_setsim.py [tiers...]

tiers default to syn10x syn100x; sf0.1 also accepted.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_UI", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from scale_curve import ShuffleMeter, build_syn  # noqa: E402
from beauty_lakehouse_spark.catalog import load  # noqa: E402
from beauty_lakehouse_spark.operators import dedup  # noqa: E402
from beauty_lakehouse_spark.session import get_spark  # noqa: E402


def profile_tier(spark, meter: ShuffleMeter, sf_dir: str, name: str) -> dict:
    out: dict[str, dict] = {}

    def stage(label, thunk):
        s0 = meter.snap()
        t0 = time.perf_counter()
        r = thunk()
        wall = time.perf_counter() - t0
        tot, _peak = ShuffleMeter.delta(s0, meter.snap())
        out[label] = {"wall_s": round(wall, 2), "shuffle_bytes": tot}
        print(
            f"{name} {label}: {wall:.2f}s shuffle {tot / 2**20:.1f} MiB",
            flush=True,
        )
        return r

    documents = load(spark, sf_dir).documents
    docs = documents.select("doc_id", "text")

    # ---- S1: signature collapse (mirrors setsim_clusters step 1) ----
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias(
                "token"
            ),
        ).filter(F.col("token") != "")
    )
    sig = tok.groupBy("doc_id").agg(
        F.md5(F.concat_ws(" ", F.array_sort(F.collect_list("token")))).alias(
            "sig"
        )
    )
    doc_sig = (
        docs.select("doc_id")
        .join(sig, "doc_id", "left")
        .withColumn(
            "sig",
            F.coalesce(F.col("sig"), F.concat(F.lit("empty:"), F.col("doc_id"))),
        )
        .cache()
    )
    reps = doc_sig.groupBy("sig").agg(F.min("doc_id").alias("rep")).cache()
    n_reps = stage("S1_signature_collapse", reps.count)
    out["S1_signature_collapse"]["n_reps"] = n_reps

    # ---- S2: rep-level prefix join (step 2) ----
    rep_docs = documents.join(
        reps.select(F.col("rep").alias("doc_id")), "doc_id", "left_semi"
    )
    edges = dedup.setsim_prefix_join(rep_docs, verify="array").select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    edges = stage("S2_rep_prefix_join", lambda: edges.localCheckpoint())
    out["S2_rep_prefix_join"]["n_edges"] = edges.count()

    # ---- S3: connected components (step 3) ----
    nodes = reps.select(F.col("rep").alias("id"))
    comp = stage(
        "S3_connected_components",
        lambda: dedup.connected_components(nodes, edges).localCheckpoint(),
    )

    # ---- S4: label-back + sizes (step 4) ----
    def s4():
        labeled = (
            doc_sig.join(reps, "sig")
            .join(comp, F.col("rep") == F.col("id"))
            .select("doc_id", F.col("comp").alias("cluster_id"))
        )
        sizes = labeled.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("cluster_size")
        )
        labeled.join(sizes, "cluster_id").select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
        ).write.format("noop").mode("overwrite").save()

    stage("S4_label_back", s4)
    out["total"] = {
        "wall_s": round(sum(v["wall_s"] for v in out.values()), 2),
        "shuffle_bytes": sum(v["shuffle_bytes"] for v in out.values()),
    }
    return out


def main() -> None:
    want = sys.argv[1:] or ["syn10x", "syn100x"]
    bad = set(want) - {"sf0.1", "syn10x", "syn100x"}
    if bad:
        sys.exit(f"unknown tier(s): {sorted(bad)}")
    spark = get_spark("profile-setsim")
    meter = ShuffleMeter(spark)
    results: dict[str, dict] = {}
    tmps: list[str] = []
    try:
        for name in want:
            if name == "sf0.1":
                d = "/root/testdata/sf0.1"
            else:
                tmp = tempfile.mkdtemp(prefix=f"bl_prof_{name}_")
                tmps.append(tmp)
                d = build_syn(
                    spark,
                    "/root/testdata/sf0.1",
                    tmp,
                    10 if name == "syn10x" else 100,
                )
            spark.catalog.clearCache()
            dedup._COMPONENTS_MEMO.clear()
            results[name] = profile_tier(spark, meter, d, name)
        print(json.dumps(results, indent=2))
    finally:
        import shutil

        for t in tmps:
            shutil.rmtree(t, ignore_errors=True)


if __name__ == "__main__":
    main()
