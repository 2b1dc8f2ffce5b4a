"""Sub-stage profile of `setsim_prefix_join` on the setsim_clusters
representative domain (the S2 stage that dominates the syn10x wall).

Mirrors the internals of `dedup.setsim_prefix_join(verify="array")`
with forced materializations between its sub-pipelines:

  tok-cache      explode + distinct-token scan (cache fill)
  df+prefix      df table, per-doc rank window, prefix cache fill
  candidates     prefix self-join + length filter + distinct
  docsets        per-rep sorted token arrays (cache fill)
  verify         two hash joins + array_intersect + threshold

    SPARK_GRAFT_CPUS=32 python scripts/profile_setsim_s2.py [tier]
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

from pyspark.sql import Window
from pyspark.sql import functions as F

from scale_curve import ShuffleMeter, build_syn  # noqa: E402
from beauty_lakehouse_spark.catalog import load  # noqa: E402
from beauty_lakehouse_spark.operators.dedup import (  # noqa: E402
    SETSIM_DEN,
    SETSIM_NUM,
)
from beauty_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    tier = sys.argv[1] if len(sys.argv) > 1 else "syn10x"
    spark = get_spark("profile-setsim-s2")
    meter = ShuffleMeter(spark)
    num, den = SETSIM_NUM, SETSIM_DEN
    tmp = None
    try:
        if tier == "sf0.1":
            d = "/root/testdata/sf0.1"
        else:
            tmp = tempfile.mkdtemp(prefix=f"bl_profs2_{tier}_")
            d = build_syn(
                spark,
                "/root/testdata/sf0.1",
                tmp,
                10 if tier == "syn10x" else 100,
            )
        documents = load(spark, d).documents
        out = {}

        def stage(label, thunk):
            s0 = meter.snap()
            t0 = time.perf_counter()
            r = thunk()
            wall = time.perf_counter() - t0
            tot, _ = ShuffleMeter.delta(s0, meter.snap())
            out[label] = {"wall_s": round(wall, 2), "shuffle_bytes": tot}
            print(
                f"{tier} {label}: {wall:.2f}s shuffle {tot / 2**20:.1f} MiB",
                flush=True,
            )
            return r

        # representative domain, as setsim_clusters builds it
        docs = documents.select("doc_id", "text")
        tok0 = (
            docs.select(
                "doc_id",
                F.explode(
                    F.array_distinct(F.split(F.col("text"), " "))
                ).alias("token"),
            ).filter(F.col("token") != "")
        )
        sig = tok0.groupBy("doc_id").agg(
            F.md5(
                F.concat_ws(" ", F.array_sort(F.collect_list("token")))
            ).alias("sig")
        )
        reps = (
            docs.select("doc_id")
            .join(sig, "doc_id", "left")
            .withColumn(
                "sig",
                F.coalesce(
                    F.col("sig"), F.concat(F.lit("empty:"), F.col("doc_id"))
                ),
            )
            .groupBy("sig")
            .agg(F.min("doc_id").alias("rep"))
            .cache()
        )
        rep_docs = documents.join(
            reps.select(F.col("rep").alias("doc_id")), "doc_id", "left_semi"
        )
        print(f"{tier}: n_reps={reps.count()}", flush=True)

        # --- setsim_prefix_join internals ---
        tok = (
            rep_docs.select(
                "doc_id",
                F.explode(
                    F.array_distinct(F.split(F.col("text"), " "))
                ).alias("token"),
            )
            .filter(F.col("token") != "")
            .cache()
        )
        n_tok = stage("tok_cache", tok.count)
        out["tok_cache"]["n_rows"] = n_tok

        sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("s"))
        df_tbl = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        ranked = (
            tok.join(df_tbl, "token")
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("doc_id").orderBy(
                        F.asc("df"), F.asc("token")
                    )
                ),
            )
            .join(sizes, "doc_id")
        )
        prefix = ranked.filter(
            F.col("rk")
            <= F.col("s") - F.expr(f"({num} * s + {den} - 1) div {den}") + F.lit(1)
        ).select("doc_id", "token", "s", "rk").cache()
        n_pref = stage("df_prefix", prefix.count)
        out["df_prefix"]["n_rows"] = n_pref

        a = prefix.select(
            F.col("doc_id").alias("doc_a"),
            "token",
            F.col("s").alias("sa"),
            F.col("rk").alias("rka"),
        )
        b = prefix.select(
            F.col("doc_id").alias("doc_b"),
            "token",
            F.col("s").alias("sb"),
            F.col("rk").alias("rkb"),
        )
        raw_cand = (
            a.join(b, "token")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .filter(
                F.lit(den) * F.least("sa", "sb")
                >= F.lit(num) * F.greatest("sa", "sb")
            )
        )
        n_occ = stage("cand_occurrences", raw_cand.count)
        out["cand_occurrences"]["n_rows"] = n_occ

        cand = raw_cand.select("doc_a", "doc_b", "sa", "sb").distinct().cache()
        n_cand = stage("cand_distinct", cand.count)
        out["cand_distinct"]["n_rows"] = n_cand

        # positional-filter what-if: how many occurrence rows / distinct
        # pairs survive the PPJoin positional upper bound?
        alpha = F.expr(f"({num} * (sa + sb) + {num} + {den} - 1) div ({num} + {den})")
        pos_cand = raw_cand.filter(
            F.lit(1) + F.least(F.col("sa") - F.col("rka"), F.col("sb") - F.col("rkb"))
            >= alpha
        ).select("doc_a", "doc_b", "sa", "sb").distinct()
        n_pos = stage("cand_positional_whatif", pos_cand.count)
        out["cand_positional_whatif"]["n_rows"] = n_pos

        docsets = (
            tok.groupBy("doc_id")
            .agg(F.array_sort(F.collect_list("token")).alias("toks"))
            .cache()
        )
        stage("docsets_cache", docsets.count)

        scored = (
            cand.join(
                docsets.select(
                    F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta")
                ),
                "doc_a",
            )
            .join(
                docsets.select(
                    F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb")
                ),
                "doc_b",
            )
            .withColumn("n_common", F.size(F.array_intersect("ta", "tb")))
        )
        verified = scored.filter(
            F.lit(den) * F.col("n_common")
            >= F.lit(num) * (F.col("sa") + F.col("sb") - F.col("n_common"))
        )
        n_ver = stage(
            "verify", lambda: verified.select("doc_a", "doc_b").count()
        )
        out["verify"]["n_rows"] = n_ver
        print(json.dumps(out, indent=2))
    finally:
        import shutil

        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
