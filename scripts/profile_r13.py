"""Round-13 optimization profiler (guide §1: measure first).

For each target query: time the DataFrame BUILD (Python plan
construction — driver-side, no cluster), the noop-sink EXECUTION
(min of 2 after 1 warmup, same methodology as bench.py), and pull
job/stage/task counts + shuffle bytes from the UI status API between
markers. Saves ``explain("formatted")`` to plans/r13/<name>_before.txt
(or _after.txt with --after).

Usage::

    SPARK_GRAFT_UI=1 python scripts/profile_r13.py [--after] name [name ...]
    SPARK_GRAFT_UI=1 python scripts/profile_r13.py --top 25   # slowest 25 from BENCH_local.json
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from beauty_lakehouse_spark.session import get_spark  # noqa: E402


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}{path}") as r:
        return json.load(r)


def _job_stats(spark):
    jobs = _api(spark, "/jobs")
    stages = _api(spark, "/stages")
    return {
        "n_jobs": len(jobs),
        "n_stages": len(stages),
        "n_tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
    }


def _clear_memos(spark) -> None:
    from beauty_lakehouse_spark import tables as _tables
    from beauty_lakehouse_spark.operators import dedup as _dedup
    from beauty_lakehouse_spark.operators import similarity as _sim

    _dedup._COMPONENTS_MEMO.clear()
    _tables._MERGE_SCENARIO_CACHE.clear()
    _sim._LSH_INDEX_CACHE.clear()
    _sim._ANN_SERVE_MEMO.clear()
    spark.catalog.clearCache()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    suffix = "_before"
    if "--after" in args:
        suffix = "_after"
        args.remove("--after")
    plan_only = "--plan-only" in args
    if plan_only:
        args.remove("--plan-only")
    out_dir = None
    if "--out-dir" in args:
        i = args.index("--out-dir")
        out_dir = args[i + 1]
        del args[i : i + 2]
    if args and args[0] == "--top":
        n = int(args[1])
        bench = json.load(open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_local.json")))
        names = [k for k, _ in sorted(
            bench["queries"].items(), key=lambda kv: -kv[1])][:n]
    else:
        names = args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_r13")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    queries = entrymod.queries()
    plans_dir = out_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        _clear_memos(spark)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        build_s = time.perf_counter() - t0
        with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        if plan_only:
            out[name] = {"build_s": round(build_s, 3)}
            print(json.dumps({name: out[name]}), flush=True)
            continue
        # warmup (codegen compile) + 2 timed, min — bench methodology
        _clear_memos(spark)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        stats0 = stats1 = None
        for i in range(2):
            _clear_memos(spark)
            s0 = _job_stats(spark)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if dt < best:
                best, stats0, stats1 = dt, s0, _job_stats(spark)
        delta = {k: stats1[k] - stats0[k] for k in stats0}
        out[name] = {
            "build_s": round(build_s, 3),
            "exec_s": round(best, 3),
            **delta,
        }
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)

    path = os.path.join(plans_dir, f"profile{suffix}.json")
    merged = {}
    if os.path.exists(path):
        merged = json.load(open(path))
    merged.update(out)
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
