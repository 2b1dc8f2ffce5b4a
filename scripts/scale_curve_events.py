"""Measured scaling curve for the hypertable cascade (late r9).

Times ``events_multires_rollup`` (and ``events_hourly`` as the
single-tier baseline) at four event volumes:

- sf0.01  (10k events)
- sf0.1   (100k events)
- syn10x  (1M events): ten TIME-SHIFTED copies of the sf0.1 events —
  copy k shifts every timestamp by k x (fixture span + 1 day), so the
  minute/hour/day bucket count grows linearly with the copies (no
  cross-copy bucket collisions). That is the honest hypertable scaling
  experiment: tier cardinality is proportional to data span, exactly
  the 100 TB regime where the minute tier is ~10^4x smaller than raw.
- syn100x (10M events): the same construction one tier up, so the
  1000x-span claim is measured, not extrapolated.

Each timed run records shuffle-write bytes via the same status-REST
``ShuffleMeter`` the dedup curve uses. The expected shape: ONE
corpus-scale shuffle (the minute-tier groupBy, linear in events) plus
two tier-sized shuffles that are noise by comparison — a superlinear
byte curve would falsify the continuous-aggregate design claim.

Run on a quiet machine: ``python scripts/scale_curve_events.py``.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_UI", "1")

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from scale_curve import ShuffleMeter, _fmt_bytes

from beauty_lakehouse_spark.catalog import load
from beauty_lakehouse_spark.operators import events as ev_ops
from beauty_lakehouse_spark.session import get_spark

QUERIES = {
    "events_hourly": ev_ops.q_events_hourly,
    "events_multires_rollup": ev_ops.q_events_multires_rollup,
}

#: copy-index stride for event_id remapping (fixture ids < 10^9)
ID_STRIDE = 1_000_000_000


def build_syn_events(spark, base_dir: str, out_dir: str, copies: int) -> str:
    """``copies`` time-shifted copies of base_dir's events, written as a
    one-table sf_dir (catalog loads lazily). Copy k shifts ts by
    k x (span + 1 day) and offsets event_id/user_id, so every copy
    lands in fresh minute buckets and the tier cardinality scales
    linearly by construction."""
    ev = load(spark, base_dir).events
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    shift_us = (hi - lo) + 86_400_000_000
    expanded = (
        ev.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("k")
        )
        .select(
            (F.col("event_id") + F.col("k").cast("long") * ID_STRIDE).alias(
                "event_id"
            ),
            F.timestamp_micros(
                F.unix_micros("ts") + F.col("k").cast("long") * shift_us
            ).alias("ts"),
            (F.col("user_id") + F.col("k").cast("long") * ID_STRIDE).alias(
                "user_id"
            ),
            "event_type",
            "value",
            "props",
        )
    )
    path = os.path.join(out_dir, "events.parquet")
    expanded.repartition(32).write.mode("overwrite").parquet(path)
    return out_dir


def time_query(fn, spark, sf_dir: str, meter: ShuffleMeter):
    spark.catalog.clearCache()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = (float("inf"), 0, 0)
    for _ in range(2):
        spark.catalog.clearCache()
        s0 = meter.snap()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        total, peak = ShuffleMeter.delta(s0, meter.snap())
        if wall < best[0]:
            best = (wall, total, peak)
    return best


def main() -> None:
    spark = get_spark("scale-curve-events")
    meter = ShuffleMeter(spark)
    tmp10 = tempfile.mkdtemp(prefix="bl_synev10x_")
    tmp100 = tempfile.mkdtemp(prefix="bl_synev100x_")
    try:
        tiers = [
            ("sf0.01", "/root/testdata/sf0.01"),
            ("sf0.1", "/root/testdata/sf0.1"),
            ("syn10x", build_syn_events(spark, "/root/testdata/sf0.1", tmp10, 10)),
            ("syn100x", build_syn_events(spark, "/root/testdata/sf0.1", tmp100, 100)),
        ]
        nev = {name: load(spark, d).events.count() for name, d in tiers}
        results: dict[str, dict[str, tuple[float, int, int]]] = {}
        for name, d in tiers:
            for qname, fn in QUERIES.items():
                wall, tot, peak = time_query(fn, spark, d, meter)
                results.setdefault(qname, {})[name] = (wall, tot, peak)
                print(
                    f"{qname} @ {name} ({nev[name]} events): {wall:.2f}s "
                    f"shuffle {_fmt_bytes(tot)} (peak stage "
                    f"{_fmt_bytes(peak)})",
                    flush=True,
                )
        print("\n| query | " + " | ".join(n for n, _ in tiers) + " |")
        print("|---|" + "---|" * len(tiers))
        print("| events | " + " | ".join(str(nev[n]) for n, _ in tiers) + " |")
        for qname, r in results.items():
            print(
                f"| {qname} | "
                + " | ".join(
                    f"{r[n][0]:.2f}s / {_fmt_bytes(r[n][1])}" for n, _ in tiers
                )
                + " |"
            )
        for qname, r in results.items():
            names = [n for n, _ in tiers]
            parts = [
                f"{a}->{b} {r[b][0] / r[a][0]:.1f}x wall "
                f"({nev[b] / nev[a]:.0f}x events, "
                f"{(r[b][1] / r[a][1]) if r[a][1] else float('nan'):.1f}x shuffle)"
                for a, b in zip(names, names[1:])
            ]
            print(f"{qname}: " + "; ".join(parts))
    finally:
        import shutil

        shutil.rmtree(tmp10, ignore_errors=True)
        shutil.rmtree(tmp100, ignore_errors=True)


if __name__ == "__main__":
    main()
