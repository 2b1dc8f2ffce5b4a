"""SparkSession factory.

The reference runs on Databricks and does zero tuning of its own
(SURVEY.md §4.1 — no cache/repartition/broadcast/conf anywhere). Our
engine makes the cluster-scale decisions explicit here, once:

- AQE on (coalesce shuffle partitions, skew-join splitting) — at 100 TB
  the Zipf-skewed keys (hot products / hot customers) are handled by AQE
  skew-join rather than hand-salting; salting helpers exist in
  ``operators.relational`` for the cases AQE can't see (aggregations).
- ``spark.sql.shuffle.partitions`` set low for local testing; on a real
  cluster AQE's coalescing makes the initial number mostly irrelevant as
  long as it is high enough (set ~2-3x total cores there).
- Arrow enabled for the few pandas-UDF paths (similarity kernels,
  multimodal decode) — everything else stays JVM-side.
- Session timezone pinned to UTC so event-time bucketing is stable and
  matches the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Files: pack small fixture files but keep the knob visible — at 100 TB
    # this is the primary scan-parallelism control (128m default).
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast threshold: dims (region/nation/supplier/part at small SF)
    # auto-broadcast; big-dim joins fall back to sort-merge + AQE.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Managed tables (bucketed sinks) live outside the repo tree.
    "spark.sql.warehouse.dir": "/tmp/beauty_lakehouse_warehouse",
}


def get_spark(app_name: str = "beauty_lakehouse_spark") -> SparkSession:
    """Build (or reuse) a SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism. When a session
    already exists (e.g. the driver's), we reuse it and only apply the
    runtime-settable confs (session timezone, AQE toggles).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    active = SparkSession.getActiveSession()
    if active is not None:
        _apply_runtime_conf(active)
        return active

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.driver.maxResultSize", "4g")
        # UI off by default (test/bench noise); SPARK_GRAFT_UI=1 turns
        # it on for tooling that reads the /api/v1 status endpoints
        # (scripts/scale_curve.py records per-query shuffle bytes)
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
    )
    if os.environ.get("SPARK_GRAFT_UI") == "1":
        # The shuffle meter (scripts/scale_curve.py) sums per-stage
        # shuffleWriteBytes from the status store; long syn100x runs
        # can exceed the default 1000 retained stages, silently
        # undercounting (ADVICE r8). Retain enough for the longest
        # measured run; the meter also warns near this limit.
        builder = builder.config("spark.ui.retainedStages", "40000")
    for k, v in DEFAULT_CONF.items():
        builder = builder.config(k, v)
    # Delta seam: when delta-spark is importable (not in this container
    # today), configure the session for it so the curated zone writes
    # real Delta tables with no code change — tests/test_delta_seam.py
    # exercises the write/merge/time-travel path the day it activates.
    try:
        from delta import configure_spark_with_delta_pip

        builder = builder.config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
        builder = configure_spark_with_delta_pip(builder)
    except ImportError:
        pass
    spark = builder.getOrCreate()
    _apply_runtime_conf(spark)
    return spark


def _apply_runtime_conf(spark: SparkSession) -> None:
    """Apply the confs that are safe to set on a live session."""
    for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.session.timeZone",
    ):
        spark.conf.set(k, DEFAULT_CONF.get(k, "true"))
