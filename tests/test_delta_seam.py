"""Delta retest hook.

delta-spark is not installable in this container, so the curated zone
runs on the documented parquet + manifest stand-in. This test encodes
the REAL-Delta contract — write_curated produces a _delta_log table,
Delta MERGE upserts into it, time travel reads version 0 — and skips
cleanly until the environment gains delta-spark (get_spark
auto-configures the session extensions the moment the import works),
so the seam is proven the day the image allows it.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from beauty_lakehouse_spark import sources


def test_delta_seam_write_merge_time_travel(spark, tmp_path):
    if not sources.delta_available(spark):
        pytest.skip("delta-spark not installed/configured in this container")

    from delta.tables import DeltaTable

    df = spark.range(10).select("id", (F.col("id") * 2).alias("v"))
    path = str(tmp_path / "curated_tbl")

    fmt = sources.write_curated(df, path)
    assert fmt == "delta"
    rep = sources.validate_curated(spark, path, expected_rows=10)
    assert rep["is_delta_table"] and rep["row_count_matches"]

    # MERGE upsert through Delta's own transaction log
    updates = spark.range(5, 15).select("id", (F.col("id") * 100).alias("v"))
    (
        DeltaTable.forPath(spark, path)
        .alias("t")
        .merge(updates.alias("s"), "t.id = s.id")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    merged = {r.id: r.v for r in sources.read_curated(spark, path).collect()}
    assert len(merged) == 15
    assert merged[0] == 0 and merged[7] == 700 and merged[14] == 1400

    # time travel: pre-merge snapshot still readable as version 0
    v0 = spark.read.format("delta").option("versionAsOf", 0).load(path)
    assert v0.count() == 10
    assert {r.v for r in v0.collect()} == {2 * i for i in range(10)}
