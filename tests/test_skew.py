"""Skew-hardening evidence.

A groupBy key owning a double-digit share of a 100 TB table puts that
share on ONE reducer (a group is the unit a shuffle must co-locate, so
the max group size is a lower bound on the best achievable max-task
input). These tests generate a hot-key table (one user = 30% of rows)
and assert — at the plan AND measurement level, not just green answers
— that the salted path actually divides that bound by n_salts, and
that the session runs with AQE on so oversized join partitions get
runtime-split on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from beauty_lakehouse_spark.operators.relational import salted_agg

N_ROWS = 60_000
HOT_SHARE = 0.3
N_SALTS = 32


def _hot_key_events(spark):
    """Synthetic events with one user owning HOT_SHARE of all rows."""
    hot = int(N_ROWS * HOT_SHARE)
    return spark.range(N_ROWS).select(
        F.when(F.col("id") < hot, F.lit("hot_user"))
        .otherwise(F.concat(F.lit("u"), (F.col("id") % 997).cast("string")))
        .alias("user_id"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_plan_has_two_phase_aggregate(spark):
    """Plan assertion: the salted aggregate's first shuffle is keyed on
    (user_id, __salt) — the hot key fans out over N_SALTS reducers —
    and only the (bounded, |groups|*n_salts-row) partial table is
    re-shuffled on user_id alone."""
    df = _hot_key_events(spark)
    out = salted_agg(
        df, ["user_id"], sums={"v": F.col("v")}, count_alias="n",
        n_salts=N_SALTS,
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    aggs = [ln for ln in plan.splitlines() if "Aggregate [" in ln]
    assert len(aggs) == 2, plan
    # inner (phase-1) aggregate carries the salt, outer does not
    assert "__salt" in aggs[1] and "user_id" in aggs[1], aggs[1]
    assert "__salt" not in aggs[0] and "user_id" in aggs[0], aggs[0]


def test_salting_bounds_max_reducer_group_input(spark):
    """Measurement assertion: unsalted, the hot key's group = 30% of
    the table on one reducer; salted, the largest (key, salt) group
    carries ~1/N_SALTS of that. Group sizes are measured from the same
    salt expression salted_agg plants."""
    df = _hot_key_events(spark)

    unsalted_max = (
        df.groupBy("user_id").count().agg(F.max("count")).first()[0]
    )
    assert unsalted_max == int(N_ROWS * HOT_SHARE)  # one task's input

    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(N_SALTS))
    salted_max = (
        df.withColumn("__salt", salt)
        .groupBy("user_id", "__salt")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    # perfect split would be HOT/32; allow 2x slack for salt-hash skew
    assert salted_max <= 2 * int(N_ROWS * HOT_SHARE) / N_SALTS, salted_max


def test_salted_agg_result_transparent_on_hot_key(spark):
    """The skew-safe plan never changes the answer: salted vs direct
    groupBy agree exactly on the hot-key table (sum/count are
    associative, so the (key, salt) partial merge is lossless)."""
    df = _hot_key_events(spark)
    salted = salted_agg(
        df, ["user_id"], sums={"v": F.col("v")}, count_alias="n",
        n_salts=N_SALTS,
    )
    plain = df.groupBy("user_id").agg(
        F.sum("v").alias("v"), F.count(F.lit(1)).alias("n")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_session_runs_with_aqe_enabled(spark):
    """Joins get their skew handling from AQE at runtime (oversized
    partitions split by spark.sql.adaptive.skewJoin); the session
    factory must leave it on — salting covers aggregates, AQE covers
    joins."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true")
        == "true"
    )


def test_salted_join_equal_and_bounded(spark):
    """Salted fact⋈build join: identical result set to the plain join,
    and the hot probe key's co-location unit shrinks from 30% of the
    table to ~1/N_SALTS of that (measured on the planted salt)."""
    from beauty_lakehouse_spark.operators.relational import salted_join

    probe = _hot_key_events(spark)
    build = (
        probe.select("user_id").distinct().withColumn(
            "grade", F.length("user_id").cast("long")
        ).withColumnRenamed("user_id", "b_user_id")
    )
    plain = probe.join(
        build, probe.user_id == build.b_user_id
    ).select("user_id", "v", "grade")
    salted = salted_join(probe, build, "user_id", "b_user_id").select(
        "user_id", "v", "grade"
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b
    # measurement: the (key, salt) unit for the hot key is ~hot/N_SALTS
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(N_SALTS))
    per_unit = (
        probe.withColumn("s", salt)
        .groupBy("user_id", "s")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    hot_rows = int(N_ROWS * HOT_SHARE)
    assert per_unit <= hot_rows // N_SALTS * 3  # generous uniformity slack
