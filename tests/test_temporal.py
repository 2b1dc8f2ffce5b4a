"""As-of join semantics (union+window form) on a hand-built case, plus
its one-shuffle plan property."""

from __future__ import annotations

from beauty_lakehouse_spark.operators.temporal import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u1", 5, "c"), ("u2", 7, "d")],
        ["k", "lts", "lval"],
    )
    right = spark.createDataFrame(
        [("u1", 10, 100), ("u1", 15, 150), ("u2", 9, 900)],
        ["k", "rts", "rval"],
    )
    out = {
        (r.k, r.lts): r.asof_rval
        for r in asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts", right_cols=["rval"]
        ).collect()
    }
    assert out[("u1", 10)] == 100   # tie: right at same ts counts
    assert out[("u1", 20)] == 150   # latest at-or-before
    assert out[("u1", 5)] is None   # no prior right row
    assert out[("u2", 7)] is None   # right row is later
    assert len(out) == 4            # every left row survives


def test_asof_join_no_row_explosion(spark):
    """The union+window form must not contain any join at all — one
    shuffle on the key, no range-join blowup."""
    left = spark.range(100).selectExpr("id % 5 AS k", "id AS lts", "id AS lval")
    right = spark.range(50).selectExpr("id % 5 AS k", "id * 2 AS rts", "id AS rval")
    df = asof_join(left, right, "k", "lts", "rts", ["rval"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert df.count() == 100
