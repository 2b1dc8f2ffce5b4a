"""As-of join semantics (union+window form) on a hand-built case, plus
its one-shuffle plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from beauty_lakehouse_spark.operators.temporal import asof_join, range_join_counts


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


def test_range_join_boundary_exactness(spark):
    """(l, l+W] semantics: right at exactly l excluded, at l+W included,
    and matches crossing a bucket boundary are found."""
    from beauty_lakehouse_spark.operators.temporal import range_join_counts

    W = 100
    left = spark.createDataFrame([(1, 95), (1, 400)], ["k", "us"])
    right = (
        spark.createDataFrame(
            # 95: == l (excluded); 96,120: in (95,195] incl. cross-bucket
            # 195: == l+W (included); 400: == l2 (excluded); 501: > l2+W
            [(1, 95), (1, 96), (1, 120), (1, 195), (1, 400), (1, 501)],
            ["k", "us"],
        ).withColumn("value", F.lit(1.0))
    )
    out = {
        r["us"]: r["n_matches"]
        for r in range_join_counts(left, right, "k", "us", "us", W)
        .withColumnRenamed("__l_us", "us")
        .collect()
    }
    assert out == {95: 3}  # 96, 120, 195; the 400-left row has no match


def test_range_join_no_duplicate_matches(spark):
    """A right row never matches the same left row twice even though the
    left side is exploded into two buckets."""
    from beauty_lakehouse_spark.operators.temporal import range_join_counts

    left = spark.createDataFrame([(1, 100)], ["k", "us"])
    right = spark.createDataFrame([(1, 150)], ["k", "us"]).withColumn(
        "value", F.lit(2.0)
    )
    rows = range_join_counts(left, right, "k", "us", "us", 100).collect()
    assert len(rows) == 1 and rows[0]["n_matches"] == 1
    assert float(rows[0]["sum_value"]) == 2.0


def test_range_join_matches_naive_inequality_join(spark):
    """Randomized equivalence: the binned form must agree with the
    naive inequality join on every (key, timestamp) multiset."""
    import random

    rnd = random.Random(7)
    W = 50
    left = [(rnd.randint(0, 3), rnd.randint(0, 400)) for _ in range(60)]
    right = [(rnd.randint(0, 3), rnd.randint(0, 400)) for _ in range(120)]
    ldf = spark.createDataFrame(left, ["k", "us"]).distinct()
    rdf = spark.createDataFrame(right, ["k", "us"]).withColumn(
        "value", F.lit(1.0)
    )
    got = {
        (r["k"], r["us"]): r["n_matches"]
        for r in range_join_counts(ldf, rdf, "k", "us", "us", W)
        .withColumnRenamed("__l_us", "us")
        .collect()
    }
    want = {}
    for lk, lus in set(left):
        n = sum(1 for rk, rus in right if rk == lk and lus < rus <= lus + W)
        if n:
            want[(lk, lus)] = n
    assert got == want


def test_open_orders_daily_matches_brute_containment(spark, sf_dir):
    """The delta-encoded concurrency equals brute-force interval
    containment on sampled days, and the series is everywhere
    nonnegative."""
    import datetime as dt

    from beauty_lakehouse_spark.catalog import load
    from beauty_lakehouse_spark.operators.temporal import q_open_orders_daily
    from pyspark.sql import functions as F

    series = {r.day: r.n_open for r in q_open_orders_daily(spark, sf_dir).collect()}
    assert all(v >= 0 for v in series.values())
    t = load(spark, sf_dir)
    spans = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.min(F.col("o_orderdate").cast("date")).alias("o"),
            F.greatest(
                F.max(F.col("l_shipdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            ).alias("c"),
        )
        .collect()
    )
    days = sorted(series)
    for day_s in days[:: max(1, len(days) // 7)]:
        d = dt.date.fromisoformat(day_s)
        brute = sum(1 for r in spans if r.o <= d <= r.c)
        assert series[day_s] == brute, day_s


def test_asof_join_forward_semantics(spark):
    """Forward as-of: smallest right_ts >= left_ts per key, inclusive
    at equality, null when no future right row exists."""
    from beauty_lakehouse_spark.operators.temporal import asof_join_forward

    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (1, 300, "c"), (2, 50, "d")],
        "k long, lts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 150, 15), (1, 200, 20), (1, 250, 25), (2, 10, 99)],
        "k long, rts long, val int",
    )
    got = {
        (r.k, r.lts): (r.asof_rts, r.asof_val)
        for r in asof_join_forward(
            left, right, key="k", left_ts="lts", right_ts="rts",
            right_cols=["rts", "val"],
        ).collect()
    }
    assert got[(1, 100)] == (150, 15)
    assert got[(1, 200)] == (200, 20)   # inclusive at equality
    assert got[(1, 300)] == (None, None)  # no future right row
    assert got[(2, 50)] == (None, None)   # right row only in the past


def test_interval_overlap_pairs_pure_python(spark, sf_dir):
    """Every emitted pair is ordered (a < b), genuinely overlaps
    (overlap_days >= 1), and the full pair set + lengths match a pure
    pandas sweep over the same per-customer intervals."""
    import pandas as pd

    from beauty_lakehouse_spark.operators.temporal import (
        q_order_interval_overlaps,
    )

    rows = q_order_interval_overlaps(spark, sf_dir).collect()
    assert rows
    got = {
        (r["custkey"], r["orderkey_a"], r["orderkey_b"]): r["overlap_days"]
        for r in rows
    }
    assert all(a < b for (_, a, b) in got)
    assert all(d >= 1 for d in got.values())

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    ends = (
        li.assign(e=li["l_shipdate"].dt.normalize())
        .groupby("l_orderkey")["e"]
        .max()
    )
    iv = orders.assign(
        s=orders["o_orderdate"].dt.normalize(),
        e=orders["o_orderkey"].map(ends),
    ).dropna(subset=["e"])
    iv["e"] = iv[["s", "e"]].max(axis=1)  # clamp inverted intervals
    want = {}
    for _, grp in iv.groupby("o_custkey"):
        recs = grp[["o_orderkey", "o_custkey", "s", "e"]].values.tolist()
        for i in range(len(recs)):
            for j in range(len(recs)):
                ka, ck, sa, ea = recs[i]
                kb, _, sb, eb = recs[j]
                if ka < kb and sa <= eb and sb <= ea:
                    d = (min(ea, eb) - max(sa, sb)).days + 1
                    want[(ck, ka, kb)] = d
    assert got == want


def test_temporal_gap_coalesce_matches_day_set(spark, sf_dir):
    """Island counts and covered days match an independent DAY-SET
    recompute (union the interval day ranges per customer, count the
    connected runs) — a structural witness that shares no windowing
    with the operator."""
    import datetime as dt

    import pandas as pd

    from beauty_lakehouse_spark.operators.temporal import (
        q_temporal_gap_coalesce,
    )

    rows = {
        r["custkey"]: r
        for r in q_temporal_gap_coalesce(spark, sf_dir).collect()
    }
    assert rows

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    ends = li.groupby("l_orderkey")["l_shipdate"].max()
    per_cust: dict = {}
    for _, r in o.iterrows():
        ok = r["o_orderkey"]
        if ok not in ends.index:
            continue
        s = r["o_orderdate"].date()
        e = max(s, ends[ok].date())
        per_cust.setdefault(r["o_custkey"], []).append((s, e))
    assert set(rows) == set(per_cust)
    for ck, ivs in per_cust.items():
        days = set()
        for s, e in ivs:
            d = s
            while d <= e:
                days.add(d)
                d += dt.timedelta(days=1)
        sorted_days = sorted(days)
        islands = 1
        for a, b in zip(sorted_days, sorted_days[1:]):
            if (b - a).days > 1:
                islands += 1
        r = rows[ck]
        assert r["n_orders"] == len(ivs)
        assert r["covered_days"] == len(days)
        assert r["n_islands"] == islands
        # longest island from the day set
        best = cur = 1
        for a, b in zip(sorted_days, sorted_days[1:]):
            cur = cur + 1 if (b - a).days == 1 else 1
            best = max(best, cur)
        assert r["longest_island_days"] == best


def test_sprt_decision_pure_python(spark, sf_dir):
    """The SPRT walk matches a pure-Python recompute via the engine's
    ln_micro constants; FLOAT WITNESS: the final LLR tracks the
    math.log walk and the boundary is ln(19)."""
    import math

    import pandas as pd

    from pyspark.sql import functions as F

    from beauty_lakehouse_spark.functions import ln_micro
    from beauty_lakehouse_spark.operators.temporal import (
        SPRT_BOUND,
        SPRT_L1,
        SPRT_L2,
        q_sprt_decision,
    )

    [r] = q_sprt_decision(spark, sf_dir).collect()

    consts = {
        (a, b): v
        for (a, b), v in zip(
            [SPRT_L1, SPRT_L2, SPRT_BOUND],
            [
                row["v"]
                for row in spark.createDataFrame(
                    [SPRT_L1, SPRT_L2, SPRT_BOUND], ["a", "b"]
                )
                .select(
                    ln_micro(
                        F.col("a").cast("long"), F.col("b").cast("long")
                    ).alias("v")
                )
                .collect()
            ],
        )
    }
    l1, l2, bound = (
        consts[SPRT_L1],
        consts[SPRT_L2],
        consts[SPRT_BOUND],
    )
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["d"] = o["o_orderdate"].dt.date
    o["u"] = (o["o_orderpriority"] == "1-URGENT").astype(int)
    day = o.groupby("d").agg(n=("u", "size"), k=("u", "sum")).sort_index()
    llr = 0
    decision, dday = "continue", None
    fllr = 0.0
    for d, row in day.iterrows():
        n, k = int(row["n"]), int(row["k"])
        llr += k * l1 - (n - k) * l2
        fllr += k * math.log(4 / 3) - (n - k) * math.log(17 / 16)
        if decision == "continue":
            if llr >= bound:
                decision, dday = "accept_h1", d.isoformat()
            elif llr <= -bound:
                decision, dday = "accept_h0", d.isoformat()
    assert r["n_days"] == len(day)
    assert r["n_urgent"] == int(day["k"].sum())
    assert r["llr_final_micro"] == llr
    assert r["boundary_micro"] == bound
    assert (r["decision"], r["decision_day"]) == (decision, dday)
    # FLOAT WITNESS: micro walk tracks the math.log walk — ln_micro is
    # accurate to ~1e-4 relative on small ratios (ln(17/16) ~ 0.06 ->
    # up to ~7 micro absolute), and the error is SYSTEMATIC per
    # constant, so it accumulates linearly in n_orders
    assert (
        abs(r["llr_final_micro"] / 1e6 - fllr)
        < 1.5e-5 * r["n_orders"] + 1e-3
    )
    assert abs(bound / 1e6 - math.log(19)) < 1e-4


def test_revenue_runs_test_pure_python(spark, sf_dir):
    """Run counts and the z-square rational match a pure recompute;
    FLOAT WITNESS: z2_micro tracks the float (R-mu)^2/var and mu
    tracks 1 + 2 n1 n2 / n."""
    import pandas as pd

    from beauty_lakehouse_spark.operators.temporal import (
        q_revenue_runs_test,
    )

    [r] = q_revenue_runs_test(spark, sf_dir).collect()

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["c"] = (o["o_totalprice"].round(2) * 100).round().astype("int64")
    o["d"] = o["o_orderdate"].dt.date
    daily = o.groupby("d")["c"].sum().sort_index()
    n = len(daily)
    med = sorted(
        zip(daily.values, daily.index)
    )[(n + 1) // 2 - 1][0]
    s = [1 if v > med else 0 for v in daily]
    n1, n2 = sum(s), n - sum(s)
    runs = 1 + sum(a != b for a, b in zip(s, s[1:]))
    assert (r["n_days"], r["n_above"], r["n_below"]) == (n, n1, n2)
    assert r["n_runs"] == runs
    assert r["mu_micro"] == 10**6 + 2 * n1 * n2 * 10**6 // n
    diff = n * (runs - 1) - 2 * n1 * n2
    den = 2 * n1 * n2 * (2 * n1 * n2 - n)
    assert r["z2_micro"] == diff * diff * (n - 1) * 10**6 // den
    assert r["z_sign"] == (1 if diff > 0 else -1 if diff < 0 else 0)
    assert r["nonrandom"] == (r["z2_micro"] > 3_841_600)
    # FLOAT WITNESS: float z^2
    mu = 1 + 2 * n1 * n2 / n
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    )
    z2f = (runs - mu) ** 2 / var
    assert abs(r["z2_micro"] / 1e6 - z2f) < max(1e-3, 1e-4 * z2f)
    assert abs(r["mu_micro"] / 1e6 - mu) < 2e-6


def test_page_hinkley_pure_python(spark, sf_dir):
    """Deviations, both ledgers, and the alarm bits match a direct
    sequential recomputation; the float witness tracks dev_ppm."""
    import pandas as pd

    from beauty_lakehouse_spark.operators.temporal import (
        PH_DELTA_PPM,
        PH_LAMBDA_PPM,
        q_page_hinkley_drift,
    )

    rows = q_page_hinkley_drift(spark, sf_dir).collect()
    od = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    od["cents"] = (od["o_totalprice"].round(2) * 100).round().astype("int64")
    daily = od.groupby(
        pd.to_datetime(od["o_orderdate"]).dt.date
    )["cents"].sum()
    assert len(rows) == len(daily)
    s = 0
    m_up = m_dn = 0
    min_up = max_dn = 0
    first_alarm = None
    for t, ((day, cents), r) in enumerate(
        zip(sorted(daily.items()), rows), start=1
    ):
        assert (r.day, r.cents) == (str(day), cents)
        s += int(cents)
        num = (int(cents) * t - s) * 1_000_000
        dev = -((-num) // s) if num < 0 else num // s
        assert r.dev_ppm == dev
        m_up += dev - PH_DELTA_PPM
        m_dn += dev + PH_DELTA_PPM
        min_up = min(min_up, m_up)
        max_dn = max(max_dn, m_dn)
        # ledger mins include the implicit start-at-0? no: the
        # running min is over the emitted prefix only
        if t == 1:
            min_up, max_dn = m_up, m_dn
        assert r.ph_up_ppm == m_up - min_up
        assert r.ph_dn_ppm == max_dn - m_dn
        assert r.alarm_up == (r.ph_up_ppm > PH_LAMBDA_PPM)
        assert r.alarm_dn == (r.ph_dn_ppm > PH_LAMBDA_PPM)
        if first_alarm is None and (r.alarm_up or r.alarm_dn):
            first_alarm = r.day
        # FLOAT WITNESS: dev tracks the float relative deviation
        xbar = s / t
        assert abs(dev / 1e6 - (int(cents) - xbar) / xbar) <= 2e-6


def test_holt_linear_forecast_pure_python(spark, sf_dir):
    """Full pure-python recomputation of the Holt fold (truncating
    division, the cross-engine convention), seed handling, and the
    h-step extrapolation."""
    import pandas as pd

    from beauty_lakehouse_spark.operators.temporal import (
        HOLT_HORIZON,
        q_holt_linear_forecast,
    )

    rows = q_holt_linear_forecast(spark, sf_dir).collect()
    fits = {r.week_idx: r for r in rows if r.kind == "fit"}
    futs = sorted(
        (r for r in rows if r.kind == "forecast"),
        key=lambda r: r.week_idx,
    )

    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    od = od.assign(
        wk=(pd.to_datetime(od["o_orderdate"]).dt.normalize()
            - pd.Timestamp("1970-01-05")).dt.days // 7,
        cents=(od["o_totalprice"] * 100).round().astype(int),
    )
    xs = od.groupby("wk")["cents"].sum().sort_index().tolist()

    def tdiv(n, d):  # truncate toward zero, like _idiv / DuckDB //
        q = abs(n) // d
        return -q if n < 0 else q

    l, b = xs[1], xs[1] - xs[0]
    for t, x in enumerate(xs[2:], start=3):
        assert fits[t].pred_cents == l + b
        assert fits[t].actual_cents == x
        nl = tdiv(x + 3 * (l + b), 4)
        nb = tdiv(nl - l + 7 * b, 8)
        l, b = nl, nb
    assert len(futs) == HOLT_HORIZON
    for h, r in enumerate(futs, start=1):
        assert r.week_idx == len(xs) + h
        assert r.actual_cents is None
        assert r.pred_cents == l + h * b
    # FLOAT WITNESS: the truncating recursion tracks the float Holt
    # recursion (alpha=.25, beta=.125) to sub-cent relative error
    lf, bf = float(xs[1]), float(xs[1] - xs[0])
    for x in xs[2:]:
        nlf = 0.25 * x + 0.75 * (lf + bf)
        bf = 0.125 * (nlf - lf) + 0.875 * bf
        lf = nlf
    assert abs(l - lf) / max(abs(lf), 1.0) < 1e-6
