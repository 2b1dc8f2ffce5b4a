"""Semantic + plan guards for the decision-support subquery shapes.

Each DataFrame formulation is checked against an independent Spark SQL
formulation (correlated EXISTS / NOT EXISTS / scalar subqueries) so the
decorrelated rewrite provably preserves the subquery semantics; plan
guards then pin the physical properties (semi/anti joins, pushdown,
window partitioning) that make the shapes scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from beauty_lakehouse_spark.catalog import load
from beauty_lakehouse_spark.operators import decision_support as ds


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_counts_distinct_qualifying_orders(spark, sf_dir):
    t = load(spark, sf_dir)
    res = {
        r.o_orderpriority: r.n_orders
        for r in ds.q_late_ship_priority_orders(spark, sf_dir).collect()
    }
    # independent recompute: distinct orders having >=1 late line
    qualifying = (
        t.orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .select("o_orderkey", "o_orderpriority")
        .distinct()
    )
    expected = {
        r.o_orderpriority: r.n
        for r in qualifying.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert res == expected


def test_q4_plan_semi_join_with_pushed_date_filter(spark, sf_dir):
    plan = _plan(ds.q_late_ship_priority_orders(spark, sf_dir))
    assert "LeftSemi" in plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert any("o_orderdate" in l and "1996-01-01" in l for l in scans), plan


def test_q13_distribution_covers_every_customer(spark, sf_dir):
    t = load(spark, sf_dir)
    dist = ds.q_customer_order_distribution(spark, sf_dir).collect()
    assert sum(r.custdist for r in dist) == t.customer.count()
    # the zero bucket is exactly the customers whose orders are all
    # urgent (or who have no orders) — the ON-clause filter must not
    # have turned the join inner
    zero = {r.c_count: r.custdist for r in dist}.get(0, 0)
    with_nonurgent = (
        t.orders.filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert zero == t.customer.count() - with_nonurgent


def test_q15_returns_every_tie_at_the_max(spark, sf_dir):
    t = load(spark, sf_dir)
    rows = ds.q_top_revenue_suppliers(spark, sf_dir).collect()
    assert rows
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1  # all returned rows share the max revenue
    n_expected = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(12,2)"))
        ).alias("r"))
        .withColumn("mx", F.max("r").over(__import__("pyspark").sql.Window.partitionBy()))
        .filter(F.col("r") == F.col("mx"))
        .count()
    )
    assert len(rows) == n_expected


def test_q21_matches_correlated_exists_formulation(spark, sf_dir):
    t = load(spark, sf_dir)
    t.register_temp_views()
    res = {
        r.s_suppkey: r.n_blamed_orders
        for r in ds.q_sole_late_supplier_orders(spark, sf_dir).collect()
    }
    # the textbook Q21 formulation: correlated EXISTS + NOT EXISTS,
    # counting distinct qualifying orders per supplier
    sql = spark.sql(
        """
        SELECT l1.l_suppkey AS s_suppkey,
               count(DISTINCT l1.l_orderkey) AS n
        FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
        WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        GROUP BY l1.l_suppkey
        """
    )
    expected = {r.s_suppkey: r.n for r in sql.collect()}
    assert res == expected
    assert res  # non-trivial on the fixture


def test_q22_members_truly_have_no_urgent_orders(spark, sf_dir):
    t = load(spark, sf_dir)
    t.register_temp_views()
    res = {
        r.nation: (r.n_customers, r.total_acctbal)
        for r in ds.q_never_urgent_rich_customers(spark, sf_dir).collect()
    }
    expected = {
        r.nation: (r.n_customers, r.total_acctbal)
        for r in spark.sql(
            """
            WITH pool AS (SELECT * FROM customer WHERE c_mktsegment IN
                          ('AUTOMOBILE', 'HOUSEHOLD', 'MACHINERY'))
            SELECT n_name AS nation, count(*) AS n_customers,
                   CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2)
                        AS DOUBLE) AS total_acctbal
            FROM pool JOIN nation ON c_nationkey = n_nationkey
            WHERE CAST(c_acctbal AS DECIMAL(12,2)) >
                  (SELECT avg(CAST(c_acctbal AS DECIMAL(12,2)))
                   FROM pool WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderpriority = '1-URGENT')
            GROUP BY n_name
            """
        ).collect()
    }
    # the SQL twin compares against the true decimal avg; our exact
    # cross-multiply (cents*n > sum) is the same predicate, so group
    # counts must agree (sums may differ only if membership differed)
    assert res == expected
    assert res


def test_q22_plan_anti_join_no_cartesian(spark, sf_dir):
    plan = _plan(ds.q_never_urgent_rich_customers(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q17_window_partitioned_by_partkey(spark, sf_dir):
    plan = _plan(ds.q_small_quantity_part_revenue(spark, sf_dir))
    window_lines = [l for l in plan.splitlines() if "Window" in l]
    assert window_lines, plan
    # the correlated-avg window must partition by the high-cardinality
    # part key, never run as a global (empty-partition) window
    assert any("l_partkey" in l for l in window_lines), plan


def test_q19_stays_a_single_equi_join(spark, sf_dir):
    plan = _plan(ds.q_brand_size_band_revenue(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    row = ds.q_brand_size_band_revenue(spark, sf_dir).collect()[0]
    assert row.n_lines > 0 and row.revenue > 0


def test_q7_matches_sql_formulation(spark, sf_dir):
    # sf0.001 is sparse enough that the pair may not trade at all in
    # the window — so assert equivalence with an independent SQL
    # formulation rather than non-emptiness (the sf0.01 oracle gate
    # covers the non-trivial case: 4 groups there)
    t = load(spark, sf_dir)
    t.register_temp_views()
    rows = {
        (r.supp_nation, r.cust_nation, r.ship_year): r.n_lines
        for r in ds.q_nation_trade_volume(spark, sf_dir).collect()
    }
    expected = {
        (r.supp_nation, r.cust_nation, r.ship_year): r.n_lines
        for r in spark.sql(
            """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS ship_year, count(*) AS n_lines
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
            """
        ).collect()
    }
    assert rows == expected
    pairs = {(s, c) for s, c, _ in rows}
    assert pairs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}


def test_q8_share_bounded_and_consistent(spark, sf_dir):
    for r in ds.q_market_share(spark, sf_dir).collect():
        assert 0.0 <= r.mkt_share_pct <= 100.0
        assert r.nation_volume <= r.total_volume + 1e-9


def test_q2_best_offer_is_partwide_min_over_europe_suppliers(spark, sf_dir):
    t = load(spark, sf_dir)
    t.register_temp_views()
    rows = ds.q_min_cost_part_supplier(spark, sf_dir).collect()
    assert rows
    # independent recompute: the correlated-subquery formulation
    expected = spark.sql(
        """
        WITH es AS (SELECT s_suppkey FROM supplier
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
                    WHERE r_name = 'EUROPE'),
        offers AS (SELECT l_partkey, l_suppkey,
                          min(CAST(l_extendedprice AS DECIMAL(12,2))) AS offer
                   FROM lineitem
                   WHERE l_partkey IN (SELECT p_partkey FROM part
                                       WHERE p_type = 'STANDARD'
                                         AND p_size BETWEEN 10 AND 20)
                     AND l_suppkey IN (SELECT s_suppkey FROM es)
                   GROUP BY 1, 2)
        SELECT l_partkey, l_suppkey FROM offers o
        WHERE offer = (SELECT min(offer) FROM offers i
                       WHERE i.l_partkey = o.l_partkey)
        """
    ).collect()
    exp_pairs = {(r.l_partkey, r.l_suppkey) for r in expected}
    got_pairs = {(r.p_partkey, r.s_suppkey) for r in rows}
    assert got_pairs <= exp_pairs  # top-100 cut of the full winner set


def test_q2_plan_windows_on_high_cardinality_partkey(spark, sf_dir):
    plan = _plan(ds.q_min_cost_part_supplier(spark, sf_dir))
    assert "partitionBy: [l_partkey" in plan.replace("=", ": ") or (
        "l_partkey" in plan and "Window" in plan
    )
    assert "CartesianProduct" not in plan


def test_q9_profit_matches_float_recompute(spark, sf_dir):
    t = load(spark, sf_dir)
    rows = ds.q_nation_product_profit(spark, sf_dir).collect()
    assert rows
    red = t.part.filter(F.col("p_name").contains("red")).select(
        "p_partkey", "p_retailprice"
    )
    j = (
        t.lineitem.join(red, F.col("l_partkey") == F.col("p_partkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name"), F.year("o_orderdate").alias("y"))
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("l_quantity") * F.col("p_retailprice") * 0.5
            ).alias("p")
        )
        .collect()
    )
    expected = {(r.n_name, r.y): r.p for r in j}
    for r in rows:
        assert abs(expected[(r.nation, r.order_year)] - r.profit) < 0.05


def test_q11_threshold_is_exclusive_and_complete(spark, sf_dir):
    t = load(spark, sf_dir)
    rows = ds.q_important_part_value(spark, sf_dir).collect()
    assert rows
    n1 = t.supplier.join(
        t.nation.filter(F.col("n_name") == "NATION_3"),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    vals = (
        t.lineitem.join(n1, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (1 - F.col("l_discount").cast("decimal(12,2)"))
            ).alias("v")
        )
    )
    total = vals.agg(F.sum("v").alias("t")).collect()[0].t
    expected = {
        r.l_partkey for r in vals.collect() if r.v * 1000 > total
    }
    assert {r.p_partkey for r in rows} == expected


def test_q16_counts_match_sql_formulation(spark, sf_dir):
    t = load(spark, sf_dir)
    t.register_temp_views()
    got = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in ds.q_part_supplier_counts(spark, sf_dir).collect()
    }
    exp = {
        (r.p_brand, r.p_type, r.p_size): r.cnt
        for r in spark.sql(
            """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
              AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
            """
        ).collect()
    }
    assert got == exp


def test_q16_plan_anti_join_for_not_in(spark, sf_dir):
    plan = _plan(ds.q_part_supplier_counts(spark, sf_dir))
    assert "LeftAnti" in plan


def test_q20_dominance_is_majority_share(spark, sf_dir):
    t = load(spark, sf_dir)
    rows = ds.q_dominant_part_suppliers(spark, sf_dir).collect()
    # every returned supplier must dominate (>50% of 1996 volume of)
    # at least one red part, and be in NATION_2
    qty = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            t.part.filter(F.col("p_name").contains("red")).select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    import pyspark

    w = pyspark.sql.Window.partitionBy("l_partkey")
    dominant = {
        r.l_suppkey
        for r in qty.withColumn("t", F.sum("q").over(w))
        .filter(F.col("q") * 2 > F.col("t"))
        .select("l_suppkey")
        .distinct()
        .collect()
    }
    n2 = {
        r.s_suppkey
        for r in t.supplier.join(
            t.nation.filter(F.col("n_name") == "NATION_2"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).collect()
    }
    assert {r.s_suppkey for r in rows} == dominant & n2


def test_zorder_improves_two_dim_locality(spark, sf_dir):
    """Chunking the fact by Morton key yields tighter two-dimensional
    bounding boxes than single-column date sort: the mean (ck-span x
    day-span) area over 15 chunks must shrink — the min/max-pruning
    win z-ordering exists for."""
    from beauty_lakehouse_spark.operators.warehouse import (
        q_orders_zorder_keys,
    )
    from beauty_lakehouse_spark.catalog import load
    from beauty_lakehouse_spark.functions import epoch_us
    from pyspark.sql import functions as F

    t = load(spark, sf_dir)
    base = {
        r.o_orderkey: (r.ck, r.d)
        for r in t.orders.select(
            "o_orderkey",
            F.col("o_custkey").alias("ck"),
            (epoch_us(F.col("o_orderdate").cast("timestamp")) / 86_400_000_000)
            .cast("long")
            .alias("d"),
        ).collect()
    }
    zk = {
        r.o_orderkey: r.zkey for r in q_orders_zorder_keys(spark, sf_dir).collect()
    }

    def mean_spans(order):
        n_chunks = 15
        keys = list(order)
        sz = (len(keys) + n_chunks - 1) // n_chunks
        ck_spans, d_spans = [], []
        for i in range(0, len(keys), sz):
            chunk = [base[k] for k in keys[i : i + sz]]
            cks = [c for c, _ in chunk]
            ds = [d for _, d in chunk]
            ck_spans.append(max(cks) - min(cks) + 1)
            d_spans.append(max(ds) - min(ds) + 1)
        return (sum(ck_spans) / len(ck_spans), sum(d_spans) / len(d_spans))

    by_date = sorted(base, key=lambda k: (base[k][1], k))
    by_z = sorted(base, key=lambda k: (zk[k], k))
    ck_z, d_z = mean_spans(by_z)
    ck_date, d_date = mean_spans(by_date)
    full_days = max(d for _, d in base.values()) - min(
        d for _, d in base.values()
    ) + 1
    # date sort prunes only on date: its chunks span ~the full custkey
    # range. Z-order chunks must be selective on BOTH dimensions:
    assert ck_z < 0.5 * ck_date          # custkey now prunes
    assert d_z < 0.6 * full_days          # date still prunes


def test_revenue_gini_matches_sorted_formula(spark, sf_dir):
    """Gini equals the textbook sorted-rank formula recomputed driver-
    side; bounds [0, 1); a planted perfectly-equal segment would be 0."""
    from decimal import Decimal

    from beauty_lakehouse_spark.catalog import load
    from beauty_lakehouse_spark.operators.warehouse import q_revenue_gini
    from pyspark.sql import functions as F

    rows = {r.segment: r for r in q_revenue_gini(spark, sf_dir).collect()}
    t = load(spark, sf_dir)
    spend = (
        t.orders.groupBy("o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(12,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "cents")
        .collect()
    )
    by_seg = {}
    for r in spend:
        by_seg.setdefault(r.c_mktsegment, []).append(r.cents)
    for seg, xs in by_seg.items():
        xs.sort()
        n, tot = len(xs), sum(xs)
        num = sum((2 * i - n - 1) * x for i, x in enumerate(xs, start=1))
        want = ((2 * num * 10**6 + n * tot) // (2 * n * tot)) / 10**6
        r = rows[seg]
        assert (r.n_customers, r.total_cents) == (n, tot)
        assert abs(r.gini - want) < 1e-9
        assert 0.0 <= r.gini < 1.0
        # FLOAT WITNESS: within half-up 6-dp of the float Gini ratio
        assert abs(r.gini - num / (n * tot)) <= 5e-7


def test_rfm_segments_quintile_laws(spark, sf_dir):
    """RFM invariants: scores in 1..5 with near-equal quintile sizes
    (ntile law: sizes differ by at most 1), segment = 100r+10f+m, and
    score 1 of each dimension holds the best metric values."""
    from collections import Counter

    from beauty_lakehouse_spark.operators.warehouse import (
        q_customer_rfm_segments,
    )

    rows = q_customer_rfm_segments(spark, sf_dir).collect()
    n = len(rows)
    for dim in ("r_score", "f_score", "m_score"):
        sizes = Counter(getattr(r, dim) for r in rows)
        assert set(sizes) == {1, 2, 3, 4, 5}
        assert max(sizes.values()) - min(sizes.values()) <= 1
    for r in rows:
        assert r.rfm_segment == r.r_score * 100 + r.f_score * 10 + r.m_score
    best_m = min(r.total_spend for r in rows if r.m_score == 1)
    worst_m = max(r.total_spend for r in rows if r.m_score == 5)
    assert best_m >= worst_m
    best_r = min(r.last_day for r in rows if r.r_score == 1)
    worst_r = max(r.last_day for r in rows if r.r_score == 5)
    assert best_r >= worst_r


def test_nation_revenue_trend_pure_python(spark, sf_dir):
    """Every per-nation OLS slope matches an exact Fraction recompute
    over a pandas rebuild of the yearly cents grid, including the
    truncate-toward-zero fixed-point semantics for negative slopes."""
    from decimal import ROUND_HALF_UP, Decimal
    from fractions import Fraction

    import pandas as pd

    from beauty_lakehouse_spark.operators.warehouse import (
        q_nation_revenue_trend,
    )

    rows = {
        r["nation"]: r for r in q_nation_revenue_trend(spark, sf_dir).collect()
    }
    assert rows

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cu = pd.read_parquet(f"{sf_dir}/customer.parquet")
    na = pd.read_parquet(f"{sf_dir}/nation.parquet")
    j = (
        li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
        .merge(na, left_on="c_nationkey", right_on="n_nationkey")
    )
    j["year"] = j["o_orderdate"].dt.year
    j["net"] = [
        Decimal(str(p)).quantize(Decimal("0.01"))
        * (1 - Decimal(str(d)).quantize(Decimal("0.01")))
        for p, d in zip(j["l_extendedprice"], j["l_discount"])
    ]
    grid = {}
    for (nat, yr), grp in j.groupby(["n_name", "year"]):
        s = sum(grp["net"], Decimal(0))
        grid.setdefault(nat, {})[yr] = int(
            s.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP) * 100
        )
    for nat, ys in grid.items():
        if len(ys) < 2:
            assert nat not in rows
            continue
        n = len(ys)
        sx = sum(ys)
        sy = sum(ys.values())
        sxy = sum(x * y for x, y in ys.items())
        sxx = sum(x * x for x in ys)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        frac = Fraction(num * 1_000_000, den)
        want = int(frac)  # Fraction.__int__ truncates toward zero
        r = rows[nat]
        assert r["n_years"] == n
        assert r["year_min"] == min(ys)
        assert r["year_max"] == max(ys)
        assert r["total_cents"] == sy
        assert r["slope_micro_cents_per_year"] == want, nat
        # FLOAT WITNESS: the micro-scaled slope tracks the float OLS
        # slope (the Fraction recompute shares the integer scale, so
        # only float division can catch a shared 10^x bug)
        fslope = num / den
        assert (
            abs(r["slope_micro_cents_per_year"] / 1e6 - fslope)
            <= 1e-6 + 1e-9 * abs(fslope)
        ), nat
