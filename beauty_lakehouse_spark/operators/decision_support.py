"""Decision-support query shapes: subquery decorrelation, outer-join
distributions, disjunctive pushdown, scalar-subquery comparisons.

The reference's warehouse layer is declared but empty
(notebooks/config/settings.ipynb:48); its stated intent is BI-style
reporting over the star schema (01_dataLake_ingestion.ipynb:420-448).
This module completes that surface with the classic decision-support
shapes (TPC-H Q4/Q7/Q8/Q12/Q13/Q15/Q17/Q18/Q19/Q21/Q22 adapted to the
fixture columns — the fixtures carry no commitdate/shipmode/container/
phone/comment, so each query keeps the SHAPE and swaps in available
predicates).

Every query here is expressed declaratively so Catalyst decorrelates /
reorders it; none hand-materializes a subquery. Cross-engine exactness
follows the repo rules: decimal-lifted money, integer cross-multiply
instead of avg comparisons, halfup_div for ratios.

Scale notes (100 TB):
- EXISTS / NOT EXISTS become left-semi / left-anti hash joins on the
  fact keys — shuffle-partitioned, no per-row subquery execution.
- Scalar aggregates (Q15 max, Q22 avg) are 1-row DataFrames broadcast
  into the comparison — no driver collect, no recompute.
- The Q17/Q21 correlations partition by l_partkey / l_orderkey — both
  high-cardinality keys, so the windows distribute evenly (unlike a
  low-cardinality segment window).
- Dimension filters are applied BEFORE joins (nation pair, EUROPE
  region, PROMO type) so broadcast sides stay tiny and the fact join
  prunes early.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import dec2, halfup_div
from .relational import money_sum, net_expr


def q_late_ship_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for H1-1996 orders where
    EXISTS a line shipped >30 days after the order date.

    The EXISTS is a left-semi join with the correlation folded into the
    join condition — the equi part (orderkey) keeps it a shuffled hash
    join; the >30d predicate is evaluated join-side, never per-row
    subquery-side."""
    t = load(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    return (
        orders.join(t.lineitem.select("l_orderkey", "l_shipdate"), late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between two nations (either
    direction), by supplier nation × customer nation × ship year.

    The nation dim is filtered to the two names BEFORE joining, so both
    nation joins are 2-row broadcasts and the supplier/customer joins
    prune to ~2/|N| of the fact early."""
    t = load(spark, sf_dir)
    pair = t.nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp_n = pair.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_n = pair.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").alias("ship_year"),
    ).agg(
        money_sum(net_expr()).alias("volume"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of PROMO-part revenue sold to
    EUROPE customers, per order year.

    Both the numerator and denominator stay integer (net × 10^4, exact
    for a scale-4 decimal) until ONE half-up division; the region and
    type filters hit the dims before any fact join."""
    t = load(spark, sf_dir)
    europe = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_n = t.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    q4 = (net_expr() * 10000).cast("decimal(38,0)")
    j = (
        t.lineitem.join(
            t.part.filter(F.col("p_type") == "PROMO").select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(europe), F.col("c_nationkey") == F.col("cn_key"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
    )
    agg = j.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", q4).otherwise(F.lit(0)))
        .cast("decimal(38,0)")
        .alias("nation_q4"),
        F.sum(q4).cast("decimal(38,0)").alias("total_q4"),
    )
    return agg.select(
        "order_year",
        (F.col("nation_q4").cast("double") / 10000.0).alias("nation_volume"),
        (F.col("total_q4").cast("double") / 10000.0).alias("total_volume"),
        halfup_div(F.col("nation_q4") * 100, F.col("total_q4"), 6).alias(
            "mkt_share_pct"
        ),
    )


def q_linestatus_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line status, how many 1996-shipped lines
    belong to high-priority (URGENT/HIGH) vs other orders — the
    conditional-count join aggregate."""
    t = load(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    INCLUDING zero-order customers — the left-outer join whose filter
    (exclude urgent orders) must live in the ON clause, not WHERE (a
    WHERE would silently turn the join inner and drop the zero bucket)."""
    t = load(spark, sf_dir)
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        t.customer.join(t.orders, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) whose 1996-Q1 shipped revenue equals
    the maximum — the scalar-subquery-on-an-aggregate pattern.

    The max is a 1-row DataFrame broadcast into the filter; revenue
    stays an exact decimal so the equality is bit-identical across
    engines (a double max-compare could drop ties)."""
    t = load(spark, sf_dir)
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(net_expr()).alias("r"))
    )
    mx = rev.agg(F.max("r").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("r") == F.col("mx"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("r"), 2).cast("double").alias("total_revenue"),
        )
    )


def q_small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: weekly revenue potential from Brand#1 lines
    whose quantity is below 20% of that part's average quantity.

    The correlated avg is a window over l_partkey (high-cardinality —
    distributes evenly); the 20%-of-avg comparison is the exact integer
    cross-multiply qty·5·n < Σqty (quantities are integral), so no
    division happens until the single final halfup_div by 7."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("l_partkey")
    qty = F.col("l_quantity").cast("decimal(38,0)")
    cents = (dec2("l_extendedprice") * 100).cast("decimal(38,0)")
    pl = (
        t.lineitem.join(
            t.part.filter(F.col("p_brand") == "Brand#1").select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            cents.alias("cents"),
            (qty * 5 * F.count(F.lit(1)).over(w)).alias("lhs"),
            F.sum(qty).over(w).alias("rhs"),
        )
        .filter(F.col("lhs") < F.col("rhs"))
    )
    return pl.agg(
        halfup_div(F.sum("cents"), F.lit(700), 2).alias("avg_weekly_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: top-100 orders by price whose total line
    quantity exceeds 200, with their customer — the group-by-HAVING
    semi-join. Aggregate-then-join: only qualifying orderkeys (~5% of
    orders) flow into the orders/customer joins."""
    t = load(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    return (
        big.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q_brand_size_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three disjunctive (brand, size
    band, quantity band) conjunctions — the OR-of-ANDs predicate that
    exercises Catalyst's common-factor extraction (the partkey equi-join
    survives; per-branch filters evaluate join-side)."""
    t = load(spark, sf_dir)
    q = F.col("l_quantity")
    s = F.col("p_size")
    b = F.col("p_brand")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(10, 30) & q.between(10, 30))
        | ((b == "Brand#3") & s.between(20, 50) & q.between(20, 50))
    )
    return (
        t.lineitem.join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            money_sum(net_expr()).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_sole_late_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper
    (>60 days after order date) in a multi-supplier order — the
    EXISTS + NOT-EXISTS double correlation, expressed as one grouped
    pass plus a window instead of two correlated subqueries.

    Per (order, supplier): did it ship late at all. Per order (window
    over the high-cardinality orderkey): #suppliers and #late
    suppliers. The blame condition (late ∧ n_supp>1 ∧ n_late=1) then
    reads off those counts — semantically identical to Q21's
    exists(other supplier) ∧ not exists(other late supplier)."""
    t = load(spark, sf_dir)
    per_os = (
        t.lineitem.join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    blamed = (
        per_os.select(
            "l_suppkey",
            "is_late",
            F.count(F.lit(1)).over(w).alias("n_supp"),
            F.sum("is_late").over(w).alias("n_late"),
        )
        .filter(
            (F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_blamed_orders"))
    )
    return (
        blamed.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"),
                "n_blamed_orders")
        .orderBy(F.desc("n_blamed_orders"), F.asc("s_suppkey"))
        .limit(100)
    )


def q_never_urgent_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per nation, customers in three segments whose
    balance beats the segment-pool's positive-balance average and who
    never placed an URGENT order.

    The scalar avg is a 1-row (Σcents, n) broadcast; the comparison is
    the exact cross-multiply cents·n > Σcents (no division). The NOT
    EXISTS is a left-anti join against the urgent-order custkeys."""
    t = load(spark, sf_dir)
    pool = t.customer.filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD", "MACHINERY")
    )
    cents = (dec2("c_acctbal") * 100).cast("decimal(38,0)")
    stats = pool.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("pool_sum"), F.count(F.lit(1)).alias("pool_n")
    )
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        pool.crossJoin(F.broadcast(stats))
        .filter(cents * F.col("pool_n") > F.col("pool_sum"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(dec2("c_acctbal")).alias("total_acctbal"),
        )
    )


def q_min_cost_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each STANDARD mid-size part, the EUROPE
    supplier(s) whose best (minimum) offer price equals the part's
    region-wide minimum — the correlated-min subquery.

    The fixtures carry no partsupp table, so the part↔supplier relation
    (and the offer price) derives from lineitem history: offer =
    min(l_extendedprice) per (part, supplier), an exact decimal min.
    The correlated ``ps_supplycost = (SELECT min ...)`` becomes a window
    min over l_partkey — high-cardinality, so the window distributes
    evenly — and the region restriction prunes suppliers BEFORE the
    offer aggregation, exactly like the subquery's scoping."""
    t = load(spark, sf_dir)
    parts = t.part.filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    ).select("p_partkey", "p_name")
    euro_supp = (
        t.supplier.join(
            F.broadcast(
                t.nation.join(
                    F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    offers = (
        t.lineitem.select("l_partkey", "l_suppkey", dec2("l_extendedprice").alias("px"))
        .join(parts.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(euro_supp.select("s_suppkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("px").alias("offer"))
    )
    w = Window.partitionBy("l_partkey")
    best = offers.withColumn("best", F.min("offer").over(w)).filter(
        F.col("offer") == F.col("best")
    )
    return (
        best.join(euro_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "nation",
            "p_partkey",
            "p_name",
            F.col("offer").cast("double").alias("min_offer"),
            "s_suppkey",
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("nation"), F.asc("s_name"),
            F.asc("p_partkey"), F.asc("s_suppkey"),
        )
        .limit(100)
    )


def q_nation_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per supplier nation × order year, profit on parts
    whose name contains "red".

    No partsupp.supplycost exists, so cost is modeled as 50% of the
    part's retail price per unit. Exactness: everything runs in integer
    10^-4 currency units — net×10^4 is integral (scale-4 decimal), and
    qty · retail_cents · 50 is integral because retail is a 2-dp
    decimal — so the (possibly negative) profit sum is exact and the
    one double division at the end is deterministic."""
    t = load(spark, sf_dir)
    red_parts = t.part.filter(F.col("p_name").contains("red")).select(
        "p_partkey", "p_retailprice"
    )
    supp_n = t.supplier.join(
        F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    net4 = (net_expr() * 10000).cast("decimal(38,0)")
    cost4 = (
        F.col("l_quantity").cast("decimal(38,0)")
        * (dec2("p_retailprice") * 100).cast("decimal(38,0)")
        * 50
    )
    return (
        t.lineitem.join(red_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("nation", F.year("o_orderdate").alias("order_year"))
        .agg(
            (F.sum(net4 - cost4).cast("double") / F.lit(10000.0)).alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value from NATION_3
    suppliers exceeds 0.1% of that nation's total shipped value — the
    global-scalar-threshold HAVING subquery.

    The threshold is a 1-row aggregate broadcast into the filter; the
    comparison is the integer cross-multiply value4·1000 > total4, so
    no division (and no float) decides membership."""
    t = load(spark, sf_dir)
    n1_supp = t.supplier.join(
        F.broadcast(t.nation.filter(F.col("n_name") == "NATION_3")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    net4 = (net_expr() * 10000).cast("decimal(38,0)")
    vals = (
        t.lineitem.join(n1_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(net4).alias("value4"))
    )
    total = vals.agg(F.sum("value4").alias("total4"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("value4") * 1000 > F.col("total4"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value4").cast("double") / F.lit(10000.0)).alias("value"),
        )
    )


def q_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    for non-Brand#5, non-PROMO parts in selected sizes, excluding
    flagged suppliers (negative account balance stands in for Q16's
    complaint comment scan).

    The part↔supplier relation is the distinct (partkey, suppkey)
    projection of lineitem; the supplier exclusion is a left-anti join
    (NOT IN over a null-free key set). The countDistinct runs after the
    pair projection is deduplicated, so the shuffled state is one row
    per pair, not per lineitem."""
    t = load(spark, sf_dir)
    parts = t.part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = t.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        t.lineitem.select("l_partkey", "l_suppkey")
        .distinct()
        .join(flagged, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        pairs.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_2 suppliers who shipped more than half of
    some "red" part's total 1996 volume — the nested-IN availability
    subquery, with partsupp.availqty replaced by shipped-quantity
    dominance.

    Per (part, supplier) quantity sums roll up once; the per-part total
    is a window over the high-cardinality partkey; dominance is the
    integer cross-multiply 2·qty > total. The distinct dominant-supplier
    set then semi-joins the nation-filtered supplier dim."""
    t = load(spark, sf_dir)
    red_parts = t.part.filter(F.col("p_name").contains("red")).select("p_partkey")
    qty = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(red_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        qty.withColumn("total", F.sum("qty").over(w))
        .filter(F.col("qty") * 2 > F.col("total"))
        .select("l_suppkey")
        .distinct()
    )
    n2 = t.supplier.join(
        F.broadcast(t.nation.filter(F.col("n_name") == "NATION_2")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        n2.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
