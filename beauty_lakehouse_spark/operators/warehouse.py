"""Warehouse layer (reference L3 — declared but never implemented).

The reference pre-declares ``warehouse/fact_sales``
(notebooks/config/settings.ipynb:48) and states the intent — revenue
aggregation by category (01_dataLake_ingestion.ipynb:448) and
orders-per-customer as CLV input (01:420-423) — but ships an empty
notebook. This module designs that layer idiomatically on the fixture
star schema: a line-grain fact built from a multi-way star join, rollup
cubes, and the window functions CLV needs.

Scale notes:
- The star join broadcasts only the bounded dims (region, nation);
  customer/part/supplier joins are left to AQE (they grow with SF).
- Rollups are single-shuffle ``GROUPING SETS`` expansions (Spark Expand
  operator) — cheaper than unioning per-level aggregates.
- Window functions partition by customer — at 100 TB that's a
  well-distributed key (no global sort anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import dec2, halfup_div
from .relational import charge_expr, money_sum, net_expr


def build_fact_sales(t) -> DataFrame:
    """Line-grain fact table: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.

    The declared-but-unbuilt warehouse table of the reference
    (config/settings.ipynb:48), on fixture roles (FIXTURES.md)."""
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_custkey",
            "c_mktsegment",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
            net_expr().alias("net_price"),
            F.col("l_quantity").alias("quantity"),
        )
    )


def q_fact_sales_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region × segment × year × quarter over the full star
    join — the reference's 'revenue by category' intent (01:448) at
    warehouse grain."""
    t = load(spark, sf_dir)
    fact = build_fact_sales(t)
    return fact.groupBy("region", "c_mktsegment", "order_year", "order_quarter").agg(
        money_sum(F.col("net_price")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("quantity"), 1).alias("total_qty"),
    )


def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation, year): subtotal hierarchy in one shuffle.
    Null grouping levels are labeled so the oracle comparison is
    unambiguous (nation/year are never null in the data)."""
    t = load(spark, sf_dir)
    fact = build_fact_sales(t)
    return (
        fact.rollup("nation", "order_year")
        .agg(money_sum(F.col("net_price")).alias("revenue"))
        .select(
            F.coalesce(F.col("nation"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("order_year"), F.lit(-1)).alias("order_year"),
            "revenue",
        )
    )


def q_order_rank_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions (absent from the reference, required by its CLV
    intent 01:420-423): rank orders within customer by price; keep top 3.
    row_number over a deterministic ordering (price desc, key asc)."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t.orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def q_customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based running sum per customer ordered by order date — the
    running-CLV shape. Deterministic frame via (date, orderkey) ordering."""
    t = load(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(dec2("o_totalprice")).over(w), 2).cast("double").alias(
            "running_spend"
        ),
    )


def q_top_order_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window aggregate without ordering: each order's share of its
    customer's lifetime spend."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("o_custkey")
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        halfup_div(
            (dec2("o_totalprice") * 100).cast("decimal(38,0)"),
            (F.sum(dec2("o_totalprice")).over(w) * 100).cast("decimal(38,0)"),
            6,
        ).alias("spend_share"),
    )


def q_order_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref F8 date arithmetic (src/generate_data.py:124-127,268-273):
    order→ship latency histogram via datediff, with a date_add-derived
    within-30-days flag. Narrow scan, one shuffle on the join key."""
    t = load(spark, sf_dir)
    j = t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        j.select(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lat_days"),
            (
                F.col("l_shipdate").cast("date")
                <= F.date_add(F.col("o_orderdate").cast("date"), 30)
            ).alias("within_30"),
        )
        .groupBy("lat_days", "within_30")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


# ----- TPC-H-shaped headline queries (bench workhorses) ---------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan-heavy aggregate. Exercises
    predicate pushdown (shipdate filter reaches the parquet scan),
    column pruning, and partial/final hash aggregation."""
    t = load(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantities are integral → double sum is exact in any order
            F.round(F.sum("l_quantity"), 1).alias("sum_qty"),
            money_sum(dec2("l_extendedprice")).alias("sum_base_price"),
            money_sum(net_expr()).alias("sum_disc_price"),
            money_sum(charge_expr()).alias("sum_charge"),
            halfup_div(
                F.sum("l_quantity").cast("decimal(38,0)"), F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            halfup_div(
                (F.sum(dec2("l_extendedprice")) * 100).cast("decimal(38,0)"),
                F.count(F.lit(1)) * 100,
                6,
            ).alias("avg_price"),
            halfup_div(
                (F.sum(dec2("l_discount")) * 100).cast("decimal(38,0)"),
                F.count(F.lit(1)) * 100,
                6,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter → 2 joins → agg → top 10.
    Customer filter prunes before the join; top-k fuses."""
    t = load(spark, sf_dir)
    res = (
        t.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(net_expr()).alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )
    return res.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10)


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join where customer and supplier must sit in
    the same nation; revenue per nation. Broadcasts the bounded dims."""
    t = load(spark, sf_dir)
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        # same-nation predicate folded into the join condition (not a
        # post-join filter) so it participates in join planning directly
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(money_sum(net_expr()).alias("revenue"))
    )


def q_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gaps per customer via lag() — repeat-purchase cadence
    (the CLV input the reference declares, 01:420-423). Exact-integer
    day arithmetic → fully oracle-comparable."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    prev = F.lag(F.col("o_orderdate").cast("date")).over(w)
    return (
        t.orders.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate").cast("date"), prev).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )


def q_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (segment × orderstatus): all 4 grouping combinations in one
    shuffle (Spark Expand operator), with grouping_id disambiguating
    subtotal levels."""
    t = load(spark, sf_dir)
    j = t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey")).select(
        "c_mktsegment", "o_orderstatus", "o_totalprice"
    )
    return (
        j.cube("c_mktsegment", "o_orderstatus")
        .agg(
            money_sum(dec2("o_totalprice")).alias("total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .select(
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("segment"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "total_sales",
            "n_orders",
            "gid",
        )
    )


def q_order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90 order value per market segment WITHOUT percentile
    functions (whose interpolation rules differ across engines):
    discrete percentile = the value at ceil(q·n) in the (value, key)
    sort order — pure integer row selection, engine-exact.

    Scale shape: the naive form windows row_number over
    partitionBy(c_mktsegment) — 5 distinct segments, so at 100x each
    reducer sorts ~1/5 of ALL orders (the classic low-cardinality-window
    killer). This form never sorts raw rows per segment:

    1. bucket each order by floor(o_totalprice) and count per
       (segment, bucket) — map-side-combined aggregate, output is
       #distinct-buckets rows (bounded by the price range, not by n);
    2. cumulative counts over buckets locate the bucket containing the
       k-th value and its within-bucket rank (the only
       partitionBy(segment) window runs over the aggregated bucket
       table, ≤ ~1e6 rows per segment regardless of data size);
    3. re-scan only rows in the ≤ 2 hit buckets per segment (broadcast
       semi-join filter — pushed to the scan) and row_number just those
       few rows to pick the exact value.

    Bucketing by floor(value) respects the (value, key) sort order, so
    the selection is exactly the naive window's answer."""
    t = load(spark, sf_dir)
    j = (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_mktsegment", "o_totalprice", "o_orderkey")
    )
    b = j.withColumn("bucket", F.floor("o_totalprice").cast("long"))
    bucket_counts = b.groupBy("c_mktsegment", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wseg = Window.partitionBy("c_mktsegment").orderBy("bucket")
    cum = bucket_counts.select(
        "c_mktsegment",
        "bucket",
        "cnt",
        F.sum("cnt").over(wseg).alias("cum_end"),
    ).withColumn("cum_before", F.col("cum_end") - F.col("cnt"))
    totals = bucket_counts.groupBy("c_mktsegment").agg(F.sum("cnt").alias("n"))
    targets = totals.select(
        "c_mktsegment",
        F.explode(
            F.array(
                F.struct(
                    F.lit("p50").alias("quantile"),
                    F.ceil(F.col("n") * 0.5).alias("k"),
                ),
                F.struct(
                    F.lit("p90").alias("quantile"),
                    F.ceil(F.col("n") * 0.9).alias("k"),
                ),
            )
        ).alias("t"),
    ).select("c_mktsegment", F.col("t.quantile").alias("quantile"), F.col("t.k").alias("k"))
    hits = (
        targets.join(cum, "c_mktsegment")
        .filter((F.col("cum_before") < F.col("k")) & (F.col("k") <= F.col("cum_end")))
        .select(
            "c_mktsegment",
            "quantile",
            "bucket",
            (F.col("k") - F.col("cum_before")).alias("within_rank"),
        )
    )
    # narrow re-scan: only rows whose (segment, bucket) holds a target
    narrowed = b.join(F.broadcast(hits), ["c_mktsegment", "bucket"])
    wb = Window.partitionBy("c_mktsegment", "quantile").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        narrowed.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == F.col("within_rank"))
        .select(
            "c_mktsegment",
            "quantile",
            F.col("o_totalprice").alias("value"),
        )
    )


def q_sales_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((segment, year), (segment), (year), ()) —
    the general form behind rollup/cube, exercised directly via the
    DataFrame ``groupingSets`` API (Spark 4). One shuffle through the
    Expand operator: each input row is replicated once per set with the
    ungrouped keys nulled, then a single partial-merge hash aggregate —
    cheaper than unioning 4 per-level aggregates (4 scans, 4 shuffles).

    ``grouping_id`` disambiguates real NULL keys from subtotal rows
    (none here: keys are non-null, coalesced to 'ALL'/-1 for display)."""
    t = load(spark, sf_dir)
    j = t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey")).select(
        "c_mktsegment",
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_totalprice",
    )
    return (
        j.groupingSets(
            [["c_mktsegment", "order_year"], ["c_mktsegment"], ["order_year"], []],
            "c_mktsegment",
            "order_year",
        )
        .agg(
            money_sum(dec2("o_totalprice")).alias("total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .select(
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("segment"),
            F.coalesce(F.col("order_year"), F.lit(-1)).alias("order_year"),
            "total_sales",
            "n_orders",
            "gid",
        )
    )


def q_customer_spend_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile assignment over customer lifetime spend — EXACTLY
    ntile(10) by (spend desc, custkey) order, computed WITHOUT a
    global window sort (the one-reducer scale-killer a naive
    ``ntile().over(Window.orderBy(...))`` is, even over the customer
    aggregate — 10⁹ customers is still 10⁹ rows on one reducer).

    Two-level exact global rank, same decomposition as
    ``training_order_shuffle`` / ``order_value_percentiles``:

    1. bucket = −floor(spend): ascending bucket order IS descending
       spend order (every row of a lower bucket outranks every row of
       a higher one), and the bucket table is bounded by the price
       RANGE, not the customer count;
    2. per-bucket counts → cumulative offsets (the only unpartitioned
       window, over the bounded bucket table);
    3. row_number WITHIN each bucket + offset = exact global rank;
    4. ntile's uneven-tile arithmetic (first n%10 tiles one larger)
       as integer expressions — matches ntile(10) bit for bit, which
       the DuckDB oracle (a real NTILE) verifies every gate run."""
    t = load(spark, sf_dir)
    spend = t.orders.groupBy("o_custkey").agg(
        F.round(F.sum(dec2("o_totalprice")), 2).alias("spend_dec")
    ).withColumn("bucket", (-F.floor("spend_dec")).cast("long"))
    offsets = (
        spend.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("cnt").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    wb = Window.partitionBy("bucket").orderBy(
        F.desc("spend_dec"), F.asc("o_custkey")
    )
    n_total = spend.agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        spend.join(F.broadcast(offsets), "bucket")
        .withColumn("rk", F.row_number().over(wb) + F.col("offset"))
        .crossJoin(F.broadcast(n_total))
    )
    # integer ntile: base size b = n div 10, remainder r = n mod 10;
    # ranks ≤ r·(b+1) fall in the first r (larger) tiles, the rest in
    # size-b tiles. ceil(x/y) = (x+y-1) div y; b can be 0 when n < 10,
    # guarded (that branch is then never taken, but ANSI mode evaluates
    # eagerly on the taken rows only — greatest() keeps it total).
    b = F.expr("n div 10")
    r = F.col("n") % 10
    head = r * (b + 1)
    tile = F.when(
        F.col("rk") <= head,
        F.expr("(rk + (n div 10) + 1 - 1) div ((n div 10) + 1)"),
    ).otherwise(
        r
        + F.expr(
            "(rk - (n % 10) * ((n div 10) + 1) + greatest(n div 10, 1L) - 1) "
            "div greatest(n div 10, 1L)"
        )
    )
    return ranked.select(
        "o_custkey",
        F.col("spend_dec").cast("double").alias("total_spend"),
        tile.cast("int").alias("decile"),
    )


def q_lorenz_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CURVE of customer lifetime spend in deciles — the
    concentration picture behind the scalar `revenue_gini`: decile d's
    cumulative share of total spend, poorest first ("the bottom 50% of
    customers carry X% of revenue"). Exact ntile(10) by (spend asc,
    custkey asc), integer cents throughout, cumulative share in ppm
    via exact floor division — bit-identical to the DuckDB twin.

    Same two-level exact-global-rank decomposition as
    `customer_spend_ntile` (ascending flavor): bucket by floor(spend)
    so ascending bucket order IS ascending spend order, per-bucket
    counts give cumulative offsets over the BOUNDED bucket table (the
    only unpartitioned window), row_number within bucket + offset is
    the exact global rank, and ntile's uneven-tile arithmetic is
    integer expressions — no 10⁹-customer single-reducer sort.

    Output: 10 rows (decile, n_customers, decile_cents, cum_cents,
    cum_share_ppm)."""
    from ..functions import _idiv

    t = load(spark, sf_dir)
    spend = (
        t.orders.groupBy("o_custkey")
        .agg(
            (F.sum(dec2("o_totalprice")) * 100).cast("long").alias("cents")
        )
        .withColumn("bucket", F.expr("cents div 100"))
    )
    offsets = (
        spend.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("cnt").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    wb = Window.partitionBy("bucket").orderBy(
        F.asc("cents"), F.asc("o_custkey")
    )
    n_total = spend.agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        spend.join(F.broadcast(offsets), "bucket")
        .withColumn("rk", F.row_number().over(wb) + F.col("offset"))
        .crossJoin(F.broadcast(n_total))
    )
    head = (F.col("n") % 10) * (F.expr("n div 10") + 1)
    tile = F.when(
        F.col("rk") <= head,
        F.expr("(rk + (n div 10) + 1 - 1) div ((n div 10) + 1)"),
    ).otherwise(
        F.col("n") % 10
        + F.expr(
            "(rk - (n % 10) * ((n div 10) + 1) + greatest(n div 10, 1L) - 1) "
            "div greatest(n div 10, 1L)"
        )
    )
    per = (
        ranked.withColumn("decile", tile.cast("int"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("decile_cents"),
        )
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )  # 10-row table: the unpartitioned window is bounded by design
    tot = per.agg(F.sum("decile_cents").alias("tot"))
    return (
        per.withColumn("cum_cents", F.sum("decile_cents").over(wc))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "decile_cents",
            F.col("cum_cents").cast("long").alias("cum_cents"),
            # lift to DECIMAL(38,0) BEFORE the 1e6 ppm multiply — in
            # long it overflows once total cents pass ~9.2e12 (hit at
            # the syn10x tier)
            _idiv(
                F.col("cum_cents").cast("decimal(38,0)") * F.lit(1_000_000),
                F.col("tot"),
            ).alias("cum_share_ppm"),
        )
        .orderBy("decile")
    )


def q_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated-subquery shape (orders costlier than their
    customer's average) in one window pass — no self-join, no
    re-aggregation. The comparison is exact integer cross-
    multiplication (price·n > Σprice in cents), sidestepping the
    avg's division entirely."""
    t = load(spark, sf_dir)
    w = Window.partitionBy("o_custkey")
    cents = (dec2("o_totalprice") * 100).cast("decimal(38,0)")
    return (
        t.orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            (F.count(F.lit(1)).over(w) * cents).alias("lhs"),
            F.sum(cents).over(w).alias("rhs"),
        )
        .filter(F.col("lhs") > F.col("rhs"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def q_revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-grain revenue trend with a trailing 3-month moving average.
    All heavy lifting is the monthly pre-aggregate (partial-merge, one
    shuffle); the trailing window then runs over ~tens of month rows —
    a bounded single-partition sort by construction, not a
    low-cardinality-window trap. Cents stay integer until the final
    half-up division."""
    t = load(spark, sf_dir)
    monthly = t.orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("int")
        .alias("month_key")
    ).agg(
        (F.sum(dec2("o_totalprice")) * 100).cast("long").alias("rev_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month_key").rowsBetween(-2, 0)
    return monthly.select(
        "month_key",
        "n_orders",
        (F.col("rev_cents").cast("double") / 100.0).alias("revenue"),
        halfup_div(
            F.sum("rev_cents").over(w),
            F.count(F.lit(1)).over(w) * 100,
            4,
        ).alias("moving_avg_3m"),
    )


def q_revenue_forecast_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure predicate-pushdown aggregate — revenue
    delta from discount removal on a year of small-quantity lines.
    Every filter (date range, discount band, quantity) reaches the
    parquet scan; the aggregate is a single partial-merge sum with NO
    grouping key. The discount-band compare runs on exact decimals
    (an IEEE 0.05 ≤ x ≤ 0.07 would misclassify boundary rows)."""
    t = load(spark, sf_dir)
    d = dec2("l_discount")
    lo = F.lit("0.05").cast("decimal(12,2)")
    hi = F.lit("0.07").cast("decimal(12,2)")
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (d >= lo)
            & (d <= hi)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(dec2("l_extendedprice") * d), 2)
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one quarter — 3-way fact join + bounded nation broadcast + top-k
    (TakeOrdered, no global sort). Deterministic tiebreak on custkey."""
    t = load(spark, sf_dir)
    j = (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            t.orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    rev = j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        money_sum(net_expr()).alias("revenue"),
        F.count(F.lit(1)).alias("n_return_lines"),
    )
    return rev.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio — the share of one
    month's revenue from PROMO parts. Both sums stay integer cents
    until ONE exact half-up division (no double accumulation)."""
    t = load(spark, sf_dir)
    j = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).join(t.part, F.col("l_partkey") == F.col("p_partkey"))
    # net is a scale-4 decimal: x10^4 integerizes EXACTLY (a x100 cast
    # would half-up-round and the two engines round casts differently)
    q4 = (net_expr() * 10000).cast("decimal(38,0)")
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", q4).otherwise(F.lit(0)))
        .cast("decimal(38,0)")
        .alias("promo_q4"),
        F.sum(q4).cast("decimal(38,0)").alias("total_q4"),
    )
    return agg.select(
        (F.col("promo_q4").cast("double") / 10000.0).alias("promo_revenue"),
        (F.col("total_q4").cast("double") / 10000.0).alias("total_revenue"),
        halfup_div(
            F.col("promo_q4") * 100, F.col("total_q4"), 6
        ).alias("promo_share_pct"),
    )


def q_top_suppliers_by_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-side star rollup: top-25 suppliers by shipped net
    revenue with their nation (broadcast dim). The supplier dim joins
    AFTER the fact aggregate — aggregate-then-join moves |suppliers|
    rows through the join instead of |lineitems| (the cardinality-
    reduction-first rule that matters at 100 TB)."""
    t = load(spark, sf_dir)
    per_supp = t.lineitem.groupBy("l_suppkey").agg(
        money_sum(net_expr()).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        per_supp.join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"),
                "revenue", "n_lines")
        .orderBy(F.desc("revenue"), F.asc("s_suppkey"))
        .limit(25)
    )


def q_customer_spend_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier detection without a single float: customers
    whose lifetime spend sits more than 3 population standard
    deviations from their market segment's mean customer spend.

    |x − μ| > 3σ is decided by the integer cross-multiply
    ``(n·x − S)² > 9·(n·Q − S²)`` (multiply through by n²; S = Σcents,
    Q = Σcents²), so the flag is bit-identical across engines — no
    float mean, no float variance, no sqrt. Sums run in DECIMAL(38,0).

    Scale: the fact collapses to one row per customer first (partial-
    aggregated groupBy), segment stats are a 5-row dim broadcast back
    into a streaming filter — no wide shuffle after the rollup. The
    raw order totals are uniform (max |z| = √3 by construction), so
    the anomaly signal only exists at the aggregated grain — which is
    where real fraud/whale detection runs anyway."""
    t = load(spark, sf_dir)
    cents = (dec2("o_totalprice") * 100).cast("decimal(38,0)")
    per_cust = (
        t.orders.groupBy("o_custkey")
        .agg(F.sum(cents).alias("cents"), F.count(F.lit(1)).alias("n_orders"))
        .join(
            t.customer.select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    stats = per_cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("q"),
    )
    dev = F.col("cents") * F.col("n") - F.col("s")  # n·x − S  (scaled by n)
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")  # n²σ²
    return (
        per_cust.join(F.broadcast(stats), "c_mktsegment")
        .filter(dev * dev > F.lit(9) * var_n2)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("c_custkey"),
            (F.col("cents").cast("double") / F.lit(100.0)).alias("total_spend"),
            "n_orders",
            (F.col("cents") * F.col("n") > F.col("s")).alias("above_mean"),
        )
    )


def q_order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 20-bin histogram of order totals with bin bounds and
    half-up percentage shares — the profiling primitive behind every
    data-distribution dashboard.

    Bin assignment is pure integer arithmetic on cents against the
    (min, max) range — ``(cents − lo) · 20 intdiv (hi − lo + 1)`` —
    so bucket membership is bit-identical across engines (a float
    width_bucket can disagree at bin edges). The (min, max) pair is a
    1-row broadcast; the histogram itself is one partial-aggregated
    groupBy over 20 groups."""
    t = load(spark, sf_dir)
    cents = (dec2("o_totalprice") * 100).cast("decimal(38,0)")
    bounds = t.orders.agg(
        F.min(cents).alias("lo"), F.max(cents).alias("hi")
    )
    width = F.col("hi") - F.col("lo") + 1
    binned = (
        t.orders.select(cents.alias("cents"))
        .crossJoin(F.broadcast(bounds))
        .select(
            ((F.col("cents") - F.col("lo")) * 20 - ((F.col("cents") - F.col("lo")) * 20) % width)
            .cast("decimal(38,0)")
            .alias("num"),
            width.alias("w"),
            "lo",
        )
        .select((F.col("num") / F.col("w")).cast("int").alias("bin"), "lo", "w")
    )
    total = t.orders.count()
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .join(F.broadcast(bounds), F.lit(True))
        .select(
            "bin",
            ((F.col("lo") + F.col("bin") * (F.col("hi") - F.col("lo") + 1) / 20)
             .cast("decimal(38,0)").cast("double") / 100.0).alias("bin_lo_approx"),
            "n_orders",
            halfup_div(F.col("n_orders") * 100, F.lit(total), 4).alias("pct"),
        )
    )


#: Z-order bits per dimension (16+16 -> 32-bit Morton key).
ZORDER_BITS = 16


def q_orders_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustering keys for the orders fact — the multi-column
    data-layout primitive behind `OPTIMIZE ... ZORDER BY (custkey,
    orderdate)`: normalize each column to 16 bits over its min/max
    range (exact integer scaling), interleave the bits into a 32-bit
    Morton key, and report the key per order. Feeding this key to
    ``tables.compact(cluster_by=...)`` sort-clusters row groups so
    min/max pruning works on BOTH columns at once — the reason
    lakehouses z-order at all.

    Everything is integer-exact (epoch-DAY units so the 65535 range
    lift stays far inside int64, range scaling via the subtraction
    floor-div trick, bit interleave as a 16-step fold), so the keys
    hash-match the SQL twin bit-for-bit.

    Scale: a narrow expression scan plus a 1-row min/max bounds
    broadcast; the interleave is constant work per row inside
    whole-stage codegen."""
    from ..functions import _idiv, epoch_us

    t = load(spark, sf_dir)
    day = _idiv(
        epoch_us(F.col("o_orderdate").cast("timestamp")),
        F.lit(86_400_000_000),
    )
    o = t.orders.select("o_orderkey", F.col("o_custkey").alias("ck"), day.alias("d"))
    bounds = o.agg(
        F.min("ck").alias("ck0"), F.max("ck").alias("ck1"),
        F.min("d").alias("d0"), F.max("d").alias("d1"),
    )
    scale = (1 << ZORDER_BITS) - 1
    j = o.crossJoin(F.broadcast(bounds)).select(
        "o_orderkey",
        _idiv(
            (F.col("ck") - F.col("ck0")) * scale,
            F.greatest(F.col("ck1") - F.col("ck0"), F.lit(1)),
        ).alias("zx"),
        _idiv(
            (F.col("d") - F.col("d0")) * scale,
            F.greatest(F.col("d1") - F.col("d0"), F.lit(1)),
        ).alias("zy"),
    )
    interleave = F.aggregate(
        F.sequence(F.lit(0), F.lit(ZORDER_BITS - 1)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.call_function(
            "shiftleft",
            F.call_function("shiftright", F.col("zx"), b).bitwiseAND(F.lit(1)),
            b * 2,
        )
        + F.call_function(
            "shiftleft",
            F.call_function("shiftright", F.col("zy"), b).bitwiseAND(F.lit(1)),
            b * 2 + 1,
        ),
    )
    return j.select("o_orderkey", "zx", "zy", interleave.alias("zkey"))


#: q_revenue_gini bucket shift over customer-spend cents (the bucket
#: table is bounded by the spend range >> 20, not the customer count).
GINI_BUCKET_SHIFT = 20


def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer-spend concentration per market
    segment — the inequality/concentration KPI (0 = spend spread
    evenly, →1 = a few whales carry the segment) — as the exact
    rational G = Σ(2i−n−1)·xᵢ / (n·Σx) over ascending-sorted spend.

    The global ascending rank i is the two-level bucket-offset
    decomposition (bucket = cents >> 20; the cumulative window runs
    over the (segment, bucket) table — bounded by the spend RANGE —
    and row_number only within buckets), so no segment ever sorts on
    one reducer. Numerator terms are DECIMAL(38,0) products; the final
    value is one exact half-up division. Ties rank by custkey —
    deterministic, and G is tie-order-invariant anyway (equal x).

    Scale: customer-grain aggregate → bucket-grain window → broadcast
    offsets → one segment-grain aggregate."""
    from pyspark.sql import Window

    from ..functions import dec2, halfup_div

    d38 = "decimal(38,0)"
    t = load(spark, sf_dir)
    spend = (
        t.orders.groupBy("o_custkey")
        .agg((F.sum(dec2("o_totalprice")) * 100).cast("long").alias("cents"))
        .join(
            t.customer.select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"), "o_custkey", "cents"
        )
        .withColumn("bkt", F.shiftright("cents", GINI_BUCKET_SHIFT))
        .cache()
    )
    sizes = spend.groupBy("segment", "bkt").agg(F.count(F.lit(1)).alias("k"))
    offs = sizes.select(
        "segment",
        "bkt",
        F.sum("k")
        .over(
            Window.partitionBy("segment")
            .orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("off"),
    ).fillna(0, subset=["off"])
    rn = F.row_number().over(
        Window.partitionBy("segment", "bkt").orderBy("cents", "o_custkey")
    )
    ranked = (
        spend.withColumn("rn", rn)
        .join(F.broadcast(offs), ["segment", "bkt"])
        .select("segment", "cents", (F.col("off") + F.col("rn")).alias("i"))
    )
    per_seg = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("cents").cast(d38) * (F.lit(2) * F.col("i")).cast(d38))
        .alias("s2i"),
    )
    num = (
        F.col("s2i")
        - (F.col("n") + 1).cast(d38) * F.col("total_cents").cast(d38)
    )
    return per_seg.select(
        "segment",
        F.col("n").cast("long").alias("n_customers"),
        "total_cents",
        halfup_div(
            num, F.col("n").cast(d38) * F.col("total_cents").cast(d38), 6
        ).alias("gini"),
    )


def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — THE canonical e-commerce analytics
    operator for this domain: per customer, Recency (epoch day of the
    last order), Frequency (order count), Monetary (lifetime spend),
    each scored into exact quintiles (1 = top fifth) and combined into
    the classic 3-digit segment code (111 = best customers, 555 =
    lapsed low-value).

    Exactness: every quintile is bit-for-bit ntile(5) over
    (metric DESC, custkey) — the DuckDB oracle runs a REAL ntile — but
    computed WITHOUT a global window sort: the same two-level
    bucket-offset rank decomposition as q_customer_spend_ntile, once
    per metric (bucket = negated metric, so ascending bucket order is
    descending metric order; bucket tables are bounded by the VALUE
    ranges — days, order counts, price units — not the customer
    count). Three bounded-grid ranks + one join tree; no reducer ever
    sorts the customer table."""
    t = load(spark, sf_dir)
    base = (
        t.orders.groupBy("o_custkey")
        .agg(
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")), F.lit("1970-01-01").cast("date")
            ).cast("long").alias("last_day"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(dec2("o_totalprice")), 2).alias("spend_dec"),
        )
        .cache()  # feeds three rank pipelines + output
    )

    def rank_desc(metric: str, out: str):
        """Exact global rank by (metric desc, custkey asc), two-level."""
        d = base.select(
            "o_custkey", metric, (-F.col(metric)).cast("long").alias("bkt")
        )
        if metric == "spend_dec":
            d = base.select(
                "o_custkey",
                metric,
                (-F.floor("spend_dec")).cast("long").alias("bkt"),
            )
        offs = (
            d.groupBy("bkt")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn(
                "off",
                F.coalesce(
                    F.sum("cnt").over(
                        Window.orderBy("bkt").rowsBetween(
                            Window.unboundedPreceding, -1
                        )
                    ),
                    F.lit(0),
                ),
            )
            .select("bkt", "off")
        )
        wb = Window.partitionBy("bkt").orderBy(
            F.desc(metric), F.asc("o_custkey")
        )
        return (
            d.join(F.broadcast(offs), "bkt")
            .withColumn(out, F.row_number().over(wb) + F.col("off"))
            .select("o_custkey", out)
        )

    n_total = base.agg(F.count(F.lit(1)).alias("n"))

    def tile5(rk: str):
        # exact ntile(5): first n%5 tiles are one larger
        return (
            F.when(
                F.col(rk) <= (F.col("n") % 5) * (F.expr("n div 5") + 1),
                F.expr(f"({rk} + (n div 5) + 1 - 1) div ((n div 5) + 1)"),
            )
            .otherwise(
                F.col("n") % 5
                + F.expr(
                    f"({rk} - (n % 5) * ((n div 5) + 1) "
                    "+ greatest(n div 5, 1L) - 1) div greatest(n div 5, 1L)"
                )
            )
            .cast("int")
        )

    joined = (
        base.join(rank_desc("last_day", "rk_r"), "o_custkey")
        .join(rank_desc("n_orders", "rk_f"), "o_custkey")
        .join(rank_desc("spend_dec", "rk_m"), "o_custkey")
        .crossJoin(F.broadcast(n_total))
    )
    r_q, f_q, m_q = tile5("rk_r"), tile5("rk_f"), tile5("rk_m")
    return joined.select(
        "o_custkey",
        "last_day",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("spend_dec").cast("double").alias("total_spend"),
        r_q.alias("r_score"),
        f_q.alias("f_score"),
        m_q.alias("m_score"),
        (r_q * 100 + f_q * 10 + m_q).cast("int").alias("rfm_segment"),
    )


def q_part_stock_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running stock balance per part WITHOUT a sequential scan:
    treating each lineitem as a stock movement in shipdate order
    (returns restock +qty, shipments draw −qty), the floor-at-zero
    balance ``b_t = max(0, b_{t−1} + d_t)`` looks inherently sequential
    — but it has the exact closed form ``b_t = S_t − min(0, min_{k≤t}
    S_k)`` (prefix sum minus clamped prefix minimum; induction:
    ``max(0, S_t − M_{t−1}) = S_t − min(S_t, M_{t−1}) = S_t − M_t``).
    So ONE part-partitioned window pass computes what a naive
    implementation would fold row-by-row — the general recipe for
    running-state operators at 100 TB: find the scan identity, never
    ship rows to a sequential reducer.

    Output per part: movement count, net quantity, the raw running
    minimum, and the final clamped balance. Quantities are exact
    integers (the fixture's l_quantity is integral; the decimal lift
    makes the cast engine-portable)."""
    t = load(spark, sf_dir)
    qty = dec2("l_quantity").cast("long")
    delta = F.when(F.col("l_returnflag") == "R", qty).otherwise(-qty)
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    run = t.lineitem.select(
        "l_partkey",
        delta.alias("d"),
        F.sum(delta).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("s"),
    )
    return run.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_moves"),
        F.sum("d").cast("long").alias("net_qty"),
        F.min("s").cast("long").alias("lowest_raw"),
        (
            F.sum("d") - F.least(F.lit(0).cast("long"), F.min("s"))
        )
        .cast("long")
        .alias("final_balance"),
    )


#: Skyline price-axis bucket width: $1 in cents. The fixture's
#: p_retailprice spans $900-$1000, so the prune table is ~100 rows;
#: the width is a constant of the PRICE DOMAIN (not the row count), so
#: the bucket table stays bounded at any corpus scale.
PARETO_BUCKET_CENTS = 100


def q_part_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (pareto frontier): parts where no other part has
    (retail price ≤, lifetime revenue ≥) with at least one strict —
    the classic "cheaper AND sells more" dominance query.

    The naive encoding is a NOT EXISTS self-join — O(n²) pairs (the
    DuckDB oracle runs exactly that, affordable at sf0.01). The
    scale-safe plan uses the distributive skyline property (a dominated
    point is always dominated by some frontier point, so pruning
    dominated points never changes the answer):

    1. bucket the price axis at a domain constant ($1); per-bucket
       max revenue is a map-side-combinable aggregate onto a
       price-range-bounded table (~100 rows);
    2. prefix-max over strictly-lower buckets (window over the bucket
       table, bounded) broadcast back: any part whose revenue ≤ that
       prefix-max is dominated by a strictly-cheaper part — at 100 TB
       this discards ~everything without a shuffle of the part table;
    3. exact finish over the surviving candidates with two windows:
       ``max(rev) RANGE OVER price < mine`` (strictly-cheaper
       dominators) and ``max(rev) PARTITION BY price`` (same-price
       dominators). Survivors are the rows that beat their bucket's
       lower-prefix max — empirically O(log) per bucket, orders of
       magnitude below the input.

    Money is exact: price in integer cents, revenue in exact scale-4
    decimal units (``net_expr`` sums) ×10⁴ as int64, so dominance
    compares integers bit-identically on both engines. Parts with no
    sales enter at revenue 0 (left join) — they can still be on the
    frontier as the cheapest do-nothing point."""
    t = load(spark, sf_dir)
    rev = t.lineitem.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        (F.sum(net_expr()) * 10000).cast("long").alias("rev_e4")
    )
    m = (
        t.part.select(
            "p_partkey",
            (dec2("p_retailprice") * 100).cast("long").alias("price_cents"),
        )
        .join(rev, "p_partkey", "left")
        .select(
            "p_partkey",
            "price_cents",
            F.coalesce("rev_e4", F.lit(0).cast("long")).alias("rev_e4"),
        )
        .withColumn(
            "bucket", F.expr(f"price_cents div {PARETO_BUCKET_CENTS}")
        )
    )
    bmax = m.groupBy("bucket").agg(F.max("rev_e4").alias("bmax"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bpre = bmax.select(
        "bucket", F.max("bmax").over(wb).alias("pmax_lower_bucket")
    )
    cand = m.join(F.broadcast(bpre), "bucket").filter(
        F.col("pmax_lower_bucket").isNull()
        | (F.col("rev_e4") > F.col("pmax_lower_bucket"))
    )
    w_lower = (
        Window.orderBy("price_cents").rangeBetween(
            Window.unboundedPreceding, -1
        )
    )
    w_same = Window.partitionBy("price_cents")
    fin = cand.select(
        "p_partkey",
        "price_cents",
        "rev_e4",
        F.max("rev_e4").over(w_lower).alias("best_lower"),
        F.max("rev_e4").over(w_same).alias("best_same"),
    )
    return fin.filter(
        (F.col("best_lower").isNull() | (F.col("best_lower") < F.col("rev_e4")))
        & (F.col("best_same") == F.col("rev_e4"))
    ).select("p_partkey", "price_cents", "rev_e4")


def q_segment_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted quartiles of line net price per market segment,
    weighted by quantity — the weighted-median operator (each line
    counts ``l_quantity`` times, so a 40-unit line moves the median
    40× more than a 1-unit line).

    Exact nearest-rank-lower semantics: the weighted q-quantile is the
    smallest value v with ``cumweight(≤v) ≥ q·total`` — evaluated as
    integer cross-multiplications (``4·cum ≥ q·4·total``), no division,
    no interpolation, so both engines agree bit-for-bit on int64 value
    units (net price ×10⁴) and int64 weights.

    Scale shape: the star join feeds a (segment, value)-grain
    pre-aggregation — map-side combinable, collapsing the fact table to
    the distinct-value grain BEFORE any window — then the cumulative
    weight runs per segment over that collapsed table, and a single
    conditional-min aggregate picks all three quantiles in one pass.
    No global sort; the only windows are segment-partitioned."""
    t = load(spark, sf_dir)
    li = (
        t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("segment"),
            (net_expr() * 10000).cast("long").alias("v_e4"),
            dec2("l_quantity").cast("long").alias("wgt"),
        )
    )
    g = li.groupBy("segment", "v_e4").agg(
        F.sum("wgt").cast("long").alias("w")
    )
    w_cum = (
        Window.partitionBy("segment")
        .orderBy("v_e4")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("segment")
    c = g.select(
        "segment",
        "v_e4",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_tot).alias("total"),
    )
    four = F.lit(4).cast("long")
    return c.groupBy("segment").agg(
        F.max("total").cast("long").alias("total_weight"),
        F.min(
            F.when(four * F.col("cum") >= F.col("total"), F.col("v_e4"))
        ).alias("wq25_e4"),
        F.min(
            F.when(
                F.lit(2).cast("long") * F.col("cum") >= F.col("total"),
                F.col("v_e4"),
            )
        ).alias("wmedian_e4"),
        F.min(
            F.when(
                four * F.col("cum") >= F.lit(3).cast("long") * F.col("total"),
                F.col("v_e4"),
            )
        ).alias("wq75_e4"),
    )


def q_nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ORDINARY LEAST SQUARES trend — the regression member
    of the analytics family (moving average smooths, forecast_delta
    what-ifs, this fits): for every nation, the closed-form OLS slope
    of yearly revenue over year, entirely in exact fixed point so the
    DuckDB twin reproduces every slope bit-for-bit.

    The yearly grid is exact integer cents (HALF_UP round of the exact
    decimal net sum — the `revenue_rollup` convention — times 100);
    the slope (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) is one exact
    DECIMAL(38,0)/HUGEINT division in micro-cents/year, truncated
    TOWARD ZERO on both engines via a sign split (Spark's decimal
    intdiv truncates where DuckDB's ``//`` floors — the one
    negative-operand divergence in the fixed-point kit, so |num| is
    divided and the sign reapplied).

    Scale: one map-side-combinable aggregate builds the
    ≤ nations×years grid; the regression is a second bounded aggregate
    over that grid — no window, no sort, no collect. Output: (nation,
    n_years, year_min, year_max, total_cents,
    slope_micro_cents_per_year) for nations with ≥ 2 years (the slope
    denominator needs x-variance)."""
    from ..functions import _idiv

    t = load(spark, sf_dir)
    fact = build_fact_sales(t)
    yearly = fact.groupBy("nation", "order_year").agg(
        (F.round(F.sum("net_price"), 2) * 100).cast("long").alias("cents")
    )
    x = F.col("order_year").cast("decimal(38,0)")
    y = F.col("cents").cast("decimal(38,0)")
    g = yearly.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_years"),
        F.min("order_year").alias("year_min"),
        F.max("order_year").alias("year_max"),
        F.sum("cents").alias("total_cents"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n = F.col("n_years").cast("decimal(38,0)")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        num < 0, -_idiv((-num) * F.lit(1_000_000), den)
    ).otherwise(_idiv(num * F.lit(1_000_000), den))
    return g.filter(F.col("n_years") >= 2).select(
        "nation",
        "n_years",
        "year_min",
        "year_max",
        F.col("total_cents").cast("long").alias("total_cents"),
        slope.alias("slope_micro_cents_per_year"),
    )


#: Rendezvous shard counts before/after scale-out. 8 → 9 exercises the
#: minimal-movement property at the smallest interesting step.
HRW_SHARDS = 8


def q_shard_rendezvous_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing shard assignment and
    its scale-out movement audit — THE consistent-placement primitive
    for distributed tables (Thaler & Ravishankar 1998; what Ceph's
    CRUSH and most shard routers build on): doc → argmax_s
    hash(doc, s). Adding shard N+1 moves ONLY the docs whose new
    argmax IS the new shard (expected 1/(N+1) of the corpus); nothing
    reshuffles between survivors — the property this operator measures
    and its pytest pins.

    Both assignments (8 and 9 shards) are pure map-side expressions:
    the per-shard hashes are a literal array of (portable md5 hash,
    shard) structs and the argmax is ``array_max`` — no explode, no
    shuffle, no UDF; lexicographic struct compare breaks (impossible
    at 60-bit, but deterministic) ties toward the higher shard id on
    BOTH engines.

    Scale: one pass over the corpus, two bounded (≤ 9-row) aggregates.

    Output per shard: (shard, n_docs_8, n_docs_9, n_arrivals) —
    n_arrivals > 0 only at the new shard if rendezvous is working."""
    from ..functions import portable_hash64

    t = load(spark, sf_dir)

    def hs(s: int):
        return F.struct(
            portable_hash64(
                F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(str(s)))
            ).alias("h"),
            F.lit(s).cast("int").alias("s"),
        )

    arr9 = F.array(*[hs(s) for s in range(HRW_SHARDS + 1)])
    assigned = t.documents.select(
        F.array_max(F.slice(arr9, 1, HRW_SHARDS))["s"].alias("shard8"),
        F.array_max(arr9)["s"].alias("shard9"),
    )
    g8 = assigned.groupBy(F.col("shard8").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs_8")
    )
    g9 = assigned.groupBy(F.col("shard9").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs_9"),
        F.sum(
            (F.col("shard8") != F.col("shard9")).cast("long")
        ).alias("n_arrivals"),
    )
    return (
        g8.join(g9, "shard", "full_outer")
        .select(
            "shard",
            F.coalesce("n_docs_8", F.lit(0)).alias("n_docs_8"),
            F.coalesce("n_docs_9", F.lit(0)).alias("n_docs_9"),
            F.coalesce("n_arrivals", F.lit(0)).alias("n_arrivals"),
        )
        .orderBy("shard")
    )


#: Zone-map pruning probe predicates: (name, lo_cents, hi_cents) range
#: queries against o_totalprice. Fixed literals so the report is a
#: deterministic, oracle-checkable artifact.
ZONE_PREDICATES = [
    ("top_decile_value", 45_000_000, 50_000_000),
    ("mid_band_value", 20_000_000, 30_000_000),
    ("micro_orders", 0, 100_000),
]


def q_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map data skipping report — the min/max-statistics pruning
    every columnar lakehouse (parquet row groups, Delta/Iceberg file
    stats, ClickHouse marks) lives on: per partition (order year),
    record the zone map (row count, min/max order value in cents),
    then evaluate each probe range predicate against the map alone —
    ``pruned`` = the whole partition provably contains no match
    (max < lo or min > hi), decided WITHOUT touching the rows.

    ``n_matches`` (the actual match count) rides along so the report
    is self-auditing: pruned = 1 ⟹ n_matches = 0 is the zone-map
    soundness invariant, pytest-pinned and hash-verified — a stats
    bug that would silently drop rows at 100 TB fails here.

    Scale: ONE map-side-combinable pass builds the year-grain zone
    maps with per-predicate conditional counts folded into the same
    aggregate; the predicate × partition expansion is bounded
    (3 × years).

    Output: (predicate, order_year, n_rows, min_cents, max_cents,
    pruned, n_matches)."""
    from ..functions import dec2

    t = load(spark, sf_dir)
    cents = (dec2("o_totalprice") * 100).cast("long")
    zm = (
        t.orders.select(
            F.year("o_orderdate").alias("order_year"),
            cents.alias("c"),
        )
        .groupBy("order_year")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
            *[
                F.sum(
                    F.col("c").between(lo, hi).cast("long")
                ).alias(f"m_{name}")
                for name, lo, hi in ZONE_PREDICATES
            ],
        )
    )
    preds = F.array(
        *[
            F.struct(
                F.lit(name).alias("predicate"),
                F.lit(lo).cast("long").alias("lo"),
                F.lit(hi).cast("long").alias("hi"),
            )
            for name, lo, hi in ZONE_PREDICATES
        ]
    )
    e = zm.select("*", F.explode(preds).alias("p"))
    n_matches = F.coalesce(
        *[
            F.when(F.col("p.predicate") == name, F.col(f"m_{name}"))
            for name, _, _ in ZONE_PREDICATES
        ]
    )
    return e.select(
        F.col("p.predicate").alias("predicate"),
        "order_year",
        "n_rows",
        "min_cents",
        "max_cents",
        (
            (F.col("max_cents") < F.col("p.lo"))
            | (F.col("min_cents") > F.col("p.hi"))
        )
        .cast("int")
        .alias("pruned"),
        n_matches.alias("n_matches"),
    ).orderBy("predicate", "order_year")


#: Numeric band-join half-width in cents: parts whose prices differ by
#: at most this are "price twins". Also the bucket width — candidates
#: can then only live in the same or adjacent bucket.
PRICE_BAND_CENTS = 100


def q_part_price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric BAND JOIN without a cartesian product — the range-join
    shape (|xₐ − x_b| ≤ δ) that trips naive engines into O(n²) nested
    loops: same-type part pairs priced within ``PRICE_BAND_CENTS`` of
    each other (competitive-pricing twins). Spark has no native band
    join, so this is the classic bucket decomposition: bucket width =
    band width δ, so every qualifying pair lives in the same or an
    adjacent bucket; the LEFT side probes (own, own+1) buckets, the
    RIGHT side sits at its own bucket, and the join is EQUI on
    (type, probe bucket) — a hash join Catalyst can shuffle on, never
    a theta join. Each pair is minted exactly once with no distinct:
    same-bucket pairs by id order, cross-bucket pairs only from the
    lower bucket's +1 probe (the adjacent-cell convention the LSH /
    ANN cell families use).

    Scale: candidates per row are bounded by bucket occupancy (skewed
    price points would be salted the same way skewed join keys are);
    work is Σ per-bucket products, never |part|².

    Output: top-100 twins by (diff_cents asc, ids) —
    (part_a, part_b, p_type, cents_a, cents_b, diff_cents)."""
    t = load(spark, sf_dir)
    base = t.part.select(
        F.col("p_partkey").alias("pk"),
        F.col("p_type").alias("ptype"),
        (dec2("p_retailprice") * 100).cast("long").alias("cents"),
    ).withColumn(
        "bucket", (F.col("cents") / F.lit(PRICE_BAND_CENTS)).cast("long")
    )
    left = base.select(
        "pk",
        "ptype",
        "cents",
        "bucket",
        F.explode(
            F.array(F.col("bucket"), F.col("bucket") + 1)
        ).alias("probe"),
    )
    right = base.select(
        F.col("pk").alias("pk_r"),
        F.col("ptype").alias("ptype_r"),
        F.col("cents").alias("cents_r"),
        F.col("bucket").alias("bucket_r"),
    )
    pairs = (
        left.join(
            right,
            (F.col("ptype") == F.col("ptype_r"))
            & (F.col("probe") == F.col("bucket_r")),
        )
        .filter(
            F.abs(F.col("cents") - F.col("cents_r"))
            <= F.lit(PRICE_BAND_CENTS)
        )
        .filter(
            F.when(
                F.col("bucket") == F.col("bucket_r"),
                F.col("pk") < F.col("pk_r"),
            ).otherwise(F.col("probe") == F.col("bucket_r"))
        )
        .filter(F.col("pk") != F.col("pk_r"))
    )
    out = pairs.select(
        F.least("pk", "pk_r").alias("part_a"),
        F.greatest("pk", "pk_r").alias("part_b"),
        F.col("ptype").alias("p_type"),
        F.when(F.col("pk") < F.col("pk_r"), F.col("cents"))
        .otherwise(F.col("cents_r"))
        .alias("cents_a"),
        F.when(F.col("pk") < F.col("pk_r"), F.col("cents_r"))
        .otherwise(F.col("cents"))
        .alias("cents_b"),
        F.abs(F.col("cents") - F.col("cents_r")).alias("diff_cents"),
    )
    return out.orderBy("diff_cents", "part_a", "part_b").limit(100)


def q_status_bitmap_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap secondary index + set algebra over it — the
    low-cardinality-column indexing primitive columnar warehouses use
    (Oracle bitmap indexes, Druid/Pinot inverted bitmaps, roaring
    bitmaps in ClickHouse): per order STATUS, a bitmap over the
    orderkey space packed into 32-bit words carried in int64 (word =
    key >> 5, bit = key & 31 — bit 31 stays clear of the int64 sign
    bit, which the two engines would otherwise treat differently),
    built with ONE map-side-combinable ``bit_or`` aggregate
    per (status, word). The algebra is then word-grain: cardinality =
    Σ popcount(word), intersection = popcount(a AND b) summed over the
    word-aligned join — never a row-level set operation.

    The report is self-auditing: statuses partition the orders, so
    every pairwise AND popcount must be 0 and Σ per-status popcounts
    must equal the table count — the invariants the pytest pins and
    the oracle hash-verifies.

    Scale: the bitmap is |keyspace|/32 words per status (itself
    shardable by word range); algebra cost is words, not rows.

    Output: (status_a, status_b, n_words_a, pop_a, pop_b, pop_and) for
    each ordered status pair plus the (s, s) diagonal."""
    t = load(spark, sf_dir)
    words = (
        t.orders.select(
            F.col("o_orderstatus").alias("status"),
            F.shiftright(F.col("o_orderkey"), 5).alias("word_id"),
            # pyspark's shiftleft wants a literal bit count; the
            # per-row shift goes through expr()
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), "
                "CAST(o_orderkey % 32 AS INT))"
            ).alias("bit"),
        )
        .groupBy("status", "word_id")
        .agg(F.bit_or("bit").alias("w"))
    )
    a = words.select(
        F.col("status").alias("status_a"),
        "word_id",
        F.col("w").alias("wa"),
    )
    b = words.select(
        F.col("status").alias("status_b"),
        "word_id",
        F.col("w").alias("wb"),
    )
    j = a.join(b, "word_id").filter(F.col("status_a") <= F.col("status_b"))
    return (
        j.groupBy("status_a", "status_b")
        .agg(
            F.count(F.lit(1)).alias("n_common_words"),
            F.sum(F.bit_count("wa")).alias("pop_a_common"),
            F.sum(F.bit_count("wb")).alias("pop_b_common"),
            F.sum(F.bit_count(F.col("wa").bitwiseAND(F.col("wb")))).alias(
                "pop_and"
            ),
        )
        .orderBy("status_a", "status_b")
    )


#: Theil–Sen pairwise-slope denominator bound: year gaps are at most
#: YEAR_SPAN_LCM's divisors, so slope·LCM is an EXACT integer (no
#: division loss before the median). lcm(1..10) covers a 10-year grid.
YEAR_SPAN_LCM = 2520


def q_revenue_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of yearly nation revenue — the
    median-of-pairwise-slopes estimator (Sen 1968) next to the OLS
    ``nation_revenue_trend``: a single crazy year drags an OLS slope
    arbitrarily far, but breaks the Theil–Sen median only past 29%
    contamination. Same fact definition as the OLS twin, so the two
    slopes are directly comparable.

    Exact fixed point with ZERO division before the median: a pair's
    slope (Δcents / Δyears) is carried as Δcents · (LCM/Δyears) —
    ``YEAR_SPAN_LCM`` = lcm(1..10) is divisible by every year gap on
    a ≤ 10-year grid (guarded), so the scaled slope is an exact
    integer and the median is an exact order statistic (lower median
    on even counts; equal values make the rank choice immaterial).

    Scale: the yearly grid is ≤ nations × years rows; the pair
    expansion is the bounded within-nation self-join (≤ C(10,2) per
    nation); the median window is PARTITIONED BY nation.

    Output: (nation, n_years, n_pairs, ts_slope_lcm — cents/year
    scaled by 2520)."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    fact = build_fact_sales(t)
    yearly = fact.groupBy("nation", "order_year").agg(
        (F.round(F.sum("net_price"), 2) * 100).cast("long").alias("cents")
    )
    a = yearly.select(
        "nation",
        F.col("order_year").alias("xi"),
        F.col("cents").alias("yi"),
    )
    b = yearly.select(
        F.col("nation").alias("nation_b"),
        F.col("order_year").alias("xj"),
        F.col("cents").alias("yj"),
    )
    pairs = a.join(
        b,
        (F.col("nation") == F.col("nation_b"))
        & (F.col("xi") < F.col("xj")),
    ).select(
        "nation",
        (F.col("xj") - F.col("xi")).alias("dx"),
        (F.col("yj") - F.col("yi")).alias("dy"),
    )
    guarded_dx = F.when(
        F.col("dx") > 10,
        F.raise_error(
            F.lit(
                "theil_sen contract violated: year gap > 10 breaks the "
                "exact LCM scaling; widen YEAR_SPAN_LCM"
            )
        ).cast("long"),
    ).otherwise(F.col("dx").cast("long"))
    scored = pairs.select(
        "nation",
        (
            F.col("dy")
            * (F.lit(YEAR_SPAN_LCM).cast("long") / guarded_dx).cast(
                "long"
            )
        ).alias("slope_lcm"),
    )
    wn = Window.partitionBy("nation").orderBy("slope_lcm")
    stats = scored.withColumn("rk", F.row_number().over(wn))
    n_per = scored.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    # lower median: the value at rank (n_pairs + 1) // 2 — with ties
    # the rank choice is immaterial, the VALUE is deterministic
    med = stats.join(F.broadcast(n_per), "nation").filter(
        F.col("rk") == F.floor((F.col("n_pairs") + 1) / 2)
    )
    ny = yearly.groupBy("nation").agg(F.count(F.lit(1)).alias("n_years"))
    return (
        med.join(F.broadcast(ny), "nation")
        .select(
            "nation",
            "n_years",
            "n_pairs",
            F.col("slope_lcm").alias("ts_slope_lcm"),
        )
        .orderBy("nation")
    )


def q_brand_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log demand curve per brand — price elasticity estimated
    from the natural experiment the discount ladder provides: at
    discount d the effective price index is (100 − d)%, so regressing
    ln(quantity sold) on ln(100 − d) across the 11 discount levels
    yields ε = %ΔQ / %ΔP (ε < 0 ⇒ discounts move volume; the
    econometric capstone next to the linear ``nation_revenue_trend``).

    Exact fixed point: both axes go through the integer ``ln_micro``
    (x = ln_micro(100−d), y = ln_micro(Σ qty) — quantities are integral
    by fixture contract, pytest-pinned), the OLS slope is one
    DECIMAL(38,0)/HUGEINT rational, sign-split to truncate toward zero
    identically on both engines, surfaced at milli (elasticities are
    O(1–100) here because the price lever is only 10% wide).

    Scale: ONE map-side-combinable shuffle to the ≤ brands × 11 grid;
    the regression runs per brand on ≤ 11 points.

    Output: (brand, n_points, total_qty, elasticity_milli) for brands
    with ≥ 2 observed discount levels."""
    from ..functions import _idiv, ln_micro

    t = load(spark, sf_dir)
    li = t.lineitem.join(
        t.part.select("p_partkey", "p_brand"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    cells = (
        li.select(
            F.col("p_brand").alias("brand"),
            F.round(F.col("l_discount") * 100).cast("int").alias("d"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .groupBy("brand", "d")
        .agg(F.sum("qty").alias("q"))
        .filter(F.col("q") >= 1)
    )
    pts = cells.select(
        "brand",
        "q",
        ln_micro(F.lit(100) - F.col("d"), F.lit(1)).alias("x"),
        ln_micro(F.col("q"), F.lit(1)).alias("y"),
    )
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = pts.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("q").alias("total_qty"),
        F.sum(dd(F.col("x"))).alias("sx"),
        F.sum(dd(F.col("y"))).alias("sy"),
        F.sum(dd(F.col("x")) * F.col("y")).alias("sxy"),
        F.sum(dd(F.col("x")) * F.col("x")).alias("sxx"),
    )
    n = F.col("n_points").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")) * F.lit(1000)
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(num < 0, -_idiv(-num, den)).otherwise(
        _idiv(num, den)
    )
    return (
        g.filter(F.col("n_points") >= 2)
        .select(
            "brand",
            "n_points",
            "total_qty",
            slope.alias("elasticity_milli"),
        )
        .orderBy("brand")
    )


#: Range-partitioner design: target partition count for the layout.
RANGE_PARTS = 8


def q_range_partition_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioner LAYOUT DESIGN over order date — the boundary
    computation behind every range-partitioned table and Spark's own
    RangePartitioner: cut the date axis so each of ``RANGE_PARTS``
    partitions holds ≈ 1/8 of the rows, then report what the cuts
    actually achieve (a date axis is lumpy — whole days cannot be
    split, so the report carries each partition's true row count and
    its micro deviation from the ideal share; THAT number is what you
    check before committing a layout at 100 TB).

    Exact: boundaries are order statistics over the DAY-grain
    cumulative grid (bounded by the calendar, never a raw-row sort) —
    partition p takes days with cum_rows in (p·N/8, (p+1)·N/8]
    rationally (cum·8 ≤ N·(p+1) in cross-multiplied integers, no
    division); deviation is one trunc division at micro.

    Output: (partition, day_lo, day_hi, n_rows, dev_micro)."""
    from pyspark.sql import Window

    from ..functions import _idiv

    t = load(spark, sf_dir)
    days = (
        t.orders.select(F.to_date("o_orderdate").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g = days.withColumn("cum", F.sum("n").over(w))
    tot = g.agg(F.max("cum").alias("nn"))
    # day d belongs to partition p = ceil(cum*P/N) - 1, computed as
    # the exact integer (cum*P + N - 1) // N - 1 — a decimal-division
    # ceil could round at the boundary; integer arithmetic cannot
    p_expr = _idiv(
        F.col("cum").cast("decimal(38,0)") * F.lit(RANGE_PARTS)
        + F.col("nn")
        - 1,
        F.col("nn").cast("decimal(38,0)"),
    ) - 1
    parts = (
        g.crossJoin(F.broadcast(tot))
        .withColumn("p", p_expr)
        .groupBy("p")
        .agg(
            F.min("day").alias("d_lo"),
            F.max("day").alias("d_hi"),
            F.sum("n").alias("n_rows"),
            F.max("nn").alias("nn"),
        )
    )
    dev = F.col("n_rows").cast("decimal(38,0)") * F.lit(
        RANGE_PARTS * 1_000_000
    ) - F.col("nn").cast("decimal(38,0)") * F.lit(1_000_000)
    signed = F.when(
        dev < 0,
        -_idiv(-dev, F.col("nn").cast("decimal(38,0)")),
    ).otherwise(_idiv(dev, F.col("nn").cast("decimal(38,0)")))
    return parts.select(
        F.col("p").cast("int").alias("partition"),
        F.date_format("d_lo", "yyyy-MM-dd").alias("day_lo"),
        F.date_format("d_hi", "yyyy-MM-dd").alias("day_hi"),
        "n_rows",
        signed.alias("dev_micro"),
    ).orderBy("partition")


#: Bayesian-average prior strength: the smoothed rate behaves like the
#: raw rate once a brand has ~this many observed items.
BAYES_PRIOR_STRENGTH = 50


def q_brand_return_bayes_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian-average ranking of brands by RETURN RATE — the
    small-sample-safe ranking formula (the "IMDB top-250" estimator /
    Beta-binomial posterior mean with a pooled prior): a brand with 2
    returns out of 3 items must not outrank one with 200 of 1000, so
    every rate is shrunk toward the global rate g with prior strength
    C = ``BAYES_PRIOR_STRENGTH``: shrunk = (k + C·g)/(n + C).

    Exact fixed point: g at micro from pooled integer counts, then
    shrunk_micro = (k·10⁶ + C·g_micro) // (n + C) — one trunc division
    per brand after one global quantization (both engines identical).
    Raw rate rides along so the shrinkage is visible.

    Scale: one map-side-combinable shuffle to brand grain (≤ |brands|
    rows); the global rate is a whitelisted 1-row broadcast.

    Output: (brand, n_items, n_returned, raw_micro, shrunk_micro),
    every brand, ordered by (shrunk desc, brand)."""
    from ..functions import _idiv

    t = load(spark, sf_dir)
    b = (
        t.lineitem.join(
            t.part.select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (F.col("l_returnflag") == "R").cast("long")
            ).alias("n_returned"),
        )
    )
    g = b.agg(
        F.sum("n_items").alias("tn"), F.sum("n_returned").alias("tk")
    ).select(
        _idiv(
            F.col("tk").cast("decimal(38,0)") * F.lit(1_000_000),
            F.col("tn"),
        ).alias("g_micro")
    )
    c = BAYES_PRIOR_STRENGTH
    out = b.crossJoin(F.broadcast(g)).select(
        "brand",
        "n_items",
        "n_returned",
        _idiv(
            F.col("n_returned").cast("decimal(38,0)") * F.lit(1_000_000),
            F.col("n_items"),
        ).alias("raw_micro"),
        _idiv(
            F.col("n_returned").cast("decimal(38,0)") * F.lit(1_000_000)
            + F.lit(c) * F.col("g_micro"),
            (F.col("n_items") + F.lit(c)).cast("decimal(38,0)"),
        ).alias("shrunk_micro"),
    )
    return out.orderBy(F.desc("shrunk_micro"), "brand")


def q_revenue_pareto_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 concentration cut — how many parts carry 80% of
    revenue (the Pareto number every catalog/assortment review opens
    with), computed exactly: parts ranked by revenue cents desc (id
    tie-break), the cut is the FIRST rank whose running share reaches
    80% (cross-multiplied — cum·5 ≥ total·4, no division), reported
    with the exact share achieved at the cut.

    Scale: one shuffle to part grain; the ranking window runs over the
    PART dimension (bounded relative to the fact table — the
    ``zipf_law_fit`` convention), never fact rows.

    Output (1 row): (n_parts, total_cents, n_parts_80, share_micro,
    cut_part_share_micro — the share of the single part at the
    cut)."""
    from pyspark.sql import Window

    from ..functions import _idiv, dec2

    t = load(spark, sf_dir)
    per_part = (
        t.lineitem.select(
            "l_partkey",
            (dec2("l_extendedprice") * 100).cast("long").alias("c"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("c").alias("rev"))
    )
    w = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = per_part.withColumn("cum", F.sum("rev").over(w)).withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("rev"), "l_partkey"))
    )
    tot = per_part.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev").alias("total_cents"),
    )
    hit = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(
            F.col("cum").cast("decimal(38,0)") * 5
            >= F.col("total_cents").cast("decimal(38,0)") * 4
        )
        .orderBy("rk")
        .limit(1)
    )
    return hit.select(
        "n_parts",
        F.col("total_cents").cast("long").alias("total_cents"),
        F.col("rk").cast("long").alias("n_parts_80"),
        _idiv(
            F.col("cum").cast("decimal(38,0)") * F.lit(1_000_000),
            F.col("total_cents"),
        ).alias("share_micro"),
        _idiv(
            F.col("rev").cast("decimal(38,0)") * F.lit(1_000_000),
            F.col("total_cents"),
        ).alias("cut_part_share_micro"),
    )


def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of supplier revenue
    within each part type — the antitrust/market-structure number
    (HHI = Σ shareᵢ², 10⁴ scale: < 1500 competitive, > 2500
    concentrated): which catalog segments depend on one supplier is a
    supply-chain risk readout, not just economics.

    Exact fixed point: with per-supplier revenue cents rᵢ and type
    total T, HHI·10⁴ = 10⁴·Σ rᵢ² // T² — ONE trunc division per type
    from two exact integer aggregates (Σ rᵢ² in DECIMAL(38,0);
    squares of per-supplier cents ~ 10¹⁸ would overflow int64).

    Scale: one shuffle to (type, supplier) grain, one to type grain;
    no windows.

    Output: (p_type, n_suppliers, total_cents, hhi_x10k), every type,
    ordered by (hhi desc, type)."""
    from ..functions import _idiv, dec2

    t = load(spark, sf_dir)
    ts = (
        t.lineitem.join(
            t.part.select("p_partkey", "p_type"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_type",
            "l_suppkey",
            (dec2("l_extendedprice") * 100).cast("long").alias("c"),
        )
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum("c").alias("r"))
    )
    g = ts.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("r").alias("total_cents"),
        F.sum(F.col("r").cast("decimal(38,0)") * F.col("r")).alias("sq"),
    )
    return g.select(
        "p_type",
        "n_suppliers",
        F.col("total_cents").cast("long").alias("total_cents"),
        _idiv(
            F.col("sq") * F.lit(10_000),
            F.col("total_cents").cast("decimal(38,0)")
            * F.col("total_cents"),
        ).alias("hhi_x10k"),
    ).orderBy(F.desc("hhi_x10k"), "p_type")


def q_interpurchase_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase regularity per customer — the squared
    coefficient of variation CV² = var/mean² of the gaps between
    consecutive orders (CV² ≪ 1: clockwork replenisher, ≈ 1:
    Poisson-random, ≫ 1: bursty) — the behavioral feature behind
    "subscription-like" customer detection, with no sqrt anywhere
    (CV² is the monotone form).

    Exact fixed point: gaps in whole days from one per-customer lag
    window; with n gaps, S = Σg, Q = Σg², CV²·10⁶ = 10⁶·(n·Q − S²)·n
    // ((n−1)·S²) — sample variance over the squared mean, one trunc
    division per customer. Zero gaps (same-day repeat orders) are
    legal; only S = 0 (ALL orders on one day) is excluded, along with
    customers having fewer than 3 gaps (too few for a stable
    variance).

    Scale: per-customer windows only; the output is bounded to the
    top-100 most regular repeat customers (CV² asc, id tie-break).

    Output: (o_custkey, n_gaps, mean_gap_milli, cv2_micro)."""
    from pyspark.sql import Window

    from ..functions import _idiv

    t = load(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date"), "o_orderkey"
    )
    gaps = (
        t.orders.select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .select("o_custkey", F.col("g").cast("long").alias("g"))
    )
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    st = gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("g").alias("s"),
        F.sum(dd(F.col("g")) * F.col("g")).alias("q"),
    ).filter((F.col("n_gaps") >= 3) & (F.col("s") > 0))
    out = st.select(
        "o_custkey",
        "n_gaps",
        _idiv(dd(F.col("s")) * F.lit(1000), F.col("n_gaps")).alias(
            "mean_gap_milli"
        ),
        _idiv(
            (dd(F.col("n_gaps")) * F.col("q") - dd(F.col("s")) * F.col("s"))
            * F.col("n_gaps")
            * F.lit(1_000_000),
            (dd(F.col("n_gaps")) - 1) * F.col("s") * F.col("s"),
        ).alias("cv2_micro"),
    )
    return out.orderBy("cv2_micro", "o_custkey").limit(100)


#: Selectivity-audit geometry: equi-width bucket count, equi-depth
#: bucket count, and the three literal range predicates audited
#: (cents). Literals are round dollar amounts inside the fixtures'
#: o_totalprice range at every SF.
SELAUDIT_WIDTH_BUCKETS = 16
SELAUDIT_DEPTH_BUCKETS = 8
SELAUDIT_PREDICATES = [
    ("le_20k", None, 2_000_000),
    ("btw_10k_30k", 1_000_000, 3_000_000),
    ("ge_50k", 5_000_000, None),
]


def q_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HISTOGRAM SELECTIVITY AUDIT — the optimizer-statistics
    diagnostic next to `q_join_cardinality_estimate`: for three fixed
    range predicates over order value, compare the TRUE row count
    against the estimate each of the two classic histogram families
    produces (equi-WIDTH: fixed value ranges, skew-sensitive;
    equi-DEPTH: fixed row mass, the one real optimizers keep), with
    uniform-within-bucket linear interpolation — the textbook
    selectivity estimator (Selinger et al. 1979; Piatetsky-Shapiro &
    Connell 1984). The audit quantifies which histogram earns its
    bytes on this data.

    Exact fixed point: both histograms are built on the DISTINCT-CENTS
    value grid (bounded domain, the repo's standard grid trick), the
    interpolation is one truncating integer division per (predicate,
    histogram), and errors are micro-scaled signed trunc divisions.

    Scale: one shuffle to the cents grid; cumulative windows run over
    the bounded VALUE DOMAIN, never raw rows; histograms are ≤ 24
    rows; predicates are literal arithmetic over those rows.

    Output (3 rows): (predicate, actual_rows, est_width, est_depth,
    err_width_micro, err_depth_micro)."""
    from ..functions import _idiv

    t = load(spark, sf_dir)
    cents = (dec2("o_totalprice") * 100).cast("long")
    grid = (
        t.orders.select(cents.alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = grid.agg(
        F.min("c").alias("cmin"),
        F.max("c").alias("cmax"),
        F.sum("n").alias("n_total"),
    )
    g = grid.crossJoin(F.broadcast(bounds))
    wb = SELAUDIT_WIDTH_BUCKETS
    db = SELAUDIT_DEPTH_BUCKETS
    # equi-width histogram: bucket = (c - cmin) div W, W = ceil(span/wb)
    width = (
        g.withColumn(
            "w", F.expr(f"(cmax - cmin + {wb}) div {wb}")
        )
        .withColumn("b", F.expr("(c - cmin) div w"))
        .groupBy("b")
        .agg(
            F.min(F.expr("cmin + b * w")).alias("lo"),
            F.min(F.expr("cmin + (b + 1) * w - 1")).alias("hi"),
            F.sum("n").alias("nb"),
        )
    )
    # equi-depth histogram: bucket = ceil(cum * db / N) over the grid
    wcum = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    depth = (
        g.withColumn("cum", F.sum("n").over(wcum))
        .withColumn(
            "b", F.expr(f"(cum * {db} + n_total - 1) div n_total")
        )
        .groupBy("b")
        .agg(
            F.min("c").alias("lo"),
            F.max("c").alias("hi"),
            F.sum("n").alias("nb"),
        )
    )

    def est(hist: DataFrame, lo_lit, hi_lit) -> DataFrame:
        """Uniform-within-bucket estimate of rows in [lo_lit, hi_lit]
        (None = unbounded) as one aggregate over the bucket table:
        per-bucket trunc((nb * overlap) div span), pure BIGINT
        (nb * span ≤ ~1e13 at any test SF — far inside int64)."""
        lo = F.lit(lo_lit if lo_lit is not None else -(1 << 62))
        hi = F.lit(hi_lit if hi_lit is not None else (1 << 62))
        return hist.select(
            F.greatest(F.col("lo"), lo).alias("ov_lo"),
            F.least(F.col("hi"), hi).alias("ov_hi"),
            F.col("nb"),
            (F.col("hi") - F.col("lo") + 1).alias("span"),
        ).agg(
            F.sum(
                F.when(
                    F.col("ov_hi") >= F.col("ov_lo"),
                    F.expr("(nb * (ov_hi - ov_lo + 1)) div span"),
                ).otherwise(F.lit(0).cast("long"))
            )
            .cast("long")
            .alias("est")
        )

    rows = []
    for name, plo, phi in SELAUDIT_PREDICATES:
        lo = plo if plo is not None else -(1 << 62)
        hi = phi if phi is not None else (1 << 62)
        actual = g.agg(
            F.sum(
                F.when(
                    (F.col("c") >= F.lit(lo)) & (F.col("c") <= F.lit(hi)),
                    F.col("n"),
                ).otherwise(F.lit(0))
            ).alias("actual_rows")
        )
        ew = est(width, plo, phi).withColumnRenamed("est", "est_width")
        ed = est(depth, plo, phi).withColumnRenamed("est", "est_depth")
        one = (
            actual.crossJoin(F.broadcast(ew))
            .crossJoin(F.broadcast(ed))
            .crossJoin(F.broadcast(bounds.select("n_total")))
        )
        rows.append(
            one.select(
                F.lit(name).alias("predicate"),
                F.col("actual_rows").cast("long").alias("actual_rows"),
                "est_width",
                "est_depth",
                _idiv(
                    (F.col("est_width") - F.col("actual_rows")).cast(
                        "decimal(38,0)"
                    )
                    * F.lit(1_000_000),
                    F.greatest(F.col("actual_rows"), F.lit(1)),
                ).alias("err_width_micro"),
                _idiv(
                    (F.col("est_depth") - F.col("actual_rows")).cast(
                        "decimal(38,0)"
                    )
                    * F.lit(1_000_000),
                    F.greatest(F.col("actual_rows"), F.lit(1)),
                ).alias("err_depth_micro"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("predicate")


#: Columns profiled by the encoding-stats report, with the partition
#: and order keys defining the run geometry (runs are counted within
#: each order-day, ordered by orderkey — the curated zone's layout).
ENCODING_COLUMNS = ["o_orderpriority", "o_orderstatus"]


def q_column_encoding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN ENCODING ADVISOR — the storage-layout diagnostic next to
    `q_orders_zorder_keys`: for each low-cardinality orders column,
    measure what dictionary and run-length encoding would actually
    achieve on the curated layout (rows clustered by order day,
    ordered by orderkey within the day): distinct-value count →
    dictionary code width in bits (ceil log2 via the exact
    length(bin(ndv-1)) both engines share), and the RUN count under
    the layout → the RLE compression ratio. The report is the input to
    a write-path encoding choice at 100 TB (a 5-value priority column
    at 3 bits/row vs 8-byte strings is a 20x scan-width cut).

    Scale: run counting is a lag comparison inside per-DAY windows
    (partitioned, bounded), one aggregate per column; never a global
    sort.

    Output: (column, n_rows, n_distinct, n_runs, dict_bits_per_value,
    rle_runs_ppm) ordered by column."""
    t = load(spark, sf_dir)
    rows = []
    for col in ENCODING_COLUMNS:
        day = F.col("o_orderdate").cast("date")
        w = Window.partitionBy(day).orderBy("o_orderkey")
        runs = t.orders.select(
            day.alias("d"),
            "o_orderkey",
            F.col(col).alias("v"),
            (
                F.lag(F.col(col)).over(w).isNull()
                | (F.lag(F.col(col)).over(w) != F.col(col))
            )
            .cast("long")
            .alias("is_run_start"),
        )
        agg = runs.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("v").alias("n_distinct"),
            F.sum("is_run_start").alias("n_runs"),
        )
        rows.append(
            agg.select(
                F.lit(col).alias("column"),
                "n_rows",
                "n_distinct",
                "n_runs",
                F.when(F.col("n_distinct") <= 1, F.lit(0))
                .otherwise(
                    F.length(F.bin(F.col("n_distinct") - 1))
                )
                .cast("long")
                .alias("dict_bits_per_value"),
                halfup_div(
                    F.col("n_runs") * 1_000_000, F.col("n_rows"), 0
                ).alias("rle_runs_ppm"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("column")


#: Mann–Kendall runs at DAILY grain: the pair expansion is bounded by
#: the CALENDAR (TPC-H order dates span ~2,400 days at every SF), so
#: the O(n²) pair join is constant-size with respect to data volume.
MK_MAX_DAYS = 20_000


def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN–KENDALL trend test (Mann 1945; Kendall 1975) on the daily
    revenue series — the nonparametric monotone-trend detector next to
    the slope estimators (`revenue_theil_sen` gives the magnitude,
    `nation_revenue_trend` the OLS fit, this one the SIGNIFICANCE):

        S    = Σ_{i<j} sgn(x_j − x_i)
        Var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)   (= 18 · Var(S))
        z²   = 18 · S² / Var18

    Everything is exact integer: S is a signed count, the tie-corrected
    variance is carried ×18 so the textbook /18 never happens, and z²
    is emitted in ppm via exact truncating division of non-negative
    ints (S² ≥ 0 — no signed-division semantics to reconcile). The
    trend direction rides as a label so the sign of S is readable.

    Scale: the daily collapse is one map-side-combinable aggregate;
    the pair join runs on the CALENDAR-bounded daily table (~2,400
    rows at every SF — guarded by ``MK_MAX_DAYS``), broadcast on one
    side, so cost is constant w.r.t. data volume. At a finer grain
    you'd switch to the O(n log n) inversion-count form; at daily
    grain the closed pair form is cheaper than its own shuffle.

    Output: 1 row (n_days, n_pairs, s_stat, var_s_x18, z2_ppm, trend).
    """
    from ..functions import _idiv

    t = load(spark, sf_dir)
    daily = (
        t.orders.groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            (F.round(F.sum("o_totalprice"), 2) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    a = daily.select(F.col("d").alias("di"), F.col("cents").alias("ci"))
    b = daily.select(F.col("d").alias("dj"), F.col("cents").alias("cj"))
    pairs = F.broadcast(a).join(b, F.col("di") < F.col("dj"))
    s = pairs.agg(
        F.sum(
            F.when(F.col("cj") > F.col("ci"), 1)
            .when(F.col("cj") < F.col("ci"), -1)
            .otherwise(0)
            .cast("long")
        ).alias("s_stat"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    nd = daily.agg(F.count(F.lit(1)).alias("n_days"))
    guard = F.when(
        F.col("n_days") > MK_MAX_DAYS,
        F.raise_error(
            F.lit(
                "mann_kendall contract violated: daily grid exceeds "
                "MK_MAX_DAYS — the closed pair form stops being the "
                "cheap plan; switch to the inversion-count form"
            )
        ).cast("long"),
    ).otherwise(F.col("n_days"))
    ties = (
        daily.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    n = guard
    return (
        s.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            "s_stat",
            (n * (n - 1) * (2 * n + 5) - F.col("tie_term"))
            .cast("long")
            .alias("var_s_x18"),
            _idiv(
                F.col("s_stat") * F.col("s_stat") * F.lit(18_000_000),
                n * (n - 1) * (2 * n + 5) - F.col("tie_term"),
            ).alias("z2_ppm"),
            F.when(F.col("s_stat") > 0, F.lit("up"))
            .when(F.col("s_stat") < 0, F.lit("down"))
            .otherwise(F.lit("flat"))
            .alias("trend"),
        )
    )


#: Hilbert key resolution per dimension — matches ZORDER_BITS so the
#: two space-filling keys are directly comparable on the same grid.
HILBERT_BITS = 16


def q_hilbert_curve_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILBERT-CURVE clustering keys for the orders fact — the
    locality-better sibling of `orders_zorder_keys` (Morton): both map
    (custkey, orderdate) to a 1-D sort key, but the Hilbert curve never
    makes the long diagonal jumps Morton does, so range scans touch
    fewer row groups (the reason Delta/Iceberg grew `OPTIMIZE ...
    HILBERT` alongside z-order).

    Same exact 16-bit range normalization as the Morton twin (so zx/zy
    are bit-identical across the two operators), then the classic
    xy→d walk (Hamilton's algorithm): 16 most-significant-first
    rounds, each deciding one quadrant digit and rotating the frame.
    The walk runs as ONE `F.aggregate` fold over the bit sequence with
    a (x, y, d) struct accumulator — a bound lambda variable, so the
    expression tree stays LINEAR in rounds (a naive unrolled
    withColumn chain doubles the tree per round — 2¹⁶ nodes — because
    each new x references both old x and y).

    Everything is integer CASE arithmetic (the quadrant digit
    (3·rx)⊕ry is a 4-entry CASE, not engine xor), so keys hash-match
    the 16-stage CTE chain the DuckDB twin unrolls.

    Scale: a narrow expression scan plus the same 1-row bounds
    broadcast as the Morton twin; the fold is constant work per row
    inside whole-stage codegen — no shuffle at all.

    Output: (o_orderkey, zx, zy, hkey)."""
    from ..catalog import spread_scan
    from ..functions import _idiv, epoch_us

    t = load(spark, sf_dir)
    day = _idiv(
        epoch_us(F.col("o_orderdate").cast("timestamp")),
        F.lit(86_400_000_000),
    )
    # spread the single-row-group scan across cores (the 16-round walk
    # below is per-row compute — §2.5 unsplittable-input fix) and share
    # ONE materialization between the bounds aggregate and the main
    # branch (previously two independent single-task scans)
    o = spread_scan(
        t.orders.select(
            "o_orderkey", F.col("o_custkey").alias("ck"), day.alias("d")
        )
    ).localCheckpoint(eager=False)
    bounds = o.agg(
        F.min("ck").alias("ck0"), F.max("ck").alias("ck1"),
        F.min("d").alias("d0"), F.max("d").alias("d1"),
    )
    scale = (1 << HILBERT_BITS) - 1
    j = o.crossJoin(F.broadcast(bounds)).select(
        "o_orderkey",
        _idiv(
            (F.col("ck") - F.col("ck0")) * scale,
            F.greatest(F.col("ck1") - F.col("ck0"), F.lit(1)),
        ).alias("zx"),
        _idiv(
            (F.col("d") - F.col("d0")) * scale,
            F.greatest(F.col("d1") - F.col("d0"), F.lit(1)),
        ).alias("zy"),
    )

    def step(acc, i):
        # s = 2^i, MSB first; rx/ry = the bit of x/y at level s
        s = F.call_function("shiftleft", F.lit(1).cast("long"), i)
        rx = F.when(
            F.call_function("shiftright", acc.x, i).bitwiseAND(F.lit(1))
            == 1,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        ry = F.when(
            F.call_function("shiftright", acc.y, i).bitwiseAND(F.lit(1))
            == 1,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        # quadrant digit (3·rx) xor ry as a 4-entry CASE (portable)
        digit = (
            F.when((rx == 0) & (ry == 0), F.lit(0))
            .when((rx == 0) & (ry == 1), F.lit(1))
            .when((rx == 1) & (ry == 1), F.lit(2))
            .otherwise(F.lit(3))
            .cast("long")
        )
        # rotate: ry=1 keeps the frame; ry=0 swaps (and flips if rx=1)
        nx = F.when(ry == 1, acc.x).otherwise(
            F.when(rx == 1, s - 1 - acc.y).otherwise(acc.y)
        )
        ny = F.when(ry == 1, acc.y).otherwise(
            F.when(rx == 1, s - 1 - acc.x).otherwise(acc.x)
        )
        return F.struct(
            nx.alias("x"), ny.alias("y"), (acc.d + s * s * digit).alias("d")
        )

    hkey = F.aggregate(
        F.sequence(
            F.lit(HILBERT_BITS - 1), F.lit(0), F.lit(-1)
        ),
        F.struct(
            F.col("zx").alias("x"),
            F.col("zy").alias("y"),
            F.lit(0).cast("long").alias("d"),
        ),
        step,
        lambda acc: acc.d,
    )
    return j.select("o_orderkey", "zx", "zy", hkey.alias("hkey"))


#: Compaction geometry: pack the per-day event micro-files into this
#: many target bins (the OPTIMIZE file-count goal), 64 bytes of fixed
#: per-row overhead on top of the variable props payload.
COMPACT_BINS = 8
COMPACT_ROW_OVERHEAD = 64


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE-style COMPACTION PLANNER — the small-file bin-packing
    every lakehouse maintenance job runs: treat each event DAY as one
    micro-file (estimated bytes = Σ len(props) + 64/row), then assign
    files to ``COMPACT_BINS`` target output files by CONTIGUOUS
    cumulative packing (bin = bytes_before // ceil(total/BINS)) so
    each rewritten file stays day-clustered (preserves time-range
    data skipping after the rewrite). Complements
    ``range_partition_boundaries`` (row balance for a partitioner)
    with BYTE balance for a file rewriter.

    Exact: file sizes, the cumulative prefix, the ceil target, and
    the bin id are all integers; fill_ppm is one trunc division. The
    window runs over the calendar-bounded DAY grid, never raw rows.

    At 100 TB the same plan runs per partition (files from the
    transaction log's add-actions instead of a scan), and the bin id
    becomes the rewrite task id — contiguity means each task reads a
    consecutive day range.

    Output: (bin, n_files, day_lo, day_hi, est_bytes, n_rows,
    fill_ppm, oversized)."""
    from ..functions import _idiv

    t = load(spark, sf_dir)
    files = (
        t.events.select(
            F.to_date("ts").alias("day"),
            (F.length("props").cast("long") + F.lit(COMPACT_ROW_OVERHEAD))
            .alias("b"),
        )
        .groupBy("day")
        .agg(
            F.sum("b").alias("bytes"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g = files.withColumn("cum", F.sum("bytes").over(w))
    tot = g.agg(F.max("cum").alias("total"))
    target = _idiv(
        F.col("total") + F.lit(COMPACT_BINS - 1), F.lit(COMPACT_BINS)
    )
    binned = (
        g.crossJoin(F.broadcast(tot))
        .withColumn("target", target)
        .withColumn(
            "bin", _idiv(F.col("cum") - F.col("bytes"), F.col("target"))
        )
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("day_lo"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("day_hi"),
            F.sum("bytes").cast("long").alias("est_bytes"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.max("target").alias("tgt"),
        )
        .select(
            F.col("bin").cast("int").alias("bin"),
            "n_files",
            "day_lo",
            "day_hi",
            "est_bytes",
            "n_rows",
            _idiv(F.col("est_bytes") * F.lit(1_000_000), F.col("tgt"))
            .alias("fill_ppm"),
            (F.col("est_bytes") > F.col("tgt")).alias("oversized"),
        )
        .orderBy("bin")
    )


#: ACF geometry: report lags 1..ACF_MAX_LAG of the daily revenue
#: series (the weekly-cycle window), Ljung-Box accumulated over them.
ACF_MAX_LAG = 7


def q_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOCORRELATION function of daily revenue (lags 1..7) with the
    accumulated LJUNG-BOX portmanteau statistic — the serial-dependence
    panel completing the trend family (`mann_kendall_trend` asks "is
    there a drift?", `revenue_runs_test` "is the sign sequence
    random?"; this asks "does yesterday predict today, and at which
    lag?" — the weekly-seasonality detector).

    Exact fixed point, no float mean: deviations are cross-multiplied
    to integers d_t = n·x_t − S (so Σd_t = 0 exactly), carried in
    DECIMAL(38,0)/HUGEINT:

        r_k  = Σ_{t≤n−k} d_t·d_{t+k} / Σ d_t²       (signed ppm)
        Q(K) = n(n+2) Σ_{k≤K} r_k²/(n−k)            (milli, from the
                                                     quantized r_ppm —
                                                     a deterministic
                                                     quantization both
                                                     engines share)

    The series is the OBSERVED-day sequence indexed by row_number
    (documented: gap days are absent, not zero-filled — zero-filling
    would manufacture autocorrelation from the calendar).

    Scale: the day grid is calendar-bounded (~2.4k rows at every SF);
    the lag pairing is ONE equijoin of the grid against itself via an
    exploded (idx + lag) key — no range join, no window over raw rows;
    everything upstream is one map-side-combinable day aggregate.

    Output: ACF_MAX_LAG rows (lag, n_days, num, den, r_ppm,
    lb_q_milli cumulative, significant at |z| > 1.96/√n in ppm²)."""
    from pyspark.sql import Window

    from ..functions import _idiv

    t = load(spark, sf_dir)
    daily = (
        t.orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            (F.sum(dec2("o_totalprice")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("day")
    g = daily.select(
        F.row_number().over(w).alias("idx"), "cents"
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cents").cast("decimal(38,0)").alias("s_sum"),
    )
    dd = (
        g.crossJoin(F.broadcast(tot))
        .select(
            "idx",
            "n_days",
            (
                F.col("cents").cast("decimal(38,0)") * F.col("n_days")
                - F.col("s_sum")
            ).alias("d"),
        )
    )
    den = dd.agg(
        F.sum(F.col("d") * F.col("d")).cast("decimal(38,0)").alias("den"),
        F.max("n_days").alias("n_days"),
    )
    pairs = (
        dd.select(
            "idx",
            "d",
            F.explode(F.sequence(F.lit(1), F.lit(ACF_MAX_LAG))).alias("lag"),
        )
        .withColumn("tidx", F.col("idx") + F.col("lag"))
        .join(
            dd.select(F.col("idx").alias("tidx"), F.col("d").alias("d2")),
            "tidx",
        )
        .groupBy("lag")
        .agg(F.sum(F.col("d") * F.col("d2")).cast("decimal(38,0)").alias("num"))
    )
    r = pairs.crossJoin(F.broadcast(den)).select(
        F.col("lag").cast("int").alias("lag"),
        "n_days",
        "num",
        "den",
        F.when(
            F.col("num") < 0,
            -_idiv(-F.col("num") * F.lit(1_000_000), F.col("den")),
        )
        .otherwise(_idiv(F.col("num") * F.lit(1_000_000), F.col("den")))
        .cast("long")
        .alias("r_ppm"),
    )
    wl = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    lb_term = _idiv(
        F.col("r_ppm") * F.col("r_ppm"), F.col("n_days") - F.col("lag")
    )
    return (
        r.withColumn("lb_sum", F.sum(lb_term).over(wl))
        .select(
            "lag",
            "n_days",
            # VARCHAR-paired with the oracle (typetags.py)
            F.col("num").cast("string").alias("num"),
            F.col("den").cast("string").alias("den"),
            "r_ppm",
            _idiv(
                F.col("n_days")
                * (F.col("n_days") + 2)
                * F.col("lb_sum"),
                F.lit(1_000_000_000),
            ).alias("lb_q_milli"),
            (
                F.col("r_ppm") * F.col("r_ppm")
                > _idiv(
                    F.lit(3_841_600_000_000).cast("long"), F.col("n_days")
                )
            ).alias("significant"),
        )
        .orderBy("lag")
    )


#: Correlation-matrix guard: num² ≤ den_a·den_b (Cauchy–Schwarz), so
#: exactness needs each den = n·Σx² − (Σx)² ≤ 10¹⁹ — value-based, not
#: an n bound (den grows with n²·var, so low-variance metrics scale
#: much further than the worst case).
CORR_MAX_DEN = "10000000000000000000"  # 10^19 > int64: lit via decimal cast


def q_order_metric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIRWISE PEARSON CORRELATION MATRIX over four order-grain
    metrics — price (quantized to $100 units), item count, total
    quantity, fulfilment latency — the feature-redundancy screen a
    modeling pipeline runs before feeding metrics to anything
    downstream (two metrics at |r| ≈ 1 are one signal). The long
    (order, metric, value) unpivot + self-join produces every pair
    from ONE pass, so adding a metric is one select, not a new
    operator.

    Exact fixed point (the spearman_price_qty device on raw values
    instead of ranks): all five moments in DECIMAL(38,0), r² in ppm
    via the guarded two-stage floor division, signed milli r via
    isqrt. Price is floor-quantized to $100 units — a deterministic
    quantization both engines share; exactness is guarded by the
    Cauchy–Schwarz bound num² ≤ den_a·den_b, so each den must stay
    ≤ ``CORR_MAX_DEN`` = 10¹⁹ (raise_error beyond — value-based,
    den = n²·var, so low-variance metrics scale far past any fixed
    row bound).

    Scale: one fact aggregate to order grain, a 4×-unpivot equijoin
    on orderkey (co-partitioned, no skew), and a 6-group moment
    collapse — fully map-side-combinable.

    Output: 6 rows (metric_a, metric_b, n_orders, r_num, den_a,
    den_b, r2_signed_ppm, r_milli)."""
    from ..functions import _idiv, isqrt

    t = load(spark, sf_dir)
    per_order = (
        t.lineitem.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.min("l_shipdate").alias("first_ship"),
        )
        .join(
            t.orders.select(
                "o_orderkey",
                "o_orderdate",
                _idiv((dec2("o_totalprice") * 100).cast("long"), F.lit(10_000))
                .alias("price100"),
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "o_orderkey",
            "price100",
            "n_items",
            "qty",
            F.datediff(F.col("first_ship"), F.col("o_orderdate"))
            .cast("long")
            .alias("latency_days"),
        )
    )
    long = per_order.select(
        "o_orderkey",
        F.explode(
            F.map_from_arrays(
                F.array(
                    F.lit("latency_days"),
                    F.lit("n_items"),
                    F.lit("price100"),
                    F.lit("qty"),
                ),
                F.array("latency_days", "n_items", "price100", "qty"),
            )
        ).alias("metric", "v"),
    )
    pairs = (
        long.alias("a")
        .join(long.alias("b"), "o_orderkey")
        .filter(F.col("a.metric") < F.col("b.metric"))
    )
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = pairs.groupBy(
        F.col("a.metric").alias("metric_a"),
        F.col("b.metric").alias("metric_b"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("a.v").cast("long").alias("sx"),
        F.sum("b.v").cast("long").alias("sy"),
        F.sum(dd(F.col("a.v")) * F.col("b.v")).cast("decimal(38,0)").alias("sxy"),
        F.sum(dd(F.col("a.v")) * F.col("a.v")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dd(F.col("b.v")) * F.col("b.v")).cast("decimal(38,0)").alias("syy"),
    )
    n = F.col("n_orders").cast("long")
    num = dd(n) * F.col("sxy") - dd(F.col("sx")) * F.col("sy")
    den_a0 = dd(n) * F.col("sxx") - dd(F.col("sx")) * F.col("sx")
    den_b = dd(n) * F.col("syy") - dd(F.col("sy")) * F.col("sy")
    # Cauchy-Schwarz: num² ≤ den_a·den_b, so num² stays inside
    # DECIMAL(38,0) iff both dens are ≤ 10¹⁹ — a VALUE-based guard
    # (den = n²·var(x)), far less pessimistic than an n bound
    den_a = F.when(
        (den_a0 > F.lit(CORR_MAX_DEN).cast("decimal(38,0)"))
        | (den_b > F.lit(CORR_MAX_DEN).cast("decimal(38,0)")),
        F.raise_error(
            F.lit(
                "correlation contract violated: den > 1e19 lets num^2 "
                "pass DECIMAL(38,0); rescale or sample upstream"
            )
        ).cast("decimal(38,0)"),
    ).otherwise(den_a0)
    anum = F.when(num < 0, -num).otherwise(num)
    rho2 = _idiv(
        _idiv(anum * anum, den_a).cast("decimal(38,0)")
        * F.lit(1_000_000),
        den_b,
    )  # the 1e6 lift stays DECIMAL: quotient*1e6 can pass int64
    return m.select(
        "metric_a",
        "metric_b",
        "n_orders",
        # string, not decimal(38,0): the oracle emits VARCHAR and the
        # driver's value hash is TYPE-TAGGED (decimal128 vs utf8 diverge
        # on identical digits — the r11 red row). Digit strings of
        # exact scale-0 decimals are engine-portable.
        num.cast("decimal(38,0)").cast("string").alias("r_num"),
        den_a.cast("decimal(38,0)").cast("string").alias("den_a"),
        den_b.cast("decimal(38,0)").cast("string").alias("den_b"),
        F.when(num < 0, -rho2).otherwise(rho2).cast("long").alias(
            "r2_signed_ppm"
        ),
        F.when(num < 0, -isqrt(rho2)).otherwise(isqrt(rho2))
        .cast("long")
        .alias("r_milli"),
    ).orderBy("metric_a", "metric_b")


#: Changepoint report depth: surface the top-3 candidate split days.
CHANGEPOINT_TOP = 3


def q_revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY-SEGMENTATION CHANGEPOINT on daily revenue — the "WHERE
    did the level shift?" answer next to the family's detectors
    (`revenue_cusum` alarms on drift, `mann_kendall_trend` tests for
    monotone trend; this localizes the single best mean-shift split):
    the least-squares split maximizes the between-group sum of squares

        BSS(t) ∝ (S_t·n − S·t)² / (t·(n−t)),   1 ≤ t < n

    with S_t the cumulative cents through day-index t. The constant
    1/n is dropped (argmax-invariant) and the score is kept as the
    exact integer floor of the cross-multiplied fraction — a
    deterministic quantization both engines share; ties break to the
    earliest day. Top-``CHANGEPOINT_TOP`` candidates are surfaced
    with exact half-up segment means so the analyst sees magnitude,
    not just location.

    Scale: one map-side-combinable day aggregate; the scan of all
    n−1 candidate splits is a cumsum + rank over the CALENDAR-bounded
    day grid, never raw rows.

    Output: 3 rows (rank, split_day, t_idx, n_days, bss_q,
    mean_before, mean_after, shift)."""
    from pyspark.sql import Window

    from ..functions import _idiv, halfup_div

    t = load(spark, sf_dir)
    daily = (
        t.orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg((F.sum(dec2("o_totalprice")) * 100).cast("long").alias("cents"))
    )
    w = Window.orderBy("day")
    g = daily.select(
        "day",
        F.row_number().over(w).alias("t"),
        F.sum("cents").over(
            Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
    )
    tot = g.agg(
        F.max("t").cast("long").alias("n_days"),
        F.max("cum").cast("long").alias("s_all"),
    )
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    scored = (
        g.crossJoin(F.broadcast(tot))
        .filter(F.col("t") < F.col("n_days"))
        .withColumn(
            "dev",
            dd(F.col("cum")) * F.col("n_days") - dd(F.col("s_all")) * F.col("t"),
        )
        .withColumn(
            # exact integer floor in DECIMAL(38,0) — bss_q can exceed
            # int64 (dev² ~ 3e29 over a ~1e6 denominator), so the
            # _idiv long cast is replaced by the same subtraction
            # trick kept wide
            "bss_q",
            (
                (
                    F.col("dev") * F.col("dev")
                    - (F.col("dev") * F.col("dev"))
                    % (dd(F.col("t")) * (F.col("n_days") - F.col("t")))
                )
                / (dd(F.col("t")) * (F.col("n_days") - F.col("t")))
            ).cast("decimal(38,0)"),
        )
    )
    wr = Window.orderBy(F.col("bss_q").desc(), "day")
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= CHANGEPOINT_TOP)
        .select(
            F.col("rank").cast("int").alias("rank"),
            F.date_format("day", "yyyy-MM-dd").alias("split_day"),
            F.col("t").cast("long").alias("t_idx"),
            "n_days",
            # VARCHAR-paired with the oracle (typetags.py)
            F.col("bss_q").cast("decimal(38,0)").cast("string").alias("bss_q"),
            halfup_div(F.col("cum"), F.col("t"), 2).alias("mean_before"),
            halfup_div(
                F.col("s_all") - F.col("cum"),
                F.col("n_days") - F.col("t"),
                2,
            ).alias("mean_after"),
            (
                halfup_div(
                    F.col("s_all") - F.col("cum"),
                    F.col("n_days") - F.col("t"),
                    2,
                )
                - halfup_div(F.col("cum"), F.col("t"), 2)
            ).alias("shift"),
        )
        .orderBy("rank")
    )


#: Hill estimator order statistics: top-k tail of the spend
#: distribution (k+1 values; the (k+1)-th anchors the ratios).
HILL_K = 100


def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILL TAIL-INDEX estimator (Hill 1975) of the order-value
    distribution — the heavy-tail dial next to the Zipf/Pareto pair
    (`zipf_law_fit` fits ranks of TERMS, `revenue_pareto_cut` reads
    concentration; Hill estimates the tail exponent α of the VALUE
    distribution itself): α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1)) over the
    top-k order statistics. α ≤ 2 means infinite variance — the
    skew/salting planner's cue that mean-based sizing lies.

    Exact fixed point: the k ratios are cents integers through
    ``ln_micro`` (micro-nats); α̂ in milli is one integer division of
    k·10⁹ by the micro-nat sum. Per-row output carries each order
    statistic and its ln ratio so the whole estimator is
    hash-verifiable, not just the scalar.

    Scale: ONE TakeOrdered(k+1) (never a global sort) + a bounded
    window for ranks; everything else is a k-row aggregate.

    Output: ``HILL_K`` rows (rank, cents, ln_ratio_micro) + attached
    (x_anchor_cents, alpha_milli, infinite_variance)."""
    from pyspark.sql import Window

    from ..functions import _idiv, dec2, ln_micro

    t = load(spark, sf_dir)
    topk = (
        t.orders.select(
            "o_orderkey",
            (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .orderBy(F.desc("cents"), F.asc("o_orderkey"))
        .limit(HILL_K + 1)
    )
    w = Window.orderBy(F.desc("cents"), F.asc("o_orderkey"))
    ranked = topk.withColumn("rank", F.row_number().over(w))
    anchor = ranked.filter(F.col("rank") == HILL_K + 1).select(
        F.col("cents").alias("x_anchor_cents")
    )
    rows = (
        ranked.filter(F.col("rank") <= HILL_K)
        .crossJoin(F.broadcast(anchor))
        .select(
            "rank",
            "cents",
            "x_anchor_cents",
            ln_micro(F.col("cents"), F.col("x_anchor_cents")).alias(
                "ln_ratio_micro"
            ),
        )
    )
    stats = rows.agg(
        F.sum("ln_ratio_micro").cast("long").alias("s")
    ).select(
        _idiv(
            F.lit(HILL_K).cast("decimal(38,0)") * F.lit(10**9), F.col("s")
        ).alias("alpha_milli")
    )
    return (
        rows.crossJoin(F.broadcast(stats))
        .select(
            "rank",
            "cents",
            "ln_ratio_micro",
            "x_anchor_cents",
            "alpha_milli",
            (F.col("alpha_milli") <= 2000).alias("infinite_variance"),
        )
        .orderBy("rank")
    )


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT LIFETIME-VALUE curves — the revenue twin of
    `cohort_retention` (that entry counts who comes BACK; this one
    accumulates what each first-order cohort has SPENT by month age —
    the curve a CAC/LTV decision actually reads). Cohort = calendar
    month of the customer's first order; age = month offset; per
    (cohort, age): cohort size, revenue landed at that age, running
    cumulative revenue, and LTV per customer in exact integer cents
    (floor division — the deterministic quantization).

    Scale: one per-customer min (map-side combinable) broadcast back
    onto orders (customer-grain dimension join), then a
    (cohort × age) grid aggregate; the cumulative window is
    PARTITIONED by cohort over the month-grain grid — bounded rows
    per partition, never a global window.

    Output: one row per (cohort_month, age_months) with
    (n_customers, revenue_cents, cum_revenue_cents, ltv_cents)."""
    from pyspark.sql import Window

    from ..functions import _idiv, dec2

    t = load(spark, sf_dir)
    o = t.orders.select(
        "o_custkey",
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).cast("long").alias("m"),
    )
    first = o.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    sizes = first.groupBy("m0").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    grid = (
        o.join(first, "o_custkey")
        .groupBy("m0", (F.col("m") - F.col("m0")).alias("age_months"))
        .agg(F.sum("cents").cast("long").alias("revenue_cents"))
    )
    w = (
        Window.partitionBy("m0")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.withColumn(
            "cum_revenue_cents",
            F.sum("revenue_cents").over(w).cast("long"),
        )
        .join(sizes, "m0")
        .select(
            F.concat_ws(
                "-",
                F.expr("m0 div 12").cast("string"),
                F.lpad(
                    (F.pmod(F.col("m0"), F.lit(12)) + 1).cast("string"),
                    2,
                    "0",
                ),
            ).alias("cohort_month"),
            F.col("age_months").cast("long").alias("age_months"),
            "n_customers",
            "revenue_cents",
            "cum_revenue_cents",
            _idiv(F.col("cum_revenue_cents"), F.col("n_customers")).alias(
                "ltv_cents"
            ),
        )
        .orderBy("cohort_month", "age_months")
    )


def q_revenue_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTIAL autocorrelation of daily revenue at lags
    1..``ACF_MAX_LAG`` via the DURBIN–LEVINSON recursion — the second
    half of the Box–Jenkins identification pair (`revenue_acf` reads
    the MA signature; PACF reads the AR order: phi_kk is lag-k
    correlation AFTER removing the shorter-lag structure).

    Exact fixed point over the ACF's quantized r_ppm values, unrolled
    to explicit columns on a 1-row frame (k = 7 is a compile-time
    constant — no iterative fixpoint, no lists):

        a_k = r_k·10⁶ − Σ_j phi_j·r_{k−j}      (10¹² scale)
        b_k = 10¹² − Σ_j phi_j·r_j
        phi_kk = a_k·10⁶ trunc-div b_k          (ppm, sign-split)
        phi'_j = phi_j − phi_kk·phi_{k−j} trunc-div 10⁶

    — a deterministic quantization of the float recursion (pytest
    float witness; error ~1 ppm per arithmetic step, compounding to
    ≤ ~10⁻⁴ at lag 7).

    Scale: everything after the ACF's day-grid aggregate is 1-row
    arithmetic; cost profile == revenue_acf's.

    Output: ``ACF_MAX_LAG`` rows (lag, acf_ppm, pacf_ppm,
    significant — the ±1.96/√n white-noise band on phi_kk)."""
    acf = q_revenue_acf(spark, sf_dir).select("lag", "r_ppm", "n_days")
    one = acf.groupBy().pivot("lag", list(range(1, ACF_MAX_LAG + 1))).agg(
        F.first("r_ppm")
    )
    n = acf.agg(F.max("n_days").alias("n"))
    cur = one.crossJoin(F.broadcast(n)).select(
        *[F.col(str(k)).alias(f"r{k}") for k in range(1, ACF_MAX_LAG + 1)],
        "n",
    )

    from ..functions import _idiv  # trunc-toward-zero for signed nums

    # phi columns live in ppm longs; build up k = 1..ACF_MAX_LAG
    phis: list = []
    pacf_cols = []
    for k in range(1, ACF_MAX_LAG + 1):
        a = F.col(f"r{k}").cast("decimal(38,0)") * F.lit(10**6) - sum(
            (
                F.col(f"phi_{j}").cast("decimal(38,0)")
                * F.col(f"r{k - j}")
                for j in range(1, k)
            ),
            F.lit(0).cast("decimal(38,0)"),
        )
        b = F.lit(10**12).cast("decimal(38,0)") - sum(
            (
                F.col(f"phi_{j}").cast("decimal(38,0)") * F.col(f"r{j}")
                for j in range(1, k)
            ),
            F.lit(0).cast("decimal(38,0)"),
        )
        cur = cur.withColumn(
            f"pacf_{k}", _idiv(a * F.lit(10**6), b)
        )
        new_phis = []
        for j in range(1, k):
            cur = cur.withColumn(
                f"phi_{j}_n{k}",
                (
                    F.col(f"phi_{j}")
                    - _idiv(
                        F.col(f"pacf_{k}").cast("decimal(38,0)")
                        * F.col(f"phi_{k - j}"),
                        F.lit(10**6),
                    )
                ),
            )
            new_phis.append(f"phi_{j}_n{k}")
        for j, src in enumerate(new_phis, start=1):
            cur = cur.withColumn(f"phi_{j}__tmp{k}", F.col(src))
        for j in range(1, k):
            cur = cur.withColumn(f"phi_{j}", F.col(f"phi_{j}__tmp{k}"))
        cur = cur.withColumn(f"phi_{k}", F.col(f"pacf_{k}"))
        pacf_cols.append(f"pacf_{k}")
    stack = ", ".join(
        f"{k}, r{k}, pacf_{k}" for k in range(1, ACF_MAX_LAG + 1)
    )
    return (
        cur.select(
            F.expr(
                f"stack({ACF_MAX_LAG}, {stack}) AS (lag, acf_ppm, pacf_ppm)"
            ),
            "n",
        )
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.col("acf_ppm").cast("long").alias("acf_ppm"),
            F.col("pacf_ppm").cast("long").alias("pacf_ppm"),
            (
                F.col("pacf_ppm") * F.col("pacf_ppm")
                > F.expr("3841600000000 div n")
            ).alias("significant"),
        )
        .orderBy("lag")
    )


def _trunc_div(num, den):
    """Truncate-toward-zero integer division of possibly-negative
    DECIMAL(38,0) columns: |num| is divided and the sign reapplied
    (Spark's decimal intdiv truncates where DuckDB's ``//`` floors —
    the house sign-split convention, `q_nation_revenue_trend`)."""
    from ..functions import _idiv

    return F.when(num < 0, -_idiv(-num, den)).otherwise(_idiv(num, den))


def _daily_ols_residuals(t) -> DataFrame:
    """Shared residual construction for the OLS diagnostics family:
    the calendar-bounded daily revenue grid, the exact
    DECIMAL(38,0)/HUGEINT rational fit (num_b/den with
    fitted·(n·den) = n·num_b·x + den·Σy − num_b·Σx), and the rounded
    integer-cents residual ``e = y − trunc(fit)``. Returns one row per
    observed day: (day, n, sx, sy, syy, num_b, den, e) with the 1-row
    power-sum aggregate broadcast-attached (whitelisted class)."""
    from ..functions import dec2

    d38 = "decimal(38,0)"
    daily = (
        t.orders.select(
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
            .cast("long")
            .alias("day"),
            (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
    )
    x = F.col("day").cast(d38)
    y = F.col("cents").cast(d38)
    g = daily.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    ).select(
        "*",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num_b"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
    )
    fit_num = (
        F.col("n") * F.col("num_b") * F.col("day").cast(d38)
        + F.col("den") * F.col("sy")
        - F.col("num_b") * F.col("sx")
    )
    fit_den = F.col("n") * F.col("den")
    return daily.crossJoin(F.broadcast(g)).select(
        "day",
        "n",
        "sx",
        "sy",
        "syy",
        "num_b",
        "den",
        (F.col("cents").cast(d38) - _trunc_div(fit_num, fit_den)).alias("e"),
    )


def q_ols_residual_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS RESIDUAL DIAGNOSTICS for the daily-revenue trend — the
    goodness-of-fit companion to the slope-only regressions
    (`q_nation_revenue_trend` fits, `q_revenue_theil_sen` robustifies,
    THIS one asks "should you trust the line?"): R², Durbin–Watson
    serial-correlation, and residual-shape summaries for the global
    ``daily_cents ~ day`` fit.

    Exact fixed point end to end: the daily grid is integer cents;
    slope and intercept stay an exact DECIMAL(38,0)/HUGEINT rational
    (num_b/den, with fitted·(n·den) = n·num_b·x + den·Σy − num_b·Σx);
    the residual is the integer cents ``y − trunc(fit)`` (one
    truncate-toward-zero division — a deterministic quantization both
    engines define identically), and every statistic is an integer
    ratio of residual power sums:

    - ``r2_ppm``   = 1e6 − (n·Σe²·1e6) div (n·Σy² − (Σy)²)
    - ``dw_micro`` = (Σ_{t≥2} (e_t − e_{t−1})²·1e6) div Σe²  — the
      Durbin–Watson statistic at micro (≈2e6 ⇒ no serial correlation,
      →0 ⇒ positive, →4e6 ⇒ negative; daily revenue around a linear
      trend typically shows DW well below 2e6).

    Magnitude contract (documented, not guarded): daily cents below
    ~4e15 keeps every product under DECIMAL(38,0) — ~10^6× the sf0.1
    fixture; the 100 TB case lands inside it because the calendar grid
    (~2.4k days) is fixed while only per-day totals grow.

    Scale: ONE map-side-combinable shuffle to the bounded calendar
    grid; the 1-row sums broadcast back onto the grid (whitelisted
    1-row attach class); the lag window orders the bounded grid, not
    rows. Output: single row (n_days, slope_micro_cents_per_day,
    intercept_cents, r2_ppm, dw_micro, n_pos_resid,
    max_abs_resid_cents)."""
    resid = _daily_ols_residuals(load(spark, sf_dir))
    w = Window.orderBy("day")
    lagged = resid.select(
        "*", (F.col("e") - F.lag("e").over(w)).alias("de")
    )
    out = lagged.groupBy("n", "sx", "sy", "syy", "num_b", "den").agg(
        F.sum(F.col("e") * F.col("e")).alias("sse"),
        F.sum(F.col("de") * F.col("de")).alias("sdd"),
        F.sum((F.col("e") > 0).cast("long")).alias("n_pos"),
        F.max(F.abs(F.col("e"))).alias("max_abs_e"),
    )
    sst = out["n"] * F.col("syy") - F.col("sy") * F.col("sy")
    return out.select(
        F.col("n").cast("long").alias("n_days"),
        _trunc_div(F.col("num_b") * F.lit(1_000_000), F.col("den"))
        .cast("long")
        .alias("slope_micro_cents_per_day"),
        _trunc_div(
            F.col("den") * F.col("sy") - F.col("num_b") * F.col("sx"),
            F.col("n") * F.col("den"),
        )
        .cast("long")
        .alias("intercept_cents"),
        (
            F.lit(1_000_000).cast("decimal(38,0)")
            - _trunc_div(out["n"] * F.col("sse") * F.lit(1_000_000), sst)
        )
        .cast("long")
        .alias("r2_ppm"),
        _trunc_div(F.col("sdd") * F.lit(1_000_000), F.col("sse"))
        .cast("long")
        .alias("dw_micro"),
        F.col("n_pos").cast("long").alias("n_pos_resid"),
        F.col("max_abs_e").cast("long").alias("max_abs_resid_cents"),
    )


def q_revenue_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASSICAL seasonal decomposition of daily revenue by ISO
    weekday — trend via a centered 7-day moving average, seasonal =
    the per-weekday mean of the detrended series, remainder = what's
    left (the additive model of the pre-STL textbook decomposition;
    STL's loess smoother is float-iterative and engine-specific, the
    classical form is exact integer arithmetic both engines share).

    Fixed point: the daily grid is integer cents; the centered MA over
    a FULL 7-observation window is one truncate-toward-zero division
    of the window sum (edge days with <7 neighbours are excluded —
    the textbook convention); seasonal indices and remainder means are
    the same division over per-weekday sums. Weekday is Spark
    ``weekday()+1`` == DuckDB ``isodow`` (Monday=1).

    Scale: map-side shuffle to the bounded calendar grid (~2.4k
    rows); the MA window and weekday means run on the grid, never on
    order rows. Output: one row per ISO weekday — (iso_dow, n_days,
    seasonal_cents, remainder_mean_abs_cents, detrended_min_cents,
    detrended_max_cents)."""
    from ..functions import dec2

    t = load(spark, sf_dir)
    daily = (
        t.orders.select(
            F.col("o_orderdate").alias("d"),
            (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("cents"))
        .select(
            "d",
            "cents",
            (F.weekday("d") + F.lit(1)).cast("int").alias("iso_dow"),
        )
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "d",
        "iso_dow",
        "cents",
        F.sum("cents").over(w).alias("win_sum"),
        F.count(F.lit(1)).over(w).alias("win_n"),
    ).filter(F.col("win_n") == 7)
    detr = ma.select(
        "d",
        "iso_dow",
        (
            F.col("cents").cast("decimal(38,0)")
            - _trunc_div(F.col("win_sum").cast("decimal(38,0)"), F.lit(7))
        ).alias("detrended"),
    )
    seasonal = detr.groupBy("iso_dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("detrended").alias("dsum"),
        F.min("detrended").cast("long").alias("detrended_min_cents"),
        F.max("detrended").cast("long").alias("detrended_max_cents"),
    ).select(
        "*",
        _trunc_div(F.col("dsum"), F.col("n_days").cast("decimal(38,0)"))
        .alias("seasonal_cents"),
    )
    rem = (
        detr.join(
            F.broadcast(seasonal.select("iso_dow", "seasonal_cents")),
            "iso_dow",
        )
        .select(
            "iso_dow",
            F.abs(F.col("detrended") - F.col("seasonal_cents")).alias("r"),
        )
        .groupBy("iso_dow")
        .agg(F.sum("r").alias("rsum"), F.count(F.lit(1)).alias("rn"))
        .select(
            "iso_dow",
            _trunc_div(F.col("rsum"), F.col("rn").cast("decimal(38,0)"))
            .cast("long")
            .alias("remainder_mean_abs_cents"),
        )
    )
    return (
        seasonal.join(rem, "iso_dow")
        .select(
            F.col("iso_dow").cast("int").alias("iso_dow"),
            F.col("n_days").cast("long").alias("n_days"),
            F.col("seasonal_cents").cast("long").alias("seasonal_cents"),
            "remainder_mean_abs_cents",
            "detrended_min_cents",
            "detrended_max_cents",
        )
        .orderBy("iso_dow")
    )


#: Residual quantization unit for the moment statistics: $100 in cents.
#: Keeps Σe⁴ inside DECIMAL(38,0)/HUGEINT for daily residuals up to
#: ~$40M (|ek| ≲ 4·10⁵ ⇒ Σek⁴ ≲ 2.4k·2.6e22 ≈ 6e25) and the second
#: moment inside isqrt's 2^52 exactness window — both guarded below.
JB_RESID_UNIT_CENTS = 10_000


def q_jarque_bera_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JARQUE–BERA normality test on the daily-revenue OLS residuals —
    the third member of the diagnostics family
    (`q_ols_residual_diagnostics` asks "does the line fit?", this asks
    "are the deviations NORMAL?" — the assumption behind every
    Gaussian interval on that fit): JB = n·(S²/6 + K²/24) against
    χ²(2), from skewness S and excess kurtosis K of the residuals.

    Exact fixed point: residuals come from the shared rounded-residual
    construction (`_daily_ols_residuals`), are quantized to $100 units
    (one truncate-toward-zero division — raw cents⁴ would overflow
    DECIMAL(38,0) at sf0.1 already), and the moment ratios are integer
    divisions: s = isqrt(m2), S_milli = m3·10³ div s³, K_milli =
    m4·10³ div m2² − 3000, JB_milli = n·(4·S² + K²) div 24·10³.
    Raw (not mean-centered) moments are correct here because OLS
    residuals with an intercept sum to exactly zero in real
    arithmetic; rounding leaves |mean| < 1 cent ≪ the $100 unit.
    The isqrt exactness window (m2 < 2^52) is RAISED on breach, the
    ddsketch guard policy.

    Scale: identical to the sibling — one map-side shuffle to the
    calendar grid, a 1-row broadcast attach, then a single bounded
    aggregate. Output: single row (n_days, resid_unit_cents,
    skew_milli, kurt_excess_milli, jb_milli, significant) where
    significant ⇔ JB > 5.991 (χ²₂ at α = 0.05)."""
    from ..functions import isqrt

    d38 = "decimal(38,0)"
    resid = _daily_ols_residuals(load(spark, sf_dir))
    ek = _trunc_div(F.col("e"), F.lit(JB_RESID_UNIT_CENTS)).cast(d38)
    sums = resid.select("n", ek.alias("ek")).groupBy("n").agg(
        F.sum(F.col("ek") * F.col("ek")).alias("s2"),
        F.sum(F.col("ek") * F.col("ek") * F.col("ek")).alias("s3"),
        F.sum(
            F.col("ek") * F.col("ek") * F.col("ek") * F.col("ek")
        ).alias("s4"),
    )
    from ..functions import _idiv

    m2 = _idiv(F.col("s2"), F.col("n")).cast("long")
    guarded_m2 = F.when(
        m2 >= F.lit(1 << 52),
        F.raise_error(
            F.lit(
                "jarque_bera contract violated: residual second moment "
                "exceeds isqrt's exact range; raise JB_RESID_UNIT_CENTS"
            )
        ).cast("long"),
    ).otherwise(m2)
    cur = sums.select(
        "n",
        guarded_m2.alias("m2"),
        _trunc_div(F.col("s3"), F.col("n")).alias("m3"),
        _idiv(F.col("s4"), F.col("n")).alias("m4"),
    ).select(
        "n", "m2", "m3", "m4", isqrt(F.col("m2")).alias("s")
    )
    skew = F.when(F.col("s") == 0, F.lit(0).cast("long")).otherwise(
        _trunc_div(
            F.col("m3").cast(d38) * F.lit(1000),
            (F.col("s").cast(d38) * F.col("s") * F.col("s")),
        )
    )
    kurt = F.when(F.col("m2") == 0, F.lit(0).cast("long")).otherwise(
        _idiv(
            F.col("m4").cast(d38) * F.lit(1000),
            F.col("m2").cast(d38) * F.col("m2"),
        )
        - F.lit(3000)
    )
    out = cur.select(
        F.col("n").cast("long").alias("n_days"),
        F.lit(JB_RESID_UNIT_CENTS).cast("long").alias("resid_unit_cents"),
        skew.cast("long").alias("skew_milli"),
        kurt.cast("long").alias("kurt_excess_milli"),
    )
    jb = _idiv(
        F.col("n_days").cast(d38)
        * (
            F.lit(4).cast(d38) * F.col("skew_milli") * F.col("skew_milli")
            + F.col("kurt_excess_milli").cast(d38)
            * F.col("kurt_excess_milli")
        ),
        F.lit(24_000).cast(d38),
    )
    return out.select(
        "*",
        jb.cast("long").alias("jb_milli"),
    ).select(
        "*", (F.col("jb_milli") > F.lit(5_991)).alias("significant")
    )
