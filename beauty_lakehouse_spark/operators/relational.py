"""Core relational operators (reference inventory SURVEY.md §2.1–2.6).

Every reference operator re-expressed on the driver fixture tables
(role mapping per FIXTURES.md: orders/lineitem ≈ orders/order_items,
customer ≈ customers, part ≈ products).

Scale design notes:
- Dim joins broadcast explicitly (``F.broadcast``) where the dim is
  bounded (region: 5 rows, nation: 25 rows at every SF); unbounded dims
  (customer, part) rely on AQE join selection so the same code works at
  100 TB where they no longer fit in memory.
- Aggregations are all partial-merge (map-side combine) hash aggregates;
  nothing here forces a complete-mode agg except collect_list in
  ``documents.py``, which is inherent to that semantic.
- Top-k uses orderBy().limit() so Catalyst fuses it to
  TakeOrderedAndProject — no full sort, no single-reducer shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import dec2, halfup_div

# --------------------------------------------------------------------------
# Generic library helpers (DataFrame → DataFrame, reusable on any input)
# --------------------------------------------------------------------------


def null_profile(df: DataFrame) -> DataFrame:
    """Per-column null counts in a single pass (ref P1/A5,
    notebooks/01_dataLake_ingestion.ipynb:317-320).

    One wide no-group aggregate → partial agg per partition + 1-row final;
    scales linearly, no shuffle of data rows."""
    return df.select(
        [F.sum(F.col(c).isNull().cast("int")).alias(c) for c in df.columns]
    )


def duplicate_keys(df: DataFrame, key: str) -> DataFrame:
    """Keys violating uniqueness (ref A9, scripts/validate_dataset.py:178-189).
    Must-be-empty on primary keys."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def orphans(child: DataFrame, parent: DataFrame, fk: str, pk: str) -> DataFrame:
    """Referential-integrity violations as a left-anti join (ref J3,
    scripts/validate_dataset.py:114,122,130 did this with Python sets —
    the distributed form is the canonical anti-join)."""
    return child.join(parent, child[fk] == parent[pk], "left_anti")


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """orderBy+limit → TakeOrderedAndProject (ref O1+O2). Always pass a
    deterministic tiebreaker column in ``order``."""
    return df.orderBy(*order).limit(k)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column] | None = None,
    count_alias: str | None = None,
    n_salts: int = 32,
) -> DataFrame:
    """Skew-safe two-phase aggregate for Zipf-hot group keys.

    AQE's skew handling splits oversized JOIN partitions but does
    nothing for a skewed groupBy key (e.g. the hottest product carries
    ~12% of order_items under the reference's G7 Zipf sampling — one
    reducer gets 12% of 100 TB). Phase 1 groups on (keys, salt) so the
    hot key spreads over ``n_salts`` reducers; phase 2 merges the
    partials on keys alone, touching only |groups|·n_salts rows.

    Spark's partial aggregation gives this for free only when map-side
    combine is effective; salting is the explicit fallback when
    cardinality is too high for the hash-map or the skew survives the
    combine. ``sums`` maps output name → input expression (summed in
    both phases); ``count_alias`` adds a row count."""
    sums = sums or {}
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    phase1_aggs = [F.sum(expr).alias(name) for name, expr in sums.items()]
    if count_alias:
        phase1_aggs.append(F.count(F.lit(1)).alias(count_alias))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*phase1_aggs)
    phase2_aggs = [F.sum(name).alias(name) for name in sums]
    if count_alias:
        phase2_aggs.append(F.sum(count_alias).alias(count_alias))
    return partial.groupBy(*keys).agg(*phase2_aggs)


def money_sum(expr: Column, scale: int = 2) -> Column:
    """Cross-engine-exact money aggregate: ``round(sum(x), scale)``.

    ``expr`` MUST be built from decimal-lifted inputs (:func:`..functions.dec2`)
    — e.g. :func:`net_expr` — never a raw double product: a double sum's
    low bits depend on partial-aggregation order AND Spark/DuckDB round
    doubles differently at .xx5 boundaries (shortest-repr vs binary).
    With decimal inputs the sum is exact in any order and the final
    HALF_UP round is deterministic on both engines. DuckDB twin:
    ``CAST(round(sum(<decimal expr>), scale) AS DOUBLE)``."""
    return F.round(F.sum(expr), scale).cast("double")


def money_round(expr: Column, scale: int = 2) -> Column:
    """Row-level twin of :func:`money_sum`: exact HALF_UP round of a
    decimal-lifted money expression."""
    return F.round(expr, scale).cast("double")


def net_expr() -> Column:
    """Exact-decimal net price: ``l_extendedprice * (1 - l_discount)``.
    DECIMAL(12,2)·DECIMAL(13,2) → scale-4 exact in both engines."""
    return dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))


def charge_expr() -> Column:
    """Exact-decimal gross charge: net · (1 + l_tax), scale-6 exact."""
    return net_expr() * (F.lit(1) + dec2("l_tax"))


# --------------------------------------------------------------------------
# Registered queries (driver signature)
# --------------------------------------------------------------------------


def q_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref A1: orders per customer (01_dataLake_ingestion.ipynb:393)."""
    t = load(spark, sf_dir)
    return t.orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))


def q_parts_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref A2: products per category (01_dataLake_ingestion.ipynb:469),
    mapped to part.p_type."""
    t = load(spark, sf_dir)
    return t.part.groupBy(F.col("p_type").alias("p_type")).agg(
        F.count(F.lit(1)).alias("n_parts")
    )


def q_null_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref P1/A5: single-pass per-column null profile on orders."""
    t = load(spark, sf_dir)
    return null_profile(
        t.orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


def q_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref A6: histogram + sort desc (02_document_db_mongodb.ipynb:372)."""
    t = load(spark, sf_dir)
    return (
        t.events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("event_type"))
    )


def q_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref A7: per-order total from line items (generate_data.py:309
    invariant total_amount = round(Σ line_total, 2)), on lineitem with
    the TPC-H revenue expression."""
    t = load(spark, sf_dir)
    return t.lineitem.groupBy("l_orderkey").agg(
        money_sum(net_expr()).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_duplicate_orderkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref A9: uniqueness check on orders PK (must be empty)."""
    t = load(spark, sf_dir)
    return duplicate_keys(t.orders, "o_orderkey")


def q_ri_orphan_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref J3: RI anti-join — lineitems whose order is missing (empty)."""
    t = load(spark, sf_dir)
    return orphans(t.lineitem, t.orders, "l_orderkey", "o_orderkey").select(
        "l_orderkey", "l_linenumber"
    )


def q_order_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref J1+P2: header⋈detail inner equi-join with projection
    (02_document_db_mongodb.ipynb:225). Filtered to one returnflag so
    the output stays collectable; the join itself is the full fact⋈fact
    shuffle (sort-merge / shuffled-hash under AQE)."""
    t = load(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "l_linenumber",
            "l_quantity",
            money_round(net_expr()).alias("net_price"),
        )
    )


def q_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref J2+A1: dimension join + per-customer aggregate. Customer is
    broadcastable at test SF; at scale AQE decides (code is hint-free on
    purpose — the dim grows with SF)."""
    t = load(spark, sf_dir)
    return (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(dec2("o_totalprice")).alias("total_spend"),
            halfup_div(
                (F.sum(dec2("o_totalprice")) * 100).cast("decimal(38,0)"),
                F.count(F.lit(1)) * 100,
                4,
            ).alias("avg_order"),
        )
    )


def q_topk_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref O1+O2 top-k: top 10 customers by lineitem revenue.
    orderBy+limit fuses to TakeOrderedAndProject; deterministic
    tiebreak on custkey."""
    t = load(spark, sf_dir)
    rev = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(money_sum(net_expr()).alias("revenue"))
    )
    return top_k(rev, [F.desc("revenue"), F.asc("o_custkey")], 10)


def q_price_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref P5: tolerance filter |computed − stored| > ε. Here: orders
    whose o_totalprice disagrees with Σ gross line charge by > 1%
    (the fixtures don't guarantee the invariant; the filter is the op)."""
    t = load(spark, sf_dir)
    per_order = t.lineitem.groupBy("l_orderkey").agg(
        F.sum(charge_expr()).alias("calc")
    )
    joined = t.orders.join(per_order, F.col("o_orderkey") == F.col("l_orderkey"))
    # exact decimal filter: |calc - total| > 1% of total, all decimal ops,
    # so boundary rows are engine-independent
    tot_dec = dec2("o_totalprice", prec=18)
    return (
        joined.filter(F.abs(F.col("calc") - tot_dec) > tot_dec * F.lit(0.01).cast("decimal(3,2)"))
        .select(
            "o_orderkey",
            F.round(F.col("calc"), 2).cast("double").alias("calc_total"),
            "o_totalprice",
        )
    )


def q_date_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref P4: cross-table date rule (order_date ≥ signup_date →
    l_shipdate ≥ o_orderdate). Must-be-empty style filter after a join."""
    t = load(spark, sf_dir)
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
        .select("l_orderkey", "l_linenumber")
    )


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref F1–F12 showcase on part: casts, arithmetic, round, string
    concat/split, clip, date pieces — all JVM-side expressions."""
    t = load(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.concat_ws("/", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.upper(F.col("p_name")).alias("name_upper"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        money_round(dec2("p_retailprice") * F.lit("1.19").cast("decimal(3,2)")).alias(
            "price_vat"
        ),
        # long, pairing with the oracle's BIGINT (typetags.py)
        F.least(F.greatest(F.col("p_size"), F.lit(5)), F.lit(40))
        .cast("long")
        .alias("size_clip"),
        (F.col("p_partkey") % 10).cast("int").alias("bucket"),
        F.length(F.col("p_name")).alias("name_len"),
    )


def q_region_mapping_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref P6: mapping-conformance without a UDF — broadcast join of
    nation against the 5-row region mapping (the reference used a pandas
    row-lambda; the Spark-native form is a broadcast lookup join)."""
    t = load(spark, sf_dir)
    return (
        t.nation.join(
            F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .select("n_nationkey", "n_name", "r_name")
    )


def q_date_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref F7/F9: string→date parse and date→string format as inverse
    operations, plus the derived calendar parts the reference's reports
    group on. The fixtures carry no string dates, so the query formats
    o_orderdate to ISO text and parses it back — asserting the round
    trip inside the engine (parsed == original ⇒ ``roundtrip_ok``)."""
    t = load(spark, sf_dir)
    iso = F.date_format("o_orderdate", "yyyy-MM-dd")
    parsed = F.to_date(iso, "yyyy-MM-dd")
    return t.orders.select(
        "o_orderkey",
        iso.alias("iso"),
        parsed.cast("string").alias("parsed_date"),
        (parsed == F.col("o_orderdate").cast("date")).alias("roundtrip_ok"),
        F.year(parsed).alias("y"),
        F.month(parsed).alias("m"),
        F.dayofmonth(parsed).alias("d"),
    )


def q_mktsegment_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref A2/A6 on the customer dim: segment histogram with share-of-total
    (adds a window-free two-pass share via a scalar subquery-style join)."""
    t = load(spark, sf_dir)
    counts = t.customer.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    total = t.customer.select(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "c_mktsegment",
            "n_customers",
            halfup_div(F.col("n_customers"), F.col("total"), 6).alias("share"),
        )
    )


def q_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who ordered in BOTH 1996 and 1997 — set intersection
    (§2.5 U-family; U1 covers EXCEPT, this covers INTERSECT) enriched
    with the customer dim.

    Scale: the year filters are literal timestamp ranges so they push
    to the parquet scan; each side deduplicates map-side before the
    intersect's shuffle (distinct custkeys, not order rows); the dim
    join shuffles on the same custkey. No windows, no skew risk
    (custkey is the natural high-cardinality key)."""
    t = load(spark, sf_dir)

    def buyers(lo: str, hi: str) -> DataFrame:
        return (
            t.orders.filter(
                (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
            )
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
        )

    both = buyers("1996-01-01", "1997-01-01").intersect(
        buyers("1997-01-01", "1998-01-01")
    )
    return both.join(
        t.customer.select("c_custkey", "c_name", "c_mktsegment"), "c_custkey"
    )


def q_urgent_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — existence filter without row duplication: the
    customers that placed at least one 1-URGENT order. Semi joins are
    the scale-right EXISTS: the build side deduplicates to distinct
    keys during the join (no multiplication by match count, no
    post-join distinct over an exploded intermediate)."""
    t = load(spark, sf_dir)
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return t.customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_order_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — wide per-year metrics into long (year, metric,
    value) form, the reshaping step reporting layers need. Spark's
    ``unpivot`` is a zero-shuffle Expand over the already-aggregated
    (bounded) wide table; all heavy lifting happened in the one
    aggregate before it."""
    t = load(spark, sf_dir)
    wide = (
        t.orders.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            F.round(F.sum(dec2("o_totalprice")), 2).cast("double").alias(
                "total_price"
            ),
            F.countDistinct("o_custkey").cast("double").alias("n_customers"),
        )
    )
    return wide.unpivot(
        ["order_year"],
        ["n_orders", "total_price", "n_customers"],
        "metric",
        "value",
    )


def q_events_by_type_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_by_type through the SKEW-SAFE two-phase salted aggregate
    — registered behind the same oracle as the direct groupBy to prove
    salting is result-transparent (sum/count are associative, so the
    (key, salt) partial merge changes the plan, never the answer).
    This is the shape to swap in when one key carries a double-digit
    share of a 100 TB table and map-side combine alone can't flatten
    the hot reducer."""
    t = load(spark, sf_dir)
    e = t.events.select(
        "event_type", F.col("value").cast("decimal(12,2)").alias("v")
    )
    out = salted_agg(
        e,
        keys=["event_type"],
        sums={"total_value": F.col("v")},
        count_alias="n_events",
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("total_value", 2).cast("double").alias("total_value"),
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_salts: int = 32,
) -> DataFrame:
    """Skew-safe shuffled equi-join for a hot probe-side key.

    AQE's skew-join split handles this case only after a stats pass and
    only per oversized partition; explicit salting is the deterministic
    form: the probe side gets a uniform salt, the build side is
    REPLICATED once per salt value (``explode(sequence)``, n_salts·|build|
    rows), and the join runs on (key, salt) — the hot key's rows now
    land on ``n_salts`` reducers instead of one. Use when the build
    side is too large to broadcast AND a probe key is hot enough to
    break a sort-merge partition; the build replication cost says keep
    n_salts at the skew factor, not higher. Result-transparent by
    construction (every probe row still meets exactly one copy of its
    build row)."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    p = probe.withColumn("__salt", salt)
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return p.join(
        b,
        (F.col(probe_key) == F.col(build_key)) & (p["__salt"] == b["__salt"]),
    ).drop("__salt")


def q_order_enriched_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """order_enriched through the SKEW-SAFE salted fact⋈fact join —
    registered behind the same oracle as the plain join to prove the
    salt+replicate rewrite is result-transparent (the join twin of
    events_by_type_salted's aggregate proof). The plan shape (join key
    widened with the salt, build side exploded n_salts-fold) is what
    you swap in when one l_orderkey carries a reducer-breaking share
    and the orders side can't broadcast."""
    t = load(spark, sf_dir)
    joined = salted_join(
        t.lineitem.filter(F.col("l_returnflag") == "R"),
        t.orders,
        "l_orderkey",
        "o_orderkey",
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "l_linenumber",
        "l_quantity",
        money_round(net_expr()).alias("net_price"),
    )


def q_bloom_semijoin_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNTIME BLOOM-FILTER pushdown for a selective fact⋈dim join —
    the large-scale join pattern where the dim-side predicate is
    selective (here urgent+finished orders, ~1/15 of the table) but
    the dim slice is too large to broadcast at 100 TB: build a
    portable Bloom filter OVER THE SELECTED KEYS (the same
    bit_or-aggregated (word, bits) register table as
    `bloom_decontaminate` — mergeable, ~2 KiB, always broadcastable
    even when the key slice is not), test every fact row MAP-SIDE with
    k broadcast word lookups (no shuffle, no groupBy — the k bit tests
    are independent joined columns), and let only passing rows proceed
    to the exact join. No false negatives by construction; the
    measured false-positive tax is part of the OUTPUT, so the filter
    itself is oracle-verified, not just the final answer.

    At this fixture scale the exact truth is also computed for every
    line (the accounting needs it); at 100 TB the `pass` filter runs
    first and only ~(selectivity + FP) of the fact shuffles. Output
    (one row): n_orders_selected, n_lines_bloom_pass, n_lines_exact,
    bloom_false_positive_lines, revenue — revenue over the truly
    matching lines with the exact decimal TPC-H net expression."""
    from functools import reduce

    from .curation import BLOOM_K, _bloom_pos

    t = load(spark, sf_dir)
    sel = (
        t.orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderstatus") == "F")
        )
        .select("o_orderkey")
        .localCheckpoint(eager=False)
    )

    def _wb(p):
        return (
            F.shiftright(p, 5),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod(p, F.lit(32)).cast("int"),
            ),
        )

    pos = sel.select(
        F.explode(
            F.array(
                *[
                    _bloom_pos(F.col("o_orderkey").cast("string"), j)
                    for j in range(BLOOM_K)
                ]
            )
        ).alias("p")
    )
    w, b = _wb(F.col("p"))
    bloom = (
        pos.select(w.alias("word"), b.alias("b"))
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
        .localCheckpoint(eager=False)
    )

    li = t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
    lk = F.col("l_orderkey").cast("string")
    bit_ok = []
    for j in range(BLOOM_K):
        w, m = _wb(_bloom_pos(lk, j))
        li = li.withColumn(f"_w{j}", w).withColumn(f"_m{j}", m)
        bj = bloom.select(
            F.col("word").alias(f"_w{j}"), F.col("bits").alias(f"_bits{j}")
        )
        li = li.join(F.broadcast(bj), f"_w{j}", "left")
        bit_ok.append(
            F.coalesce(F.col(f"_bits{j}"), F.lit(0)).bitwiseAND(
                F.col(f"_m{j}")
            )
            != 0
        )
    passes = reduce(lambda a, c: a & c, bit_ok)
    flagged = li.join(
        F.broadcast(sel.withColumn("_hit", F.lit(True))),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left",
    ).select(
        passes.alias("pass"),
        F.coalesce(F.col("_hit"), F.lit(False)).alias("hit"),
        "l_extendedprice",
        "l_discount",
    )
    agg = flagged.agg(
        F.sum(F.col("pass").cast("long")).alias("n_lines_bloom_pass"),
        F.sum((F.col("pass") & F.col("hit")).cast("long")).alias(
            "n_lines_exact"
        ),
        F.sum((F.col("pass") & ~F.col("hit")).cast("long")).alias(
            "bloom_false_positive_lines"
        ),
        money_sum(
            F.when(F.col("pass") & F.col("hit"), net_expr()).otherwise(
                F.lit(0).cast("decimal(12,2)")
            )
        ).alias("revenue"),
    )
    n_sel = sel.agg(F.count(F.lit(1)).alias("n_orders_selected"))
    return n_sel.crossJoin(F.broadcast(agg)).select(
        "n_orders_selected",
        "n_lines_bloom_pass",
        "n_lines_exact",
        "bloom_false_positive_lines",
        "revenue",
    )
