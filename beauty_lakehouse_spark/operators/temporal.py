"""Temporal join operators Spark lacks natively: as-of join.

The classic need: for each left event, the most recent right event at
or before it (per key). Spark has no ASOF JOIN; the naive encodings are
a range join (explodes) or a per-key collect (driver-bound). The
scale-safe form used here is the UNION + WINDOW technique:

    1. tag right rows 0 and left rows 1, union them on a common schema;
    2. one window per key ordered by (ts, tag): ``last(right_payload,
       ignorenulls=True)`` over unbounded-preceding..current carries the
       latest right value forward;
    3. keep left rows.

Cost: ONE shuffle on the key + a per-key sort — identical asymptotics
to a regular sort-merge join, no row explosion, no driver state. Tag
ordering makes ties (right.ts == left.ts) count as "at or before".

DuckDB has native ASOF JOIN, so the operator is oracle-comparable —
provided the right side is unique per (key, ts) (otherwise "latest
right row" is ambiguous in both engines); callers pre-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``key`` (nulls when no
    prior right row exists). Right must be unique per (key, right_ts)."""
    lcols = [c for c in left.columns if c not in (key, left_ts)]
    l_tagged = left.select(
        key,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        key,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc("__ts"), F.asc("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        key,
        "__ts",
        "__tag",
        *lcols,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return filled.filter(F.col("__tag") == 1).drop("__tag").withColumnRenamed(
        "__ts", left_ts
    )


def q_purchase_time_since_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join in anger: for every purchase event, microseconds since
    the user's most recent view at-or-before it (null-free: only
    purchases with a prior view). Oracle: DuckDB native ASOF JOIN."""
    t = load(spark, sf_dir)
    e = t.events.select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("us")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "us"
    )
    # unique per (user, ts): keep the smallest view event_id per instant
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("us").alias("v_us"))
        .agg(F.min("event_id").alias("view_event_id"))
    )
    joined = asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="us",
        right_ts="v_us",
        right_cols=["v_us", "view_event_id"],
    )
    return (
        joined.filter(F.col("asof_v_us").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.col("asof_view_event_id").alias("view_event_id"),
            (F.col("us") - F.col("asof_v_us")).alias("us_since_view"),
        )
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix per the user timeline
    (lag over (user, ts, event_id)) — the Markov-chain input of
    behavioral analytics. Exact integer/string comparisons throughout."""
    t = load(spark, sf_dir)
    e = t.events.select(
        "user_id", "event_type", epoch_us("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    pairs = e.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


RANGE_5MIN_US = 5 * 60 * 1_000_000


def q_events_preceding_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-frame window — the scale-safe form of a time-range
    self-join: for each event, how many same-user events (and how much
    value) landed in the strictly-preceding 5 minutes. RANGE BETWEEN on
    epoch-µs ordering does this in one shuffle + per-key sort; the
    equivalent inequality self-join would be O(events x window)."""
    t = load(spark, sf_dir)
    e = t.events.select(
        "user_id", "event_id", epoch_us("ts").alias("us"),
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("us"))
        .rangeBetween(-RANGE_5MIN_US, -1)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_prev_5min"),
        F.round(F.coalesce(F.sum("v").over(w), F.lit(0).cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("value_prev_5min"),
    )


RANGE_10MIN_US = 10 * 60 * 1_000_000


def range_join_counts(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_us: int,
) -> DataFrame:
    """Interval/range join, binned: for each left row, the right rows
    with ``left_ts < right_ts <= left_ts + window_us`` on the same key,
    pre-aggregated to (n_matches, sum value).

    The naive encoding is an inequality join — Spark plans it as a
    per-key nested loop, O(left×right) within each key. The scale-safe
    form bins the time axis at the window width: a right row in bucket
    b can only match left rows in buckets b-1 and b, so joining on
    (key, bucket) with the left side expanded to 2 buckets bounds the
    candidate set to an equi-join, then the exact range predicate
    filters residuals. Shuffle volume: 2×|left| + |right| rows on a
    composite key — no quadratic blowup, skew bounded by events per
    key per window."""
    # integer division (`div`), never double `/`: at 100 TB the epoch-µs
    # values are large enough that an IEEE quotient can round up across
    # a bucket boundary and silently drop a match
    lb = F.expr(f"{left_ts} div {window_us}")
    l2 = left.select(
        key,
        F.col(left_ts).alias("__l_us"),
        F.explode(F.array(lb, lb + 1)).alias("__bucket"),
    )
    r2 = right.select(
        key,
        F.col(right_ts).alias("__r_us"),
        F.col("value").cast("decimal(12,2)").alias("__v"),
        F.expr(f"{right_ts} div {window_us}").alias("__bucket"),
    )
    matched = l2.join(r2, [key, "__bucket"]).filter(
        (F.col("__r_us") > F.col("__l_us"))
        & (F.col("__r_us") <= F.col("__l_us") + window_us)
    )
    return matched.groupBy(key, "__l_us").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.sum("__v").alias("sum_value"),
    )


def q_purchase_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join in anger: for every purchase event, how many error
    events (and their total value) the same user produced in the 10
    minutes right after it — zeros kept via a left join back to the
    purchase spine. Oracle: the equivalent SQL inequality join."""
    t = load(spark, sf_dir)
    e = t.events.select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("us"), "value"
    )
    purchases = e.filter(F.col("event_type") == "purchase")
    errors = e.filter(F.col("event_type") == "error")
    # both sides derive from the same scan: rename the agg's key columns
    # so the re-join is unambiguous (and Catalyst can't confuse lineage)
    agg = range_join_counts(
        purchases, errors, key="user_id", left_ts="us", right_ts="us",
        window_us=RANGE_10MIN_US,
    ).select(
        F.col("user_id").alias("__k"),
        F.col("__l_us").alias("__p_us"),
        "n_matches",
        "sum_value",
    )
    return (
        purchases.join(
            agg,
            (purchases.user_id == F.col("__k")) & (purchases.us == F.col("__p_us")),
            "left",
        )
        .select(
            purchases.user_id,
            "event_id",
            F.coalesce("n_matches", F.lit(0)).alias("n_errors_10min"),
            F.round(
                F.coalesce(F.col("sum_value"), F.lit(0).cast("decimal(12,2)")), 2
            )
            .cast("double")
            .alias("error_value_10min"),
        )
    )


def gap_fill_daily(
    agg: DataFrame,
    key: str,
    day: str,
    value: str,
    spine_bounds: DataFrame,
) -> DataFrame:
    """Regularize a sparse per-(key, day) aggregate onto a dense daily
    spine and forward-fill missing days — the time-series resampling
    primitive (downsample happened upstream; this is the gap-fill +
    ffill half).

    ``spine_bounds`` is a 1-row (day_min, day_max) DataFrame; the dense
    spine is keys × sequence(day_min, day_max) — calendar-bounded, so
    the explode is tiny no matter how large the fact was. The ffill
    window runs over the SPINE (|keys| × days rows), never the fact:
    at 100 TB the fact collapses to day grain before this operator,
    so the low-cardinality partition is safe — its partition size is
    bounded by the calendar, not the data."""
    keys = agg.select(key).distinct()
    spine = (
        keys.crossJoin(F.broadcast(spine_bounds))
        .select(
            key,
            F.explode(
                F.sequence(
                    F.col("day_min"),
                    F.col("day_max"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias(day),
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy(day)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(agg, [key, day], "left")
    return joined.select(
        key,
        day,
        F.col(value).isNull().alias("is_gap"),
        F.last(value, ignorenulls=True).over(w).alias(f"{value}_filled"),
    )


def q_daily_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily order-revenue series per market segment, with gaps
    forward-filled (carry the last observed day's revenue) and flagged.

    The per-day aggregate is exact decimal money; the fill copies
    already-rounded doubles, so the series is bit-identical across
    engines. Leading gaps (before a segment's first order) stay NULL —
    both engines agree."""
    t = load(spark, sf_dir)
    day = F.col("o_orderdate").cast("date")
    agg = (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"), day.alias("day"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("revenue")
        )
    )
    bounds = t.orders.agg(
        F.min(day).alias("day_min"), F.max(day).alias("day_max")
    )
    filled = gap_fill_daily(agg, "segment", "day", "revenue", bounds)
    return filled.select(
        "segment",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "is_gap",
        F.col("revenue_filled").alias("revenue"),
    )


def q_open_orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-interval counting: how many orders are OPEN on each
    calendar day, where an order is open from its order date until its
    last line ships — the backlog/occupancy query (active sessions,
    concurrent rentals, beds filled) that naive SQL writes as a
    day×interval join.

    Delta encoding: each order contributes +1 on its start day and −1
    the day after it closes; per-day delta sums + one running sum over
    the calendar spine reconstruct the concurrency. Cost is 2 rows per
    interval plus a calendar-bounded window — at 100 TB this replaces
    a days×orders blowup with one combinable aggregate (the interval
    table never re-scans), which is why every occupancy pipeline ships
    this shape. The spine comes from the 1-row bounds broadcast
    (sequence over date range), so days with no delta still report the
    carried count.

    Output is bit-exact in both engines: integer deltas, integer
    running sum, ISO day strings."""
    t = load(spark, sf_dir)
    spans = (
        t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("o_orderkey")
        .agg(
            F.min(F.col("o_orderdate").cast("date")).alias("open_day"),
            # the fixtures violate ship_after_order on purpose; clamp
            # to same-day close so inverted intervals count one day
            F.greatest(
                F.max(F.col("l_shipdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            ).alias("close_day"),
        )
    )
    deltas = spans.select(
        F.col("open_day").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            F.date_add("close_day", 1).alias("day"), F.lit(-1).alias("delta")
        )
    )
    per_day = deltas.groupBy("day").agg(F.sum("delta").alias("d"))
    bounds = spans.agg(
        F.min("open_day").alias("day_min"), F.max("close_day").alias("day_max")
    )
    spine = bounds.select(
        F.explode(F.sequence("day_min", "day_max")).alias("day")
    )
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    series = (
        spine.join(per_day, "day", "left")
        .select("day", F.coalesce("d", F.lit(0)).alias("d"))
        .select(
            "day",
            F.sum("d").over(w).cast("long").alias("n_open"),
        )
    )
    return series.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n_open"
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the right row with the SMALLEST
    ``right_ts`` ≥ ``left_ts`` within the same ``key`` — the forward
    direction of the as-of join (pandas ``merge_asof
    direction='forward'``). Same union-tag + running-fill machinery as
    :func:`asof_join`, with the window scanning the FUTURE
    (currentRow→unboundedFollowing, FIRST non-null) and ties ordered
    left-before-right (__tag DESC) so a right row AT the exact left
    timestamp falls inside the left row's future frame and matches
    (≥ semantics, mirroring the backward form's ≤). Scale: one shuffle on key, per-key window over the
    entity's own timeline — identical economics to the backward form."""
    lcols = [c for c in left.columns if c not in (key, left_ts)]
    l_tagged = left.select(
        key,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        key,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc("__ts"), F.desc("__tag"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        key,
        "__ts",
        "__tag",
        *lcols,
        *[
            F.first(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return filled.filter(F.col("__tag") == 1).drop("__tag").withColumnRenamed(
        "__ts", left_ts
    )


def q_view_to_purchase_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join in anger: for every view event, microseconds
    until the user's NEXT purchase at-or-after it — the conversion-lag
    signal of funnel analytics (the mirror of
    q_purchase_time_since_view's backward attribution). Oracle: the
    equivalent inequality-join + min aggregation in DuckDB."""
    t = load(spark, sf_dir)
    e = t.events.select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("us")
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "us"
    )
    # unique per (user, ts): keep the smallest purchase event_id per instant
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("us").alias("p_us"))
        .agg(F.min("event_id").alias("purchase_event_id"))
    )
    joined = asof_join_forward(
        views,
        purchases,
        key="user_id",
        left_ts="us",
        right_ts="p_us",
        right_cols=["p_us", "purchase_event_id"],
    )
    return joined.filter(F.col("asof_p_us").isNotNull()).select(
        "user_id",
        "event_id",
        F.col("asof_purchase_event_id").alias("purchase_event_id"),
        (F.col("asof_p_us") - F.col("us")).alias("us_to_purchase"),
    )


def q_order_interval_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL OVERLAP JOIN — the third temporal-join shape Spark
    lacks natively (backward as-of, forward as-of, and now interval
    overlap): per customer, every pair of their orders whose active
    intervals [o_orderdate, max(l_shipdate)] intersect, with the exact
    inclusive overlap length in days. The operational question is
    concurrency: which orders were in flight at the same time for the
    same customer (fulfilment contention, split-shipment candidates).

    Spark-first plan: the interval table is one map-side-combinable
    max per order; the overlap join is an EQUI-join on the partition
    key (custkey) with the interval predicate applied post-join, so
    the only shuffle is the per-key co-location and the fanout is
    bounded by orders-per-customer (a bounded domain here — the
    datagen caps orders per customer; for unbounded keys the standard
    scale path is time-bucketing the intervals so each pair meets in
    exactly one bucket, the `copurchase_edges` banding trick). Never a
    cartesian or a theta-join over raw rows. Dates compare as exact
    integer days on both engines. The fixtures deliberately contain
    ship-before-order rows (see `date_rule_violations`), so the end is
    clamped to at least the start — an order is active on its order
    date — keeping every interval well-formed and every emitted
    overlap ≥ 1 day. Oracle: the identical self-join in DuckDB
    (date - date is integer days).

    Output: (custkey, orderkey_a, orderkey_b, overlap_days), pairs
    keyed a < b so each unordered pair appears once."""
    t = load(spark, sf_dir)
    ends = t.lineitem.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("end_d")
    )
    iv = (
        t.orders.select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("start_d"),
        )
        .join(ends, F.col("o_orderkey") == F.col("l_orderkey"))
        .drop("l_orderkey")
        .withColumn("end_d", F.greatest("start_d", "end_d"))
    )
    a = iv.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey_a"),
        F.col("start_d").alias("s_a"),
        F.col("end_d").alias("e_a"),
    )
    b = iv.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey_b"),
        F.col("start_d").alias("s_b"),
        F.col("end_d").alias("e_b"),
    )
    return (
        a.join(b, "custkey")
        .filter(
            (F.col("orderkey_a") < F.col("orderkey_b"))
            & (F.col("s_a") <= F.col("e_b"))
            & (F.col("s_b") <= F.col("e_a"))
        )
        .select(
            "custkey",
            "orderkey_a",
            "orderkey_b",
            (
                F.datediff(
                    F.least("e_a", "e_b"), F.greatest("s_a", "s_b")
                )
                + 1
            ).alias("overlap_days"),
        )
    )


#: CUSUM design: slack (allowance) and alarm threshold as fractions of
#: the daily-revenue sd — k = sd/2 detects ~1-sd level shifts fastest,
#: h = 4 sd is the classic ARL trade-off (Page 1954; Montgomery SPC).
CUSUM_K_SD_HALVES = 1  # k = 1 * sd/2
CUSUM_H_SD = 4


def q_revenue_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detector over daily revenue — the
    sequential level-shift monitor next to the 3σ point-anomaly window
    (``event_volume_anomalies``): S_t = max(0, S_{t−1} + x_t − μ − k)
    accumulates small persistent drifts a per-point test never sees.

    The recursion LOOKS sequential, but clamp-at-zero folds admit the
    SCAN IDENTITY (the ``part_stock_balance`` trick): S_t = C_t −
    min_{τ≤t} C_τ with C the plain prefix sum of (x − μ − k) — two
    cumulative windows over the bounded DAY grid, no sequential fold.
    μ, the sd (exact integer ``isqrt``), and thus k = sd/2 and the
    alarm bar h = 4·sd all derive from the same bounded grid; exact
    cents throughout.

    Scale: fact → day grain is one map-side-combinable shuffle;
    both windows run over the calendar-bounded grid.

    Output: (day, revenue_cents, cusum_cents, alarm) for every day."""
    from pyspark.sql import Window

    from ..functions import _idiv, dec2, isqrt

    t = load(spark, sf_dir)
    daily = (
        t.orders.select(
            F.to_date("o_orderdate").alias("day"),
            (dec2("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").alias("rev"))
    )
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("s1"),
        F.sum(dd(F.col("rev")) * F.col("rev")).alias("s2"),
    ).select(
        _idiv(dd(F.col("s1")), F.col("n")).alias("mu"),
        isqrt(
            _idiv(
                dd(F.col("n")) * F.col("s2") - dd(F.col("s1")) * F.col("s1"),
                dd(F.col("n")) * (dd(F.col("n")) - 1),
            )
        ).alias("sd"),
    )
    # k = sd/2 stays integer via shiftright — no float enters the fold
    g = daily.crossJoin(F.broadcast(stats)).withColumn(
        "y",
        F.col("rev")
        - F.col("mu")
        - F.shiftright(F.col("sd") * CUSUM_K_SD_HALVES, 1),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g = g.withColumn("cum", F.sum("y").over(w)).withColumn(
        "run_min", F.least(F.min("cum").over(w), F.lit(0).cast("long"))
    )
    return g.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("rev").alias("revenue_cents"),
        (F.col("cum") - F.col("run_min")).alias("cusum_cents"),
        (
            F.col("cum") - F.col("run_min") > F.col("sd") * CUSUM_H_SD
        ).alias("alarm"),
    ).orderBy("day")


def q_temporal_gap_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL COALESCE (temporal normalization): merge each
    customer's overlapping-or-day-adjacent order-activity intervals
    [o_orderdate, max(l_shipdate)] into maximal disjoint ISLANDS —
    the temporal-database `pack` operator, and the fourth interval
    shape in the temporal family (backward as-of, forward as-of,
    overlap join, now coalesce). The operational reading: how many
    distinct busy periods did a customer have, and how long was the
    longest.

    Spark-first plan: the classic gaps-and-islands scan — order each
    customer's intervals by (start, orderkey), take the running max of
    end over STRICTLY preceding rows, mark an island start wherever
    the current start exceeds that running max (no overlap with
    anything before it), and sum the markers to mint island ids. Both
    windows are per-customer (bounded), never global; islands then
    aggregate per (customer, island) and once more per customer. All
    date arithmetic is exact integer days on both engines; ends are
    clamped to starts like the overlap join (fixtures contain
    deliberate ship-before-order rows).

    Output: (custkey, n_orders, n_islands, covered_days,
    longest_island_days) — covered_days is the union length, which the
    pytest cross-checks against a day-set recompute."""
    t = load(spark, sf_dir)
    ends = t.lineitem.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("end_d")
    )
    iv = (
        t.orders.select(
            "o_orderkey",
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").cast("date").alias("start_d"),
        )
        .join(ends, F.col("o_orderkey") == F.col("l_orderkey"))
        .drop("l_orderkey")
        .withColumn("end_d", F.greatest("start_d", "end_d"))
    )
    w_prev = (
        Window.partitionBy("custkey")
        .orderBy(F.asc("start_d"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy("custkey").orderBy(
        F.asc("start_d"), F.asc("o_orderkey")
    )
    marked = iv.withColumn(
        "new_island",
        (
            # merge overlapping AND day-adjacent intervals (the
            # standard temporal `pack`): a new island starts only when
            # a full empty day separates it from everything before
            F.col("start_d")
            > F.date_add(
                F.coalesce(
                    F.max("end_d").over(w_prev),
                    F.lit("0001-01-01").cast("date"),
                ),
                1,
            )
        ).cast("long"),
    ).withColumn("island", F.sum("new_island").over(w_run))
    islands = marked.groupBy("custkey", "island").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("start_d").alias("s"),
        F.max("end_d").alias("e"),
    )
    return (
        islands.groupBy("custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.datediff("e", "s") + 1).alias("covered_days"),
            # long, pairing with the oracle's BIGINT (typetags.py)
            F.max(F.datediff("e", "s") + 1)
            .cast("long")
            .alias("longest_island_days"),
        )
        .orderBy("custkey")
    )


#: SPRT design: H0 p=0.15 vs H1 p=0.20 urgent-order share, alpha =
#: beta = 0.05 (boundary ln 19). Increments use exact integer-ratio
#: logs: L1 = ln(p1/p0) = ln(4/3), L2 = ln((1-p0)/(1-p1)) = ln(17/16).
SPRT_L1 = (4, 3)
SPRT_L2 = (17, 16)
SPRT_BOUND = (19, 1)


def q_sprt_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD SEQUENTIAL PROBABILITY RATIO TEST (Wald 1945) on the daily
    urgent-order share — the SEQUENTIAL member of the inference family
    (the t/U/KS/randomization tests are fixed-sample; CUSUM detects
    level shifts; the SPRT answers "stop as soon as the evidence
    decides" with guaranteed error rates): cumulative log-likelihood
    ratio for H1: p = 0.20 vs H0: p = 0.15 of an order being URGENT,
    walked day by day; accept H1 at +ln 19, H0 at −ln 19 (α = β =
    0.05), at the FIRST crossing.

    Exact fixed point: the day increment k·ln(4/3) − (n−k)·ln(17/16)
    uses ``ln_micro`` on literal integer ratios (both engines fold the
    same constants); the walk is a cumulative sum over the bounded DAY
    grid (calendar-span window, never raw rows) and the first-crossing
    scan is one aggregate over that grid.

    Output (1 row): (n_days, n_orders, n_urgent, llr_final_micro,
    boundary_micro, decision, decision_day)."""
    t = load(spark, sf_dir)
    return sprt_finish(sprt_day_grid(t.orders))


def sprt_day_grid(orders: DataFrame) -> DataFrame:
    """The (day, n, k) sufficient-statistic grid behind the SPRT —
    shared by the batch query and the streamed drain (count/sum are
    additive and order-insensitive, so the grid is complete-mode
    streamable and micro-batch-slicing-independent)."""
    return (
        orders.select(
            F.col("o_orderdate").cast("date").alias("d"),
            (F.col("o_orderpriority") == "1-URGENT")
            .cast("long")
            .alias("u"),
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("u").alias("k"))
    )


def sprt_finish(day: DataFrame) -> DataFrame:
    """Cumulative LLR walk + first-crossing decision over the bounded
    day grid (batch-side finisher shared by both surfaces)."""
    from ..functions import ln_micro

    l1 = ln_micro(F.lit(SPRT_L1[0]), F.lit(SPRT_L1[1]))
    l2 = ln_micro(F.lit(SPRT_L2[0]), F.lit(SPRT_L2[1]))
    bound = ln_micro(F.lit(SPRT_BOUND[0]), F.lit(SPRT_BOUND[1]))
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walk = day.withColumn(
        "llr",
        F.sum(F.col("k") * l1 - (F.col("n") - F.col("k")) * l2).over(w),
    ).withColumn("bound", bound)
    hits = walk.select(
        "d",
        "n",
        "k",
        "llr",
        "bound",
        F.when(F.col("llr") >= F.col("bound"), F.lit("accept_h1"))
        .when(F.col("llr") <= -F.col("bound"), F.lit("accept_h0"))
        .alias("hit"),
    )
    first = hits.filter(F.col("hit").isNotNull()).agg(
        F.min(F.struct("d", "hit")).alias("f")
    )
    tot = hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n").alias("n_orders"),
        F.sum("k").alias("n_urgent"),
        F.max(F.struct("d", "llr")).alias("last"),
        F.max("bound").alias("boundary_micro"),
    )
    return tot.crossJoin(F.broadcast(first)).select(
        "n_days",
        "n_orders",
        "n_urgent",
        F.col("last.llr").alias("llr_final_micro"),
        "boundary_micro",
        F.coalesce(F.col("f.hit"), F.lit("continue")).alias("decision"),
        F.date_format(F.col("f.d"), "yyyy-MM-dd").alias("decision_day"),
    )


def q_revenue_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD–WOLFOWITZ RUNS TEST on daily revenue vs its median — the
    nonparametric RANDOMNESS test completing the monitoring family
    (CUSUM detects level shifts, KS detects distribution drift, the
    runs test asks "is the above/below-median sequence random at all"
    — trend and oscillation both fail it): R = number of sign runs,
    compared against E[R] = 1 + 2·n₁n₂/n with
    Var[R] = 2n₁n₂(2n₁n₂−n) / (n²(n−1)).

    Exact fixed point: the day grid and its lower median are exact
    integers; z² is the single rational
    (n(R−1)−2n₁n₂)²·(n−1) / (2n₁n₂(2n₁n₂−n)) trunc-divided at micro
    (no square root needed — the α=0.05 two-sided decision is
    z² > 1.96² = 3.8416); the sign of R−E[R] rides along.

    Scale: one shuffle to the calendar-bounded day grid; the median,
    the run count (a lag comparison), and the cumulative rank all run
    over that bounded grid, never raw rows.

    Output (1 row): (n_days, n_above, n_below, n_runs, mu_micro,
    z2_micro, z_sign, nonrandom)."""
    from ..functions import _idiv, dec2

    t = load(spark, sf_dir)
    daily = (
        t.orders.select(
            F.col("o_orderdate").cast("date").alias("d"),
            (dec2("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").alias("rev"))
    )
    w_rank = Window.orderBy(F.asc("rev"), F.asc("d"))
    n_tot = daily.agg(F.count(F.lit(1)).alias("n_days"))
    med = (
        daily.withColumn("rk", F.row_number().over(w_rank))
        .crossJoin(F.broadcast(n_tot))
        .filter(F.col("rk") == F.expr("(n_days + 1) div 2"))
        .select(F.col("rev").alias("median_rev"))
    )
    signed = daily.crossJoin(F.broadcast(med)).select(
        "d", (F.col("rev") > F.col("median_rev")).cast("long").alias("s")
    )
    w_day = Window.orderBy("d")
    runs = signed.withColumn(
        "new_run",
        (
            F.lag("s").over(w_day).isNull()
            | (F.lag("s").over(w_day) != F.col("s"))
        ).cast("long"),
    )
    agg = runs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").alias("n1"),
        F.sum(F.lit(1) - F.col("s")).alias("n2"),
        F.sum("new_run").alias("r"),
    )
    from ..functions import _idiv

    diff = F.col("n") * (F.col("r") - 1) - 2 * F.col("n1") * F.col("n2")
    # |diff| <= n*n/2 ~ 3e6 at test SF; diff^2*(n-1) <= ~2e16 fits
    # int64; the final *1e6 runs in DECIMAL(38,0) via _idiv
    z2 = _idiv(
        (diff * diff * (F.col("n") - 1)).cast("decimal(38,0)")
        * F.lit(1_000_000),
        2 * F.col("n1") * F.col("n2")
        * (2 * F.col("n1") * F.col("n2") - F.col("n")),
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.expr(
            "CAST(1000000 + (2 * n1 * n2 * 1000000) div n AS BIGINT)"
        ).alias("mu_micro"),
        z2.alias("z2_micro"),
        F.when(diff > 0, F.lit(1))
        .when(diff < 0, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("z_sign"),
        (z2 > F.lit(3_841_600)).alias("nonrandom"),
    )


#: Page-Hinkley tolerance (delta) and alarm bar (lambda), both on the
#: scale-free ppm relative-deviation scale: a day must deviate > 5%
#: from the running mean before it contributes, and the cumulative
#: drift must reach 0.5 relative units to alarm.
PH_DELTA_PPM = 50_000
PH_LAMBDA_PPM = 500_000


def q_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE–HINKLEY drift detector (Page 1954; Hinkley 1971) on daily
    revenue — the SEQUENTIAL drift monitor of the change family:
    CUSUM (`revenue_cusum`) tracks deviation from a FIXED reference,
    binary segmentation (`revenue_changepoint`) localizes offline;
    Page–Hinkley is the online form — deviation from the RUNNING mean,
    so it needs no training window and adapts as the level moves.

    Scale-free fixed point: the per-day increment is the relative
    deviation dev = (x_t − x̄_t)/x̄_t in ppm — exactly
    (x_t·t − S_t)·10⁶ trunc-div S_t (integer cross-multiplication;
    trunc-toward-zero on both engines via the sign-split idiom).
    Then the classic two one-sided ledgers:

        m_up_t = Σ (dev − δ);  PH_up = m_up − min_{i≤t} m_up
        m_dn_t = Σ (dev + δ);  PH_dn = max_{i≤t} m_dn − m_dn

    alarm when PH > λ. δ, λ are ppm constants — the detector behaves
    identically at every data scale (the point of normalizing).

    Scale: one map-side-combinable daily aggregate; every window runs
    on the bounded calendar grid (the km_curve/ACF precedent). At
    100 TB the day grid is still ~thousands of rows.

    Output: one row per day (day, cents, dev_ppm, ph_up_ppm,
    ph_dn_ppm, alarm_up, alarm_dn), day-ordered."""
    t = load(spark, sf_dir)
    return ph_finish(ph_daily_grid(t.orders))


def ph_daily_grid(orders: DataFrame) -> DataFrame:
    """The (day, cents) revenue grid behind Page-Hinkley — ONE
    additive, order-insensitive aggregate, so it is complete-mode
    streamable as-is (the bootstrap_grid contract); shared by the
    batch entry and the ``page_hinkley_streamed`` drain so the two
    surfaces can never drift."""
    from ..functions import _idiv, dec2

    return (
        orders.select(
            F.col("o_orderdate").cast("date").alias("day"),
            (dec2("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )


def ph_finish(daily: DataFrame) -> DataFrame:
    """Page-Hinkley ledgers over the bounded day grid (the km_curve
    bounded-window convention) — the finisher shared by batch and
    streamed surfaces."""
    from ..functions import _idiv

    w_asc = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g = (
        daily.withColumn("t", F.row_number().over(Window.orderBy("day")))
        .withColumn("s", F.sum("cents").over(w_asc))
    )
    num = (
        F.col("cents").cast("decimal(38,0)") * F.col("t") - F.col("s")
    ) * F.lit(1_000_000)
    dev = F.when(num < 0, -_idiv(-num, F.col("s"))).otherwise(
        _idiv(num, F.col("s"))
    )
    d = g.withColumn("dev_ppm", dev)
    d = d.withColumn(
        "m_up", F.sum(F.col("dev_ppm") - F.lit(PH_DELTA_PPM)).over(w_asc)
    ).withColumn(
        "m_dn", F.sum(F.col("dev_ppm") + F.lit(PH_DELTA_PPM)).over(w_asc)
    )
    d = d.withColumn(
        "ph_up_ppm", F.col("m_up") - F.min("m_up").over(w_asc)
    ).withColumn("ph_dn_ppm", F.max("m_dn").over(w_asc) - F.col("m_dn"))
    return d.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cents",
        "dev_ppm",
        F.col("ph_up_ppm").cast("long").alias("ph_up_ppm"),
        F.col("ph_dn_ppm").cast("long").alias("ph_dn_ppm"),
        (F.col("ph_up_ppm") > PH_LAMBDA_PPM).alias("alarm_up"),
        (F.col("ph_dn_ppm") > PH_LAMBDA_PPM).alias("alarm_dn"),
    ).orderBy("day")


#: R/S analysis block sizes (powers of two so every ln(n) spacing is
#: uniform) and the isqrt contract bound for the squared R/S ratio.
HURST_SCALES = [16, 32, 64, 128, 256]
HURST_RS2_MAX = 1 << 52


def q_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HURST EXPONENT of daily revenue by RESCALED-RANGE (R/S)
    analysis (Hurst 1951; Mandelbrot & Wallis 1969) — the long-memory
    diagnostic next to the family's detectors (`revenue_runs_test`
    asks "random?", ACF/PACF measure linear memory at fixed lags; the
    Hurst slope summarizes persistence across ALL horizons: H ≈ 0.5
    random walk, H > 0.5 trending, H < 0.5 mean-reverting).

    For each block size n in ``HURST_SCALES``: split the day-indexed
    series into complete blocks, and per block keep the classic
    statistic as EXACT integers by clearing the block mean's
    denominator — with S_b the block sum and cum_t the prefix sum,

        W_t = n·cum_t − t·S_b          (= n · mean-adjusted Z_t)
        R'  = max W − min W            (= n · R;  W_n = 0 anchors 0)
        V_b = Σ_t (n·x_t − S_b)²       (= n³ · S²,  DECIMAL(38,0))
        (R/S)²·10⁶ = R'²·n·10⁶ // V_b  (scale-free, guarded < 2^52)

    so rs_milli = isqrt((R/S)²·10⁶) is exact in both engines. Per
    scale, blocks average to avg_rs_milli (exact floor), and the
    Hurst slope is the cross-multiplied integer OLS of
    ln_micro(avg_rs_milli/1000) on ln_micro(n) — the
    `nation_revenue_trend` kit over 5 points, sign-split division so
    truncation agrees cross-engine.

    Scale: fact → day grain is one shuffle; blocks and windows live on
    the calendar-bounded day grid; the fit collapses 5 rows. Blocks
    with zero variance or R/S < 1 are dropped deterministically (both
    engines share the rule).

    Output: one row per surviving scale (block_n, n_blocks,
    avg_rs_milli, ln_n_micro, ln_rs_micro) + the shared hurst_milli."""
    from ..functions import _idiv, dec2, isqrt, ln_micro

    t = load(spark, sf_dir)
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    daily = (
        t.orders.select(
            F.to_date("o_orderdate").alias("day"),
            (dec2("o_totalprice") * 100).cast("long").alias("rev"),
        )
        .groupBy("day")
        .agg(F.sum("rev").alias("rev"))
    )
    # day index over the bounded calendar grid (the
    # revenue_changepoint convention)
    idx = (
        daily.withColumn(
            "idx", F.row_number().over(Window.orderBy("day")) - 1
        )
        .withColumn(
            "block_n",
            F.explode(F.array(*[F.lit(n) for n in HURST_SCALES])),
        )
        .withColumn("blk", F.expr("idx div block_n"))
        .withColumn("tpos", (F.col("idx") % F.col("block_n")).cast("long"))
    )
    wb = Window.partitionBy("block_n", "blk").orderBy("tpos")
    wp = Window.partitionBy("block_n", "blk")
    rows = idx.select(
        "block_n",
        "blk",
        "rev",
        F.sum("rev").over(wb.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        (F.col("tpos") + 1).alias("t"),
        F.sum("rev").over(wp).alias("sb"),
        F.count(F.lit(1)).over(wp).alias("cnt"),
    ).filter(F.col("cnt") == F.col("block_n"))
    w = F.col("block_n") * F.col("cum") - F.col("t") * F.col("sb")
    blocks = rows.groupBy("block_n", "blk").agg(
        (F.max(w) - F.min(w)).alias("rp"),
        F.sum(
            (dd(F.col("block_n")) * F.col("rev") - F.col("sb"))
            * (dd(F.col("block_n")) * F.col("rev") - F.col("sb"))
        ).alias("vb"),
    ).filter(F.col("vb") > 0)
    rs2 = _idiv(
        dd(F.col("rp")) * F.col("rp") * F.col("block_n") * F.lit(1_000_000),
        F.col("vb"),
    )
    scored = blocks.select(
        "block_n",
        F.when(
            F.lit(True),
            F.when(
                rs2 >= F.lit(HURST_RS2_MAX),
                F.raise_error(
                    F.lit(
                        "hurst contract violated: (R/S)^2*1e6 >= 2^52 "
                        "breaks exact isqrt; rescale upstream"
                    )
                ).cast("long"),
            ).otherwise(isqrt(rs2)),
        ).alias("rs_milli"),
    )
    per_scale = (
        scored.groupBy("block_n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum("rs_milli").alias("rs_sum"),
        )
        .select(
            "block_n",
            "n_blocks",
            _idiv(dd(F.col("rs_sum")), F.col("n_blocks")).alias(
                "avg_rs_milli"
            ),
        )
        .filter(F.col("avg_rs_milli") >= 1000)
        .select(
            F.col("block_n").cast("long").alias("block_n"),
            "n_blocks",
            "avg_rs_milli",
            ln_micro(F.col("block_n"), F.lit(1)).alias("ln_n_micro"),
            ln_micro(F.col("avg_rs_milli"), F.lit(1000)).alias(
                "ln_rs_micro"
            ),
        )
    )
    fit = per_scale.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ln_n_micro").alias("sx"),
        F.sum("ln_rs_micro").alias("sy"),
        F.sum(dd(F.col("ln_n_micro")) * F.col("ln_rs_micro")).alias("sxy"),
        F.sum(dd(F.col("ln_n_micro")) * F.col("ln_n_micro")).alias("sxx"),
    ).select(
        (
            dd(F.col("k")) * F.col("sxy") - dd(F.col("sx")) * F.col("sy")
        ).alias("num"),
        (
            dd(F.col("k")) * F.col("sxx") - dd(F.col("sx")) * F.col("sx")
        ).alias("den"),
    )
    slope = F.when(
        F.col("num") < 0,
        -_idiv(-F.col("num") * F.lit(1000), F.col("den")),
    ).otherwise(_idiv(F.col("num") * F.lit(1000), F.col("den")))
    return (
        per_scale.crossJoin(F.broadcast(fit.select(slope.alias("hurst_milli"))))
        .select(
            "block_n",
            "n_blocks",
            "avg_rs_milli",
            "ln_n_micro",
            "ln_rs_micro",
            "hurst_milli",
        )
        .orderBy("block_n")
    )


#: Holt smoothing constants: dyadic rationals so every update is one
#: exact floor division (alpha = 1/4, beta = 1/8), and the forecast
#: horizon in weeks.
HOLT_ALPHA_DEN = 4
HOLT_BETA_DEN = 8
HOLT_HORIZON = 4


def q_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT LINEAR-TREND FORECAST (double exponential smoothing) of
    weekly revenue — the first actual FORECASTER next to the family's
    diagnostics (seasonality/ACF/PACF/changepoint/Hurst describe the
    series; this one extrapolates it):

        l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
        x̂_{t+h} = l_t + h·b_t

    Exact fixed point: α = 1/4 and β = 1/8 make every update ONE
    integer division — l_t = (x_t + 3(l+b)) ÷ 4, b_t = (l_t − l + 7b)
    ÷ 8 — where ÷ is TRUNCATE-toward-zero on both engines (DuckDB's
    ``//`` truncates on negatives — measured −7//2 = −3 — and Spark's
    ``_idiv`` does the same; the trend CAN go negative, so the two
    division conventions genuinely diverge and the truncating one is
    the repo's cross-engine standard). Seeds:
    l₂ = x₂, b₂ = x₂ − x₁ (observation-indexed; weeks with no orders
    are skipped, not zero-filled — the dense-rank convention).

    The recursion is sequential BY NATURE, but the state space is the
    calendar-bounded WEEK grid (~340 cells at any SF — TPC-H's date
    range is fixed), so the whole series folds in one
    ``aggregate()`` over a collected array: corpus-scale work is the
    map-side-combinable week aggregate; the fold is O(weeks), a
    constant. The DuckDB twin is a recursive CTE over the same grid —
    bit-for-bit including negative-trend floors.

    Output: one row per week from t = 3 (kind 'fit', one-step-ahead
    prediction l_{t−1}+b_{t−1} beside the actual) plus HOLT_HORIZON
    rows (kind 'forecast', actual NULL): (week_idx, kind,
    actual_cents, pred_cents)."""
    from ..functions import _idiv, dec2

    t = load(spark, sf_dir)
    weekly = (
        t.orders.select(
            F.floor(
                F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-05"))
                / 7
            ).alias("wk"),
            (dec2("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("wk")
        .agg(F.sum("c").alias("rev"))
    )
    arr = weekly.agg(
        F.array_sort(F.collect_list(F.struct("wk", "rev"))).alias("a")
    )
    # truncate-toward-zero division, the repo's cross-engine integer
    # convention (matches DuckDB's ``//`` on negatives)
    fd = lambda n, d: _idiv(n, F.lit(d))  # noqa: E731
    xs = F.expr("transform(a, s -> s.rev)")
    folded = arr.select(
        "a",
        F.aggregate(
            F.slice(xs, 3, F.size(xs)),
            F.struct(
                F.element_at(xs, 2).cast("long").alias("l"),
                (F.element_at(xs, 2) - F.element_at(xs, 1))
                .cast("long")
                .alias("b"),
                F.array().cast("array<long>").alias("fits"),
            ),
            lambda acc, x: F.struct(
                fd(x + 3 * (acc["l"] + acc["b"]), HOLT_ALPHA_DEN)
                .cast("long")
                .alias("l"),
                fd(
                    fd(x + 3 * (acc["l"] + acc["b"]), HOLT_ALPHA_DEN).cast(
                        "long"
                    )
                    - acc["l"]
                    + (HOLT_BETA_DEN - 1) * acc["b"],
                    HOLT_BETA_DEN,
                )
                .cast("long")
                .alias("b"),
                F.concat(
                    acc["fits"],
                    F.array((acc["l"] + acc["b"]).cast("long")),
                ).alias("fits"),
            ),
        ).alias("st"),
    ).localCheckpoint(eager=True)
    fits = folded.select(
        "a", F.posexplode(F.col("st.fits")).alias("k", "pred")
    ).select(
        (F.col("k") + 3).cast("long").alias("week_idx"),
        F.lit("fit").alias("kind"),
        F.expr("a[k + 2].rev").cast("long").alias("actual_cents"),
        F.col("pred").cast("long").alias("pred_cents"),
    )
    fut = folded.select(
        "a",
        F.explode(
            F.sequence(F.lit(1), F.lit(HOLT_HORIZON))
        ).alias("h"),
        F.col("st.l").alias("l"),
        F.col("st.b").alias("b"),
    ).select(
        (F.size("a") + F.col("h")).cast("long").alias("week_idx"),
        F.lit("forecast").alias("kind"),
        F.lit(None).cast("long").alias("actual_cents"),
        (F.col("l") + F.col("h") * F.col("b")).cast("long").alias(
            "pred_cents"
        ),
    )
    return fits.unionByName(fut).orderBy("week_idx")
