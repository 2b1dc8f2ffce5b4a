"""Event-time operators over the events table (north-star extension;
the reference is batch-only — SURVEY.md §2.8).

Batch forms of the streaming windows live here (window / session_window
on a static DataFrame); ``streaming/pipelines.py`` runs the same
transformations under readStream+watermark and the tests assert
batch-equivalence (availableNow).

Cross-engine parity: all bucket keys are integer epoch arithmetic
(unix_micros), never formatted timestamps — timezone- and
precision-proof against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import dec2, epoch_us, halfup_div

HOUR_US = 3_600_000_000
HALF_HOUR_US = 1_800_000_000
SESSION_GAP_US = 15 * 60 * 1_000_000


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event_type: count + sum(value).
    Expressed with the native ``F.window`` operator; the output key is
    the window start in epoch-µs."""
    t = load(spark, sf_dir)
    return (
        t.events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec2("value")), 2).cast("double").alias("total_value"),
        )
        .select(
            epoch_us(F.col("w.start")).alias("hour_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour long, 30 min step): every event lands in 2
    windows. Native ``F.window(ts, '1 hour', '30 minutes')``."""
    t = load(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            halfup_div(
                (F.sum(dec2("value")) * 100).cast("decimal(38,0)"),
                F.count(F.lit(1)) * 100,
                6,
            ).alias("avg_value"),
        )
        .select(
            epoch_us(F.col("w.start")).alias("win_start_us"),
            "n_events",
            "avg_value",
        )
    )


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user (15-min inactivity gap) via the native
    ``F.session_window``. A new session starts when the gap since the
    previous event is ≥ the gap duration (Spark's window is
    [start, last_event + gap))."""
    t = load(spark, sf_dir)
    return (
        t.events.groupBy(
            F.session_window("ts", "15 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec2("value")), 2).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            epoch_us(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "session_value",
        )
    )


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction (get_json_object) + per-type stats of the
    extracted value — the semi-structured column pattern."""
    t = load(spark, sf_dir)
    return (
        t.events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            halfup_div(F.sum("k").cast("decimal(38,0)"), F.count("k"), 6).alias(
                "avg_k"
            ),
            F.max("k").alias("max_k"),
        )
    )


def q_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity profile: event span, counts by kind (pivot-style
    conditional aggregation — single pass, no pivot shuffle)."""
    t = load(spark, sf_dir)
    e = t.events.select(
        "user_id", "event_type", "value", epoch_us("ts").alias("ts_us")
    )
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_purchase"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("n_error"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", dec2("value")).otherwise(
                    F.lit(0).cast("decimal(12,2)")
                )
            ),
            2,
        ).cast("double").alias("purchase_value"),
    )


#: Funnel stage order for q_event_funnel.
FUNNEL_STAGES = ["view", "click", "purchase"]


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user conversion funnel view → click → purchase: a user
    converts a stage only if their FIRST event of that stage happens
    after their first event of the previous stage (classic ordered
    funnel). One groupBy(user) with conditional min aggregates —
    single shuffle, exact integer-µs comparisons (oracle-matched)."""
    t = load(spark, sf_dir)
    e = t.events.select("user_id", "event_type", epoch_us("ts").alias("us"))
    firsts = e.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("us"))).alias(f"t_{s}")
            for s in FUNNEL_STAGES
        ]
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_view"))
    purchased = (
        clicked & F.col("t_purchase").isNotNull() & (F.col("t_purchase") > F.col("t_click"))
    )
    per_user = firsts.select(
        "user_id",
        viewed.alias("s_view"),
        clicked.alias("s_click"),
        purchased.alias("s_purchase"),
    )
    return per_user.select(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("s_view").cast("long")).alias("n_view"),
        F.sum(F.col("s_click").cast("long")).alias("n_click"),
        F.sum(F.col("s_purchase").cast("long")).alias("n_purchase"),
    )


def q_user_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user event-type counts via the native pivot operator
    with an EXPLICIT value list (an implicit list costs an extra
    distinct pass and makes the output schema data-dependent)."""
    t = load(spark, sf_dir)
    types = ["view", "click", "purchase", "signup", "error"]
    return (
        t.events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in types],
        )
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the epoch-week of
    their first event; for each (cohort_week, weeks-since-cohort)
    cell, how many of that cohort's users were active. All integer
    arithmetic (µs → epoch day → epoch week), no date functions with
    engine-specific week rules.

    Scale: two map-side-combinable aggregates — distinct (user, week)
    activity with the per-user min folded in, then the cohort-cell
    count. Both shuffle on high-cardinality keys; no windows."""
    t = load(spark, sf_dir)
    per_user_week = (
        t.events.select("user_id", epoch_us("ts").alias("epoch_us"))
        .select("user_id", F.expr("epoch_us div 86400000000 div 7").alias("week"))
        .distinct()
        # consumed by two branches (cohort agg + join) — cache so the
        # scan+distinct runs once, not per branch
        .cache()
    )
    cohort = per_user_week.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        per_user_week.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-newest-per-key dedupe — the CDC "latest state" compaction
    every upsert log needs.

    Scale shape: NOT a row_number window (full per-key sort of every
    row). ``max(struct(ts, id, payload...))`` is an ordinary hash
    aggregate with map-side partial merge: each task keeps one struct
    per key, the shuffle moves #keys rows, not #events. Struct
    comparison is lexicographic, so (us, event_id) orders by time with
    the unique id as tiebreak."""
    t = load(spark, sf_dir)
    e = t.events.select(
        "user_id",
        F.struct(
            epoch_us("ts").alias("us"),
            "event_id",
            "event_type",
            F.col("value").cast("decimal(12,2)").alias("v"),
        ).alias("s"),
    )
    last = e.groupBy("user_id").agg(F.max("s").alias("s"))
    return last.select(
        "user_id",
        F.col("s.us").alias("last_us"),
        F.col("s.event_id").alias("last_event_id"),
        F.col("s.event_type").alias("last_event_type"),
        F.col("s.v").cast("double").alias("last_value"),
    )


ROLLING_WINDOW_DAYS = 7


def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the windowed
    COUNT(DISTINCT) Spark windows cannot express directly (distinct
    aggregates are unsupported over frames).

    The scale-safe encoding: reduce to DISTINCT (user, day) pairs
    first, then each pair votes for the ≤7 window END days it belongs
    to (explode of a 7-element sequence — linear fan-out, bounded by
    the window length), then one countDistinct per end day. Shuffles:
    pair-distinct + final groupBy. The inequality-join form (days ⋈
    pairs ON day BETWEEN end-6 AND end) the oracle uses would be a
    per-key nested loop at scale."""
    t = load(spark, sf_dir)
    pairs = (
        t.events.select(
            "user_id",
            F.expr(
                f"unix_micros(CAST(ts AS TIMESTAMP)) div {86_400_000_000}"
            ).alias("day"),
        )
        .distinct()
        .cache()  # consumed by votes + day spine
    )
    days = pairs.select("day").distinct()
    votes = pairs.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"), F.col("day") + (ROLLING_WINDOW_DAYS - 1)
            )
        ).alias("end_day"),
    )
    counted = votes.groupBy("end_day").agg(
        F.countDistinct("user_id").alias("n_users_7d")
    )
    # only days that actually occur in the data form the report spine
    return counted.join(
        days, counted.end_day == days.day, "left_semi"
    ).select(F.col("end_day").alias("day"), "n_users_7d")


#: Trailing window for q_event_volume_anomalies: the previous 24 hourly
#: buckets (RANGE frame in epoch-µs, so calendar gaps shrink the frame
#: instead of silently pulling in stale hours).
ANOMALY_TRAIL_US = 24 * HOUR_US
#: Minimum trailing buckets before an anomaly verdict is attempted —
#: fewer and the variance estimate is noise.
ANOMALY_MIN_TRAIL = 12


def q_event_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series volume anomaly detection: for every (event_type,
    hour) bucket, flag hours whose event count deviates from the
    trailing-24-hour mean by more than 3 population standard
    deviations — the standard ops/traffic-spike monitor, computed
    without a single float.

    |c − μ| > 3σ over the trailing frame (w buckets, S = Σcounts,
    Q = Σcounts²) is decided by the integer cross-multiply
    ``(w·c − S)² > 9·(w·Q − S²)`` — multiply through by w²; exact in
    DECIMAL(38,0) (HUGEINT on the DuckDB side), valid for hourly
    counts up to ~1e17. The trailing frame is a RANGE window in
    epoch-µs ``[-24h, -1h]`` (self-excluding, gap-aware); buckets with
    fewer than ``ANOMALY_MIN_TRAIL`` trailing hours report
    ``is_anomaly = false`` rather than a noise verdict. Every bucket
    row is returned with its flag, so the oracle hash covers the
    negative decisions too — the gate cannot pass vacuously.

    Scale: one groupBy shuffle to hourly grain (map-side combinable),
    then a window partitioned by event_type over the *bucket* table —
    rows = hours × types, ~5 orders of magnitude smaller than the
    fact; per-partition state is bounded by the calendar, not the
    data. No UDFs, no collect."""
    t = load(spark, sf_dir)
    hourly = (
        t.events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "event_type",
            epoch_us(F.col("w.start")).alias("hour_start_us"),
            "n_events",
        )
    )
    return volume_anomaly_finish(hourly)


def volume_anomaly_finish(hourly: DataFrame) -> DataFrame:
    """The anomaly verdict over an (event_type, hour_start_us,
    n_events) bucket table — shared by the batch query above and the
    streaming drain (the hourly table is what the stream maintains;
    the trailing-window test is a batch finish over it, the same
    split as the HLL register/estimate pair)."""
    from pyspark.sql import Window

    fr = (
        Window.partitionBy("event_type")
        .orderBy("hour_start_us")
        .rangeBetween(-ANOMALY_TRAIL_US, -HOUR_US)
    )
    c = F.col("n_events").cast("decimal(38,0)")
    stats = hourly.select(
        "event_type",
        "hour_start_us",
        "n_events",
        F.count(F.lit(1)).over(fr).alias("trailing_hours"),
        F.sum(c).over(fr).alias("s"),
        F.sum(c * c).over(fr).alias("q"),
    )
    w = F.col("trailing_hours").cast("decimal(38,0)")
    dev = w * c - F.col("s")
    var = w * F.col("q") - F.col("s") * F.col("s")
    return stats.select(
        "event_type",
        "hour_start_us",
        "n_events",
        F.col("trailing_hours").cast("int").alias("trailing_hours"),
        F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("trailing_events"),
        F.when(
            F.col("trailing_hours") >= ANOMALY_MIN_TRAIL,
            dev * dev > F.lit(9) * var,
        )
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )


def q_user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension type 2 build: collapse each user's
    event-type observation stream into validity intervals
    (effective_from / effective_to / is_current) — the standard
    dimension-history construction every lakehouse runs, as pure
    window algebra.

    Islands detection: a version starts where the observed attribute
    differs from the previous observation (lag), version ids are the
    running sum of change flags, the interval is the version's min
    timestamp, closed by the next version's start (lead); the last
    version per user is open (is_current). Ties are broken by
    event_id so the construction is total-order deterministic.

    Scale: every window is partitioned by user_id — per-partition
    state is one user's history, never the table; two narrow window
    passes plus one groupBy, all map-side-combinable. At 100 TB this
    runs per user shard exactly as written."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    e = t.events.select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("us")
    )
    obs = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        "us",
        "event_type",
        F.when(
            F.lag("event_type").over(obs).isNull()
            | (F.lag("event_type").over(obs) != F.col("event_type")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    ).withColumn(
        "version",
        F.sum("chg").over(
            obs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    versions = flagged.groupBy("user_id", "version").agg(
        # all observations in a version share one event_type by
        # construction; min() is the deterministic way to pick it
        F.min("event_type").alias("state"),
        F.min("us").alias("effective_from"),
        F.count(F.lit(1)).alias("n_observations"),
    )
    vw = Window.partitionBy("user_id").orderBy("version")
    return versions.select(
        "user_id",
        F.col("version").cast("int").alias("version"),
        "state",
        "effective_from",
        F.lead("effective_from").over(vw).alias("effective_to"),
        F.lead("effective_from").over(vw).isNull().alias("is_current"),
        "n_observations",
    )


def q_events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal profile + residual diagnostics per event type: the
    hour-of-day activity baseline (the seasonal-naive model every
    traffic forecast starts from) and how much of the count variance
    that baseline explains — all exact integers.

    Per (event_type, hour-of-day 0..23): bucket count over the whole
    range, n_days the slot was observed, and the residual sum of
    squares of the per-day counts around the slot mean, computed by
    the one-pass identity n·Σc² − (Σc)² (so the report needs no second
    scan and no floats; the slot mean itself is surfaced as the exact
    half-up ratio). A slot whose var_num is large relative to its mean
    is bursty — the signal that picks between the seasonal baseline
    and the anomaly monitor upstream.

    Scale: one groupBy to (type, day, hour) grain — map-side
    combinable — then one groupBy to the 24·|types| profile grid."""
    from ..functions import _idiv

    t = load(spark, sf_dir)
    us = epoch_us("ts")
    per_day = (
        t.events.select(
            "event_type",
            (us - us % F.lit(86_400_000_000)).alias("day_us"),
            _idiv(us % F.lit(86_400_000_000), F.lit(HOUR_US)).alias("hod"),
        )
        .groupBy("event_type", "day_us", "hod")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d38 = "decimal(38,0)"
    return per_day.groupBy("event_type", "hod").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("n_days"),
        halfup_div(F.sum("c").cast(d38), F.count(F.lit(1)), 6).alias(
            "mean_per_day"
        ),
        (
            F.count(F.lit(1)).cast(d38)
            * F.sum(F.col("c").cast(d38) * F.col("c").cast(d38))
            - F.sum(F.col("c").cast(d38)) * F.sum(F.col("c").cast(d38))
        )
        .cast("long")
        .alias("var_num"),
    )


#: Session path mining: inactivity gap that opens a new session, and
#: the path-prefix length the report keys on.
PATH_GAP_US = SESSION_GAP_US
PATH_PREFIX = 8


def q_session_paths_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 session paths: the ordered sequence of event types a
    session walks through (first ``PATH_PREFIX`` steps), counted across
    all sessions — the product-analytics view one level above the
    funnel (fixed stages) and the transition matrix (1-step Markov).

    Sessionization is the gap-islands window (lag gap ≥ 15 min opens a
    session, running-sum session index — the same construction the
    SCD2 build uses, keyed by inactivity instead of state change);
    paths are built by an ORDERED in-group aggregation: rank events in
    the session, keep the first 8, sort the collected (rank, type)
    structs, join with '>'. Total-order tie-breaks (us, event_id)
    everywhere, so the path strings — and their counts — hash-match
    the SQL twin exactly.

    Scale: windows partitioned by user_id, the aggregation by
    (user_id, session) — per-partition state is one user's history;
    the final count shuffles path strings (bounded by the prefix cap:
    ≤ 8 type names each)."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    e = t.events.select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("us")
    )
    obs = Window.partitionBy("user_id").orderBy("us", "event_id")
    sessioned = e.select(
        "user_id",
        "event_id",
        "event_type",
        "us",
        F.when(
            F.lag("us").over(obs).isNull()
            | (F.col("us") - F.lag("us").over(obs) >= PATH_GAP_US),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_s"),
    ).withColumn(
        "session",
        F.sum("new_s").over(
            obs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sw = Window.partitionBy("user_id", "session").orderBy("us", "event_id")
    ranked = sessioned.withColumn("rn", F.row_number().over(sw)).filter(
        F.col("rn") <= PATH_PREFIX
    )
    paths = ranked.groupBy("user_id", "session").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(30)
    )


MINUTE_US = 60_000_000
DAY_US = 86_400_000_000


def q_events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: minute → hour →
    day rollups of the event stream, raw data scanned ONCE.

    The TimescaleDB/Druid pattern for time-series at scale: the finest
    tier (1-minute buckets per event_type) is the only aggregate that
    touches raw rows; every coarser tier aggregates the next-finer
    TIER, not the raw table. At 100 TB of events the minute tier is
    ~10⁴× smaller than raw (bounded by minutes × event_types), so the
    hour and day cascades are near-free map-side re-aggregations of an
    already-tiny table — this is why hypertables can serve dashboards
    over years of data. Sums cascade EXACTLY: the value sum is carried
    as decimal(12,2) partials (dec2) and only rounded at output, so
    ``sum(day) == sum(hours) == sum(minutes)`` bit-for-bit.

    The shared minute/hour subtrees are lazily checkpointed so the
    three output tiers materialize the cascade once instead of
    re-scanning raw per tier (same convention as dedup.py's shared
    self-join subtrees).
    """
    t = load(spark, sf_dir)
    us = epoch_us(F.col("ts"))
    minute = t.events.groupBy(
        ((us - us % F.lit(MINUTE_US))).alias("bucket_start_us"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec2("value")).alias("sv"),
    )
    return multires_cascade(minute)


def multires_cascade(minute: DataFrame) -> DataFrame:
    """Derive the 3-tier rollup union from a materialized minute tier
    (columns ``bucket_start_us, event_type, n_events, sv`` with ``sv``
    an exact decimal partial). Shared by the batch operator above and
    the streamed drain (``streaming.pipelines.multires_minute_values``),
    which maintains the minute tier incrementally and derives the
    coarse tiers at read time — TimescaleDB real-time-aggregate
    semantics."""
    minute = minute.localCheckpoint(eager=False)

    def _up(df: DataFrame, span_us: int) -> DataFrame:
        b = F.col("bucket_start_us")
        return df.groupBy(
            (b - b % F.lit(span_us)).alias("bucket_start_us"),
            F.col("event_type"),
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sv").alias("sv"),
        )

    hour = _up(minute, HOUR_US).localCheckpoint(eager=False)
    day = _up(hour, DAY_US)

    def _out(df: DataFrame, resolution: str) -> DataFrame:
        return df.select(
            F.lit(resolution).alias("resolution"),
            F.col("bucket_start_us"),
            F.col("event_type"),
            F.col("n_events").cast("long").alias("n_events"),
            F.round(F.col("sv"), 2).cast("double").alias("total_value"),
        )

    return (
        _out(minute, "minute")
        .unionByName(_out(hour, "hour"))
        .unionByName(_out(day, "day"))
    )


def q_user_modal_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE aggregate — the most frequent event type per user, with a
    deterministic lexicographic tie-break — computed WITHOUT a window
    or a sort: per-(user, type) counts, then ``min(struct(-n, type))``
    per user (the smallest negated count is the largest count; equal
    counts fall through to the smallest type string). Two map-side-
    combinable aggregates end to end, so the operator scales exactly
    like a plain groupBy — the naive row_number-over-window mode would
    sort every user's rows instead (that formulation is the ORACLE,
    proving the aggregate form equivalent).

    Output: (user_id, modal_event_type, n_modal, n_total)."""
    t = load(spark, sf_dir)
    c = t.events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return user_modal_finish(c)


def user_modal_finish(counts: DataFrame) -> DataFrame:
    """Modal pick over a (user_id, event_type, n) count table — the
    read half of `q_user_modal_event`, shared with the streamed drain
    (per-key counts are mergeable complete-mode state; this finisher
    turns the drained grid into the same modal report)."""
    picked = counts.groupBy("user_id").agg(
        F.min(
            F.struct(
                (-F.col("n")).alias("neg_n"),
                F.col("event_type").alias("t"),
            )
        ).alias("best"),
        F.sum("n").alias("n_total"),
    )
    return picked.select(
        "user_id",
        F.col("best.t").alias("modal_event_type"),
        (-F.col("best.neg_n")).alias("n_modal"),
        "n_total",
    )


def q_user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user MARKOV (conditional) entropy rate — how predictable a
    user's next event type is given the current one, the sequence-
    level sibling of `q_categorical_entropy`'s marginal profile and
    the per-user reduction of `q_event_transitions`' global matrix:
    H = (1/n)·Σᵢⱼ nᵢⱼ·ln(nᵢ/nᵢⱼ) over the user's first-order
    transition counts, in exact integer micro-nats (`ln_micro`, no
    float ln; final division exact HALF_UP). 0 = fully deterministic
    behavior, ln(#types) = uniform.

    Scale: one lag window per user timeline (the `event_transitions`
    shuffle), then every aggregate runs on the bounded per-(user,
    type, type) count table — at most |types|² rows per user — never
    the raw events again. Output: (user_id, n_transitions,
    entropy_micro_nats) for users with ≥ 1 transition."""
    from pyspark.sql import Window

    from ..functions import epoch_us, halfup_div, ln_micro

    t = load(spark, sf_dir)
    e = t.events.select(
        "user_id", "event_type", epoch_us("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    pairs = e.select(
        "user_id",
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    nij = pairs.groupBy("user_id", "from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_ij")
    )
    ni = nij.groupBy("user_id", "from_type").agg(
        F.sum("n_ij").alias("n_i")
    )
    j = nij.join(ni, ["user_id", "from_type"])
    g = j.groupBy("user_id").agg(
        F.sum("n_ij").alias("n_transitions"),
        F.sum(
            F.col("n_ij") * ln_micro(F.col("n_i"), F.col("n_ij"))
        ).alias("tot"),
    )
    return g.select(
        "user_id",
        "n_transitions",
        halfup_div(F.col("tot"), F.col("n_transitions"), 0).alias(
            "entropy_micro_nats"
        ),
    )


#: Deterministic throttle: events kept per user per hour.
RATE_CAP_PER_HOUR = 5


def q_events_rate_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RATE-CAP throttle — keep the first
    RATE_CAP_PER_HOUR events per user per clock hour (by event time,
    event_id tie-break) and emit the survivors with their slot rank:
    the ingestion-side sampling rule a pipeline applies to chatty
    producers so one hot user cannot dominate a window, made
    deterministic (re-runs and replicas keep the SAME events — no RNG,
    no arrival-order dependence).

    One row_number window per (user, hour) — the partition key is the
    throttle key, so state and sort are bounded by a user's events in
    one hour, and the shuffle is the same one any per-user-hour
    aggregate pays. Output: (event_id, user_id, hour_us, rk)."""
    from pyspark.sql import Window

    from ..functions import epoch_us

    t = load(spark, sf_dir)
    hour_us = 3_600_000_000
    e = t.events.select(
        "event_id", "user_id", epoch_us("ts").alias("us")
    ).withColumn("hour_us", F.col("us") - F.pmod("us", F.lit(hour_us)))
    w = Window.partitionBy("user_id", "hour_us").orderBy(
        F.asc("us"), F.asc("event_id")
    )
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RATE_CAP_PER_HOUR)
        .select("event_id", "user_id", "hour_us", "rk")
    )


#: ln(2) in micro-nats — the half-life constant of the decay fit.
LN2_MICRO = 693_147


def q_retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIAL DECAY FIT of the pooled retention curve — the
    model-fitting capstone composing `q_cohort_retention` (the cells)
    with the `nation_revenue_trend` regression kit (the fit): assume
    retention r(k) ≈ r₀·e^(−b·k) and estimate b by OLS of
    y_k = ln(eligible_k / active_k) on week offset k, reporting the
    slope in micro-nats/week and the implied half-life ln2/b.

    Right-censoring handled exactly: offset k's denominator counts
    only cohorts OLD ENOUGH to be observable at k (cohort_week + k ≤
    max active week) — expressed as an explode of each cohort's
    1..horizon offsets over the bounded cohort-size table, so no
    inequality join and no nested loop. Every step is integer
    (`ln_micro` decays, DECIMAL(38,0)/HUGEINT normal equations,
    sign-split truncate-toward-zero division, LN2_MICRO·10⁶ // slope
    for the half-life), so the DuckDB twin reproduces the fit
    bit-for-bit.

    Output (one row, empty if fewer than 2 curve points):
    (n_points, slope_micro_nats_per_week, half_life_micro_weeks)."""
    from ..functions import _idiv, ln_micro

    cells = q_cohort_retention(spark, sf_dir)
    mx = cells.agg(
        F.max(F.col("cohort_week") + F.col("week_offset")).alias("max_week")
    )
    sizes = cells.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    num = (
        cells.filter(F.col("week_offset") >= 1)
        .groupBy("week_offset")
        .agg(F.sum("n_active").alias("n_active"))
    )
    den = (
        sizes.crossJoin(F.broadcast(mx))
        .select(
            "cohort_size",
            F.explode(
                F.sequence(
                    F.lit(1).cast("long"),
                    F.col("max_week") - F.col("cohort_week"),
                )
            ).alias("week_offset"),
        )
        .groupBy("week_offset")
        .agg(F.sum("cohort_size").alias("n_eligible"))
    )
    pts = num.join(den, "week_offset").select(
        "week_offset",
        ln_micro(F.col("n_eligible"), F.col("n_active")).alias("y"),
    )
    x = F.col("week_offset").cast("decimal(38,0)")
    y = F.col("y").cast("decimal(38,0)")
    g = pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    ).filter(F.col("n_points") >= 2)
    n = F.col("n_points").cast("decimal(38,0)")
    nm = n * F.col("sxy") - F.col("sx") * F.col("sy")
    dn = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(nm < 0, -_idiv((-nm) * F.lit(1_000_000), dn)).otherwise(
        _idiv(nm * F.lit(1_000_000), dn)
    )
    s = g.select("n_points", slope.alias("slope_micro_nats_per_week"))
    return s.select(
        "n_points",
        "slope_micro_nats_per_week",
        F.when(
            F.col("slope_micro_nats_per_week") > 0,
            _idiv(
                F.lit(LN2_MICRO).cast("decimal(38,0)") * F.lit(1_000_000),
                F.col("slope_micro_nats_per_week"),
            ),
        ).alias("half_life_micro_weeks"),
    )


def q_user_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAU/MAU STICKINESS — the product-analytics engagement ratio:
    per epoch week, weekly active users over the trailing-4-week
    active users (1.0 = every monthly user shows up every week). The
    trailing-window DISTINCT is the interesting part at scale: instead
    of re-scanning 4 weeks of events per window (or a distinct-over-
    RANGE window, which Spark cannot do), each distinct (user, week)
    activity row VOTES into the ≤4 windows it feeds via a bounded
    sequence explode, and one countDistinct per window finishes — the
    same explode-vote encoding as `q_rolling_distinct_users`, at week
    grain. Exact integer counts; the ratio is half-up 6 dp.

    Output: (week, wau, mau, stickiness) for every active week."""
    t = load(spark, sf_dir)
    uw = (
        t.events.select("user_id", epoch_us("ts").alias("epoch_us"))
        .select(
            "user_id",
            F.expr("epoch_us div 86400000000 div 7").alias("week"),
        )
        .distinct()
    )
    wau = uw.groupBy("week").agg(F.count(F.lit(1)).alias("wau"))
    mau = (
        uw.select(
            "user_id",
            F.explode(
                F.sequence(F.col("week"), F.col("week") + 3)
            ).alias("week"),
        )
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        wau.join(mau, "week")
        .select(
            "week",
            "wau",
            "mau",
            halfup_div(F.col("wau"), F.col("mau"), 6).alias("stickiness"),
        )
    )


def q_user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over each user's activity calendar: the longest
    run of CONSECUTIVE active days per user (the engagement-streak
    feature every retention model wants), via the classic
    day − row_number() island key — consecutive days share a constant
    difference, so one window + one groupBy finds every streak without
    a self-join or a sequential scan.

    Per user: number of distinct active days, number of maximal
    streaks (islands), the longest streak length, and that streak's
    start date (earliest start on length ties, via min(struct(-len,
    start)) — no second window). Top-100 users by (longest desc,
    active days desc, user_id) keeps the output bounded.

    Scale: the day grid is distinct (user, date) — far smaller than raw
    events; the only window is partitioned BY USER over that user's own
    days (bounded by the calendar span, never a global sort); islands
    collapse map-side-combinably.

    Output: (user_id, n_active_days, n_streaks, longest_streak,
    longest_start)."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    days = (
        t.events.select(
            "user_id", F.to_date("ts").alias("d")
        ).distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "grp", F.date_sub("d", F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("d").alias("start"),
    )
    per_user = streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak"),
        F.min(
            F.struct((-F.col("len")).alias("neg"), F.col("start").alias("s"))
        )["s"].alias("longest_start_d"),
    )
    return (
        per_user.select(
            "user_id",
            "n_active_days",
            "n_streaks",
            "longest_streak",
            F.date_format("longest_start_d", "yyyy-MM-dd").alias(
                "longest_start"
            ),
        )
        .orderBy(
            F.desc("longest_streak"),
            F.desc("n_active_days"),
            "user_id",
        )
        .limit(100)
    )


def q_kaplan_meier_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of TIME TO REPEAT PURCHASE — the
    non-parametric estimator every churn analysis starts from (Kaplan &
    Meier 1958), censoring-correct by construction. Subject: a
    customer's first order; "death" = the second order, at duration =
    days between them (same-day repeats are t = 0, ranked by orderkey);
    a customer who never re-orders is RIGHT-CENSORED at the corpus max
    order date (the honest encoding — we know they survived *at least*
    that long, not that they churned; ``retention_decay_fit`` is the
    parametric sibling).

    At each distinct death time t: n_risk = customers still
    un-reordered and un-censored before t, d = repeats at t, c =
    censored at t; the survival curve is carried in LOG space as exact
    micro-nats — ln S(t) = Σ_{t'≤t} −ln_micro(n, n−d) — so no float
    product or exp appears on either engine (the ``ln_micro``
    portability template). If the curve hits zero (n = d at some t),
    ln S is NULL from that point on (−∞ has no fixed-point encoding;
    NULL is the documented sentinel).

    Scale: one per-customer window (partitioned by customer — never a
    global sort) ranks each customer's first two orders; everything
    after runs on the duration-grain grid (bounded by the calendar
    span) — bounded-table windows only. The corpus max date is a
    whitelisted 1-row broadcast.

    Output: (t_days, n_risk, n_deaths, n_censored, ln_surv_micro),
    one row per death time."""
    from pyspark.sql import Window

    from ..functions import ln_micro

    t = load(spark, sf_dir)
    o = t.orders.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    )
    wc = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    ranked = o.withColumn("rn", F.row_number().over(wc)).filter(
        F.col("rn") <= 2
    )
    firsts = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
    )
    gmax = t.orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("gmax")
    )
    u = firsts.crossJoin(F.broadcast(gmax)).select(
        F.when(
            F.col("d2").isNotNull(), F.datediff("d2", "d1")
        )
        .otherwise(F.datediff("gmax", "d1"))
        .alias("t_days"),
        F.col("d2").isNull().cast("long").alias("cen"),
    )
    return km_curve(u)


def km_curve(u: DataFrame) -> DataFrame:
    """Kaplan–Meier curve from (t_days, cen) subject rows — the tail
    shared by the batch ``q_kaplan_meier_repeat`` and the streamed
    ``kaplan_meier_streamed`` drain, so the two surfaces can never
    drift. All windows run over the bounded duration-grain grid."""
    from pyspark.sql import Window

    from ..functions import ln_micro

    grid = u.groupBy("t_days").agg(
        F.sum(F.lit(1) - F.col("cen")).alias("n_deaths"),
        F.sum("cen").alias("n_censored"),
    )
    w_desc = Window.orderBy(F.desc("t_days")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_asc = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = grid.withColumn(
        "n_risk",
        F.sum(F.col("n_deaths") + F.col("n_censored")).over(w_desc),
    )
    step = F.when(
        (F.col("n_deaths") > 0)
        & (F.col("n_risk") - F.col("n_deaths") >= 1),
        -ln_micro(F.col("n_risk"), F.col("n_risk") - F.col("n_deaths")),
    ).otherwise(F.lit(0).cast("long"))
    dead = (
        (F.col("n_deaths") > 0) & (F.col("n_risk") == F.col("n_deaths"))
    ).cast("int")
    s = r.withColumn("step", step).withColumn("dead", dead)
    c = s.withColumn("lnsum", F.sum("step").over(w_asc)).withColumn(
        "cumdead", F.max("dead").over(w_asc)
    )
    return (
        c.filter(F.col("n_deaths") > 0)
        .select(
            "t_days",
            "n_risk",
            "n_deaths",
            "n_censored",
            F.when(F.col("cumdead") == 1, F.lit(None).cast("long"))
            .otherwise(F.col("lnsum"))
            .alias("ln_surv_micro"),
        )
        .orderBy("t_days")
    )


#: Absorbing-Markov funnel horizon: conversion probability within this
#: many transitions, unrolled (constant rounds over the bounded
#: state-grid — never an iterative fixpoint on raw rows).
MARKOV_STEPS = 5
MARKOV_ABSORB = "purchase"


def q_markov_conversion_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-Markov funnel: from each behavioral state, the
    probability of reaching PURCHASE within k = 1..``MARKOV_STEPS``
    transitions — the chain-level conversion metric that a plain funnel
    (fixed event order) and the entropy rate (predictability) both
    miss. Purchase is modeled absorbing: once converted, converted.

    Exact fixed point: transition probabilities stay as integer count
    rationals (n_ij / n_i — never materialized as floats); the value
    recursion p_{k+1}(s) = Σ_j n_sj · p_k(j) // n_s runs in micro
    units with one trunc division per state per round (a deterministic
    quantization BOTH engines define identically — the ``ln_micro``
    policy), seeded with p_0(purchase) = 10⁶.

    Scale: ONE fact-side shuffle builds the ≤ |states|² transition
    grid (the ``user_behavior_entropy`` lag pairing); all
    ``MARKOV_STEPS`` rounds are joins over that bounded grid —
    per-round cost is states², independent of corpus size.

    Output: (step, state, p_micro) for every state × step, purchase
    rows pinned at 10⁶."""
    from pyspark.sql import Window

    from ..functions import _idiv

    t = load(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    pairs = t.events.select(
        "user_id",
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    c = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_ij")
    )
    m = c.groupBy("from_type").agg(F.sum("n_ij").alias("n_i"))
    states = (
        t.events.select(F.col("event_type").alias("state")).distinct()
    )
    p = states.select(
        "state",
        F.when(F.col("state") == MARKOV_ABSORB, F.lit(10**6))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("p_micro"),
    )
    out = None
    for step in range(1, MARKOV_STEPS + 1):
        nxt = (
            c.join(p, F.col("to_type") == F.col("state"))
            .groupBy("from_type")
            .agg(F.sum(F.col("n_ij") * F.col("p_micro")).alias("acc"))
            .join(F.broadcast(m), "from_type")
            .select(
                F.col("from_type").alias("state"),
                _idiv(F.col("acc"), F.col("n_i")).alias("p_micro"),
            )
        )
        p = (
            states.join(nxt, "state", "left")
            .select(
                "state",
                F.when(
                    F.col("state") == MARKOV_ABSORB, F.lit(10**6)
                )
                .otherwise(F.coalesce("p_micro", F.lit(0)))
                .cast("long")
                .alias("p_micro"),
            )
        )
        labeled = p.select(
            F.lit(step).cast("int").alias("step"), "state", "p_micro"
        )
        out = labeled if out is None else out.unionByName(labeled)
    return out.orderBy("step", "state")


#: Strict-order funnel: step sequence and the per-transition window.
FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_WINDOW_US = 3_600_000_000


def q_window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed ORDERED funnel (ClickHouse ``windowFunnel`` semantics):
    per user, the deepest prefix of view → click → purchase completed
    IN ORDER with each transition inside ``FUNNEL_WINDOW_US`` — the
    time-constrained funnel that ``event_funnel``'s unordered
    presence-check can't express (a purchase before the click must NOT
    count).

    Greedy-earliest matching (the windowFunnel contract): anchor =
    the user's earliest view; step k+1 = the earliest step-(k+1) event
    after step k within the window. Each "earliest after t" is one
    min-aggregate over the user's own events — per-user bounded joins,
    no window functions at all.

    Scale: three user-grain aggregates, each a map-side-combinable
    min over one event type; the per-user event list is never
    materialized.

    Output: (depth, n_users) — users whose deepest completed prefix
    is exactly `depth` (0 = had no view), plus Σ = all users."""
    t = load(spark, sf_dir)
    ev = t.events.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    users = ev.select("user_id").distinct()
    anchors = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    cur = users.join(anchors, "user_id", "left")
    prev_col = "t1"
    for i, step in enumerate(FUNNEL_STEPS[1:], start=2):
        nxt = (
            ev.filter(F.col("event_type") == step)
            .join(
                cur.filter(F.col(prev_col).isNotNull()).select(
                    "user_id", prev_col
                ),
                "user_id",
            )
            .filter(
                (F.col("us") > F.col(prev_col))
                & (F.col("us") <= F.col(prev_col) + FUNNEL_WINDOW_US)
            )
            .groupBy("user_id")
            .agg(F.min("us").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "user_id", "left")
        prev_col = f"t{i}"
    depth = F.when(F.col("t1").isNull(), F.lit(0))
    for i in range(2, len(FUNNEL_STEPS) + 1):
        depth = depth.when(F.col(f"t{i}").isNull(), F.lit(i - 1))
    depth = depth.otherwise(F.lit(len(FUNNEL_STEPS)))
    return (
        cur.select(depth.cast("int").alias("depth"))
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("depth")
    )


#: Shapley attribution channels (the "touchpoints" preceding a first
#: purchase). 3 players => the 8-subset lattice is a literal.
SHAPLEY_CHANNELS = ["view", "click", "signup"]


def q_shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven multi-touch attribution via exact SHAPLEY values
    (Shao & Li 2011 — the game-theoretic split behind Google's
    data-driven attribution): each user's exposure set = which of
    {view, click, signup} they did BEFORE their first purchase
    (non-converters: ever); the coalition value v(S) is the exact
    conversion rate of users whose exposure set is EXACTLY S; channel
    c's credit is φ_c = Σ_S w(|S|)·(v(S∪c) − v(S)) — the only split
    that is efficient, symmetric, and null-player-correct.

    Exact fixed point: v(S) at micro from integer (converters, users)
    counts (empty subsets contribute v = 0 — reported via n_users so
    the gap is visible, not silent); with 3 players 6·φ has INTEGER
    weights (2, 1, 1, 2 by |S|), so phi_x6_micro is a pure integer
    combination of the eight v's — no division after v.

    Scale: ONE shuffle to user grain (conditional min/exists
    aggregates), one to the ≤ 8-row exposure-mask grid; the Shapley
    assembly is literal arithmetic on that grid.

    Output: (channel, phi_x6_micro, v_solo_micro, v_full_micro) —
    per channel, plus solo and grand-coalition rates for context."""
    from ..functions import _idiv

    t = load(spark, sf_dir)
    ev = t.events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("us"))
        ).alias("t_buy"),
        *[
            F.min(
                F.when(F.col("event_type") == ch, F.col("us"))
            ).alias(f"t_{ch}")
            for ch in SHAPLEY_CHANNELS
        ],
    )
    exposed = [
        (
            F.col(f"t_{ch}").isNotNull()
            & (
                F.col("t_buy").isNull()
                | (F.col(f"t_{ch}") < F.col("t_buy"))
            )
        ).cast("int")
        for ch in SHAPLEY_CHANNELS
    ]
    mask = exposed[0] + exposed[1] * 2 + exposed[2] * 4
    grid = per_user.select(
        mask.alias("mask"),
        F.col("t_buy").isNotNull().cast("long").alias("conv"),
    ).groupBy("mask").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("conv").alias("n_conv"),
    )
    # one row holding v(S) in micro for all 8 masks (missing => 0)
    vcols = [
        F.coalesce(
            F.max(
                F.when(
                    F.col("mask") == m,
                    _idiv(
                        F.col("n_conv").cast("decimal(38,0)")
                        * F.lit(1_000_000),
                        F.col("n_users"),
                    ),
                )
            ),
            F.lit(0).cast("long"),
        ).alias(f"v{m}")
        for m in range(8)
    ]
    one = grid.agg(*vcols)
    rows = []
    for i, ch in enumerate(SHAPLEY_CHANNELS):
        bit = 1 << i
        phi = F.lit(0).cast("long")
        for s in range(8):
            if s & bit:
                continue
            size = bin(s).count("1")
            coef = {0: 2, 1: 1, 2: 2}[size]
            phi = phi + F.lit(coef) * (
                F.col(f"v{s | bit}") - F.col(f"v{s}")
            )
        rows.append(
            one.select(
                F.lit(ch).alias("channel"),
                phi.alias("phi_x6_micro"),
                F.col(f"v{bit}").alias("v_solo_micro"),
                F.col("v7").alias("v_full_micro"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("channel")


#: Channels credited by the rule-based attribution operators (same
#: roster as the Shapley operator, so the three models are comparable).
ATTRIB_CHANNELS = SHAPLEY_CHANNELS


def _attrib_touches(t) -> DataFrame:
    """Pre-purchase channel touches shared by the rule-based
    attribution operators: one row per (user, channel event) strictly
    before the user's first purchase, with the touch's (us, event_id)
    order key and the purchase time. Users who never purchase
    contribute nothing — rule-based models credit conversions only
    (unlike the Shapley operator, which also uses non-converters to
    estimate coalition values)."""
    ev = t.events.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("us"),
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_buy"))
    )
    return (
        ev.filter(F.col("event_type").isin(ATTRIB_CHANNELS))
        .join(buys, "user_id")
        .filter(F.col("us") < F.col("t_buy"))
    )


def q_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITION-BASED (U-shaped) multi-touch attribution — the
    rule-based industry standard next to the data-driven Shapley
    split: each conversion distributes 1,000,000 ppm of credit over
    the user's pre-purchase touches — 40% to the first touch, 40% to
    the last, 20% split evenly across the middle (1 touch → 100%,
    2 touches → 50/50). Touch order is (event time, event_id) — a
    total order, so first/last are unambiguous.

    Exact fixed point: per-touch credit is integer ppm; the middle
    split truncates (per-user loss < n_middle ppm, asserted bounded in
    the pytest), everything else is literal integer arithmetic.

    Scale: one shuffle to user grain for first-purchase times, one
    per-user window over the (bounded per user) touch list, one final
    channel aggregate. No self-joins, no cross products.

    Output: (channel, n_first, n_last, n_middle, credit_ppm) — the
    credit each channel earned across all conversions."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    touches = _attrib_touches(t)
    w_user = Window.partitionBy("user_id")
    w_asc = w_user.orderBy(F.asc("us"), F.asc("event_id"))
    w_desc = w_user.orderBy(F.desc("us"), F.desc("event_id"))
    ranked = (
        touches.withColumn("rk", F.row_number().over(w_asc))
        .withColumn("rk_rev", F.row_number().over(w_desc))
        .withColumn("n", F.count(F.lit(1)).over(w_user))
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1_000_000))
        .when(
            F.col("n") == 2,
            F.lit(500_000),
        )
        .when(F.col("rk") == 1, F.lit(400_000))
        .when(F.col("rk_rev") == 1, F.lit(400_000))
        .otherwise(F.expr("CAST(200000 div (n - 2) AS BIGINT)"))
    )
    return (
        ranked.select(
            F.col("event_type").alias("channel"),
            (F.col("rk") == 1).cast("long").alias("is_first"),
            ((F.col("rk_rev") == 1) & (F.col("n") > 1))
            .cast("long")
            .alias("is_last"),
            ((F.col("rk") > 1) & (F.col("rk_rev") > 1))
            .cast("long")
            .alias("is_mid"),
            credit.alias("credit"),
        )
        .groupBy("channel")
        .agg(
            F.sum("is_first").alias("n_first"),
            F.sum("is_last").alias("n_last"),
            F.sum("is_mid").alias("n_middle"),
            F.sum("credit").alias("credit_ppm"),
        )
        .orderBy("channel")
    )


def q_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-DECAY multi-touch attribution — the third rule-based model
    (next to position-based and Shapley): a touch's weight HALVES per
    DAY of age at conversion time, computed as the exact integer
    ``1_000_000 >> age_days`` (capped at 30 halvings → weight 0
    beyond a month) so both engines draw bit-identical weights with
    no float exponentials. Each conversion's 1,000,000 ppm of credit
    splits across its touches proportionally to weight (truncating
    integer division against the user's weight sum).

    Scale: same shape as the position model — user-grain shuffle, one
    per-user aggregate for the weight sum (broadcast back via a
    window), one channel aggregate.

    Output: (channel, n_touches, weight_sum, credit_ppm)."""
    from pyspark.sql import Window

    from ..functions import _idiv

    t = load(spark, sf_dir)
    touches = _attrib_touches(t)
    age_w = F.expr("(t_buy - us) div 86400000000")
    wt = F.expr(
        "shiftright(CAST(1000000 AS BIGINT), "
        "CAST(least(age_w, CAST(30 AS BIGINT)) AS INT))"
    )
    w_user = Window.partitionBy("user_id")
    weighted = touches.withColumn("age_w", age_w).withColumn(
        "wt", wt
    ).withColumn("w_sum", F.sum("wt").over(w_user))
    credit = F.when(
        F.col("w_sum") > 0,
        _idiv(
            F.col("wt").cast("decimal(38,0)") * F.lit(1_000_000),
            F.col("w_sum"),
        ),
    ).otherwise(F.lit(0).cast("long"))
    return (
        weighted.select(
            F.col("event_type").alias("channel"),
            "wt",
            credit.alias("credit"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("wt").alias("weight_sum"),
            F.sum("credit").alias("credit_ppm"),
        )
        .orderBy("channel")
    )


#: Log-rank grouping: the named segment vs everyone else (two-sample
#: form; the k-sample generalization is a sum over groups).
LOGRANK_SEG = "BUILDING"
#: chi2(1df) 0.95 quantile, milli-scaled.
LOGRANK_CHI2_95_MILLI = 3_841


def q_logrank_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-RANK TEST (Mantel 1966) — do two customer segments have the
    SAME time-to-repeat-purchase survival curve? The inference
    companion to ``q_kaplan_meier_repeat``: KM draws the curves, this
    says whether the '{LOGRANK_SEG}' curve differs from the rest
    beyond chance, censoring-correct by construction (a churn analysis
    that t-tests raw gap days silently drops every censored customer —
    the classic bias this test exists to avoid).

    Same subjects as the KM entry (first order → second order, right-
    censored at the corpus max date). At each death time t with n at
    risk (n₁ in group 1), d deaths (d₁ in group 1):

        E₁ += d·n₁/n                       (micro-scaled floor)
        V  += d·(n−d)·n₁·n₀ / (n²·(n−1))   (micro-scaled floor)
        χ² = (O₁ − E₁)² / V                (milli, from the quantized
                                            sums — the deterministic-
                                            quantization contract)

    Scale: one per-customer window builds subjects; the hypergeometric
    ledger runs on the bounded duration-grain grid (calendar span),
    exactly like ``km_curve`` — bounded-table windows only; the test
    itself is one 1-row aggregate broadcast back onto the 2-row group
    summary.

    Output: 2 rows (segment, n_subjects, n_events, n_censored,
    e_events_micro, v_micro, chi2_milli, significant)."""
    from pyspark.sql import Window

    from ..functions import _idiv

    t = load(spark, sf_dir)
    o = (
        t.orders.select("o_custkey", F.col("o_orderdate").cast("date").alias("d"), "o_orderkey")
        .join(
            t.customer.select(
                "c_custkey",
                (F.col("c_mktsegment") == LOGRANK_SEG)
                .cast("long")
                .alias("grp"),
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    wc = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    ranked = o.withColumn("rn", F.row_number().over(wc)).filter(
        F.col("rn") <= 2
    )
    firsts = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
        F.max("grp").alias("grp"),
    )
    gmax = t.orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("gmax")
    )
    u = firsts.crossJoin(F.broadcast(gmax)).select(
        F.when(F.col("d2").isNotNull(), F.datediff("d2", "d1"))
        .otherwise(F.datediff("gmax", "d1"))
        .alias("t_days"),
        F.col("d2").isNull().cast("long").alias("cen"),
        "grp",
    )
    ev = F.lit(1) - F.col("cen")
    grid = u.groupBy("t_days").agg(
        F.sum(ev * F.col("grp")).alias("d1"),
        F.sum(ev * (F.lit(1) - F.col("grp"))).alias("d0"),
        F.sum(F.col("cen") * F.col("grp")).alias("c1"),
        F.sum(F.col("cen") * (F.lit(1) - F.col("grp"))).alias("c0"),
    )
    w_desc = Window.orderBy(F.desc("t_days")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = grid.withColumn(
        "n1", F.sum(F.col("d1") + F.col("c1")).over(w_desc)
    ).withColumn("n0", F.sum(F.col("d0") + F.col("c0")).over(w_desc))
    n = F.col("n1") + F.col("n0")
    d = F.col("d1") + F.col("d0")
    deaths = r.filter(d > 0).select(
        "d1",
        "d0",
        _idiv(d * F.col("n1") * F.lit(1_000_000), n).alias("e1u"),
        _idiv(d * F.col("n0") * F.lit(1_000_000), n).alias("e0u"),
        F.when(
            n > 1,
            _idiv(
                d.cast("decimal(38,0)")
                * (n - d)
                * F.col("n1")
                * F.col("n0")
                * F.lit(1_000_000),
                n.cast("decimal(38,0)") * n * (n - 1),
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("vu"),
    )
    diffu = (
        F.col("o1") * F.lit(1_000_000) - F.col("e1_micro")
    ).cast("decimal(38,0)")
    stats = (
        deaths.agg(
            F.sum("d1").cast("long").alias("o1"),
            F.sum("d0").cast("long").alias("o0"),
            F.sum("e1u").cast("long").alias("e1_micro"),
            F.sum("e0u").cast("long").alias("e0_micro"),
            F.sum("vu").cast("long").alias("v_micro"),
        )
        .select(
            "o1",
            "o0",
            "e1_micro",
            "e0_micro",
            "v_micro",
            F.when(
                F.col("v_micro") > 0,
                _idiv(
                    diffu * diffu * F.lit(1000),
                    F.col("v_micro").cast("decimal(38,0)")
                    * F.lit(1_000_000),
                ),
            ).alias("chi2_milli"),
        )
        .withColumn(
            "significant", F.col("chi2_milli") > F.lit(LOGRANK_CHI2_95_MILLI)
        )
    )
    groups = u.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.sum(F.lit(1) - F.col("cen")).cast("long").alias("n_events"),
        F.sum("cen").cast("long").alias("n_censored"),
    )
    return (
        groups.crossJoin(F.broadcast(stats))
        .select(
            F.when(F.col("grp") == 1, F.lit(LOGRANK_SEG))
            .otherwise(F.lit("OTHER"))
            .alias("segment"),
            "n_subjects",
            "n_events",
            "n_censored",
            F.when(F.col("grp") == 1, F.col("e1_micro"))
            .otherwise(F.col("e0_micro"))
            .alias("e_events_micro"),
            "v_micro",
            "chi2_milli",
            "significant",
        )
        .orderBy("segment")
    )


def q_nelson_aalen_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NELSON–AALEN cumulative hazard of time-to-repeat-purchase —
    the third leg of the survival family (KM estimates S(t)
    multiplicatively, log-rank TESTS two groups; Nelson–Aalen
    estimates the cumulative hazard H(t) = Σ d/n additively — the
    quantity hazard-ratio models are built on, better-behaved than
    −ln(KM) at small risk sets). Same subjects as
    ``q_kaplan_meier_repeat`` (first order → second, right-censored
    at the corpus max date).

    Exact fixed point: per death time the increment d·10⁶ // n
    (micro), the Poisson variance increment d·10¹² // n² (pico),
    both accumulated over the duration grid — deterministic
    quantizations both engines define identically (pytest float
    witness).

    Scale: identical to km_curve — one per-customer window builds
    subjects; the ledger runs on the calendar-bounded duration grid.

    Output: one row per death time (t_days, n_risk, n_deaths,
    n_censored, na_cum_micro, var_cum_pico)."""
    from pyspark.sql import Window

    from ..functions import _idiv

    t = load(spark, sf_dir)
    o = t.orders.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    )
    wc = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    ranked = o.withColumn("rn", F.row_number().over(wc)).filter(
        F.col("rn") <= 2
    )
    firsts = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
    )
    gmax = t.orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("gmax")
    )
    u = firsts.crossJoin(F.broadcast(gmax)).select(
        F.when(F.col("d2").isNotNull(), F.datediff("d2", "d1"))
        .otherwise(F.datediff("gmax", "d1"))
        .alias("t_days"),
        F.col("d2").isNull().cast("long").alias("cen"),
    )
    grid = u.groupBy("t_days").agg(
        F.sum(F.lit(1) - F.col("cen")).alias("n_deaths"),
        F.sum("cen").alias("n_censored"),
    )
    w_desc = Window.orderBy(F.desc("t_days")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_asc = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = grid.withColumn(
        "n_risk",
        F.sum(F.col("n_deaths") + F.col("n_censored")).over(w_desc),
    )
    stepped = r.withColumn(
        "h_step", _idiv(F.col("n_deaths") * F.lit(1_000_000), F.col("n_risk"))
    ).withColumn(
        "v_step",
        _idiv(
            F.col("n_deaths").cast("decimal(38,0)") * F.lit(10**12),
            F.col("n_risk").cast("decimal(38,0)") * F.col("n_risk"),
        ),
    )
    return (
        stepped.withColumn("na_cum_micro", F.sum("h_step").over(w_asc))
        .withColumn("var_cum_pico", F.sum("v_step").over(w_asc))
        .filter(F.col("n_deaths") > 0)
        .select(
            # long, pairing with the oracle's BIGINT (typetags.py)
            F.col("t_days").cast("long").alias("t_days"),
            "n_risk",
            "n_deaths",
            "n_censored",
            F.col("na_cum_micro").cast("long").alias("na_cum_micro"),
            F.col("var_cum_pico").cast("long").alias("var_cum_pico"),
        )
        .orderBy("t_days")
    )
