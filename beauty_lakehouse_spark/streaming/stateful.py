"""Custom stateful streaming operator via ``applyInPandasWithState``.

Built-in streaming aggregates emit updated VALUES; they cannot emit
TRANSITIONS (a row only at the moment a running total crosses a
threshold). That shape needs user-managed state — the canonical
``applyInPandasWithState`` use case (SURVEY.md §2.8 north star).

``purchase_milestones`` keys state by user: cumulative purchase value
persists in GroupState across micro-batches; each batch emits one row
per (user, threshold) newly crossed. State is one float per user —
bounded, shuffle-partitioned, and timeout-free here (add
``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.setTimeoutDuration``
for keyed-TTL eviction on unbounded key spaces at 100 TB/day).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MILESTONES = [100.0, 500.0, 1000.0, 5000.0]

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("milestone", T.DoubleType(), False),
        T.StructField("total_at_crossing", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("total", T.DoubleType(), True)])


def _milestone_fn(thresholds: list[float]):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        total = state.get[0] if state.exists else 0.0
        out_ms, out_tot = [], []
        for pdf in pdfs:
            # deterministic within-batch order: event time
            for v in pdf.sort_values("ts_us")["value"]:
                new_total = total + float(v)
                for m in thresholds:
                    if total < m <= new_total:
                        out_ms.append(m)
                        out_tot.append(round(new_total, 2))
                total = new_total
        state.update((total,))
        if out_ms:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_ms),
                    "milestone": out_ms,
                    "total_at_crossing": out_tot,
                }
            )

    return fn


def purchase_milestones(
    events: DataFrame, thresholds: list[float] | None = None
) -> DataFrame:
    """Streaming per-user purchase-milestone detector. ``events`` is the
    (streaming) events frame; output is append-mode transition rows."""
    thresholds = sorted(thresholds or MILESTONES)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "value",
    )
    return purchases.groupBy("user_id").applyInPandasWithState(
        _milestone_fn(thresholds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from ..operators.events import RATE_CAP_PER_HOUR

#: Rate-cap K — shared with the batch ``q_events_rate_capped`` contract
#: (first K events per (user, clock hour) by (event time, event_id)),
#: so the streamed twin can never drift from the batch oracle.
RATE_CAP_K = RATE_CAP_PER_HOUR

RATE_CAP_OUTPUT = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("hour_us", T.LongType(), False),
        T.StructField("rk", T.IntegerType(), False),
        T.StructField("version", T.LongType(), False),
    ]
)

RATE_CAP_STATE = T.StructType(
    [
        T.StructField("us_arr", T.ArrayType(T.LongType()), True),
        T.StructField("eid_arr", T.ArrayType(T.LongType()), True),
        T.StructField("version", T.LongType(), True),
    ]
)


def _rate_cap_fn(k: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id, hour_us = key
        if state.exists:
            us_arr, eid_arr, version = state.get
            kept = list(zip(us_arr, eid_arr))
        else:
            kept, version = [], 0
        for pdf in pdfs:
            kept.extend(zip(pdf["us"], pdf["event_id"]))
        # min-k merge: associative + commutative, so the FINAL kept set
        # is independent of micro-batch slicing and arrival order —
        # a late-arriving earlier event correctly evicts a kept one
        kept = sorted(set(kept))[:k]
        version += 1
        state.update(
            ([int(u) for u, _ in kept], [int(e) for _, e in kept], version)
        )
        yield pd.DataFrame(
            {
                "event_id": [int(e) for _, e in kept],
                "user_id": [int(user_id)] * len(kept),
                "hour_us": [int(hour_us)] * len(kept),
                "rk": list(range(1, len(kept) + 1)),
                "version": [version] * len(kept),
            }
        )

    return fn


def rate_capped_events(events: DataFrame, k: int = RATE_CAP_K) -> DataFrame:
    """Streaming deterministic ingestion throttle: user-managed min-k
    state per (user, clock hour) — the eviction-correct bounded top-k
    shape built-in streaming aggregates cannot express (a late earlier
    event must EVICT a previously-kept row, so append mode is wrong;
    each update re-emits the key's current kept set stamped with a
    monotone per-key version, and ``rate_capped_finish`` keeps the
    final snapshot). State is ≤ k (time, id) pairs per active key."""
    keyed = events.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
    ).withColumn("hour_us", F.col("us") - F.col("us") % 3_600_000_000)
    return keyed.groupBy("user_id", "hour_us").applyInPandasWithState(
        _rate_cap_fn(k),
        outputStructType=RATE_CAP_OUTPUT,
        stateStructType=RATE_CAP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rate_capped_finish(drained: DataFrame) -> DataFrame:
    """Last-version-wins snapshot of the drained update stream: the
    final kept set per (user, hour) — identical to the batch
    ``q_events_rate_capped`` report regardless of slicing."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "hour_us")
    return (
        drained.withColumn("mv", F.max("version").over(w))
        .filter(F.col("version") == F.col("mv"))
        .select("event_id", "user_id", "hour_us", "rk")
    )


KM_FIRSTS_OUTPUT = T.StructType(
    [
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("d1_days", T.LongType(), False),
        T.StructField("d2_days", T.LongType(), True),
        T.StructField("max_days", T.LongType(), False),
        T.StructField("version", T.LongType(), False),
    ]
)

KM_FIRSTS_STATE = T.StructType(
    [
        T.StructField("days_arr", T.ArrayType(T.LongType()), True),
        T.StructField("okey_arr", T.ArrayType(T.LongType()), True),
        T.StructField("max_days", T.LongType(), True),
        T.StructField("version", T.LongType(), True),
    ]
)


def _km_firsts_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (custkey,) = key
    if state.exists:
        days_arr, okey_arr, max_days, version = state.get
        kept = list(zip(days_arr, okey_arr))
    else:
        kept, max_days, version = [], -(2**62), 0
    for pdf in pdfs:
        kept.extend(zip(pdf["days"], pdf["o_orderkey"]))
        max_days = max(max_days, int(pdf["days"].max()))
    # min-2 by (order date, orderkey): associative + commutative, so
    # the final (first, second) pair is slicing/arrival-order
    # independent — same merge law as the rate-cap state
    kept = sorted(set(kept))[:2]
    version += 1
    state.update(
        (
            [int(d) for d, _ in kept],
            [int(k) for _, k in kept],
            int(max_days),
            version,
        )
    )
    yield pd.DataFrame(
        {
            "o_custkey": [int(custkey)],
            "d1_days": [int(kept[0][0])],
            "d2_days": [int(kept[1][0]) if len(kept) > 1 else None],
            "max_days": [int(max_days)],
            "version": [version],
        }
    )


def km_firsts(orders: DataFrame) -> DataFrame:
    """Streaming per-customer (first, second) order-date tracker — the
    min-2 instance of the user-managed bounded top-k state shape (see
    ``rate_capped_events``), plus the per-key max order date so the
    drained snapshot carries everything Kaplan–Meier censoring needs
    (global max = max over keys; every order belongs to some key).
    Dates travel as integer days-since-epoch (exact, tz-proof)."""
    keyed = orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("days"),
    )
    return keyed.groupBy("o_custkey").applyInPandasWithState(
        _km_firsts_fn,
        outputStructType=KM_FIRSTS_OUTPUT,
        stateStructType=KM_FIRSTS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def km_firsts_finish(drained: DataFrame) -> DataFrame:
    """Last-version-wins snapshot → (t_days, cen) subject rows →
    the shared ``operators.events.km_curve`` tail: KM-at-ingest equal
    to the batch ``q_kaplan_meier_repeat`` regardless of slicing."""
    from pyspark.sql import Window

    from ..operators.events import km_curve

    w = Window.partitionBy("o_custkey")
    snap = (
        drained.withColumn("mv", F.max("version").over(w))
        .filter(F.col("version") == F.col("mv"))
        .select("o_custkey", "d1_days", "d2_days", "max_days")
    )
    gmax = snap.agg(F.max("max_days").alias("gmax"))
    u = snap.crossJoin(F.broadcast(gmax)).select(
        F.when(
            F.col("d2_days").isNotNull(),
            F.col("d2_days") - F.col("d1_days"),
        )
        .otherwise(F.col("gmax") - F.col("d1_days"))
        .cast("int")
        .alias("t_days"),
        F.col("d2_days").isNull().cast("long").alias("cen"),
    )
    return km_curve(u)


URL_DEDUP_OUTPUT = T.StructType(
    [
        T.StructField("url_key", T.LongType(), False),
        T.StructField("n_tok", T.LongType(), False),
        T.StructField("n_distinct", T.LongType(), False),
        T.StructField("n_at_url", T.LongType(), False),
        T.StructField("version", T.LongType(), False),
    ]
)

URL_DEDUP_STATE = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_tok", T.LongType(), True),
        T.StructField("n_distinct", T.LongType(), True),
        T.StructField("n_seen", T.LongType(), True),
        T.StructField("version", T.LongType(), True),
    ]
)


def _url_dedup_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (url_key,) = key
    if state.exists:
        doc_id, n_tok, n_distinct, n_seen, version = state.get
    else:
        doc_id, n_tok, n_distinct, n_seen, version = None, 0, 0, 0, 0
    for pdf in pdfs:
        n_seen += len(pdf)
        # min-by-doc_id merge: associative + commutative, so the
        # surviving crawl is slicing/arrival-order independent — a
        # late-arriving EARLIER crawl correctly evicts the kept one
        i = int(pdf["doc_id"].idxmin())
        cand = int(pdf["doc_id"].loc[i])
        if doc_id is None or cand < doc_id:
            doc_id = cand
            n_tok = int(pdf["n_tok"].loc[i])
            n_distinct = int(pdf["n_distinct"].loc[i])
    version += 1
    state.update((int(doc_id), n_tok, n_distinct, int(n_seen), version))
    yield pd.DataFrame(
        {
            "url_key": [int(url_key)],
            "n_tok": [n_tok],
            "n_distinct": [n_distinct],
            "n_at_url": [int(n_seen)],
            "version": [version],
        }
    )


def url_dedup_state(documents: DataFrame) -> DataFrame:
    """URL-DEDUP-AT-INGEST: per url_key the smallest-doc_id crawl's
    stats plus the running crawl count, maintained as min-1 state over
    the documents landing stream (the k=1 instance of the bounded
    min-k shape `rate_capped_events`/`km_firsts` establish — a web
    crawler's frontier dedup, running at ingest instead of in a batch
    repair pass). Update mode + per-key version stamp; the finish
    keeps the last snapshot per URL."""
    from ..operators.curation import url_keyed_docs

    keyed = url_keyed_docs(documents)
    return keyed.groupBy("url_key").applyInPandasWithState(
        _url_dedup_fn,
        outputStructType=URL_DEDUP_OUTPUT,
        stateStructType=URL_DEDUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def url_dedup_finish(drained: DataFrame) -> DataFrame:
    """Last-version-wins snapshot of the drained update stream → the
    per-URL winner table → the SHARED `domain_mixture_finish` tail, so
    the drain lands behind the same oracle row as the batch
    `domain_dedup_mixture` regardless of micro-batch slicing."""
    from pyspark.sql import Window

    from ..operators.curation import domain_mixture_finish

    w = Window.partitionBy("url_key")
    snap = (
        drained.withColumn("mv", F.max("version").over(w))
        .filter(F.col("version") == F.col("mv"))
        .select("url_key", "n_tok", "n_distinct", "n_at_url")
    )
    return domain_mixture_finish(snap)
