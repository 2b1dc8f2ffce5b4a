"""The spark.sql front door (temp views over the catalog) and physical-
plan regression guards: the properties that make these queries scale —
pushdown, pruning, codegen, broadcast — asserted so a refactor can't
silently lose them."""

from __future__ import annotations

from pyspark.sql import functions as F

from beauty_lakehouse_spark.catalog import load
from beauty_lakehouse_spark.operators import warehouse


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sql_front_door(spark, sf_dir):
    t = load(spark, sf_dir)
    t.register_temp_views()
    df = spark.sql(
        """
        SELECT l_returnflag, count(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag
        """
    )
    rows = {r.l_returnflag: r.n for r in df.collect()}
    expected = {
        r.l_returnflag: r.n
        for r in t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows == expected


def test_pricing_summary_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(warehouse.q_pricing_summary(spark, sf_dir))
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan_lines, plan
    # the shipdate predicate must reach the parquet scan, and the scan
    # must read only the 7 needed columns (pruning)
    assert any("l_shipdate" in l and "DataFilters" in l for l in scan_lines)
    assert not any("l_orderkey" in l for l in scan_lines)


def test_pricing_summary_whole_stage_codegen(spark, sf_dir):
    df = warehouse.q_pricing_summary(spark, sf_dir)
    df.collect()  # AQE only finalizes (and fuses codegen stages) on execution
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # '*(N)' prefixes mark WholeStageCodegen stages in the plan string;
    # both the scan+partial-agg and the final-agg stages must be fused
    import re

    assert len(set(re.findall(r"\*\((\d+)\)", plan))) >= 2, plan


def test_shipping_priority_filters_before_joins(spark, sf_dir):
    plan = _plan(warehouse.q_shipping_priority(spark, sf_dir))
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    # every one of the three table scans carries its own pushed filter
    assert any("c_mktsegment" in l and "BUILDING" in l for l in scans)
    assert any("o_orderdate" in l and "1998-03-15" in l for l in scans)
    assert any("l_shipdate" in l and "1996-03-15" in l for l in scans)


def test_bounded_dims_broadcast(spark, sf_dir):
    plan = _plan(warehouse.q_local_supplier_volume(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_percentiles_no_low_cardinality_window_over_raw_rows(spark, sf_dir):
    """q_order_value_percentiles must never sort raw order rows inside a
    partitionBy(c_mktsegment)-only window (5 segments -> each reducer
    sorts 1/5 of ALL orders at scale). Any window that orders raw rows
    (o_orderkey in its sort spec) must be partitioned finer than just
    the segment; segment-only windows may only run over the aggregated
    bucket table (no o_orderkey in scope there)."""
    import re

    plan = _plan(warehouse.q_order_value_percentiles(spark, sf_dir))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        if "o_orderkey" in spec:
            assert "quantile" in spec, spec


def test_pii_and_repetition_are_shuffle_free(spark, sf_dir):
    """Both per-doc text signals must stay a single narrow scan with no
    DATA-GRAIN shuffle — the property that makes them linear at 100 TB.
    The one allowed Exchange is the r13 ``spread_scan`` round-robin
    repartition of the (unsplittable, single-row-group) small scan that
    fans the per-row gram fold across cores; it moves scan-sized bytes
    exactly once, never keyed data, and is a no-op at real scale where
    the scan already splits."""
    from beauty_lakehouse_spark.operators import text

    for fn in (text.q_pii_scan, text.q_repetition_stats):
        plan = _plan(fn(spark, sf_dir))
        exchanges = [
            l for l in plan.splitlines() if "Exchange" in l
        ]
        assert all(
            "RoundRobinPartitioning" in l and "REPARTITION_BY_NUM" in l
            for l in exchanges
        ), plan
        scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
        assert scans and all("ReadSchema" not in l or "text" in l for l in scans)
        assert not any("lang" in l and "source" in l for l in scans)  # pruned


def test_sequence_packing_no_global_window_over_docs(spark, sf_dir):
    """The only unpartitioned window may run over the bucket table
    (N / bucket_width rows), never the raw documents: every Sort that
    feeds a single-partition Exchange must sit on the aggregated-bucket
    branch (below a HashAggregate), not directly on the scan."""
    from beauty_lakehouse_spark.operators import curation

    df = curation.q_sequence_packing(spark, sf_dir)
    plan = _plan(df)
    lines = plan.splitlines()

    def _indent(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-*("))

    singles = [i for i, l in enumerate(lines) if "SinglePartition" in l]
    assert singles, plan
    for i in singles:
        # walk ONLY this exchange's own subtree (deeper-indented lines)
        base = _indent(lines[i])
        subtree = []
        for line in lines[i + 1:]:
            if line.strip() and _indent(line) <= base:
                break
            subtree.append(line)
        # inside the subtree, an aggregate must appear before any scan:
        # the single-partition input is the aggregated bucket table,
        # never raw document rows
        agg_at = next(
            (j for j, l in enumerate(subtree) if "HashAggregate" in l), None
        )
        scan_at = next(
            (j for j, l in enumerate(subtree) if "FileScan" in l or "Scan parquet" in l),
            None,
        )
        assert agg_at is not None, plan
        assert scan_at is None or agg_at < scan_at, plan


def test_grouping_sets_levels_consistent(spark, sf_dir):
    """GROUPING SETS output: every level present, grand total equals the
    sum of the (segment, year) leaves, and gid disambiguates levels."""
    from beauty_lakehouse_spark.operators.warehouse import q_sales_grouping_sets

    rows = q_sales_grouping_sets(spark, sf_dir).collect()
    gids = {r["gid"] for r in rows}
    assert gids == {0, 1, 2, 3}
    leaves = [r for r in rows if r["gid"] == 0]
    total = [r for r in rows if r["gid"] == 3]
    assert len(total) == 1
    assert total[0]["n_orders"] == sum(r["n_orders"] for r in leaves)
    assert abs(
        total[0]["total_sales"] - sum(r["total_sales"] for r in leaves)
    ) < 1e-6 * max(1.0, abs(total[0]["total_sales"]))
    # one Expand, one aggregate — not a union of per-level plans
    plan = (
        q_sales_grouping_sets(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") == 1, plan
    assert "Union" not in plan, plan


def test_unpivot_long_form_round_trip(spark, sf_dir):
    """unpivot emits exactly one row per (year, metric) and preserves
    the wide values."""
    from beauty_lakehouse_spark.operators.relational import (
        q_order_metrics_unpivot,
    )

    rows = q_order_metrics_unpivot(spark, sf_dir).collect()
    years = {r["order_year"] for r in rows}
    metrics = {r["metric"] for r in rows}
    assert metrics == {"n_orders", "total_price", "n_customers"}
    assert len(rows) == len(years) * 3
    by = {(r["order_year"], r["metric"]): r["value"] for r in rows}
    # n_orders must be a positive integer-valued double for every year
    assert all(
        v > 0 and v == int(v)
        for (y, m), v in by.items()
        if m == "n_orders"
    )


def test_revenue_forecast_delta_full_pushdown(spark, sf_dir):
    """Q6 shape: the date/quantity predicates must reach the parquet
    scan and the scan must read only the 4 needed columns."""
    plan = _plan(warehouse.q_revenue_forecast_delta(spark, sf_dir))
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scans, plan
    assert any("l_shipdate" in l and "DataFilters" in l for l in scans)
    assert any("l_quantity" in l and "DataFilters" in l for l in scans)
    # projection pruning: no untouched wide columns in ReadSchema
    assert not any("l_returnflag" in l for l in scans)


def test_returned_item_report_broadcast_and_topk(spark, sf_dir):
    """Q10 shape: nation broadcast, no cartesian, and the top-20 fused
    to TakeOrderedAndProject (no global sort)."""
    plan = _plan(warehouse.q_returned_item_report(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan, plan


def test_doc_chunking_is_shuffle_free(spark, sf_dir):
    """The chunk expansion must be a pure codegen row expansion —
    no Exchange anywhere (the property that makes it linear and
    sink-streamable at 100 TB)."""
    from beauty_lakehouse_spark.operators import curation

    plan = _plan(curation.q_doc_chunking(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_training_shuffle_no_single_partition_sort_over_docs(spark, sf_dir):
    """Global ordering must come from the two-level bucket scheme: any
    SinglePartition exchange may only carry the aggregated bucket-count
    table (below a HashAggregate), never raw document rows; the raw
    side is partitioned by bucket."""
    from beauty_lakehouse_spark.operators import curation

    plan = _plan(curation.q_training_order_shuffle(spark, sf_dir))
    lines = plan.splitlines()

    def _indent(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-*("))

    singles = [i for i, l in enumerate(lines) if "SinglePartition" in l]
    assert singles, plan
    for i in singles:
        base = _indent(lines[i])
        subtree = []
        for l in lines[i + 1:]:
            if _indent(l) <= base:
                break
            subtree.append(l)
        assert any("HashAggregate" in l for l in subtree), plan
    # the document-carrying window is hash-partitioned by bucket
    assert any(
        "hashpartitioning(bucket" in l for l in lines
    ), plan


def test_bpe_pair_counts_aggregates_vocabulary_not_stream(spark, sf_dir):
    """Pair statistics must be computed over the aggregated vocabulary:
    the pair-explode must sit ABOVE the token-frequency HashAggregate
    in the plan (explode of the raw token stream would multiply the
    full corpus by word length before any combine)."""
    from beauty_lakehouse_spark.operators import text

    plan = _plan(text.q_bpe_pair_counts(spark, sf_dir))
    lines = plan.splitlines()
    gen_idx = [
        i for i, l in enumerate(lines)
        if "Generate explode" in l and "substring" in l
    ]
    agg_idx = [
        i for i, l in enumerate(lines)
        if "HashAggregate" in l and "token" in l
    ]
    assert gen_idx and agg_idx, plan
    # deeper in the printed tree = earlier in execution; the pair
    # explode must appear above (smaller index than) the vocab
    # aggregate's final stage
    assert min(gen_idx) < max(agg_idx), plan


def test_no_stringified_extremes_in_oracle_sql():
    """Round-6's only driver-gate red row (`table_stats`) came from an
    engine-version-sensitive canonicalization layer: DECIMAL→VARCHAR /
    strftime applied to a single aggregated extreme. The r7 audit
    removed every instance; this pins the class shut — no oracle may
    stringify a min/max (digit-strings of exact integers, like
    moments_sketch's HUGEINT sums, are fine: integer printing cannot
    drift)."""
    import re

    import __spark_entry__ as entrymod

    for name, sql in entrymod.oracle_sql().items():
        assert not re.search(
            r"CAST\(\s*(?:min|max)\((?:[^()]|\([^()]*\))*\)\s*"
            r"AS\s+VARCHAR\s*\)",
            sql,
            re.IGNORECASE,
        ), f"{name}: stringified min/max extreme (the table_stats bug class)"
        assert not re.search(
            r"strftime\(\s*(min|max)\s*\(", sql, re.IGNORECASE
        ), f"{name}: strftime over an aggregated extreme"


#: the only types a hashed oracle column may carry: these map 1:1 onto
#: Spark/Arrow types (int64/int32/float64/utf8/date32/timestamp/bool/
#: decimal128(p,s)).  Anything else — HUGEINT (int128) above all — has
#: no Spark twin, so a type-tagged value hash diverges even when every
#: value is identical (the r7 `table_stats` red row: an uncast
#: `sum(CASE…)` is HUGEINT in DuckDB, int64 in Spark).
_PORTABLE_DUCKDB_TYPES = (
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BOOLEAN",
    "DECIMAL",
)


def _duckdb_con_with_views():
    import os

    import duckdb

    from tests.conftest import SF_DIR

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _nonportable_columns(con, sql):
    return [
        (col, typ)
        for col, typ, *_ in con.execute(f"DESCRIBE ({sql})").fetchall()
        if not typ.upper().startswith(_PORTABLE_DUCKDB_TYPES)
    ]


def test_oracle_output_types_are_portable():
    """Mechanical type-level audit (the r7 string-level audit missed the
    int128 channel): DESCRIBE every `oracle_sql()` entry in DuckDB and
    assert no output column carries a type outside the portable set —
    HUGEINT/UHUGEINT/UTINYINT/etc. must never reach a hashed column,
    because the driver's value hash is type-tagged and Spark has no
    int128."""
    import __spark_entry__ as entrymod

    con = _duckdb_con_with_views()
    offenders = {}
    for name, sql in sorted(entrymod.oracle_sql().items()):
        bad = _nonportable_columns(con, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles with non-portable output column types (wrap in "
        f"CAST(... AS BIGINT)/DOUBLE): {offenders}"
    )


def test_driver_gate_front_is_all_oracle_bearing():
    """The driver's correctness gate walks queries() in order under a
    ~50-row budget; a rows-only entry in that window burns a slot on a
    `no_oracle` verdict (r7 wasted 3 of 50; the r13 relaxation that
    let never-row-verified rows-only entries ride the front burned 15
    of 50 — CORRECTNESS_r13 shows the driver gives them all-null
    `no_oracle` rows, it does NOT row-verify them). Strict policy
    restored (VERDICT r13 ask #2): every entry in the ~50-slot window
    must carry an oracle."""
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    front = names[:50]
    wasted = [n for n in front if n not in oracles]
    assert not wasted, (
        f"rows-only entries inside the gate window (each burns a "
        f"verification slot on a no_oracle verdict): {wasted}"
    )


def _driver_green_ever():
    """Union of green rows across every committed CORRECTNESS_r*.json —
    the driver's own record of which entries have ever passed its gate."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            for name, row in json.load(fh).items():
                # hash_match must be literally True (ADVICE r12): a
                # missing/None hash means the values were never
                # checked, so the row hasn't earned green.
                if (
                    row.get("rows_match")
                    and row.get("schema_match", True)
                    and row.get("hash_match") is True
                ):
                    green.add(name)
    return green


def test_driver_gate_front_policy():
    """VERDICT r9 ask #1: the gate's ~50-slot budget must be spent on
    entries that were NEVER driver-green (residue from a prior round's
    budget overflow, plus anything new this round) before re-verifying
    rows the driver has already greened. Mechanically: in queries()
    order, no never-green oracle entry may sit behind an already-green
    one.

    Carry-over policy (r11): this round added MORE new oracle entries
    than one gate budget (> 50), so zeroing the residue within the
    round is arithmetically impossible — the overflow rides the FRONT
    of the next round's order (the r8→r9 precedent), which the
    ordering assertion below guarantees. The residue must stay within
    ONE extra gate budget (≤ 100 total) so it drains in a single
    following round; every entry is hash-verified in the full local
    replica (CORRECTNESS_local.json) regardless of when the driver's
    ~50-slot gate reaches it."""
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    green = _driver_green_ever()
    never = [n for n in names if n in oracles and n not in green]
    assert len(never) <= 100, (
        f"{len(never)} never-driver-verified oracle entries exceed "
        "TWO gate budgets — the residue cannot drain next round; "
        "stop adding oracle entries"
    )
    if never:
        last_never = max(names.index(n) for n in never)
        stale_before = [
            n
            for n in names[:last_never]
            if n in oracles and n in green
        ]
        assert not stale_before, (
            "already-green entries ahead of never-verified ones "
            f"(wastes gate slots): {stale_before[:5]}... "
            f"before {names[last_never]}"
        )


def test_registry_dtype_pairing(spark, sf_dir):
    """VERDICT r11 ask #2 (the CLASS behind the round's one red row):
    the driver's value hash is TYPE-TAGGED, so a Spark DECIMAL(38,0)
    column diverges from an oracle VARCHAR on IDENTICAL digits — and
    the old stringifying replica couldn't see it. Registry-wide audit:
    for every oracle-bearing entry, the Spark result dtypes must PAIR
    (beauty_lakehouse_spark.typetags) with the DuckDB output types,
    column by column. DuckDB side via DESCRIBE (bind only, no
    execution); Spark side via .dtypes on the built plan."""
    import __spark_entry__ as entrymod
    from beauty_lakehouse_spark.typetags import pair_mismatches

    con = _duckdb_con_with_views()
    offenders = {}
    for name, sql in sorted(entrymod.oracle_sql().items()):
        desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        d_cols = [r[0] for r in desc]
        d_types = [r[1] for r in desc]
        df = entrymod.queries()[name](spark, sf_dir)
        diffs = pair_mismatches(df.dtypes, d_cols, d_types)
        if diffs:
            offenders[name] = diffs
    assert not offenders, (
        "entries whose Spark dtypes do not pair with their oracle's "
        f"output types (type-tagged hash WILL diverge): {offenders}"
    )


def test_dtype_pairing_catches_decimal_vs_varchar():
    """Negative control for the r11 bug class: an injected
    decimal(38,0) ↔ VARCHAR pairing must be flagged."""
    from beauty_lakehouse_spark.typetags import pair_mismatches

    diffs = pair_mismatches(
        [("r_num", "decimal(38,0)"), ("n", "bigint")],
        ["r_num", "n"],
        ["VARCHAR", "BIGINT"],
    )
    assert diffs == [("r_num", "decimal(38,0)", "utf8")], diffs
    # and the documented portable pairings stay silent
    assert not pair_mismatches(
        [
            ("s", "string"), ("i", "bigint"), ("d", "double"),
            ("dt", "date"), ("ts", "timestamp"), ("b", "boolean"),
            ("dec", "decimal(38,0)"), ("arr", "array<bigint>"),
        ],
        ["s", "i", "d", "dt", "ts", "b", "dec", "arr"],
        [
            "VARCHAR", "BIGINT", "DOUBLE", "DATE", "TIMESTAMP",
            "BOOLEAN", "DECIMAL(38,0)", "BIGINT[]",
        ],
    )


def test_oracle_type_audit_catches_uncast_integer_sum():
    """Negative control: the exact bug class (`sum(CASE…)` with no CAST
    → HUGEINT) must be flagged by the audit helper, proving the check
    has teeth."""
    con = _duckdb_con_with_views()
    bad = _nonportable_columns(
        con,
        "SELECT sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) "
        "AS n_nulls FROM orders",
    )
    assert bad == [("n_nulls", "HUGEINT")], bad


def test_ddsketch_oracle_mirrors_ln_micro_guard():
    """ADVICE r8: the Spark side RAISES on cents >= 2^31 (ln_micro's
    exact range); the DuckDB oracle must fail loudly on the same input
    rather than silently mis-bucket — both engines share the contract."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()["ddsketch_value_quantiles"]
    con = duckdb.connect()
    # in-range orders: oracle runs fine
    ok = pd.DataFrame({"o_totalprice": [10.00, 99.99, 21474836.47]})
    con.register("orders", ok)
    assert len(con.execute(sql).fetchall()) == 3  # one row per quantile
    # a single out-of-contract order (cents >= 2^31): oracle raises
    bad = pd.DataFrame({"o_totalprice": [10.00, 21474836.48]})
    con.register("orders", bad)
    try:
        con.execute(sql).fetchall()
        raise AssertionError(
            "oracle silently bucketed cents >= 2^31 (contract asymmetry)"
        )
    except duckdb.Error as e:
        assert "ddsketch bucket contract violated" in str(e)
