"""Nested-document operators (reference layer 2, the MongoDB pipeline).

The reference collapses orders⋈order_items into order documents with an
embedded ``items`` array-of-structs, then ships them to MongoDB via a
driver-side ``toPandas()`` (02_document_db_mongodb.ipynb:222-276) — THE
scalability cliff called out in SURVEY.md §3.2. Our engine keeps the
collapse distributed end to end: the document sink is ``df.write.json``
(or any Spark connector), never a driver collect.

``collect_list`` is order-nondeterministic under shuffle, so every array
is ``array_sort``-ed — documents get a canonical form, which also makes
the round-trip law testable (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load

ITEM_COLS = ["l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"]


def collapse_order_docs(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """orders ⋈ lineitem → one row per order with items array<struct>.

    Ref A3 (02_document_db_mongodb.ipynb:226-244): groupBy on the order
    columns + collect_list(struct(...)). Physical plan:
    ObjectHashAggregate after an Exchange on o_orderkey. Grouping only on
    the key and re-attaching header columns via first() keeps the
    grouping key narrow (the reference grouped on all 6 header columns,
    which makes the shuffle key wide for no semantic gain).
    """
    items = lineitem.select(
        "l_orderkey", F.struct(*ITEM_COLS).alias("item")
    )
    docs = items.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("item")).alias("items"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return (
        orders.join(docs, F.col("o_orderkey") == F.col("l_orderkey"), "inner")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "n_items",
            "items",
        )
    )


def explode_order_docs(docs: DataFrame) -> DataFrame:
    """Inverse of :func:`collapse_order_docs` — the round-trip law
    (explode(docs.items) == lineitem projection, order-insensitive)."""
    return docs.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.explode("items").alias("item"),
    ).select("l_orderkey", *[F.col(f"item.{c}").alias(c) for c in ITEM_COLS])


def write_json_docs(docs: DataFrame, path: str) -> None:
    """Document sink (ref S6 reimagined): distributed JSON-lines write —
    the Spark-native replacement for the reference's driver-side
    toPandas→PyMongo insert_many."""
    docs.write.mode("overwrite").json(path)


def read_json_docs(spark: SparkSession, path: str) -> DataFrame:
    """Document source (ref S7): read the exported docs back."""
    return spark.read.json(path)


def write_docs(
    docs: DataFrame,
    target: str,
    fmt: str = "json",
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Generalized document sink: the JSON-lines path above plus a
    connector passthrough for the reference's MongoDB target
    (02_document_db_mongodb.ipynb:297-322 writes via PyMongo
    insert_many; the Spark-native equivalent is the ``mongodb``
    DataSource v2 connector). JSON remains the tested path — the Mongo
    connector jar is environment-provided, so with ``fmt="mongodb"``
    pass ``connection.uri``/``database``/``collection`` options and
    ``target`` is ignored by the connector (it addresses via options).

    Example::

        write_docs(docs, "", fmt="mongodb",
                   **{"connection.uri": "mongodb://host:27017",
                      "database": "beauty", "collection": "orders"})
    """
    writer = docs.write.format(fmt).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    if fmt == "mongodb":
        writer.save()
    else:
        writer.save(target)


# ----- registered queries ---------------------------------------------------


def q_order_docs_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-comparable shadow of the document collapse: per-order item
    count + item-derived totals (the array itself is checked by the
    pytest round-trip law; DuckDB list/struct hashing is not stable
    enough across engines to compare arrays directly)."""
    t = load(spark, sf_dir)
    docs = collapse_order_docs(t.orders, t.lineitem)
    return docs.select(
        "o_orderkey",
        "o_custkey",
        "n_items",
        F.round(
            F.aggregate(
                F.col("items"),
                F.lit(0).cast("decimal(20,2)"),
                lambda acc, x: (
                    acc + x["l_extendedprice"].cast("decimal(12,2)")
                ).cast("decimal(20,2)"),
            ),
            2,
        ).cast("double").alias("items_gross"),
    )
