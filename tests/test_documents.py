"""Round-trip law for the document layer (SURVEY.md §5.2): collapsing
lineitem into order documents and exploding back must reproduce the
original projection, order-insensitively. Replaces the reference's
Mongo insert/read cycle (02_document_db_mongodb.ipynb:269-322)."""

from __future__ import annotations

from pyspark.sql import functions as F

from beauty_lakehouse_spark.catalog import load
from beauty_lakehouse_spark.operators.documents import (
    ITEM_COLS,
    collapse_order_docs,
    explode_order_docs,
    read_json_docs,
    write_json_docs,
)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_collapse_explode_round_trip(spark, sf_dir):
    t = load(spark, sf_dir)
    docs = collapse_order_docs(t.orders, t.lineitem)
    back = explode_order_docs(docs)
    orig = t.lineitem.select("l_orderkey", *ITEM_COLS)
    assert _canon(back) == _canon(orig)


def test_collapse_item_counts_match(spark, sf_dir):
    t = load(spark, sf_dir)
    docs = collapse_order_docs(t.orders, t.lineitem)
    bad = docs.filter(F.size("items") != F.col("n_items")).count()
    assert bad == 0
    assert docs.count() == t.lineitem.select("l_orderkey").distinct().count()


def test_json_sink_source_round_trip(spark, sf_dir, tmp_path):
    t = load(spark, sf_dir)
    docs = collapse_order_docs(t.orders, t.lineitem.limit(200))
    path = str(tmp_path / "docs_json")
    write_json_docs(docs, path)
    back = read_json_docs(spark, path)
    assert back.count() == docs.count()
    # JSON re-infers types; compare the stable key + count columns
    a = sorted((r.o_orderkey, r.n_items) for r in docs.collect())
    b = sorted((r.o_orderkey, r.n_items) for r in back.collect())
    assert a == b


def test_write_docs_generalized_sink(spark, sf_dir, tmp_path):
    """write_docs: json path round-trips; mongodb path plumbs the format
    + options through to Spark's DataSource resolution (the connector
    jar is environment-provided, so resolution failing with the format
    name proves the passthrough reached the source registry)."""
    import pytest as _pytest

    from beauty_lakehouse_spark.operators.documents import write_docs

    t = load(spark, sf_dir)
    docs = collapse_order_docs(t.orders, t.lineitem.limit(50))
    path = str(tmp_path / "docs_json2")
    write_docs(docs, path, fmt="json")
    assert read_json_docs(spark, path).count() == docs.count()

    with _pytest.raises(Exception, match="(?i)mongodb"):
        write_docs(
            docs, "", fmt="mongodb",
            **{"connection.uri": "mongodb://localhost:27017",
               "database": "beauty", "collection": "orders"},
        )
