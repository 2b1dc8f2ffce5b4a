"""PII scan, repetition stats, and decontamination semantics. The
fixture corpus has no real PII, so PII behavior is proven on planted
rows with a direct Spark-vs-DuckDB parity check (same comparison the
driver gate does, on adversarial inputs the fixtures can't provide)."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from beauty_lakehouse_spark.catalog import load
from beauty_lakehouse_spark.operators import curation, text

PLANTED = [
    (1, "contact me at alice.smith+spam@example.co.uk for details"),
    (2, "call +1-555-123-4567 or 020 7946 0958 today"),
    (3, "server at 192.168.0.1 and 10.0.0.255 responded"),
    (4, "no identifiers here just plain words"),
    (5, "mixed bob@test.io then 8.8.8.8 then 555-867-5309 end"),
    (6, "almost@an@email and 999.999.999.999 still matches shape"),
]


def _spark_pii(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    red = F.col("text")
    for cls, pat in text.PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{cls}>")
    return df.select(
        "doc_id",
        *[
            F.size(F.regexp_extract_all("text", F.lit(p), 0)).alias(f"n_{c}")
            for c, p in text.PII_PATTERNS.items()
        ],
        F.md5(red).alias("redacted_hash"),
    )


def test_pii_planted_parity_with_duckdb(spark):
    got = {
        r.doc_id: (r.n_email, r.n_phone, r.n_ipv4, r.redacted_hash)
        for r in _spark_pii(spark, PLANTED).collect()
    }
    pdf = pd.DataFrame(PLANTED, columns=["doc_id", "text"])  # noqa: F841
    e, p, i = (
        text.PII_PATTERNS["email"],
        text.PII_PATTERNS["phone"],
        text.PII_PATTERNS["ipv4"],
    )
    want = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]), r[4])
        for r in duckdb.sql(
            f"""SELECT doc_id,
              len(regexp_extract_all(text, '{e}')) AS n_email,
              len(regexp_extract_all(text, '{p}')) AS n_phone,
              len(regexp_extract_all(text, '{i}')) AS n_ipv4,
              md5(regexp_replace(regexp_replace(regexp_replace(text,
                '{e}', '<email>', 'g'), '{p}', '<phone>', 'g'),
                '{i}', '<ipv4>', 'g')) AS redacted_hash
            FROM pdf"""
        ).fetchall()
    }
    assert got == want
    # the planted rows actually exercise every class
    assert got[1][0] >= 1 and got[2][1] >= 1 and got[3][2] == 2
    assert got[4] == (0, 0, 0, got[4][3])


def test_pii_scan_fixture_runs_clean(spark, sf_dir):
    rows = text.q_pii_scan(spark, sf_dir).collect()
    n = load(spark, sf_dir).documents.count()
    assert len(rows) == n
    for r in rows:
        assert r.has_pii == ((r.n_email + r.n_phone + r.n_ipv4) > 0)


def test_repetition_identities(spark, sf_dir):
    """n_grams == n_tokens - 1 per doc; distinct <= total; the
    repetitive flag matches the integer cross-multiplication rule."""
    toks = {
        r.doc_id: r.n
        for r in load(spark, sf_dir)
        .documents.select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    rows = text.q_repetition_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_grams == toks[r.doc_id] - 1
        assert 1 <= r.top_gram_freq <= r.n_grams
        assert r.n_distinct_grams <= r.n_grams
        assert r.repetitive == ((r.n_grams - r.n_distinct_grams) * 5 > r.n_grams)


def test_repetition_flags_planted_loop(spark):
    df = spark.createDataFrame(
        [(1, "spam ham " * 50 + "end"), (2, " ".join(f"w{i}" for i in range(100)))],
        ["doc_id", "text"],
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text")
    )

    class _T:
        documents = df

    import beauty_lakehouse_spark.operators.text as tmod

    orig = tmod.load
    tmod.load = lambda *_: _T()
    try:
        rows = {r.doc_id: r for r in tmod.q_repetition_stats(None, "x").collect()}
    finally:
        tmod.load = orig
    assert rows[1].repetitive and not rows[2].repetitive
    assert rows[1].top_gram_freq >= 49


def test_decontaminate_only_train_docs_and_real_overlap(spark, sf_dir):
    """Reported docs are train-split only, and each really shares >= 1
    3-gram with >= 1 test doc (spot-check via dedup.shingles)."""
    from beauty_lakehouse_spark.operators.dedup import shingles

    rows = curation.q_decontaminate(spark, sf_dir).collect()
    assert rows
    t = load(spark, sf_dir)
    b = curation._bucket(F.col("doc_id"), "split")
    buckets = {r.doc_id: r.b for r in t.documents.select("doc_id", b.alias("b")).collect()}
    for r in rows:
        assert buckets[r.doc_id] < curation.SPLIT_VAL_END  # non-test side
        assert r.n_hit_grams >= 1 and r.n_test_docs >= 1

    sh = shingles(t.documents, n=3, max_doc_freq=curation.DECON_MAX_DOC_FREQ)
    by_doc: dict[int, set] = {}
    for row in sh.collect():
        by_doc.setdefault(row.doc_id, set()).add(row.shingle)
    test_docs = [d for d, bk in buckets.items() if bk >= curation.SPLIT_VAL_END]
    sample = rows[:5]
    for r in sample:
        hits = {
            td
            for td in test_docs
            if by_doc.get(td, set()) & by_doc.get(r.doc_id, set())
        }
        assert len(hits) == r.n_test_docs
