"""Cross-engine determinism helpers: portable hash and exact half-up
division must agree with DuckDB bit-for-bit — these are the primitives
the whole oracle-comparison story rests on."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
from pyspark.sql import functions as F

from beauty_lakehouse_spark.functions import (
    halfup_div,
    halfup_div_sql,
    portable_hash64,
    portable_hash64_sql,
)


def test_portable_hash64_matches_duckdb(spark):
    vals = ["", "a", "hello world", "ünïcode", "0", "x" * 100]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r.s: r.h for r in df.select("s", portable_hash64("s").alias("h")).collect()}
    con = duckdb.connect()
    for v in vals:
        expected = con.sql(
            "SELECT " + portable_hash64_sql("?").replace("?", f"'{v}'")
        ).fetchall()[0][0]
        assert got[v] == expected, v


def test_halfup_div_matches_python_decimal(spark):
    cases = [(1, 3), (2, 3), (1, 8), (266810539 * 100, 800 * 100), (5, 2), (7, 2000000)]
    df = spark.createDataFrame(cases, ["n", "d"])
    for k in (2, 4, 6):
        got = {
            (r.n, r.d): r.v
            for r in df.select(
                "n", "d", halfup_div(F.col("n"), F.col("d"), k).alias("v")
            ).collect()
        }
        for n, d in cases:
            expected = float(
                (Decimal(n) / Decimal(d)).quantize(
                    Decimal(1).scaleb(-k), rounding=ROUND_HALF_UP
                )
            )
            assert got[(n, d)] == expected, (n, d, k)


def test_halfup_div_matches_duckdb(spark):
    cases = [(1, 3), (2, 3), (1, 8), (26681053900, 80000), (7, 2000000)]
    df = spark.createDataFrame(cases, ["n", "d"])
    got = sorted(
        (r.n, r.d, r.v)
        for r in df.select("n", "d", halfup_div(F.col("n"), F.col("d"), 6).alias("v")).collect()
    )
    con = duckdb.connect()
    expected = sorted(
        (n, d, con.sql(f"SELECT {halfup_div_sql(str(n), str(d), 6)}").fetchall()[0][0])
        for n, d in cases
    )
    assert got == expected


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    from pyspark.sql import functions as F

    from beauty_lakehouse_spark.catalog import load
    from beauty_lakehouse_spark.operators.relational import salted_agg

    li = load(spark, sf_dir).lineitem
    salted = salted_agg(
        li,
        ["l_returnflag"],
        sums={"qty": F.col("l_quantity")},
        count_alias="n",
        n_salts=8,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"), F.count(F.lit(1)).alias("n")
    )
    a = sorted(tuple(r) for r in salted.collect())
    b = sorted(tuple(r) for r in plain.collect())
    assert a == b


def test_lift_pandas_declared_schema(spark):
    import pandas as pd

    from beauty_lakehouse_spark import sources

    pdf = pd.DataFrame({"customer_id": [1, 2], "first_name": ["A", "B"]})
    schema = __import__("pyspark.sql.types", fromlist=["t"]).StructType(
        [f for f in sources.BEAUTY_CSV_SCHEMAS["customers"] if f.name in pdf.columns]
    )
    df = sources.lift_pandas(spark, pdf, schema)
    assert df.schema == schema
    assert df.count() == 2


def test_ln_micro_cross_engine_and_accuracy(spark):
    """ln_micro's Spark and DuckDB implementations are the same integer
    algorithm: bit-identical on a seeded sweep, and within ~20
    micro-nats of float ln (the documented quantization bound)."""
    import math
    import random

    import duckdb
    from pyspark.sql import functions as F

    from beauty_lakehouse_spark.functions import ln_micro, ln_micro_sql

    rng = random.Random(11)
    cases = [(1, 1), (2, 1), (2**31 - 1, 1), (500, 499), (3, 2)]
    for _ in range(200):
        n, d = rng.randint(1, 2**31 - 1), rng.randint(1, 10**6)
        cases.append((max(n, d), min(n, d)))
    df = spark.createDataFrame(cases, "num long, den long")
    got = {
        (r.num, r.den): r.v
        for r in df.select(
            "num", "den", ln_micro(F.col("num"), F.col("den")).alias("v")
        ).collect()
    }
    con = duckdb.connect()
    for n, d in cases:
        dk = con.sql(f"SELECT {ln_micro_sql(str(n), str(d))}").fetchone()[0]
        assert got[(n, d)] == dk, (n, d, got[(n, d)], dk)
        assert abs(got[(n, d)] - math.log(n / d) * 1e6) <= 20, (n, d)


def test_isqrt_cross_engine_exact(spark):
    """isqrt: exact floor(sqrt(x)) on both engines, including perfect
    squares and their neighbors (the float-sqrt boundary cases)."""
    import duckdb
    import math
    import random

    from pyspark.sql import functions as F

    from beauty_lakehouse_spark.functions import isqrt, isqrt_sql

    cases = [0, 1, 2, 3, 4, 8, 9, 10, 2**40, 2**40 + 1, 2**52 - 1]
    for k in [10**3, 10**6, 223372036]:
        cases += [k * k - 1, k * k, k * k + 1]
    rng = random.Random(3)
    cases += [rng.randrange(2**52) for _ in range(200)]
    df = spark.createDataFrame([(x,) for x in cases], "x long")
    got = {r.x: r.s for r in df.select("x", isqrt(F.col("x")).alias("s")).collect()}
    con = duckdb.connect()
    for x in cases:
        want = math.isqrt(x)
        dk = con.sql(f"SELECT {isqrt_sql(str(x))}").fetchone()[0]
        assert got[x] == want == dk, (x, got[x], dk, want)


def test_splitmix60_cross_engine_exact(spark):
    """The splitmix60 mixer (one md5 seed -> many decorrelated 60-bit
    uniforms; the r10 bootstrap hash-bill fix) is bit-identical across
    Spark, DuckDB, and an independent pure-Python recompute, for seeds
    spanning the full 60-bit range and every bootstrap stream index."""
    from beauty_lakehouse_spark.functions import splitmix60, splitmix60_sql

    m60 = 1 << 60
    seeds = [0, 1, 2**30 - 1, 2**30, 3141592653589793238 % m60,
             m60 - 1, 424136118829305344]
    streams = [0, 1, 7, 31]

    def py_mix(seed, stream):
        def mulmod60(z, c):
            return (((z >> 30) * c % (1 << 30)) * (1 << 30)
                    + (z % (1 << 30)) * c) % m60
        z = (seed + (stream + 1) * 15614961330584597 % m60) % m60
        z ^= z >> 31
        z = mulmod60(z, 2654435761)
        z ^= z >> 29
        z = mulmod60(z, 2246822519)
        return z ^ (z >> 32)

    rows = [(s, r) for s in seeds for r in streams]
    df = spark.createDataFrame(rows, ["seed", "stream"])
    got = {
        (r.seed, r.stream): r.u
        for r in df.select(
            "seed", "stream",
            splitmix60(F.col("seed"), F.col("stream")).alias("u"),
        ).collect()
    }
    con = duckdb.connect()
    for s, r in rows:
        want = py_mix(s, r)
        dk = con.sql(
            f"SELECT {splitmix60_sql(str(s), str(r))}"
        ).fetchone()[0]
        assert got[(s, r)] == want == dk, (s, r, got[(s, r)], want, dk)
        assert 0 <= want < m60
