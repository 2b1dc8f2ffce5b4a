"""Portable column helpers.

Everything here is a pure Column→Column function built from JVM-side
``pyspark.sql.functions`` (whole-stage-codegen friendly; no Python UDFs).

Cross-engine determinism is a design requirement: the driver compares our
Spark results against DuckDB oracle SQL by value-hash, so any function
used in a query output must have an exactly-equivalent DuckDB expression.
The key tool is :func:`portable_hash64` — a 60-bit integer hash derived
from md5, which both Spark (``conv(substr(md5(x),1,15),16,10)``) and
DuckDB (``('0x' || substr(md5(x),1,15))::bigint``) compute identically.
Spark's native ``hash()``/``xxhash64()`` are faster but engine-specific,
so they are reserved for internal plumbing (salting, bucketing) that
never reaches a compared output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "portable_hash64",
    "portable_hash64_sql",
    "money",
    "dec2",
    "dec2_sql",
    "halfup_div",
    "halfup_div_sql",
    "epoch_us",
    "iso_date",
    "clip",
    "normalized_text_hash",
    "normalized_text_hash_sql",
]


def portable_hash64(col: Column | str) -> Column:
    """60-bit stable integer hash of a string column (md5-based).

    Identical in DuckDB as ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    15 hex digits < 2^60, so the value always fits a signed int64.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str) -> str:
    """The DuckDB twin of :func:`portable_hash64` as a SQL fragment."""
    return f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"


def normalized_text_hash(col: Column | str = "text") -> Column:
    """Canonical exact-dedup key: md5 of lower(trim(text)).

    A cross-engine-exactness invariant shared by batch exact dedup, the
    corpus-cleaning duplicate rule, and the streaming dedup group table
    — change it HERE (and its ``_sql`` twin) or group membership drifts
    between those surfaces and the driver gate."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(c)))


def normalized_text_hash_sql(expr: str = "text") -> str:
    """The DuckDB twin of :func:`normalized_text_hash`."""
    return f"md5(lower(trim({expr})))"


def money(col: Column, scale: int = 2) -> Column:
    """Round a money amount the way the reference does everywhere
    (2-dp double; reference src/generate_data.py:192,199,301,302,309)."""
    return F.round(col, scale)


def dec2(col: Column | str, prec: int = 12) -> Column:
    """Exact decimal lift of a 2-dp money/rate column.

    The fixtures' money doubles are exact at 2 decimals, so the
    double→decimal cast is lossless and engine-identical. Lifting INPUTS
    (never intermediate double products — those already carry FP error
    that Spark and DuckDB round differently at .xx5 boundaries) makes all
    downstream +,*,sum exact, order-independent, and bit-identical across
    engines. DuckDB twin: :func:`dec2_sql`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},2)")


def dec2_sql(expr: str, prec: int = 12) -> str:
    """DuckDB twin of :func:`dec2`."""
    return f"CAST({expr} AS DECIMAL({prec},2))"


def halfup_div(num: Column, den: Column, k: int) -> Column:
    """``round(num / den, k)`` with exact HALF_UP semantics, as double.

    ``num`` and ``den`` must be integer-valued, non-negative columns
    (long, or integral-valued decimal). Both engines compute
    ``(2·num·10^k + den) intdiv (2·den)`` in exact integer arithmetic
    (Spark DECIMAL(38,0), DuckDB HUGEINT) — the textbook half-up formula
    — then divide by 10^k in IEEE double, which is deterministic.
    This sidesteps both engines' differing double-round semantics
    (Spark rounds the shortest decimal repr, DuckDB the binary value).
    DuckDB twin: :func:`halfup_div_sql`.
    """
    n = num.cast("decimal(38,0)") * F.lit(2 * 10**k) + den.cast("decimal(38,0)")
    d = den.cast("decimal(38,0)") * F.lit(2)
    q = (n - (n % d)) / d  # exact: numerator is divisible by d
    return q.cast("long") / F.lit(float(10**k))


def halfup_div_sql(num: str, den: str, k: int) -> str:
    """DuckDB twin of :func:`halfup_div` as a SQL fragment."""
    p = 10**k
    return (
        f"(CAST(((CAST({num} AS HUGEINT) * {2 * p} + CAST({den} AS HUGEINT)) // "
        f"(CAST({den} AS HUGEINT) * 2)) AS DOUBLE) / {float(p)})"
    )


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch as int64 — the tz-proof, precision-proof
    way to compare timestamps across engines (DuckDB: ``epoch_us(ts)``).

    Works for TIMESTAMP and TIMESTAMP_NTZ (session tz is pinned to UTC,
    so the NTZ→TZ cast is the identity).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def iso_date(col: Column | str) -> Column:
    """yyyy-MM-dd string (DuckDB: ``strftime(d, '%Y-%m-%d')``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def clip(col: Column, lo: float, hi: float) -> Column:
    """np.clip as a column expression (reference src/generate_data.py:140)."""
    return F.least(F.greatest(col, F.lit(lo)), F.lit(hi))
