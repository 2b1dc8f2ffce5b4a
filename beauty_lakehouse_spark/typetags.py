"""Portable type tags — the cross-engine (type, value) pairing layer.

The driver's correctness hash is TYPE-TAGGED: identical digit strings
hash differently when one engine ships them as ``decimal128(38,0)`` and
the other as ``utf8`` (the r11 ``order_metric_correlations`` red row:
Spark DECIMAL(38,0) vs DuckDB ``CAST(... AS VARCHAR)``). The local
replica's value canonicalization stringified everything, so it passed
where the driver failed. This module closes that class: both engines'
output column types are mapped into ONE tag space (Arrow-flavored,
because DuckDB→Arrow is what a driver-side hash actually sees — e.g.
HUGEINT arrives as ``decimal128(38,0)``), and a query is only green
when every column's tags pair.

Documented portable pairings (each line is one tag):

===============  ==================  ================
tag              Spark dtype         DuckDB type
===============  ==================  ================
utf8             string              VARCHAR
int64            bigint              BIGINT
int32            int                 INTEGER
int16            smallint            SMALLINT
int8             tinyint             TINYINT
float64          double              DOUBLE
float32          float               FLOAT / REAL
bool             boolean             BOOLEAN
date             date                DATE
timestamp        timestamp[_ntz]     TIMESTAMP[_*]
decimal(p,s)     decimal(p,s)        DECIMAL(p,s) / HUGEINT→(38,0)
binary           binary              BLOB
list<t>          array<T>            T[]
struct           struct<...>         STRUCT(...)
map              map<...>            MAP(...)
===============  ==================  ================
"""

from __future__ import annotations

_SPARK_SIMPLE = {
    "string": "utf8",
    "bigint": "int64",
    "long": "int64",
    "int": "int32",
    "integer": "int32",
    "smallint": "int16",
    "short": "int16",
    "tinyint": "int8",
    "byte": "int8",
    "double": "float64",
    "float": "float32",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
    "void": "null",
}

_DUCK_SIMPLE = {
    "VARCHAR": "utf8",
    "TEXT": "utf8",
    "BIGINT": "int64",
    "INTEGER": "int32",
    "SMALLINT": "int16",
    "TINYINT": "int8",
    "UTINYINT": "uint8",
    "USMALLINT": "uint16",
    "UINTEGER": "uint32",
    "UBIGINT": "uint64",
    "DOUBLE": "float64",
    "FLOAT": "float32",
    "REAL": "float32",
    "BOOLEAN": "bool",
    "DATE": "date",
    "BLOB": "binary",
    # Arrow ships DuckDB's int128 as decimal128(38,0) — but oracles
    # should never emit bare HUGEINT (pinned by
    # test_oracle_output_types_are_portable); the tag exists so a slip
    # shows up as a decimal-vs-whatever mismatch, not a KeyError.
    "HUGEINT": "decimal(38,0)",
}


def spark_tag(dtype: str) -> str:
    """Map a Spark ``df.dtypes`` string to its portable tag."""
    d = dtype.strip()
    low = d.lower()
    if low in _SPARK_SIMPLE:
        return _SPARK_SIMPLE[low]
    if low.startswith("decimal(") and low.endswith(")"):
        return "decimal(" + low[len("decimal("):-1].replace(" ", "") + ")"
    if low.startswith("array<") and low.endswith(">"):
        return f"list<{spark_tag(d[6:-1])}>"
    if low.startswith("struct<"):
        return "struct"
    if low.startswith("map<"):
        return "map"
    return f"?spark:{d}"


def duckdb_tag(typ: str) -> str:
    """Map a DuckDB type string (``str(rel.types[i])``) to its tag."""
    t = typ.strip()
    up = t.upper()
    if up in _DUCK_SIMPLE:
        return _DUCK_SIMPLE[up]
    if up.startswith("TIMESTAMP"):  # TIMESTAMP / _S/_MS/_NS / WITH TZ
        return "timestamp"
    if up.startswith("DECIMAL(") and up.endswith(")"):
        return "decimal(" + up[len("DECIMAL("):-1].replace(" ", "") + ")"
    if t.endswith("[]"):
        return f"list<{duckdb_tag(t[:-2])}>"
    if up.startswith("STRUCT("):
        return "struct"
    if up.startswith("MAP("):
        return "map"
    return f"?duckdb:{t}"


def pair_mismatches(
    spark_dtypes: list[tuple[str, str]],
    duck_cols: list[str],
    duck_types: list[str],
) -> list[tuple[str, str, str]]:
    """Column-name-aligned tag comparison.

    Returns [(column, spark_tag, duckdb_tag), ...] for every column
    whose tags do not pair (missing columns pair against '<absent>').
    Column-name sets are compared by the schema check elsewhere; here
    we only report tag divergence for the shared names.
    """
    s = {name: spark_tag(dt) for name, dt in spark_dtypes}
    d = {c: duckdb_tag(t) for c, t in zip(duck_cols, duck_types)}
    out = []
    for name in sorted(set(s) | set(d)):
        st, dt = s.get(name, "<absent>"), d.get(name, "<absent>")
        if st != dt:
            out.append((name, st, dt))
    return out
