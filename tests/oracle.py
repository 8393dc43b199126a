"""Local mini-oracle: run a registry Spark query and its DuckDB SQL twin
on the same parquet tables and compare row-count + order-insensitive
values — a faithful local stand-in for the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from datapipelinerepo_spark import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    # Round-2 tightening: the driver hashes full-precision values, so the
    # local normalizer must NOT forgive precision the driver would flag.
    # (The r1 9-sig-digit / whole-second normalizer masked all three driver
    # hash failures — VERDICT.md "What's wrong".)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr == full double precision
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    try:  # Decimal: exact digits, scale-cosmetics (trailing zeros) removed
        import decimal

        if isinstance(v, decimal.Decimal):
            return format(v.normalize(), "f")
    except Exception:
        pass
    return v


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for r in rows:
        key = tuple(_norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def _type_kind(t: str) -> str:
    """Collapse a type name to the equivalence kind the driver's value
    canonicalization respects. DuckDB HUGEINT (uncast integer SUM) and
    DECIMAL serialize as float-ish on the driver side while Spark emits
    bigint — values equal, hashes differ (VERDICT r4 "What's wrong",
    8 red rows). Kinds must match per-column or compare() fails even
    when the Python-level values agree."""
    t = t.lower().split("(")[0].strip()
    return {
        "tinyint": "int", "smallint": "int", "integer": "int", "int": "int",
        "bigint": "int", "utinyint": "int", "usmallint": "int",
        "uinteger": "int", "ubigint": "int", "byte": "int", "short": "int",
        "long": "int",
        "hugeint": "hugeint", "uhugeint": "hugeint", "int128": "hugeint",
        "float": "float", "double": "float", "real": "float",
        "decimal": "decimal", "numeric": "decimal",
        "varchar": "str", "string": "str", "text": "str",
        "boolean": "bool", "bool": "bool",
        "date": "date", "timestamp": "ts", "timestamp_ns": "ts",
        "timestamp_ntz": "ts", "timestamp with time zone": "ts",
        "blob": "bytes", "binary": "bytes",
    }.get(t, t)


def _is_complex(t: str) -> bool:
    t = t.lower()
    return any(m in t for m in ("array", "struct", "map", "[]", "list", "row("))


def typing_mismatches(spark_df, rel) -> list[str]:
    """Per-column type-kind diffs between a Spark result and its DuckDB
    oracle relation — the lint that makes HUGEINT/DECIMAL-vs-BIGINT
    oracle bugs fail locally before the driver flags them."""
    s_types = {f.name.lower(): f.dataType.simpleString() for f in spark_df.schema.fields}
    bad = []
    for name, dtype in zip(rel.columns, rel.types):
        n = name.lower()
        if n not in s_types:
            continue
        if _is_complex(s_types[n]) or _is_complex(str(dtype)):
            continue  # value compare still covers these; the known
            # driver-hash failure class is scalar numeric typing
        sk, dk = _type_kind(s_types[n]), _type_kind(str(dtype))
        if sk == dk:
            continue
        if {sk, dk} == {"date", "str"}:
            # proven benign: both serialize to the ISO string on the
            # driver side (pipeline_idempotent_reload green since r03)
            continue
        # int-vs-float/decimal in EITHER direction, or hugeint anywhere,
        # breaks the driver hash; cross-kind cases we know are benign
        # (none today) would be listed here explicitly.
        bad.append(f"{n}: spark={s_types[n]} duck={dtype}")
    return bad


def decimal_output_columns(spark_df) -> list[str]:
    """Driver-facing DecimalType columns — BANNED, allowlist zero
    (VERDICT r10 item 2). The r8–r10 bisection proved the driver's
    oracle environment normalizes bare DECIMAL output columns
    differently from DuckDB 1.0.0: the 7 never-green hash-red rows were
    EXACTLY the registry queries emitting `sum_val DECIMAL(28,4)`,
    while all 17 decimal-arithmetic-but-DOUBLE-output queries stayed
    green. Decimal arithmetic INSIDE a query is fine (and required for
    bit-exact IVM self-checks); the final projection must cast to
    DOUBLE (lossless at these magnitudes) or STRING."""
    from pyspark.sql.types import DecimalType

    return [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, DecimalType)
    ]


def compare(spark_df, con, sql, allow_decimal: bool = False) -> tuple[bool, str]:
    # allow_decimal is for TEST-INTERNAL constructs only (the readback
    # checksum twins compare exact DECIMAL sums against local DuckDB
    # and never reach the driver); every registry query keeps the ban.
    dec_cols = [] if allow_decimal else decimal_output_columns(spark_df)
    if dec_cols:
        return False, (
            "driver-facing DecimalType output columns (banned — the "
            f"r8–r10 driver-env hash-red class): {dec_cols}"
        )
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    rel = con.sql(sql)
    d_rows = rel.fetchall()
    d_cols = [c for c in rel.columns]
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    bad_types = typing_mismatches(spark_df, rel)
    if bad_types:
        return False, f"oracle typing mismatch (driver would hash-fail): {bad_types}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    sm = rows_to_multiset([tuple(r) for r in s_rows], [c.lower() for c in s_cols])
    dm = rows_to_multiset(d_rows, [c.lower() for c in d_cols])
    if sm != dm:
        only_s = [k for k in sm if sm[k] != dm.get(k, 0)][:3]
        only_d = [k for k in dm if dm[k] != sm.get(k, 0)][:3]
        return False, f"value mismatch; spark-only≈{only_s} duck-only≈{only_d}"
    return True, "ok"
