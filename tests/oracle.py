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


def compare(spark_df, con, sql) -> tuple[bool, str]:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    rel = con.sql(sql)
    d_rows = rel.fetchall()
    d_cols = [c for c in rel.columns]
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    sm = rows_to_multiset([tuple(r) for r in s_rows], [c.lower() for c in s_cols])
    dm = rows_to_multiset(d_rows, [c.lower() for c in d_cols])
    if sm != dm:
        only_s = [k for k in sm if sm[k] != dm.get(k, 0)][:3]
        only_d = [k for k in dm if dm[k] != sm.get(k, 0)][:3]
        return False, f"value mismatch; spark-only≈{only_s} duck-only≈{only_d}"
    return True, "ok"
