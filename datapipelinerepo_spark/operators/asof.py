"""As-of (temporal) join — for each left row, the most recent right row
at or before its timestamp, per key. The canonical time-series operator
Spark has no built-in for (DuckDB: ASOF JOIN; kdb: aj; Flink: temporal
join), composed here from a union + ordered window so it scales:

- the naive form (inequality join + row_number) builds the full
  |L|x|R|-per-key pair space before pruning — quadratic in hot keys;
- this form interleaves both sides in ONE shuffle on the key, sorts by
  time, and carries the latest right payload forward with
  last_value(ignoreNulls) — linear, skew-bounded by the key, and
  whole-stage-codegen'd.

At equal timestamps the right row wins (ASOF's >= semantics): the sort
places right rows before left rows within a timestamp via the _side
tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt) -> bool:
    """Can a column of this type appear in a sort/window ORDER BY?
    Spark rejects MapType, the opaque VariantType, and the legacy
    CalendarIntervalType (months+days+micros have no total order;
    make_interval produces it — code-review r7) anywhere inside an
    ordering expression; the ANSI DayTime/YearMonth interval types ARE
    orderable. Arrays and structs are orderable iff their
    element/field types are."""
    if isinstance(dt, T.MapType):
        return False
    if dt.typeName() in ("variant", "calendarinterval", "interval"):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the newest right
    ``value_cols`` whose ``right_ts`` <= ``left_ts`` for the same
    ``key`` (NULLs where no prior right row exists).

    Output: all left columns + ``value_cols`` (aliased as given).

    Row-atomic carry (code-review r6): the matched right row travels as
    ONE struct, so (a) a NULL in the newest matching row is returned as
    NULL instead of last(ignorenulls) reaching back to a STALE older
    value, and (b) multiple value_cols always come from the SAME right
    row — never a column-wise mix of rows that never co-existed. Right
    rows with a NULL ``right_ts`` are excluded (a NULL event time
    satisfies no ≤ comparison; under nulls-first ordering it would
    otherwise poison every left row of its key), a NULL ``left_ts``
    matches nothing (same reason), and right rows tied on
    (key, right_ts) resolve by a struct of the ORDERABLE value columns
    — arbitrary but DETERMINISTIC across runs and partitionings.
    (The tie-break struct holds only orderable-typed columns: putting
    the full payload struct in ORDER BY failed with AnalysisException
    as soon as any value column was a map — ADVICE r6. Rows tied on
    (key, right_ts) AND every orderable value column differ only in
    unorderable columns; that residual tie stays engine-ordered.)"""
    value_cols = value_cols or [c for c in right.columns if c not in (key, right_ts)]
    ord_cols = [c for c in value_cols if _orderable(right.schema[c].dataType)]
    rrow = F.struct(*[F.col(c).alias(c) for c in value_cols])
    rrow_type = right.select(rrow.alias("x")).schema["x"].dataType
    rord = F.struct(*[F.col(c).alias(c) for c in ord_cols])
    rord_type = right.select(rord.alias("x")).schema["x"].dataType
    lrow_type = left.select(F.struct(*left.columns).alias("x")).schema["x"].dataType
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        rrow.alias("_rrow"),
        rord.alias("_rord"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
    )
    l_tagged = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(rrow_type).alias("_rrow"),
        F.lit(None).cast(rord_type).alias("_rord"),
        F.struct(*left.columns).alias("_lrow"),
    )
    # right rows sort BEFORE left rows at the same _ts (_side desc) so a
    # tie matches — ASOF's >= semantics; _rord as the final key makes
    # same-timestamp right rows a deterministic total order (over the
    # orderable payload columns)
    order = [F.col("_ts").asc(), F.col("_side").desc()]
    if ord_cols:
        order.append(F.col("_rord").asc())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r_tagged.unionByName(l_tagged).select(
        "_side",
        "_lrow",
        F.last("_rrow", ignorenulls=True).over(w).alias("_cr"),
    )
    return carried.filter(F.col("_side") == 0).select(
        F.col("_lrow.*"),
        *[F.col(f"_cr.{c}").alias(c) for c in value_cols],
    )
