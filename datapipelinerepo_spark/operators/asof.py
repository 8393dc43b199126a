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
    """
    value_cols = value_cols or [c for c in right.columns if c not in (key, right_ts)]
    l_tagged = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_v_{c}") for c in value_cols],
        F.struct(*left.columns).alias("_lrow"),
    )
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
    )
    # right rows sort BEFORE left rows at the same _ts (_side desc) so a
    # tie matches — ASOF's >= semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = r_tagged.unionByName(l_tagged).select(
        "_side",
        "_lrow",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_cv_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 0).select(
        F.col("_lrow.*"),
        *[F.col(f"_cv_{c}").alias(c) for c in value_cols],
    )
