"""Window-function operators — SURVEY.md §2.5 (extension, not
reference-mandated): the reference's watermark pattern (global MAX)
generalized to per-partition latest/rank/lag/running aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_group(df: DataFrame, group: str, order: str, tiebreak: str) -> DataFrame:
    """Per-group latest row via row_number — the per-partition watermark
    generalization of MAX(Date) (datasources.py:140). Deterministic: full
    ordering (order DESC, tiebreak DESC)."""
    w = Window.partitionBy(group).orderBy(F.col(order).desc(), F.col(tiebreak).desc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def running_sum(df: DataFrame, group: str, order: str, value: str, alias: str = "running") -> DataFrame:
    """Running total per group. Decimal-exact, and RANGE-framed (all
    peers of the current order value are included) so the result is
    deterministic even when the ordering key has ties — a ROWS frame
    over tied keys depends on shuffle order and differs run-to-run on a
    cluster."""
    w = (
        Window.partitionBy(group)
        .orderBy(order)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # decimal(30,6), not (18,4): a |v| >= 1e14 would overflow an
    # 18-digit decimal to NULL under non-ANSI cast semantics and SUM
    # would silently skip it, shorting every later running total
    # (code-review r6); 30 digits of headroom keep the SUM itself
    # (38-digit result precision) exact for corpus-scale frames
    return df.withColumn(
        alias, F.sum(F.col(value).cast("decimal(30,6)")).over(w).cast("double")
    )


def lag_delta(df: DataFrame, group: str, order: str, tiebreak: str, value: str, alias: str = "delta") -> DataFrame:
    """Difference from previous row per group (lag)."""
    w = Window.partitionBy(group).orderBy(F.col(order), F.col(tiebreak))
    return df.withColumn(alias, F.col(value) - F.lag(value).over(w))
