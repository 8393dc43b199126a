"""Data-quality gates for the load path: dbt-style expectations plus
Spark's ``observe`` API for zero-extra-pass inline metrics.

Expectations are DataFrame queries that return VIOLATION rows (empty =
pass) — they compose with the Pipeline gates (plans/pipeline.py) so a
load can be blocked on quality the same way it's blocked on watermark
or quota. ``observe`` metrics ride on the load job itself: the counts
are computed by the same tasks that write the rows, so a 100 TB append
gets its row/null accounting for free instead of via a second scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key: str | list[str]) -> DataFrame:
    """Violations of a uniqueness expectation: key tuples appearing
    more than once, with their multiplicity. One hash-shuffle on the
    key (partial-aggregated)."""
    keys = [key] if isinstance(key, str) else list(key)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def null_keys(df: DataFrame, cols: str | list[str]) -> DataFrame:
    """Violations of a non-null expectation: rows where any of ``cols``
    is NULL (fused into the scan — no shuffle)."""
    cs = [cols] if isinstance(cols, str) else list(cols)
    cond = F.lit(False)
    for c in cs:
        cond = cond | F.col(c).isNull()
    return df.filter(cond)


def orphan_keys(child: DataFrame, parent: DataFrame, on: str | list[str]) -> DataFrame:
    """Violations of referential integrity: child rows whose key has no
    parent (left-anti join — ships only the key column of the parent).
    NULL child keys are not orphans (SQL FK semantics); use null_keys
    to forbid them separately."""
    keys = [on] if isinstance(on, str) else list(on)
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(k).isNotNull()
    return child.filter(cond).join(
        parent.select(*keys).distinct(), on=keys, how="left_anti"
    )


def accepted_values(df: DataFrame, col: str, allowed: list) -> DataFrame:
    """Violations of a domain expectation: rows whose ``col`` is outside
    the allowed set (NULL is a violation — pair with null_keys if NULLs
    are instead forbidden outright)."""
    return df.filter(~F.col(col).isin(allowed) | F.col(col).isNull())


@dataclass(frozen=True)
class ExpectationResult:
    name: str
    violations: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def check_expectations(
    named: dict[str, DataFrame], fail_fast: bool = False
) -> list[ExpectationResult]:
    """Evaluate violation queries. Counts materialize one at a time so
    fail_fast can stop paying for later checks once one fails."""
    out: list[ExpectationResult] = []
    for name, v in named.items():
        r = ExpectationResult(name, v.count())
        out.append(r)
        if fail_fast and not r.passed:
            break
    return out


def with_load_metrics(
    df: DataFrame, key_cols: list[str], observation_name: str = "load_metrics"
):
    """Attach observe() metrics to a load: total rows plus per-key-col
    null counts, computed BY THE WRITE JOB itself (no second scan —
    at 100 TB a post-hoc quality scan costs as much as the load).
    Returns (df, Observation); read ``obs.get`` AFTER the write action.
    """
    from pyspark.sql import Observation

    obs = Observation(observation_name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [
        F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}") for c in key_cols
    ]
    return df.observe(obs, *metrics), obs
