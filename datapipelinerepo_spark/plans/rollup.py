"""Continuous aggregate (hypertable-rollup) maintenance: a materialized
time-bucket rollup kept current by merging per-batch partial aggregates
— the TimescaleDB continuous-aggregate / Druid rollup pattern on plain
Spark tables.

Incremental contract: maintaining the rollup over any partitioning of
the input into delta batches yields EXACTLY the table a full recompute
would (counts and decimal sums are mergeable partials). Each batch
aggregates map-side to one row per (bucket, key) before touching the
rollup, so the merge cost scales with the rollup's cardinality — not
the event volume; at 100 TB/day the nightly merge touches only the
day's buckets via the upsert key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import TableStore

ROLLUP_KEYS = ["bucket_start", "event_type"]


def _partial(events: DataFrame, ts_col: str, key_col: str, value_col: str,
             bucket: str) -> DataFrame:
    return (
        events.groupBy(
            F.window(ts_col, bucket).alias("_w"), F.col(key_col).alias("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).alias("_sum"),
        )
        .select(
            F.date_format(F.col("_w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "event_type",
            "n_events",
            F.col("_sum").cast("decimal(28,4)").alias("sum_value"),
        )
    )


def rollup_maintain(
    store: TableStore,
    events_delta: DataFrame,
    table: str = "events_rollup_hourly",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "1 hour",
) -> None:
    """Merge one delta batch into the rollup table: aggregate the batch
    to (bucket, key) partials, add them to any existing bucket rows,
    upsert the result. Buckets untouched by the delta are not read or
    rewritten beyond the upsert's survivors pass (a real MERGE on a
    lakehouse format touches only matching files)."""
    delta = _partial(events_delta, ts_col, key_col, value_col, bucket)
    if store.exists(table):
        existing = store.read(table)
        touched = existing.join(
            delta.select(*ROLLUP_KEYS), on=ROLLUP_KEYS, how="left_semi"
        )
        merged = (
            touched.unionByName(delta)
            .groupBy(*ROLLUP_KEYS)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").cast("decimal(28,4)").alias("sum_value"),
            )
        )
    else:
        merged = delta
    store.upsert(merged, table, ROLLUP_KEYS)


def rollup_recompute(
    events_all: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "1 hour",
) -> DataFrame:
    """The full-recompute reference the incremental path must equal."""
    return _partial(events_all, ts_col, key_col, value_col, bucket)
