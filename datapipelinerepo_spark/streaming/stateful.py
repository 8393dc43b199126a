"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the extension point for per-key state Spark's built-in windowed aggs
can't express (running totals that survive micro-batch and restart
boundaries, custom eviction, per-key ML state, ...).

The reference has no stateful stream processing (its event path is
stateless per-event append, functions/main.py:40-51); this is the
Spark-native extension SURVEY.md §2.8 marks out. State lives in the
checkpointed state store: per-key, partitioned by the grouping key, so
a 1000-executor cluster shards state horizontally and a restart resumes
from the last committed micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_COUNTS_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("total_events", LongType(), True),
        StructField("batch_events", LongType(), True),
        StructField("last_seen", StringType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("total", LongType(), True),
        StructField("last_seen", StringType(), True),
    ]
)


def running_counts_stateful(
    events: DataFrame, key_col: str = "session", ts_col: str = "ts"
) -> DataFrame:
    """Running per-key event totals across micro-batches.

    Emits one row per key per micro-batch with the lifetime total, the
    batch's contribution, and the latest event timestamp seen. The
    pandas batches arrive Arrow-encoded per key; state is a tiny
    (total, last_seen) tuple, so state-store size is O(|keys|), not
    O(|events|) — bounded regardless of stream length.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total, last_seen = state.get if state.exists else (0, None)
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
            mx = pdf[ts_col].max()
            mx_s = str(mx) if pd.notna(mx) else None
            if mx_s is not None and (last_seen is None or mx_s > last_seen):
                last_seen = mx_s
        total += batch
        state.update((total, last_seen))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "total_events": [total],
                "batch_events": [batch],
                "last_seen": [last_seen],
            }
        )

    return (
        events.withColumnRenamed(key_col, "key")
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_COUNTS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
