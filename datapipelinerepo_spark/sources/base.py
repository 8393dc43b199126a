"""Ingestion layer: distributed fetch over a work-list DataFrame with
the reference's retry policy, behind an injectable fetcher so tests
never touch the network (SURVEY.md §7 step 5).

Scale posture: the work list (zips, game ids, …) is a DataFrame; the
fetch runs inside ``mapInPandas`` so each executor pulls its partition
of keys concurrently — the reference's sequential per-key driver loop
(datasources.py:221, :658) becomes partition-parallel, which is the
difference between 540 s and minutes-per-million-keys.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

Fetcher = Callable[[str], str]


class FetchError(Exception):
    """Permanent fetch failure (HTTP error / redirect bail,
    datasources.py:226-235, :246-249)."""


class FetchTimeout(Exception):
    """Transient timeout — retried once after a backoff sleep
    (datasources.py:236-245)."""


class RetryPolicy:
    """O6: timeout → sleep(backoff) → one retry; permanent errors skip
    the key (record dropped, pipeline continues). Sleep is injectable
    for tests."""

    def __init__(self, backoff_s: float = 30.0, retries: int = 1, sleep=time.sleep):
        self.backoff_s = backoff_s
        self.retries = retries
        self.sleep = sleep

    def fetch(self, fetcher: Fetcher, url: str) -> str | None:
        attempts = self.retries + 1
        for i in range(attempts):
            try:
                return fetcher(url)
            except FetchTimeout:
                if i + 1 >= attempts:
                    return None
                self.sleep(self.backoff_s)
            except FetchError:
                return None
        return None


def fetch_map(
    worklist: DataFrame,
    url_col: str,
    fetcher: Fetcher,
    policy: RetryPolicy | None = None,
    payload_col: str = "payload",
) -> DataFrame:
    """Fetch one payload per work-list row, executor-side.

    Failed keys yield NULL payloads (skip semantics); callers filter.
    The fetcher and policy are serialized to executors (keep them small
    — fixture dicts or an http client factory, not sessions).
    """
    policy = policy or RetryPolicy()
    out_schema = StructType(
        list(worklist.schema.fields) + [StructField(payload_col, StringType(), True)]
    )

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = [policy.fetch(fetcher, u) for u in pdf[url_col]]
            yield pdf

    return worklist.mapInPandas(_fetch, schema=out_schema)
