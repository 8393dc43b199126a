"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship coverage-gap query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry
(datapipelinerepo_spark/registry.py + registry_ext.py) — one entry per
implemented operator from SURVEY.md §2 plus the LLM-data extension ops.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datapipelinerepo_spark.registry import REGISTRY  # noqa: E402
import datapipelinerepo_spark.registry_ext  # noqa: E402,F401 (registers ext queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §3 EP3: coverage-gap work list) on sf0.001."""
    return REGISTRY["flagship_coverage_gap"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: e.fn for name, e in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.sql for name, e in REGISTRY.items() if e.sql is not None}
