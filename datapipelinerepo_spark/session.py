"""SparkSession construction with the engine's config posture.

Scale posture (SURVEY.md §4, §7): AQE on (runtime re-plan, skew-join
splitting, broadcast demotion), Arrow on (vectorized pandas-UDF
transfer), dynamic partition overwrite (idempotent date re-loads,
reference behavior ``datasources.py:50-59``), session timezone pinned
to UTC so timestamp semantics are deterministic across engines.

On a real cluster the same builder is used with ``master`` unset (taken
from spark-submit) — nothing here is local-mode-specific except the
default master.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "datapipelinerepo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    At 100 TB the operative knobs are AQE (coalesces the ~2000-partition
    shuffles this config requests down to what the data needs, splits
    skewed partitions) and partitionOverwriteMode=dynamic (so re-loads
    replace only the touched date partitions, not the table).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (the legacy default) writes NO parquet min/max
        # statistics, which silently disables manifest-stats data
        # skipping (io.read_where) on every TimestampType column —
        # the flagship event-time range case (code-review r8 wave 2).
        # TIMESTAMP_MICROS is the modern spec'd physical type, carries
        # stats, and every current reader (DuckDB included) handles it.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.parquet.mergeSchema", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
