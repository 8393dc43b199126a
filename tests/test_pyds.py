"""Spark 4 Python Data Source tests: the reference's API-pull (S5) and
push-event (S7) paths as real pluggable sources — distributed fetch
partitions, filter pushdown into the source, streaming offsets with
deterministic replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipelinerepo_spark.sources.pyds import (
    WeatherApiReader,
    register_python_sources,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    # pushFilters() support is gated off by default
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_python_sources(spark)
    yield
    spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def _weather(spark, zips: str):
    return (
        spark.read.format("weather_api")
        .option("zips", zips)
        .option("date", "2026-08-12")
        .option("batch_size", "2")
        .load()
    )


def test_weather_source_reads_all_zips(spark):
    df = _weather(spark, "30301,30302,30303")
    rows = df.collect()
    assert {r["zip_code"] for r in rows} == {"30301", "30302", "30303"}
    assert all(r["date"].isoformat() == "2026-08-12" for r in rows)
    # deterministic across reads (stable digest, not salted hash())
    again = {r["zip_code"]: r["avgtemp_f"] for r in _weather(spark, "30301,30302,30303").collect()}
    assert {r["zip_code"]: r["avgtemp_f"] for r in rows} == again


def test_weather_source_partitions_split_worklist(spark):
    df = _weather(spark, "1,2,3,4,5")  # batch_size=2 → 3 partitions
    assert df.rdd.getNumPartitions() == 3


def test_weather_filter_pushdown_prunes_fetches(spark):
    """zip_code equality reaches the reader: only the asked-for zip is
    fetched (partition count collapses), and results stay correct."""
    df = _weather(spark, "30301,30302,30303,30304").filter(
        F.col("zip_code") == "30302"
    )
    rows = df.collect()
    assert [r["zip_code"] for r in rows] == ["30302"]

    # reader-level check of the pruning itself
    reader = WeatherApiReader(
        {"zips": "30301,30302,30303,30304", "date": "2026-08-12", "batch_size": "2"}
    )
    from pyspark.sql.datasource import EqualTo, GreaterThan

    leftover = list(
        reader.pushFilters([EqualTo(("zip_code",), "30302"), GreaterThan(("avgtemp_f",), 0.0)])
    )
    assert reader.zips == ["30302"]  # pruned to one fetch
    assert len(leftover) == 1  # unsupported filter handed back to Spark


def test_website_hits_stream_offsets_and_totals(spark, tmp_path):
    """The custom streaming source drains max_hits rows across
    micro-batches of hits_per_batch; a second run over a fresh
    checkpoint yields identical data (offset-pure reads)."""

    import time

    def run(ckpt_dir, out_name):
        df = (
            spark.readStream.format("website_hits")
            .option("hits_per_batch", "4")
            .option("max_hits", "10")
            .load()
        )
        # the python micro-batch stream doesn't support availableNow —
        # run continuous micro-batches and stop once the source drains
        q = (
            df.writeStream.format("memory")
            .queryName(out_name)
            .option("checkpointLocation", str(ckpt_dir))
            .outputMode("append")
            .start()
        )
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if spark.sql(f"SELECT COUNT(*) FROM {out_name}").first()[0] >= 10:
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)
        return sorted(
            (r["hit_id"], r["session"], r["page"], r["device"])
            for r in spark.sql(f"SELECT * FROM {out_name}").collect()
        )

    first = run(tmp_path / "c1", "hits_a")
    assert len(first) == 10
    assert first[0] == (0, "s0", "/", "desktop")
    second = run(tmp_path / "c2", "hits_b")
    assert first == second
