"""Spark 4 Python Data Source forms of the reference's ingest paths.

The reference pulls a weather API per zip code in a driver-side loop
(datasources.py:218-261) and receives website hits as push messages
(main.py:40-51). Here both become *pluggable Spark sources*:

- ``weather_api`` (batch): ``spark.read.format("weather_api")
  .option("zips", "30301,30302").option("date", "2026-08-12").load()``.
  The zip work-list is split into InputPartitions so the per-zip
  fetches run ON EXECUTORS in parallel — the reference's sequential
  1-process loop becomes a distributed scan. ``pushFilters`` handles
  ``zip_code = '...'`` equality/IN pushdown by pruning fetch partitions
  — predicate pushdown reaching an HTTP source means un-asked-for zips
  are never fetched at all.
- ``website_hits`` (streaming): a SimpleDataSourceStreamReader whose
  offset is the event sequence number; ``read(start)`` is a pure
  function of the offset, so checkpoint replay regenerates identical
  micro-batches (exactly-once without a transactional sink).

Network note: the container has no egress, so ``_fetch_day`` is a
deterministic synthetic payload keyed by (zip, date) — the documented
swap point for a real ``requests.get`` (same signature, executor-side).
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)

WEATHER_SCHEMA = (
    "zip_code string, date date, maxtemp_f double, mintemp_f double, "
    "avgtemp_f double, totalprecip_in double"
)


def _fetch_day(zip_code: str, date: str) -> str:
    """Deterministic stand-in for the per-zip HTTP GET
    (datasources.py:221-261). Swap for a real fetch in deployment; the
    JSON shape mirrors the reference's forecastday payload."""
    import hashlib

    # stable digest, NOT Python hash(): str hashing is salted per
    # process, and this must agree across executors and re-runs
    h = int(hashlib.md5(f"{zip_code}:{date}".encode()).hexdigest()[:4], 16)
    day = {
        "maxtemp_f": 70.0 + h % 30,
        "mintemp_f": 50.0 + h % 20,
        "avgtemp_f": 60.0 + h % 25,
        "totalprecip_in": (h % 100) / 100.0,
    }
    return json.dumps({"forecast": {"forecastday": [{"day": day}]}})


class WeatherApiReader(DataSourceReader):
    def __init__(self, options):
        self.zips = [z for z in options.get("zips", "").split(",") if z]
        self.date = options.get("date", "1970-01-01")
        self.batch = int(options.get("batch_size", "50"))

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("zip_code",):
                self.zips = [z for z in self.zips if z == f.value]
            elif isinstance(f, In) and f.attribute == ("zip_code",):
                keep = {str(v) for v in f.values}
                self.zips = [z for z in self.zips if z in keep]
            else:
                yield f  # unsupported → Spark re-applies it post-scan

    def partitions(self) -> list[InputPartition]:
        return [
            InputPartition(self.zips[i : i + self.batch])
            for i in range(0, len(self.zips), self.batch)
        ] or [InputPartition([])]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        import datetime as dt

        d = dt.date.fromisoformat(self.date)
        for z in partition.value:
            day = json.loads(_fetch_day(z, self.date))["forecast"]["forecastday"][0]["day"]
            yield (
                z,
                d,
                day["maxtemp_f"],
                day["mintemp_f"],
                day["avgtemp_f"],
                day["totalprecip_in"],
            )


class WeatherApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "weather_api"

    def schema(self) -> str:
        return WEATHER_SCHEMA

    def reader(self, schema) -> WeatherApiReader:
        return WeatherApiReader(self.options)


HITS_SCHEMA = "hit_id bigint, session string, page string, device string"
_PAGES = ("/", "/projects", "/about", "/contact")


class WebsiteHitsStreamReader(SimpleDataSourceStreamReader):
    """Offset = next hit sequence number. Rows are a pure function of
    their sequence number, so readBetweenOffsets replay (after a crash
    between micro-batches) reproduces bit-identical batches."""

    def __init__(self, options):
        self.per_batch = int(options.get("hits_per_batch", "5"))
        self.max_hits = int(options.get("max_hits", "20"))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    @staticmethod
    def _row(i: int) -> tuple:
        return (i, f"s{i % 3}", _PAGES[i % len(_PAGES)], "mobile" if i % 2 else "desktop")

    def read(self, start: dict):
        lo = start["seq"]
        hi = min(lo + self.per_batch, self.max_hits)
        return iter([self._row(i) for i in range(lo, hi)]), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([self._row(i) for i in range(start["seq"], end["seq"])])


class WebsiteHitsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "website_hits"

    def schema(self) -> str:
        return HITS_SCHEMA

    def simpleStreamReader(self, schema) -> WebsiteHitsStreamReader:
        return WebsiteHitsStreamReader(self.options)


def register_python_sources(spark) -> None:
    spark.dataSource.register(WeatherApiDataSource)
    spark.dataSource.register(WebsiteHitsDataSource)
