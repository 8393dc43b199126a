"""Top-level pipeline entry points — the switch-over surface for the
reference's six Cloud Function handlers (functions/main.py:14-90).

Each reference handler builds a source list (+ optional manual-override
list) and calls ``run_pipeline``; here the same six entries build the
Spark-native sources and run the Pipeline orchestrator. The trigger
edge changes (Pub/Sub event → plain function call from cron/Airflow/
`spark-submit`), the body doesn't: a user invoking
``weather_pipeline(...)`` today calls this one with a store/fetcher
instead of implicit GCP clients — everything else (schedule gates,
quota, extract, load semantics) is behavior-compatible.

The fetcher argument replaces the reference's hard-wired
``requests.get`` (datasources.py:66-73): inject
``sources.base.make_dict_fetcher`` fixtures in tests, a real HTTP
fetcher in deployment, or use the ``weather_api`` Python DataSource
(sources/pyds.py) for the fully distributed fetch path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .io import TableStore
from .plans import Clock, Pipeline, PipelineReport, SystemClock
from .sources.reference_shaped import (
    GamesSource,
    GameStatsSource,
    GeoSource,
    TeamsSource,
    WeatherSource,
    WebsiteEventsSource,
)


def _run(sources, manual, spark, store, clock) -> PipelineReport:
    return Pipeline(
        sources, spark=spark, store=store, clock=clock or SystemClock(), manual=manual
    ).run()


def weather_pipeline(
    spark: SparkSession, store: TableStore, fetcher, zips=("GA",),
    manual: list[str] | None = None, clock: Clock | None = None,
) -> PipelineReport:
    """main.py:14-23 — WeatherData(['GA']) daily pull."""
    return _run([WeatherSource(list(zips), fetcher)], manual or [], spark, store, clock)


def uslocations_pipeline(
    spark: SparkSession, store: TableStore, fetcher, states=("GA",),
    manual: list[str] | None = None, clock: Clock | None = None,
) -> PipelineReport:
    """main.py:27-36 — GeoData() zip/county refresh."""
    return _run([GeoSource(list(states), fetcher)], manual or [], spark, store, clock)


def websitehits_pipeline(
    spark: SparkSession, store: TableStore, payloads_b64: list[str],
    manual: list[str] | None = None, clock: Clock | None = None,
) -> PipelineReport:
    """main.py:40-51 — push-payload ingest (batch form; the streaming
    twin is streaming/ingest.read_base64_event_stream)."""
    return _run([WebsiteEventsSource(payloads_b64)], manual or [], spark, store, clock)


def cf_pwr5teams_pipeline(
    spark: SparkSession, store: TableStore, fetcher, conferences=("SEC",),
    manual: list[str] | None = None, clock: Clock | None = None,
) -> PipelineReport:
    """main.py:55-64 — CFTeamsAll conference scrape."""
    return _run([TeamsSource(list(conferences), fetcher)], manual or [], spark, store, clock)


def cf_games_pipeline(
    spark: SparkSession, store: TableStore, fetcher, years,
    manual: list[str] | None = None, clock: Clock | None = None,
) -> PipelineReport:
    """main.py:68-77 — CFGames teams×years incremental pull."""
    # years=None means the massgrab historical backfill (GamesSource
    # docstring); list(None) would TypeError before O6 isolation (r6)
    return _run(
        [GamesSource(list(years) if years is not None else None, fetcher)],
        manual or [],
        spark,
        store,
        clock,
    )


def cf_gamestats_pipeline(
    spark: SparkSession, store: TableStore, fetcher,
    manual: list[str] | None = None, clock: Clock | None = None,
) -> PipelineReport:
    """main.py:81-90 — CFGameTeamStats dependent pull driven by the
    flagship coverage-gap work list."""
    return _run([GameStatsSource(fetcher)], manual or [], spark, store, clock)
