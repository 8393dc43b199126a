"""Run every oracle-backed registry query against DuckDB at sf0.001 —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from datapipelinerepo_spark.registry import REGISTRY
import datapipelinerepo_spark.registry_ext  # noqa: F401

from .oracle import compare, duck_connection

_ORACLE_NAMES = [n for n, e in REGISTRY.items() if e.sql is not None]
_ROWS_ONLY = [n for n, e in REGISTRY.items() if e.sql is None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, duck, name):
    e = REGISTRY[name]
    ok, msg = compare(e.fn(spark, sf_dir), duck, e.sql)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
