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


# Session-conf fence riding the existing per-query runs (VERDICT r8
# item 2, restructured per code-review r9 wave 1: a standalone fence
# test re-materialized the whole registry a second time for minutes of
# wall clock; as an autouse fixture here it polices every oracle/
# rows-only/sf01/sf1 run at zero added query cost). The one documented
# global side effect — load_table's nanosAsLong (io.py) — is
# allowlisted; anything else failing here is a new, unreviewed session-
# global mutation that could corrupt a LATER query in the driver's
# shared 50-query session.
_CONF_ALLOWLIST = {"spark.sql.legacy.parquet.nanosAsLong"}


@pytest.fixture(autouse=True)
def _conf_fence(request, spark):
    def snap():
        return {r["key"]: r["value"] for r in spark.sql("SET").collect()}

    before = snap()
    yield
    after = snap()
    delta = {
        k for k in set(before) ^ set(after) if k not in _CONF_ALLOWLIST
    } | {
        k
        for k in set(before) & set(after)
        if before[k] != after[k] and k not in _CONF_ALLOWLIST
    }
    assert not delta, (
        f"{request.node.name} mutated session confs outside the "
        f"allowlist: {sorted(delta)}"
    )


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, duck, name):
    e = REGISTRY[name]
    ok, msg = compare(e.fn(spark, sf_dir), duck, e.sql)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    from .oracle import decimal_output_columns

    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
    # oracle-backed queries get this lint inside compare(); rows-only
    # entries face the driver too (VERDICT r10 item 2, allowlist zero)
    assert not decimal_output_columns(df), (
        f"{name}: DecimalType output columns are banned driver-facing"
    )


# ---------------------------------------------------------------------------
# sf0.1 oracle pass over the BENCHED subset (VERDICT r5 item 4): the
# driver verifies values at sf0.01 only, so a bug class that only shows
# on bigger/different data (e.g. the r05 ns-timestamp truncation, off
# by 1 µs for ~12% of values) would ship undetected. Re-proving the
# headline queries at 10× the driver's data catches scale-dependent
# value drift. Marked slow; run `-m "not slow"` for the quick loop.
# ---------------------------------------------------------------------------

_SF01_DIR = "/root/testdata/sf0.1"
_BENCHED_ORACLE = [
    n for n, e in REGISTRY.items() if e.bench and e.sql is not None
]


@pytest.fixture(scope="module")
def duck_sf01():
    con = duck_connection(_SF01_DIR)
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", _BENCHED_ORACLE)
def test_oracle_parity_sf01(spark, duck_sf01, name):
    e = REGISTRY[name]
    ok, msg = compare(e.fn(spark, _SF01_DIR), duck_sf01, e.sql)
    assert ok, f"{name} @ sf0.1: {msg}"


# ---------------------------------------------------------------------------
# sf1 oracle pass (VERDICT r6 item 3): the queries whose SCALE.md
# claims rest on sf1 behavior — text family, the keyed/versioned store,
# and the global-rank/quantile machinery — value-checked at 100× the
# driver's data, not just timed. sf1 is synthesized locally from sf0.1
# (tools/gen_sf1.py: key-offset sharding, decorrelated documents/
# embeddings) the first time this pass runs. Catches the
# scale-dependent-value-drift class the r5 ns-timestamp bug
# exemplified (off by 1 µs for ~12% of values — invisible at sf0.01).
# ---------------------------------------------------------------------------

_SF1_DIR = "/tmp/testdata_sf1"
_SF1_NAMES = [
    "text_bpe_learn",
    "text_bpe_learn_batched",
    "text_bpe_encode",
    "text_vocab_coverage",
    "scale_exact_quantiles",
    "scale_sketch_set_ops",
    "store_keyed_merge",
    "store_versioned_snapshot",
    "retrieval_bm25_topk",
    "sample_token_budget",
    "events_funnel_conversion",
    # r8 (VERDICT r7 item 4): the REST of the benched oracle set —
    # every bench=True oracle-bearing entry is now value-checked at
    # sf1, not just timed. Output sizes measured ≤ 960k rows (the
    # flagship and sessionize read-backs), collectable in seconds.
    "flagship_coverage_gap",
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_volume",
    "events_asof_join",
    "events_range_join",
    "events_window_tumbling",
    "events_sessionize",
    "q21_waiting_suppliers",
    "cdc_latest_wins",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "text_quality",
    "dedup_connected_components",
    "text_perplexity",
    "sample_global_shuffle",
    "text_substring_dedup",
    "dedup_sorted_neighborhood",
    # r8 store additions with aggregate/slice-sized outputs (the
    # whole-table read-backs — time travel, schema evolution, CDF,
    # merge — stay at sf0.01: multi-million-row collects are cost, not
    # verification gain; their machinery is exercised here through
    # the rollup and skipping compositions)
    "store_incremental_rollup",
    "store_incremental_minmax",  # r9: maintained MIN/MAX/AVG
    "store_stats_skipping",
    # r11: the consistency layer + sketch-only rollup — heavy
    # multi-write lifecycles with tiny (≤10-row) outputs
    "store_incremental_distinct_sketch",
    "store_read_group",
    "store_write_group",
    "store_stacked_view_group",
    # r12: group time travel, store-accumulating incremental
    # dedup/ANN, and the bloom point probe — output sizes are cuts,
    # pairs, or a key-slice (all collectable); the lifecycles
    # themselves are the scale exercise
    "store_read_group_asof",
    "store_incremental_dedup_corpus",
    "store_incremental_lsh_index",
    "store_incremental_ann_index",
    "store_bloom_point_read",
    # r13: the unified planner + point-probe serving lifecycles —
    # year-slab/stats + bloom + bucket routing composed; outputs are
    # key-slices and two-cut tags (all collectable)
    "store_read_planned",
    "store_read_planned_disjunction",
    "store_bloom_conjunctive_read",
    "store_bloom_inlist_read",
    "store_group_point_read",
    # r13 continuation: null-count/prefix planner routes, the element
    # bloom index, and the stats-answered scalars — outputs are
    # filtered slices or one aggregate row (all collectable); the
    # per-file skip arithmetic is the scale exercise
    "store_read_planned_nulls",
    "store_read_planned_prefix",
    "store_bloom_element_read",
    "store_stats_scalar_agg",
    "store_count_planned",
]


@pytest.fixture(scope="module")
def duck_sf1():
    import os

    if not os.path.isdir(_SF1_DIR):
        import importlib.util

        gen = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "gen_sf1.py",
        )
        spec = importlib.util.spec_from_file_location("gen_sf1", gen)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main(_SF1_DIR)
    con = duck_connection(_SF1_DIR)
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", _SF1_NAMES)
def test_oracle_parity_sf1(spark, duck_sf1, name):
    e = REGISTRY[name]
    ok, msg = compare(e.fn(spark, _SF1_DIR), duck_sf1, e.sql)
    assert ok, f"{name} @ sf1: {msg}"


# ---------------------------------------------------------------------------
# sf1 CHECKSUM twins for the whole-table read-back store queries
# (VERDICT r8 item 5): store_time_travel_ts / store_schema_evolution /
# store_cdf_changes / store_merge_when return multi-million-row frames
# at sf1, so their full value hash stays an sf0.01-only proof (the
# documented collect-cost trade). These twins run the SAME query and
# the SAME oracle at sf1 but compare an aggregate projection — row
# count, per-column non-null count, decimal sum, min/max (distinct
# count for strings) — catching scale-dependent value drift without
# the collect. The full-hash proof at sf0.01 anchors exactness; this
# anchors scale.
# ---------------------------------------------------------------------------

_READBACK_CHECKSUMS = {
    "store_time_travel_ts": {
        "num": ["version", "o_orderkey", "o_totalprice"], "str": [],
    },
    "store_schema_evolution": {
        "num": ["o_orderkey", "o_totalprice"], "str": ["o_orderstatus"],
    },
    "store_cdf_changes": {
        "num": ["o_orderkey", "o_totalprice"], "str": ["_change_type"],
    },
    "store_merge_when": {
        "num": ["o_orderkey", "o_totalprice", "adj"], "str": ["tag"],
    },
}


def _checksum_spark(df, spec):
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in spec["num"]:
        aggs += [
            F.count(F.col(c)).cast("bigint").alias(f"n_{c}"),
            F.sum(F.col(c).cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .alias(f"sum_{c}"),
            F.min(F.col(c).cast("double")).alias(f"min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"max_{c}"),
        ]
    for c in spec["str"]:
        aggs += [
            F.count(F.col(c)).cast("bigint").alias(f"n_{c}"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"nd_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    return df.agg(*aggs)


def _checksum_sql(sql, spec):
    parts = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
    for c in spec["num"]:
        parts += [
            f'CAST(COUNT("{c}") AS BIGINT) AS "n_{c}"',
            f'CAST(SUM(CAST("{c}" AS DECIMAL(18,4))) AS DECIMAL(38,4))'
            f' AS "sum_{c}"',
            f'MIN(CAST("{c}" AS DOUBLE)) AS "min_{c}"',
            f'MAX(CAST("{c}" AS DOUBLE)) AS "max_{c}"',
        ]
    for c in spec["str"]:
        parts += [
            f'CAST(COUNT("{c}") AS BIGINT) AS "n_{c}"',
            f'CAST(COUNT(DISTINCT "{c}") AS BIGINT) AS "nd_{c}"',
            f'MIN("{c}") AS "min_{c}"',
            f'MAX("{c}") AS "max_{c}"',
        ]
    return f"SELECT {', '.join(parts)} FROM ({sql})"


@pytest.mark.parametrize("name", sorted(_READBACK_CHECKSUMS))
def test_readback_checksum_twin_construction(spark, sf_dir, duck, name):
    """Fast-suite anchor: the checksum twins must agree at sf0.001 too
    (guards the twin construction itself against drift from the real
    query/oracle)."""
    e = REGISTRY[name]
    spec = _READBACK_CHECKSUMS[name]
    ok, msg = compare(
        _checksum_spark(e.fn(spark, sf_dir), spec),
        duck,
        _checksum_sql(e.sql, spec),
        allow_decimal=True,  # twins compare exact DECIMAL sums locally
    )
    assert ok, f"{name} checksum twin: {msg}"


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_READBACK_CHECKSUMS))
def test_readback_checksums_sf1(spark, duck_sf1, name):
    e = REGISTRY[name]
    spec = _READBACK_CHECKSUMS[name]
    ok, msg = compare(
        _checksum_spark(e.fn(spark, _SF1_DIR), spec),
        duck_sf1,
        _checksum_sql(e.sql, spec),
        allow_decimal=True,  # twins compare exact DECIMAL sums locally
    )
    assert ok, f"{name} checksum @ sf1: {msg}"
