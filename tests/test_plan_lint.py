"""Plan-lint coverage: every bench query's executed plan is free of the
scale anti-patterns plan_lint flags; seeded negatives prove the linter
actually fires."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipelinerepo_spark.plans import lint
from datapipelinerepo_spark.registry import REGISTRY
import datapipelinerepo_spark.registry_ext  # noqa: F401

_BENCH = [n for n, e in REGISTRY.items() if e.bench]


@pytest.mark.parametrize("name", _BENCH)
def test_bench_plans_lint_clean(spark, sf_dir, name):
    # Bench membership comes from Entry.bench; the per-query intent
    # allowlist is the single _REGISTRY_ALLOW below (round 4 collapsed
    # the separate bench allowlist that had started to drift from it).
    lint.assert_clean(
        REGISTRY[name].fn(spark, sf_dir),
        allow=tuple(_REGISTRY_ALLOW.get(name, ())),
    )


def test_lint_flags_cartesian(spark):
    a = spark.range(4)
    b = spark.range(4).withColumnRenamed("id", "id2")
    codes = {f.code for f in lint.plan_findings(a.crossJoin(b))}
    assert "cartesian_product" in codes or "broadcast_nested_loop" in codes


def test_lint_flags_row_udf(spark):
    from pyspark.sql.functions import udf

    slow = udf(lambda x: x + 1, "long")
    df = spark.range(4).select(slow(F.col("id")))
    assert {f.code for f in lint.plan_findings(df)} == {"python_row_udf"}


def test_lint_allow_suppresses(spark):
    a = spark.range(4)
    b = spark.range(4).withColumnRenamed("id", "id2")
    lint.assert_clean(
        a.crossJoin(b),
        allow=("cartesian_product", "broadcast_nested_loop"),
    )


def test_lint_pandas_udf_not_flagged(spark):
    from pyspark.sql.functions import pandas_udf

    fast = pandas_udf(lambda s: s * 2, "long")
    df = spark.range(16).select(fast(F.col("id")))
    assert lint.plan_findings(df) == []


def test_pushed_filters_surface(spark, sf_dir):
    df = REGISTRY["p1_point_lookup"].fn(spark, sf_dir)
    assert any(p and p != "[]" for p in lint.pushed_filters(df))


def test_pipeline_lint_gate_rejects_bad_extract(spark, tmp_path):
    """Pipeline(lint_plans=True) refuses to load a cartesian extract —
    the refusal is a per-source error (O6 isolation), and the same
    pipeline with the gate off loads it."""
    from datapipelinerepo_spark.io import TableStore
    from datapipelinerepo_spark.plans.pipeline import DataSource, Pipeline

    class BadSource(DataSource):
        name = "bad"
        table_name = "bad_t"
        write_mode = "overwrite"

        def schedule(self, ctx):
            return True

        def extract(self, ctx):
            a = ctx.spark.range(3)
            b = ctx.spark.range(3).withColumnRenamed("id", "id2")
            return a.crossJoin(b)

    store = TableStore(spark, str(tmp_path))
    gated = Pipeline([BadSource()], spark=spark, store=store, lint_plans=True).run()
    assert "bad" in gated.errors and "plan lint failed" in gated.errors["bad"]
    assert not store.exists("bad_t")

    ungated = Pipeline([BadSource()], spark=spark, store=store).run()
    assert ungated.errors == {} and ungated.loaded_rows["bad"] == 9


# Every registered query's executed plan, linted. The allowlist is the
# explicit statement of INTENT: global scalar results legitimately end
# in a single-partition aggregate; scalar-subquery gates and the exact
# all-pairs baselines legitimately build a (1-row or sampled) nested
# loop. Anything NOT listed here must lint clean — a new finding on any
# query is a plan regression, not noise.
_REGISTRY_ALLOW = {
    # final global scalar / 1-row result
    "p4_date_part_filter": {"single_partition_exchange"},
    "a1_watermark_max": {"single_partition_exchange"},
    "a6_emptiness_gate": {"single_partition_exchange"},
    "q14_promo_share": {"single_partition_exchange"},
    "q6_forecast_revenue": {"single_partition_exchange"},
    "q19_disjunctive_pushdown": {"single_partition_exchange"},
    "q15_top_supplier": {"single_partition_exchange"},
    "q17_small_quantity_revenue": {"single_partition_exchange"},
    "scale_approx_aggs": {"single_partition_exchange"},
    # final global 1-row profile aggregate (ANALYZE-style table stats)
    "profile_column_stats": {"single_partition_exchange"},
    "scale_heavy_hitters": {"single_partition_exchange"},
    "graph_triangle_count": {"single_partition_exchange"},
    # the only unpartitioned window runs over the 256-row bucket-counts
    # frame (then broadcasts); the corpus itself shuffles once on _b
    "sample_global_shuffle": {"single_partition_exchange"},
    "sample_shard_plan": {"single_partition_exchange"},  # same 256-row window
    # same bounded bucket-offsets window (≤33 rows) feeding the
    # broadcast; the corpus itself shuffles once on the range bucket
    "dedup_sorted_neighborhood": {"single_partition_exchange"},
    # bucketed global-order path since r5: the only global windows are
    # the ≤33-row bucket-offsets frame (single-partition, bounded) and
    # the 1-row total-count crossJoin broadcast for the tile arithmetic
    "w_ntile_deciles": {"single_partition_exchange", "broadcast_nested_loop"},
    # final 1-row funnel summary: three scalar counts cross-joined
    "events_funnel": {"broadcast_nested_loop", "single_partition_exchange"},
    # 1-row scalar-subquery gate broadcast into a filter
    "a9_above_avg": {"broadcast_nested_loop", "single_partition_exchange"},
    "q11_group_share_having": {"broadcast_nested_loop", "single_partition_exchange"},
    "q22_idle_wealthy_customers": {"broadcast_nested_loop", "single_partition_exchange"},
    "data_mix_report": {"broadcast_nested_loop", "single_partition_exchange"},
    "text_tfidf": {"broadcast_nested_loop", "single_partition_exchange"},
    "text_perplexity": {"broadcast_nested_loop", "single_partition_exchange"},
    "text_dsir_importance": {"broadcast_nested_loop", "single_partition_exchange"},
    "text_bigram_perplexity": {"broadcast_nested_loop", "single_partition_exchange"},
    "sample_temperature_mix": {"broadcast_nested_loop", "single_partition_exchange"},
    # 1-row (N, avgdl) corpus-stats aggregate crossJoin-broadcast onto
    # the query-term postings; top-k is TakeOrderedAndProject
    "retrieval_bm25_topk": {"broadcast_nested_loop", "single_partition_exchange"},
    # 1-row total-weight aggregate crossJoin-broadcast onto the 5-row
    # per-lang plan (sample_repeat_plan); vocab_coverage's rank window
    # runs over the vocabulary frame (orders smaller than the corpus)
    # and its 3-row K-table cross-broadcasts the 1-row total
    "sample_repeat_plan": {"broadcast_nested_loop", "single_partition_exchange"},
    "text_vocab_coverage": {"broadcast_nested_loop", "single_partition_exchange"},
    "sample_mix_rebalance": {"broadcast_nested_loop", "single_partition_exchange"},
    # 1-row bound/threshold aggregates crossJoin-broadcast back onto the
    # sketch output (scale_approx_aggs_bounded: the 3-value sketch+exact
    # frame; scale_heavy_hitters_verified: the c21 boundary scalar)
    "scale_approx_aggs_bounded": {"broadcast_nested_loop", "single_partition_exchange"},
    "scale_heavy_hitters_verified": {"broadcast_nested_loop", "single_partition_exchange"},
    # intentionally exact / sampled all-pairs
    "ann_topk_bruteforce": {"broadcast_nested_loop"},
    "embedding_margin_mining": {"broadcast_nested_loop"},  # rides the exact top-k
    "ann_topk_quantized": {"broadcast_nested_loop"},
    "embedding_dup_pairs": {"broadcast_nested_loop"},
    "dedup_levenshtein_pairs": {"broadcast_nested_loop"},
    # the reference's driving cross join (J4) IS a cross join
    "j4_cross_join_worklist": {"broadcast_nested_loop"},
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_plans_lint_with_intent(spark, sf_dir, name):
    findings = lint.plan_findings(REGISTRY[name].fn(spark, sf_dir))
    got = {f.code for f in findings}
    assert got <= _REGISTRY_ALLOW.get(name, set()), findings
