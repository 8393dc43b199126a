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
# explicit statement of INTENT; anything NOT listed here must lint
# clean — a new finding on any query is a plan regression, not noise.
#
# Since r6 the lint itself recognizes the scalar-aggregate funnel
# (Exchange SinglePartition whose child is a keys=[] PARTIAL aggregate:
# one constant-size buffer per task crosses, not data), which retired
# the ~20 "final global scalar" entries this list used to carry. What
# remains falls in exactly TWO intent classes:
#
# (a) single_partition_exchange — ONLY the bounded bucket-offsets
#     window: a ≤33-row (or 256-row for the hash-prefix shuffle) frame
#     of per-bucket counts, cumulated by an unpartitioned window and
#     broadcast back. The frame is POST-AGGREGATION (cardinality = the
#     fixed bucket count, never the corpus) — structurally asserted by
#     test_single_partition_allowances_sit_on_aggregated_frames below.
# (b) broadcast_nested_loop — 1-row scalar-subquery gates / totals
#     cross-broadcasts, the intentionally-exact all-pairs baselines,
#     bounded triangular offsets joins, and the reference's J4 driving
#     cross join.
_REGISTRY_ALLOW = {
    # (a) 256-row hash-prefix bucket-counts window, broadcast offsets
    "sample_global_shuffle": {"single_partition_exchange"},
    "sample_shard_plan": {"single_partition_exchange"},
    # (a) ≤33-row range-bucket offsets window (sorted-neighborhood
    # positions); the corpus itself shuffles once on the range bucket
    "dedup_sorted_neighborhood": {"single_partition_exchange"},
    # (a) ≤33-row bucket-offsets window + (b) 1-row total-count
    # crossJoin broadcast for the exact ntile arithmetic
    "w_ntile_deciles": {"single_partition_exchange", "broadcast_nested_loop"},
    # (a) same bucket-offsets window + (b) 3-row quantile table ⨯ 1-row
    # count broadcast (exact global quantiles on the bucketed machinery)
    "scale_exact_quantiles": {"single_partition_exchange", "broadcast_nested_loop"},
    # (a) two ≤33-row bucket-offsets windows (one per z dimension) +
    # (b) 1-row total-count crossJoin broadcast for the rank→bucket
    # arithmetic — the scale_exact_quantiles machinery, twice
    "scale_zorder_values": {"single_partition_exchange", "broadcast_nested_loop"},
    # (b) rides the exact brute-force scorer over the pre-filtered slice
    "ann_topk_filtered": {"broadcast_nested_loop"},
    # (b) 1-row scalar-subquery gate broadcast into a filter
    "a9_above_avg": {"broadcast_nested_loop"},
    "q11_group_share_having": {"broadcast_nested_loop"},
    "q22_idle_wealthy_customers": {"broadcast_nested_loop"},
    # (b) final 1-row funnel summary: three scalar counts cross-joined
    "events_funnel": {"broadcast_nested_loop"},
    # (b) 1-row corpus-stat aggregate (N / total tokens / total weight /
    # avgdl) crossJoin-broadcast onto a grouped frame
    "data_mix_report": {"broadcast_nested_loop"},
    "text_tfidf": {"broadcast_nested_loop"},
    "text_perplexity": {"broadcast_nested_loop"},
    "text_bigram_perplexity": {"broadcast_nested_loop"},
    "text_dsir_importance": {"broadcast_nested_loop"},
    "sample_temperature_mix": {"broadcast_nested_loop"},
    "sample_mix_rebalance": {"broadcast_nested_loop"},
    "sample_repeat_plan": {"broadcast_nested_loop"},
    # (b) 1-row (N, avgdl) stats broadcast onto query-term postings;
    # top-k itself is TakeOrderedAndProject
    "retrieval_bm25_topk": {"broadcast_nested_loop"},
    # (b) ≤33×33 triangular bucket-offsets join + 3-row K-table totals
    # cross-broadcast (r6: vocab frame itself is bucketed, no global
    # window — VERDICT r5 item 1)
    "text_vocab_coverage": {"broadcast_nested_loop"},
    # (b) ≤33×33 triangular bucket-offsets join (the same
    # global_desc_rank_cumsum machinery)
    "sample_token_budget": {"broadcast_nested_loop"},
    # (b) 1-row bound/threshold aggregates crossJoin-broadcast back onto
    # the sketch output
    "scale_approx_aggs_bounded": {"broadcast_nested_loop"},
    "scale_sketch_set_ops": {"broadcast_nested_loop"},  # 1-row exact ⨯ 1-row sketch agg
    "scale_heavy_hitters_verified": {"broadcast_nested_loop"},
    # (b) intentionally exact / sampled all-pairs baselines
    "ann_topk_bruteforce": {"broadcast_nested_loop"},
    "embedding_margin_mining": {"broadcast_nested_loop"},  # rides the exact top-k
    "ann_topk_quantized": {"broadcast_nested_loop"},
    "embedding_dup_pairs": {"broadcast_nested_loop"},
    "dedup_levenshtein_pairs": {"broadcast_nested_loop"},
    # (b) the reference's driving cross join (J4) IS a cross join
    "j4_cross_join_worklist": {"broadcast_nested_loop"},
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_registry_plans_lint_with_intent(spark, sf_dir, name):
    findings = lint.plan_findings(REGISTRY[name].fn(spark, sf_dir))
    got = {f.code for f in findings}
    assert got <= _REGISTRY_ALLOW.get(name, set()), findings


def test_lint_scalar_agg_funnel_not_flagged(spark):
    # SELECT max(x) FROM t: partial→final keys=[] aggregate — the
    # SinglePartition exchange moves one buffer per task, not data
    assert lint.plan_findings(spark.range(64).agg(F.max("id"))) == []


def test_lint_collect_list_funnel_still_flagged(spark):
    # a keys=[] aggregate whose partial buffer is DATA-SIZED must flag
    codes = {f.code for f in lint.plan_findings(spark.range(64).agg(F.collect_list("id")))}
    assert "single_partition_exchange" in codes


def test_lint_exact_percentile_funnel_still_flagged(spark):
    # exact median/percentile/mode partials buffer every distinct value
    # — data-sized despite keys=[] — and must flag; the approx sketch
    # form has a bounded buffer and is exempt (code-review r6)
    for agg in (F.median("id"), F.expr("percentile(id, 0.5)"), F.mode("id")):
        codes = {f.code for f in lint.plan_findings(spark.range(64).agg(agg))}
        assert "single_partition_exchange" in codes, agg
    assert lint.plan_findings(spark.range(64).agg(F.percentile_approx("id", 0.5))) == []


def test_lint_global_window_still_flagged(spark):
    from pyspark.sql import Window

    df = spark.range(64).select(F.row_number().over(Window.orderBy("id")))
    codes = {f.code for f in lint.plan_findings(df)}
    assert "single_partition_exchange" in codes


_SP_ALLOWED = sorted(
    n for n, a in _REGISTRY_ALLOW.items() if "single_partition_exchange" in a
)


@pytest.mark.parametrize("name", _SP_ALLOWED)
def test_single_partition_allowances_sit_on_aggregated_frames(spark, sf_dir, name):
    """Structural guard on intent class (a): every ALLOWED SinglePartition
    exchange must funnel a post-aggregation frame — between the exchange
    and any leaf scan below it there is a grouped (non-scalar) aggregate,
    so the funneled cardinality is the group count (the fixed bucket
    fan-out), never the corpus. A future vocab-coverage-style exception
    (corpus-sized sort under an allowed exchange) fails here instead of
    hiding in the allowlist (VERDICT r5 item 8)."""
    df = REGISTRY[name].fn(spark, sf_dir)
    lines = lint._executed_plan(df).splitlines()

    def depth(ln: str) -> int:
        return len(ln) - len(ln.lstrip(" *+-:"))

    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        # lint-exempt scalar funnels don't need the allowance at all
        # (same predicate as the lint, incl. the data-sized-partial
        # exclusion so an exact-median funnel can't slip through here)
        child = lines[i + 1 : i + 4]
        if any(
            ("keys=[]" in c or "key=[]" in c) and "partial_" in c
            for c in child
        ) and not any(
            needle in c for c in child for needle in lint.DATA_SIZED_PARTIALS
        ):
            continue
        # walk the exchange's subtree (deeper-indented lines until the
        # indentation returns to the exchange's level) looking for a
        # grouped aggregate before any file scan
        d0 = depth(ln)
        found_group_agg = False
        for sub in lines[i + 1 :]:
            if sub.strip() and depth(sub) <= d0:
                break
            if "Scan parquet" in sub or "Scan ExistingRDD" in sub:
                break
            if ("Aggregate(key" in sub) and ("keys=[]" not in sub) and (
                "key=[]" not in sub
            ):
                found_group_agg = True
                break
        assert found_group_agg, (
            f"{name}: allowed SinglePartition exchange does not sit on a "
            f"post-aggregation frame: {ln.strip()[:160]}"
        )
