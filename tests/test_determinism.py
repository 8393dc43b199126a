"""Partitioning-determinism tests: the engine's claim (SCALE.md) is
that results are IDENTICAL under different shuffle layouts — the
property that makes 1000-executor runs reproducible and oracle hashes
stable. Exercised by re-running representative queries under different
spark.sql.shuffle.partitions settings and comparing full result sets."""

from __future__ import annotations

import pytest

from datapipelinerepo_spark.registry import REGISTRY
import datapipelinerepo_spark.registry_ext  # noqa: F401

QUERIES = [
    "q1_pricing_summary",       # decimal-sum aggregates
    "flagship_coverage_gap",    # join + count-distinct
    "a7_percentiles",           # exact percentiles
    "q10_returned_items",       # top-k with ORDER BY ties
    "data_mix_report",          # broadcast scalar share
    "text_rolling_fingerprint", # integer rolling hash
    "retrieval_bm25_topk",      # ordered-fold float scores + top-k ties
    "embedding_kcenter_coreset",  # iterative argmax over float dists
    "text_token_entropy",       # decimal term sums
    "text_zipf_fit",            # ordered-fold OLS over the rank window
    "w_ntile_deciles",          # range-bucketed global positions
    "scale_heavy_hitters",      # sketch candidates -> exact recount
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_result_identical_across_partitionings(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    fn = REGISTRY[name].fn
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        r3 = _rows(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        r13 = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert r3 == r13


def test_dsir_partitioning_invariant(spark):
    """DSIR scores are identical at 1 and 7 partitions (rounded-ln +
    DECIMAL sum discipline)."""
    from pyspark.sql import functions as F

    from datapipelinerepo_spark.operators.text import dsir_importance

    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)), "en" if i % 3 else "de")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    tgt = F.col("lang") == "en"
    a = sorted(map(tuple, dsir_importance(df.coalesce(1), tgt).collect()))
    b = sorted(map(tuple, dsir_importance(df.repartition(7), tgt).collect()))
    assert a == b


def test_minhash_signatures_partitioning_invariant(spark):
    """The Carter-Wegman signature family is a pure per-row function:
    identical signatures at any partitioning."""
    from datapipelinerepo_spark.operators.dedup import minhash_signatures, shingles

    rows = [(i, f"alpha beta gamma delta epsilon w{i % 5} zeta") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, minhash_signatures(shingles(df.coalesce(1))).collect()))
    b = sorted(map(tuple, minhash_signatures(shingles(df.repartition(7))).collect()))
    assert a == b
