"""End-to-end training-data prep: the operator composition removes
planted junk (low quality, PII, exact dups, near-dups) while keeping
clean docs — and stays fully lazy until materialized."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipelinerepo_spark.io import load_table
from datapipelinerepo_spark.plans.training_prep import (
    PrepConfig,
    prepare_training_data,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the quiet green forest where many small animals live together "
    "through the long warm summer days"
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    base = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    planted = spark.createDataFrame(
        [
            (900001, "too short"),                        # fails quality gate
            (900002, GOOD + " contact me a@b.com 5551234"),  # PII, survives redacted
            (900003, GOOD),                               # exact dup of 900004
            (900004, GOOD),
            (900005, GOOD + " extra trailing words here"),   # near-dup of GOOD
        ],
        "doc_id long, text string",
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("planted").alias("source"), F.length("text").alias("n_chars"),
    )
    return base.union(planted)


def test_prep_removes_planted_junk(spark, corpus):
    out = prepare_training_data(corpus, PrepConfig(near_dup_threshold=0.5))
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 900001 not in ids                     # quality-gated
    assert 900004 not in ids                     # exact dup dropped
    assert len({900003, 900005} & ids) <= 1      # near-dup cluster collapsed
    survivors = out.filter(F.col("doc_id").isin(900002, 900003)).collect()
    assert survivors, "clean planted docs should survive"
    for r in survivors:
        assert "a@b.com" not in r["text"] and "5551234" not in r["text"]
    # redaction accounting came through the join
    red = {r["doc_id"]: r["n_redacted"] for r in survivors}
    if 900002 in red:
        assert red[900002] == 2  # one email + one digit run


def test_prep_keeps_original_corpus_mostly_intact(spark, corpus):
    cfg = PrepConfig()
    before = corpus.filter(F.col("doc_id") < 50).count()
    out = prepare_training_data(corpus, cfg)
    kept = out.filter(F.col("doc_id") < 50).count()
    # synthetic corpus is clean prose: the pipeline shouldn't nuke it
    assert kept >= before * 0.5


def test_prep_best_quality_keeper_keeps_longest(spark, corpus):
    """keeper="best_quality": the surviving member of the near-dup
    cluster is the LONGEST one (900005 = GOOD + extra words), not the
    min id — and the rest of the pipeline is unchanged."""
    out = prepare_training_data(
        corpus, PrepConfig(near_dup_threshold=0.5, keeper="best_quality")
    )
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    cluster = {900003, 900005} & ids
    if cluster:  # the near-dup pair collapsed to its longest member
        assert cluster == {900005}
    assert 900001 not in ids and 900004 not in ids


def test_prep_model_gates_drop_planted_outliers(spark, corpus):
    """A gibberish hapax doc has the corpus's highest perplexity; a
    ceiling below it drops it while keeping the clean corpus."""
    from datapipelinerepo_spark.operators.text import unigram_perplexity

    gib_words = " ".join(f"zqxj{i}vw" for i in range(40))
    gib = spark.createDataFrame(
        [(900009, gib_words)], "doc_id long, text string"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("planted").alias("source"), F.length("text").alias("n_chars"),
    )
    c2 = corpus.union(gib)
    # the pipeline fits the LM on the quality-GATED corpus — mirror that
    from datapipelinerepo_spark.plans.training_prep import quality_gate

    cfg0 = PrepConfig(near_dup_threshold=0.5)
    ppls = {
        r["doc_id"]: r["ppl"]
        for r in unigram_perplexity(quality_gate(c2, cfg0)).collect()
    }
    assert ppls[900009] == max(ppls.values())
    ceiling = sorted(ppls.values())[-2]  # everything but the gibberish
    out = prepare_training_data(
        c2,
        PrepConfig(near_dup_threshold=0.5, max_perplexity=float(ceiling)),
    )
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 900009 not in ids
    assert any(i < 50 for i in ids)  # clean corpus survives


def test_span_gate_drops_stitched_docs(spark, corpus):
    """With the span gate on, a doc stitched from two corpus docs'
    spans is dropped while organic docs survive."""
    from pyspark.sql import functions as F

    donors = corpus.filter(F.col("doc_id").isin(0, 1)).collect()
    # take ~60% of each donor so the DONORS stay under the share cut
    # (the stitched doc itself is 100% duplicated material)
    w0 = donors[0]["text"].split()
    w1 = donors[1]["text"].split()
    stitched_text = " ".join(w0[: int(len(w0) * 0.6)] + w1[: int(len(w1) * 0.6)])
    stitched = spark.createDataFrame(
        [(900100, stitched_text)], "doc_id long, text string"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("planted").alias("source"), F.length("text").alias("n_chars"),
    )
    cfg = PrepConfig(max_dup_share=0.8, near_dup_threshold=0.95)
    out = prepare_training_data(corpus.union(stitched), cfg)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 900100 not in ids          # stitched doc gated out
    assert 0 in ids and 1 in ids      # donors survive (share < 0.8)


def test_assign_splits_appends_stable_column(spark, corpus):
    """assign_splits adds the deterministic split column; every row
    gets one of train/valid/test and re-running doesn't move rows."""
    cfg = PrepConfig(assign_splits=True)
    out = prepare_training_data(corpus, cfg)
    a = {(r["doc_id"], r["split"]) for r in out.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in prepare_training_data(corpus, cfg).select("doc_id", "split").collect()}
    assert a == b and len(a) > 0
    assert {s for _, s in a} <= {"train", "valid", "test"}


def test_dsir_gate_keeps_target_like_docs(spark):
    """DSIR gate: background-vocabulary docs drop, target-vocabulary
    docs survive the full pipeline."""
    from pyspark.sql import functions as F

    tgt = ("tea and crumpets with lovely weather indeed a fine morning for "
           "the garden party where the the guests arrive by noon and stay "
           "well past dark enjoying every small plate served")
    bg = ("schnell fahren zug bahnhof wetter heute gut morgen abend spaet "
          "viele leute kommen zusammen lange reise durch den winter mit "
          "schnee und eis auf allen wegen")
    rows = (
        [(i, tgt + f" marker{i}", "en") for i in range(8)]
        + [(100 + i, bg + f" zeichen{i}", "de") for i in range(8)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string").select(
        "doc_id", "text", "lang", F.lit("x").alias("source"),
        F.length("text").alias("n_chars"),
    )
    cfg = PrepConfig(dsir_target=F.col("lang") == "en", near_dup_threshold=0.99)
    ids = {r["doc_id"] for r in prepare_training_data(df, cfg).select("doc_id").collect()}
    assert all(i in ids for i in range(8))
    assert all(100 + i not in ids for i in range(8))
