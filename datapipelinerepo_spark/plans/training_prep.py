"""End-to-end training-data preparation plan: the composition the
LLM-data operators exist for, as one lazy DataFrame chain.

    raw documents
      → quality gate        (length / token / punct thresholds)
      → model gates         (optional: linear-classifier score floor,
                             unigram-LM perplexity ceiling — CCNet-style)
      → PII redaction       (<EMAIL>/<IP>/<NUM>)
      → exact dedup         (digest window, keep min id)
      → near-dup dedup      (MinHash+LSH pairs → connected components
                             → keep min-id or highest-quality member)
      → mix report + deterministic stratified sample

Everything stays a DataFrame until the caller writes: the whole prep is
ONE Spark job graph — Catalyst fuses the map-side stages (gate, redact,
digest) into the scan, and the only shuffles are the ones the dedup
semantics require (digest window; LSH band join; component iteration).
No collect anywhere; at 100 TB the driver only ever sees the plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import graph as G
from ..operators import text as T


@dataclass(frozen=True)
class PrepConfig:
    min_chars: int = 100
    min_tokens: int = 20
    max_punct_ratio: float = 0.05
    near_dup_threshold: float = 0.5
    id_col: str = "doc_id"
    text_col: str = "text"
    # model-based gates (None = off): linear-classifier score floor and
    # unigram-LM perplexity ceiling — the CCNet-style filters applied
    # AFTER the cheap structural gate so the models score fewer docs
    min_model_score: float | None = None
    max_perplexity: float | None = None
    # keeper policy inside each near-dup component: "min_id" (cheapest)
    # or "best_quality" (keep the longest member — one extra window)
    keeper: str = "min_id"
    # corpus-duplicated-span gate (None = off): drop docs whose share of
    # n-gram positions duplicated across the corpus reaches this value
    # (the Lee-et-al span-dedup cut, text.duplicated_span_stats)
    max_dup_share: float | None = None
    # DSIR target selection (None = off): a boolean Column marking the
    # target slice; docs scoring less target-like than background under
    # the two unigram LMs are dropped (text.dsir_importance)
    dsir_target: object | None = None
    # append a deterministic md5-range train/valid/test column at the
    # end (sampling.split_assign; stable under corpus growth)
    assign_splits: bool = False


def quality_gate_predicate(cfg: PrepConfig) -> Column:
    """The structural gate as a boolean COLUMN (NULL-safe: NULL text →
    false), so callers that need both survivors and rejects can stamp
    one flag on one materialization instead of filter + anti-join (the
    streaming ingest's per-batch shape)."""
    c = F.col(cfg.text_col)
    punct_ratio = T.token_count(c, T.PUNCT_RE) / F.greatest(F.length(c), F.lit(1))
    return F.coalesce(
        (F.length(c) >= cfg.min_chars)
        & (T.token_count(c) >= cfg.min_tokens)
        & (punct_ratio < cfg.max_punct_ratio),
        F.lit(False),
    )


def quality_gate(df: DataFrame, cfg: PrepConfig) -> DataFrame:
    return df.filter(quality_gate_predicate(cfg))


def redact(df: DataFrame, cfg: PrepConfig) -> DataFrame:
    """Replace the text column with its redacted form (keeps schema)."""
    red = T.redact_pii(df, text_col=cfg.text_col, id_col=cfg.id_col).select(
        cfg.id_col, "n_redacted"
    )
    t0 = F.col(cfg.text_col)
    t1 = F.regexp_replace(t0, T.EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, T.IPV4_RE, "<IP>")
    t3 = F.regexp_replace(t2, T.NUMRUN_RE, "<NUM>")
    return df.withColumn(cfg.text_col, t3).join(red, on=cfg.id_col, how="left")


def model_gate(df: DataFrame, cfg: PrepConfig) -> DataFrame:
    """Model-based filtering: drop docs below the linear-classifier
    score floor and/or above the perplexity ceiling. Both models run as
    relational passes (see text.linear_model_score /
    unigram_perplexity); only (id, score) columns join back — the text
    never re-shuffles for the gate."""
    out = df
    if cfg.min_model_score is not None:
        ms = T.linear_model_score(
            out, text_col=cfg.text_col, id_col=cfg.id_col
        ).filter(F.col("model_score") >= cfg.min_model_score).select(cfg.id_col)
        out = out.join(ms, on=cfg.id_col, how="left_semi")
    if cfg.max_perplexity is not None:
        ok = T.unigram_perplexity(
            out, text_col=cfg.text_col, id_col=cfg.id_col
        ).filter(F.col("ppl") <= cfg.max_perplexity).select(cfg.id_col)
        out = out.join(ok, on=cfg.id_col, how="left_semi")
    return out


def drop_near_dups(df: DataFrame, cfg: PrepConfig) -> DataFrame:
    """MinHash+LSH pairs → connected components → keep each component's
    representative: min id (default) or the highest-quality member
    (``cfg.keeper == "best_quality"`` — longest text wins, tie → min
    id, via graph.canonical_keep). Docs in no pair are their own
    component and survive."""
    pairs = D.minhash_lsh_pairs(
        df, threshold=cfg.near_dup_threshold, text_col=cfg.text_col, id_col=cfg.id_col
    ).select("id_a", "id_b")
    if cfg.keeper == "best_quality":
        sized = df.withColumn("_len", F.length(F.col(cfg.text_col)))
        keep = G.canonical_keep(
            sized.select(F.col(cfg.id_col), "_len"),
            pairs,
            id_col=cfg.id_col,
            quality_col="_len",
        ).select(F.col("keeper_id").alias(cfg.id_col))
    else:
        comps = G.dedup_components(df.select(F.col(cfg.id_col)), pairs)
        keep = comps.filter(F.col(cfg.id_col) == F.col("comp")).select(cfg.id_col)
    return df.join(keep, on=cfg.id_col, how="left_semi")


def span_gate(df: DataFrame, cfg: PrepConfig) -> DataFrame:
    """Drop docs stitched from corpus-duplicated spans: dup_share ≥
    ``cfg.max_dup_share`` (text.duplicated_span_stats). Only (id,
    share) joins back — the ids-only semi-join discipline of the other
    gates."""
    stats = T.duplicated_span_stats(
        df, text_col=cfg.text_col, id_col=cfg.id_col
    )
    ok = stats.filter(F.col("dup_share") < cfg.max_dup_share).select(cfg.id_col)
    # docs below the n-gram floor have no span stats: they pass the gate
    short = df.select(cfg.id_col).join(
        stats.select(cfg.id_col), on=cfg.id_col, how="left_anti"
    )
    return df.join(ok.union(short), on=cfg.id_col, how="left_semi")


def dsir_gate(df: DataFrame, cfg: PrepConfig) -> DataFrame:
    """DSIR selection: keep docs that look more like the
    ``cfg.dsir_target`` slice than the background corpus
    (text.dsir_importance keep flag)."""
    keep = (
        T.dsir_importance(
            df, cfg.dsir_target, text_col=cfg.text_col, id_col=cfg.id_col
        )
        .filter(F.col("keep"))
        .select(cfg.id_col)
    )
    return df.join(keep, on=cfg.id_col, how="left_semi")


def prepare_training_data(df: DataFrame, cfg: PrepConfig | None = None) -> DataFrame:
    """The full prep chain. Returns the cleaned corpus with an added
    ``n_redacted`` column (plus ``split`` when ``cfg.assign_splits``);
    compose with ``text.sequence_packing`` / stratified sampling
    downstream."""
    cfg = cfg or PrepConfig()
    gated = model_gate(quality_gate(df, cfg), cfg)
    if cfg.max_dup_share is not None:
        gated = span_gate(gated, cfg)
    if cfg.dsir_target is not None:
        gated = dsir_gate(gated, cfg)
    clean = redact(gated, cfg)
    exact = D.exact_dedup(clean, text_col=cfg.text_col, id_col=cfg.id_col)
    out = drop_near_dups(exact, cfg)
    if cfg.assign_splits:
        from ..operators.sampling import split_assign

        out = split_assign(out, id_col=cfg.id_col)
    return out
