"""Skew mitigation for large joins — the salting pattern, plus the
diagnosis query that decides when to use it.

AQE's skew-join split (spark.sql.adaptive.skewJoin.enabled, on in our
session defaults) handles sort-merge skew transparently; explicit
salting remains necessary when (a) the skewed side feeds an
aggregation keyed the same way (AQE can't split a hash-agg key), or
(b) the join is forced to shuffle-hash where AQE skew handling doesn't
apply. The salt fans ONE hot key's rows across ``salt_buckets``
reducers at the cost of replicating the other side's matching rows
``salt_buckets``-fold — so salt the fact side, replicate the dim side,
and keep salt_buckets near the executor-core count, not higher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Diagnosis: per-key row counts for the heaviest keys plus their
    share of the table — the number that says whether the biggest key
    overflows one reducer's share (count_max / (total/shuffle_parts)).
    One scan: the total is the sum over the (tiny) aggregated per-key
    table, broadcast back — not a second pass over the input."""
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    total = per_key.agg(F.sum("n_rows").alias("_total"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_rows") / F.col("_total"), 6))
        .drop("_total")
        .orderBy(F.col("n_rows").desc(), F.col(key).asc())
        .limit(top_n)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated.

    The fact row's salt is a deterministic hash of its full row (any
    per-row spread works — correctness never depends on which bucket a
    row lands in, because the dim side carries every bucket). Each hot
    key now occupies ``salt_buckets`` shuffle partitions instead of one.

    Join columns are restored to the caller's names; the salt never
    escapes. Only inner/left joins are valid: in a right or full join
    the replicated dim side's unmatched copies would each surface as a
    spurious null-padded row."""
    if how.replace("_", "").lower() not in {"inner", "left", "leftouter"}:
        raise ValueError(
            f"salted_join supports how='inner'|'left' (got {how!r}); "
            "right/full joins would emit one row per unmatched dim replica"
        )
    # rand-free per-row spread that does NOT hash row content: content
    # hashing sends identical duplicate rows (or a frame that is only
    # the key column) to ONE bucket — zero fan-out in exactly the
    # degenerate hot-key case the salt exists for (code-review r6).
    # monotonically_increasing_id varies per row unconditionally; the
    # salt only routes rows, never reaches results, so run-to-run id
    # differences are invisible to the output.
    fact_salted = fact.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    dim_replicated = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(salt_buckets)]))
    )
    return fact_salted.join(dim_replicated, on=[key, "_salt"], how=how).drop("_salt")


def salted_count_by_key(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed GROUP BY keys: partial count per
    (key, salt) — hot key split across ``salt_buckets`` reducers — then
    final sum per key. Same result as a direct groupBy; bounded reducer
    load. (Spark's own partial aggregation already does this for
    algebraic aggs; the explicit form matters for aggs with large
    per-key state, e.g. collect_set or exact distinct.)"""
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )  # per-row spread independent of content — see salted_join
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(key).agg(F.sum("_pc").alias("n_rows"))
