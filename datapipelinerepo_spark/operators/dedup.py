"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB documents):
- exact dedup is a single hash-shuffle on a digest of the text (shuffle
  md5(text), never the text bytes);
- MinHash+LSH is the linear-cost near-dup path: per-doc signature
  (map-only) → band buckets (explode k_bands rows/doc) → candidate
  pairs only within buckets (no quadratic pair space) → exact Jaccard
  verification on the candidates;
- SimHash gives a 64-bit signature whose Hamming distance approximates
  cosine similarity of the token multiset; banding its 4 x 16-bit chunks
  buckets candidates the same way;
- the quadratic word-level Jaccard join is provided for *verification*
  and oracle-parity on samples — never the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: one row per distinct text with the keeper
    id (min) and copy count. Shuffles only (digest, id): at 100 TB the
    text column never crosses the wire."""
    return (
        df.select(F.md5(F.col(text_col)).alias("_digest"), F.col(id_col))
        .groupBy("_digest")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("_digest")
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (min id) per distinct text, via a window
    keyed on the text digest: ONE shuffle of the rows, no join (the
    digest-agg + semi-join alternative shuffles the rows anyway to meet
    the keeper ids, plus the agg shuffle — and its self-join composes
    badly: dedup∘dedup trips an analyzer attribute-reuse error).
    Duplicate ids are fine; exactly one row per distinct text
    survives."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.split(F.col(text_col), r"\s+")).alias("_toks"),
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Word-set Jaccard similarity over all pairs sharing ≥1 token,
    via explode + self-join on token + pair aggregation. Exact but
    quadratic in bucket size — use on samples/candidates only; the scale
    path is minhash_lsh_pairs (which calls this on its candidates).

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    toks = _tokens(df, text_col, id_col)
    sizes = toks.select("_id", F.size("_toks").alias("_sz"))
    flat = toks.select("_id", F.explode("_toks").alias("_tok"))
    a, b = flat.alias("a"), flat.alias("b")
    inter = (
        a.join(b, (F.col("a._tok") == F.col("b._tok")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_sz").alias("_sza"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_sz").alias("_szb"))
    jac = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("_inter").cast("double")
                / (F.col("_sza") + F.col("_szb") - F.col("_inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    )


def shingles(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Word n-gram shingle sets per document, represented as xxhash64
    values of the n-gram (map-only, no per-shingle string allocation —
    hashing token longs beats concat_ws-of-slices ~2x; Jaccard over
    hashed shingles equals string-shingle Jaccard up to 2^-64
    collisions)."""
    toks = F.split(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " ")
    # token hashes must be a materialized column, NOT an inline expression:
    # expressions referenced inside a higher-order lambda are re-evaluated
    # per outer element (no CSE) — inline tok_h turns O(len) into O(len^2)
    hashed = df.select(
        F.col(id_col).alias("_id"),
        F.transform(toks, lambda s: F.xxhash64(s)).alias("_tokh"),
    )
    idx = F.sequence(F.lit(1), F.greatest(F.size("_tokh") - n + 1, F.lit(1)))
    sh = F.transform(
        idx,
        lambda i: F.xxhash64(*[F.try_element_at("_tokh", i + j) for j in range(n)]),
    )
    return hashed.select("_id", F.array_distinct(sh).alias("_shingles"))


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 32, seed: int = 42
) -> DataFrame:
    """MinHash signature per doc: for each of ``num_hashes`` seeded
    xxhash64 functions, the min over the doc's shingle hashes.

    Computed with array expressions (array_min over a transform) —
    map-only, zero shuffle: at 100 TB the signature stage is pure
    scan-side work that AQE never has to re-plan. (The alternative
    explode → 32-agg groupBy shuffles |docs|x|shingles| rows.)

    The per-seed lambda MUST take exactly one parameter: pyspark's
    ``transform`` treats a two-arg lambda as (element, index), so the
    once-used ``lambda s, i=i:`` idiom silently shadowed the seed with
    the array index — every "independent" hash became the same
    position-dependent function and near-dups with shifted minima were
    missed. Seeds are bound via a closure factory instead."""

    def _sig(i: int):
        return F.array_min(
            F.transform("_shingles", lambda s: F.xxhash64(s, F.lit(seed + i)))
        ).alias(f"h{i}")

    return shingled.select("_id", *[_sig(i) for i in range(num_hashes)])


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs via MinHash+LSH banding, verified with exact
    shingle-Jaccard. Linear candidate generation: docs colliding in ≥1
    of ``bands`` band-hashes become candidates; only candidates get the
    exact Jaccard check.

    Band geometry: 8 bands × 4 rows puts the S-curve midpoint at
    (1/8)^(1/4) ≈ 0.59. Measured note: widening recall with r=3
    (midpoint 0.50) triples wall-clock at sf0.1 — sub-threshold
    candidate mass dominates the verify join — so the default keeps
    r=4 and relies on the exact verifier for the 0.5-0.59 tail.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    rows_per_band = num_hashes // bands
    # Corpus-wide shingles are computed ONCE (signature branch). The two
    # verify sides recompute shingles only for documents that appear in a
    # candidate pair (semi-join below) — a tiny subset of the corpus at
    # any scale. Round 1 recomputed full-corpus shingles in all three
    # branches (a measured choice vs caching: 2.4s recompute vs 2.6-3.3s
    # cache-fill at sf0.1, and corpus-sized caches don't exist at
    # 100 TB); round 2 shrinks the verify branches instead, which beats
    # both.
    sh = shingles(df, n=shingle_n, text_col=text_col, id_col=id_col)
    sig = minhash_signatures(sh, num_hashes=num_hashes)
    band_cols = [
        F.xxhash64(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)], F.lit(b)).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("_id", F.explode(F.array(
        *[F.struct(F.lit(b).alias("band_no"), band_cols[b].alias("band_hash")) for b in range(bands)]
    )).alias("bb")).select("_id", "bb.band_no", "bb.band_hash")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    # Materialize the candidate-id pairs (ids only — small even when the
    # corpus is 100 TB) so the banding subtree runs exactly once instead
    # of once per verify side, then restrict the verify-side shingle
    # recompute to candidate documents via a semi-join. AQE broadcasts
    # the id set when it is small and falls back to a shuffled semi-join
    # when it is not — no driver-side collect either way.
    cand = cand.localCheckpoint(eager=True)
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    shv = shingles(
        df.join(cand_ids, id_col, "left_semi"),
        n=shingle_n,
        text_col=text_col,
        id_col=id_col,
    )
    sa = shv.select(F.col("_id").alias("id_a"), F.col("_shingles").alias("_sha"))
    sb = shv.select(F.col("_id").alias("id_b"), F.col("_shingles").alias("_shb"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("_sha", "_shb")).cast("double")
                / F.size(F.array_union("_sha", "_shb")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash of the word set: sign-aggregate each bit of the
    token hashes. Pure expressions: explode tokens → per-bit ±1 sums →
    reassemble bits. One shuffle keyed by doc id."""
    toks = _tokens(df, text_col, id_col)
    flat = toks.select("_id", F.explode("_toks").alias("_tok")).withColumn(
        "_h", F.xxhash64("_tok")
    )
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    sums = flat.groupBy("_id").agg(*bit_aggs)
    sig = sums.select(
        "_id",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(0)
                for i in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sig.withColumnRenamed("_id", id_col)


def simhash_pairs(df: DataFrame, max_hamming: int = 8, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup candidates whose SimHash Hamming distance ≤ max_hamming.
    Banding: 4 x 16-bit chunks — any pair within Hamming ≤3 of each
    other shares at least one exact chunk (pigeonhole); wider radii are
    still found when any chunk matches. Avoids the full cross join."""
    sig = simhash(df, text_col, id_col).select(
        F.col(id_col).alias("_id"), F.col("simhash")
    )
    chunks = sig.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_no"),
                        F.shiftright("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("_id", "simhash", "c.chunk_no", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_no") == F.col("b.chunk_no"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("_sa"),
            F.col("b.simhash").alias("_sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
