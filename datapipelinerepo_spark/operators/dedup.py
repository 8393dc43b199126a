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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


_MINHASH_MP = (1 << 31) - 1  # Mersenne prime 2^31-1


def _cw_constants(seed: int, num_hashes: int) -> tuple[list[int], list[int]]:
    """The Carter-Wegman (a_i, b_i) pairs — ONE derivation shared by
    the Arrow hot path and the expression reference, so the bit-
    exactness parity pin cannot be broken by editing one copy."""
    a = [
        _splitmix64(seed + 2 * i) % (_MINHASH_MP - 1) + 1
        for i in range(num_hashes)
    ]
    b = [_splitmix64(seed + 2 * i + 1) % _MINHASH_MP for i in range(num_hashes)]
    return a, b


_XXH_P1 = np.uint64(0x9E3779B185EBCA87)
_XXH_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_XXH_P3 = np.uint64(0x165667B19E3779F9)
_XXH_P4 = np.uint64(0x85EBCA77C2B2AE63)
_XXH_P5 = np.uint64(0x27D4EB2F165667C5)


def _xxh64_long(vals: np.ndarray, seed: int = 42) -> np.ndarray:
    """Spark's xxhash64 of a LONG column, vectorized (XXH64 single
    8-byte block, default seed 42) — verified bit-identical to the JVM
    expression across sign/magnitude edge values. Lets the Arrow
    MinHash path reproduce the exact base hashes the historical
    expression form computed with F.xxhash64 over the shingle longs."""
    with np.errstate(over="ignore"):
        v = np.asarray(vals, dtype=np.int64).astype(np.uint64)
        h = np.uint64(seed) + _XXH_P5 + np.uint64(8)
        h = np.broadcast_to(h, v.shape).copy()
        r31, r27, r33, r29, r32, r37 = (np.uint64(x) for x in (31, 27, 33, 29, 32, 37))
        k = v * _XXH_P2
        k = ((k << r31) | (k >> r33)) * _XXH_P1
        h ^= k
        h = ((h << r27) | (h >> r37)) * _XXH_P1 + _XXH_P4
        h ^= h >> r33
        h *= _XXH_P2
        h ^= h >> r29
        h *= _XXH_P3
        h ^= h >> r32
        return h.astype(np.int64)


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
    hash functions, the min over the doc's shingle hashes — computed
    in ONE Arrow-vectorized pass (see the in-body note), map-only,
    zero shuffle: at 100 TB the signature stage is pure scan-side
    work that AQE never has to re-plan. (The alternative explode →
    32-agg groupBy shuffles |docs|x|shingles| rows.)

    Each shingle STRING is hashed exactly once (xxhash64, JVM-side in
    shingles() → reduced mod the Mersenne prime 2³¹−1), and the
    ``num_hashes`` functions are Carter-Wegman derivations
    (a_i·h + b_i) mod 2³¹−1 over that base — the datasketch family,
    with 31-bit operands so every product stays inside signed-64. The
    round-2 per-seed ``xxhash64(s, seed_i)`` form re-hashed every
    shingle string 32 times and was 95% of the banding stage's cost;
    the round-4 expression form fixed that but stayed interpreted
    per-element (higher-order lambdas never reach codegen) — this
    Arrow form computes identical integers batch-at-a-time
    (parity pinned in test_minhash_arrow_matches_expression_form)."""

    MP = _MINHASH_MP
    a_const, b_const = _cw_constants(seed, num_hashes)
    A = np.asarray(a_const, dtype=np.int64)
    B = np.asarray(b_const, dtype=np.int64)

    # Arrow-vectorized CW minima (round-5 rewrite): the expression form
    # (array_min over nested transform lambdas) is interpreted per
    # element — 32 pmod chains per shingle never reach codegen and were
    # ~8 s of the 14 s sf1 pipeline (the same pathology the LSH bucket
    # UDF fixed, 34 s -> 2.4 s). Here the whole Arrow batch flattens
    # into ONE (total_shingles, num_hashes) int64 matrix with a
    # segment-min per doc. Integer-exact parity with the expression
    # form (same base reduction, same CW constants; products < 2^62 so
    # int64 never wraps; numpy % matches pmod's floored semantics) is
    # pinned by test_minhash_arrow_matches_expression_form. xxhash64 of
    # the shingles stays JVM-side in shingles(); still map-only, zero
    # shuffle.
    # chunk the (shingles x num_hashes) matrix so the transient stays
    # ~16 MB per task instead of Arrow-batch-sized (code-review r5: a
    # 10k-doc batch of long documents could allocate hundreds of MB)
    CHUNK = 1 << 16

    @pandas_udf("array<long>")
    def sig_udf(sh: pd.Series) -> pd.Series:
        if len(sh) == 0:
            return pd.Series([], dtype=object)
        out: list = [None] * len(sh)
        group: list = []  # (row_idx, int64 array) pending this chunk
        pending = 0

        def flush():
            nonlocal group, pending
            if not group:
                return
            flat = np.concatenate([g[1] for g in group])
            # base = pmod(xxhash64(shingle_long), MP), exactly as the
            # expression reference computes it; numpy % == pmod, MP > 0
            base = _xxh64_long(flat) % MP
            M = (base[:, None] * A[None, :] + B[None, :]) % MP
            off = 0
            for idx, arr in group:
                out[idx] = M[off : off + len(arr)].min(axis=0).tolist()
                off += len(arr)
            group, pending = [], 0

        for i, v in enumerate(sh):
            if v is None or len(v) == 0:
                continue  # no shingles -> no defined minima (stays None)
            group.append((i, np.asarray(v, dtype=np.int64)))
            pending += len(v)
            if pending >= CHUNK:
                flush()
        flush()
        return pd.Series(out)

    sig = shingled.select("_id", sig_udf(F.col("_shingles")).alias("_sig"))
    return sig.select(
        "_id",
        *[
            F.element_at("_sig", i + 1).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )


def _minhash_signatures_expr(
    shingled: DataFrame, num_hashes: int = 32, seed: int = 42
) -> DataFrame:
    """The pure-expression form of minhash_signatures (array_min over a
    CW transform) — kept as the integer-exactness REFERENCE the Arrow
    path is pinned against; not used on the hot path (interpreted
    per-element, ~16x slower at sf1)."""
    MP = _MINHASH_MP
    a_const, b_const = _cw_constants(seed, num_hashes)

    base = F.transform("_shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(MP)))

    def _sig(i: int):
        a, b = a_const[i], b_const[i]
        return F.array_min(
            F.transform(
                "_hs", lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MP))
            )
        ).alias(f"h{i}")

    return shingled.withColumn("_hs", base).select(
        "_id", *[_sig(i) for i in range(num_hashes)]
    )


def _band_rows(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(\\_id, band_no, band_hash) rows — the LSH banding of a corpus.
    Map-only per document (shingles → signatures → band hashes, no
    shuffle), so it composes per-batch: banding a union equals the
    union of the bandings, which is what makes the persisted-index
    incremental path below exact."""
    rows_per_band = num_hashes // bands
    sh = shingles(df, n=shingle_n, text_col=text_col, id_col=id_col)
    sig = minhash_signatures(sh, num_hashes=num_hashes)
    band_cols = [
        F.xxhash64(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)], F.lit(b)).alias(f"band{b}")
        for b in range(bands)
    ]
    return sig.select("_id", F.explode(F.array(
        *[F.struct(F.lit(b).alias("band_no"), band_cols[b].alias("band_hash")) for b in range(bands)]
    )).alias("bb")).select("_id", "bb.band_no", "bb.band_hash")


def _bucket_pairs(
    banded: DataFrame,
    bucket_cols: tuple[str, str] = ("band_no", "band_hash"),
    payload: str | None = None,
) -> DataFrame:
    """Candidate pairs from LSH bucket membership, WITHOUT a self-join:
    groupBy the bucket key, collect the member ids, expand in-bucket
    pairs with array expressions. One shuffle of (bucket, id) rows and
    one evaluation of whatever subtree produced ``banded`` — a
    bucket-stream self-join evaluates that subtree twice and shuffles
    both copies (measured 6× slower for MinHash banding at sf0.1).

    ``payload``: optional extra column carried next to the id (e.g. the
    SimHash signature, so the Hamming filter needs no join-back); pairs
    then expose ``{payload}_a`` / ``{payload}_b``.

    Buckets with one member emit nothing. Pair expansion is quadratic in
    bucket size BY DESIGN (that is LSH's candidate semantics); a
    degenerate bucket (mass boilerplate) is better handled by exact
    dedup upstream than by capping here, which would silently drop
    recall.
    """
    member = (
        F.struct(F.col("_id").alias("i"), F.col(payload).alias("p"))
        if payload
        else F.struct(F.col("_id").alias("i"))
    )
    grouped = (
        banded.groupBy(*bucket_cols)
        .agg(F.collect_list(member).alias("_m"))
        .filter(F.size("_m") > 1)
        # sort by id so pairs come out (low, high); materialized column,
        # not an inline expression, for the same no-CSE-in-lambdas
        # reason as shingles()
        .withColumn("_ms", F.array_sort("_m"))
    )
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    "_ms",
                    lambda x, i: F.transform(
                        F.slice(F.col("_ms"), i + 2, F.size("_ms")),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("_p")
    )
    cols = [
        F.col("_p.a.i").alias("id_a"),
        F.col("_p.b.i").alias("id_b"),
    ]
    if payload:
        cols += [
            F.col("_p.a.p").alias(f"{payload}_a"),
            F.col("_p.b.p").alias(f"{payload}_b"),
        ]
    return pairs.select(*cols)


def minhash_band_index(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The persistable LSH index of a corpus: one (id, band_no,
    band_hash) row per document per band, ~``bands``×16 bytes per doc —
    tiny next to the corpus. Write it once (bucketed by band_hash for a
    shuffle-free probe join), APPEND each ingested batch's banding, and
    nightly near-dup checks stop re-signing the historical corpus:
    only the new batch is shingled/signed (map-only), then probed
    against this table. The fresh-index and incremental paths agree
    exactly because banding is a pure per-document function."""
    return _band_rows(
        df, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        text_col=text_col, id_col=id_col,
    ).select(F.col("_id").alias(id_col), "band_no", "band_hash")


def incremental_near_dup_lsh(
    new: DataFrame,
    index: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """Which incoming documents near-duplicate something ALREADY in the
    corpus — the nightly-crawl counterpart of ``minhash_lsh_pairs``,
    against a pre-built ``minhash_band_index`` (same num_hashes/bands/
    shingle_n as the index, or band hashes won't line up).

    ``new_bands``: optionally the batch's ALREADY-computed banding (the
    ``minhash_band_index(new, ...)`` frame) — the streaming ingest
    computes it once for the index write and passes it here so the
    pandas-UDF signature pass (the dominant per-doc cost this design
    amortizes) runs once per batch, not twice (code-review r6).

    Scale shape: the historical corpus is never re-signed — the new
    batch is banded map-only, the probe join shuffles |new|×bands rows
    against the (bucketed) index, and exact-Jaccard verification
    re-shingles only candidate documents on either side (semi-joins
    into ``new`` and ``corpus``). Equals minhash_lsh_pairs over
    new ∪ corpus restricted to cross-batch pairs (tested), because
    per-document banding composes over unions.

    Output: (new_id, corpus_id, jaccard), jaccard ≥ threshold.
    """
    nb = (
        new_bands.select(
            F.col(id_col).alias("_id"), "band_no", "band_hash"
        )
        if new_bands is not None
        else _band_rows(
            new, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            text_col=text_col, id_col=id_col,
        )
    )
    cand = (
        nb.join(
            index.select(
                F.col(id_col).alias("_old_id"), "band_no", "band_hash"
            ),
            ["band_no", "band_hash"],
        )
        .select(F.col("_id").alias("new_id"), F.col("_old_id").alias("corpus_id"))
        .distinct()
        .localCheckpoint(eager=True)  # ids only — banding subtree runs once
    )
    sh_new = shingles(
        new.join(cand.select(F.col("new_id").alias(id_col)).distinct(), id_col, "left_semi"),
        n=shingle_n, text_col=text_col, id_col=id_col,
    ).select(F.col("_id").alias("new_id"), F.col("_shingles").alias("_sha"))
    sh_old = shingles(
        corpus.join(cand.select(F.col("corpus_id").alias(id_col)).distinct(), id_col, "left_semi"),
        n=shingle_n, text_col=text_col, id_col=id_col,
    ).select(F.col("_id").alias("corpus_id"), F.col("_shingles").alias("_shb"))
    return (
        cand.join(sh_new, "new_id")
        .join(sh_old, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            (
                F.size(F.array_intersect("_sha", "_shb")).cast("double")
                / F.size(F.array_union("_sha", "_shb")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", F.round("jaccard", 4).alias("jaccard"))
    )


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
    # 100 TB); round 2 shrank the verify branches; round 3 replaces the
    # candidate SELF-JOIN — whose two branches each re-ran the whole
    # shingle+signature subtree and shuffled it (measured 6.1 s of the
    # 7.5 s total at sf0.1) — with ONE groupBy on the bucket key and
    # in-bucket pair expansion (measured 0.9 s): banding is computed
    # exactly once and only (band_no, band_hash, id) rows ever shuffle.
    banded = _band_rows(
        df, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        text_col=text_col, id_col=id_col,
    )
    cand = _bucket_pairs(banded).distinct()
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
    ).localCheckpoint(eager=True)
    # ^ candidate-doc shingles materialize once; without this the sa/sb
    # branches below each re-scan the corpus and re-shingle (candidate
    # docs are a tiny slice at any scale, so the checkpoint is bounded)
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


def hamming_pairs(
    sig: DataFrame,
    sig_col: str,
    id_col: str,
    max_hamming: int = 8,
) -> DataFrame:
    """Pairs of rows whose 64-bit signatures are within ``max_hamming``
    bits — the generic banded Hamming join behind SimHash text dedup
    and perceptual-hash media dedup. Banding: 4 x 16-bit chunks — any
    pair within Hamming ≤3 shares at least one exact chunk (pigeonhole);
    wider radii are still found when any chunk matches. groupBy-bucket
    pair expansion (no self-join: the signature subtree runs once), and
    the signatures ride the pairs so the exact `bit_count` filter needs
    no join-back. Output: (id_a, id_b, hamming)."""
    s = sig.select(F.col(id_col).alias("_id"), F.col(sig_col).alias("_sig"))
    chunks = s.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_no"),
                        F.shiftright("_sig", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("_id", "_sig", "c.chunk_no", "c.chunk")
    cand = _bucket_pairs(
        chunks, bucket_cols=("chunk_no", "chunk"), payload="_sig"
    ).distinct()
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("_sig_a").bitwiseXOR(F.col("_sig_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs(df: DataFrame, max_hamming: int = 8, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup candidates whose SimHash Hamming distance ≤ max_hamming
    — the banded Hamming join (``hamming_pairs``) over the map-computed
    SimHash signatures; no full cross join at any corpus size."""
    sig = simhash(df, text_col, id_col)
    return hamming_pairs(
        sig, sig_col="simhash", id_col=id_col, max_hamming=max_hamming
    )


def simhash_verified_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Identical-WORD-SET pairs surfaced through the SimHash banding
    machinery and verified exactly: candidates are signature-equal
    pairs (Hamming 0 through the banded chunk join), then an exact
    sorted-distinct-token-array comparison keeps only true word-set
    matches. Output: (id_a, id_b), id_a < id_b.

    Unlike ``simhash_pairs`` (whose Hamming distances are a function of
    the 64-bit hash and so have no SQL twin), this composition is
    hash-INDEPENDENT by construction: SimHash is a pure function of the
    word set, so equal word sets always collide at Hamming 0 and are
    always candidates (recall = 1, not an empirical property of the
    corpus), and the exact verify removes any hash-collision false
    positives — the output is exactly the equal-word-set pairs, which a
    relational oracle reproduces with a sort+join. Scale shape: the
    token-array join-back touches candidate docs only (bounded), same
    as the MinHash verify branch."""
    sig = simhash(df, text_col, id_col)
    cand = hamming_pairs(sig, sig_col="simhash", id_col=id_col, max_hamming=0)
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.array_sort(
            F.array_distinct(F.split(F.col(text_col), r"\s+"))
        ).alias("_ws"),
    )
    a = toks.select(F.col("_id").alias("id_a"), F.col("_ws").alias("_wa"))
    b = toks.select(F.col("_id").alias("id_b"), F.col("_ws").alias("_wb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("_wa") == F.col("_wb"))
        .select("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Cross-batch incremental dedup: bloom prefilter + exact verify
# ---------------------------------------------------------------------------


def _digest_bit_positions(digest_col, m_bits: int, k: int, seed: int):
    """k bloom bit positions per digest, computed JVM-side (xxhash64
    with k seeds, mod m) so no Python touches the full input."""
    return F.array(
        *[
            F.pmod(F.xxhash64(digest_col, F.lit(seed + i)), F.lit(m_bits))
            for i in range(k)
        ]
    )


def digest_bloom_bitmap(
    digests: DataFrame,
    digest_col: str = "digest",
    m_bits: int = 1 << 23,
    k: int = 5,
    seed: int = 101,
) -> bytes:
    """Bloom bitmap of a digest column. Sizing: m ≈ 9.6·n bits gives
    ~1% false positives (m/n = -k/ln(1-fpp^(1/k)) at k=5); the default
    1 MiB bitmap covers ~870k digests at 1%.

    Build is map-only: bit positions come from JVM xxhash64, each
    partition folds its positions into a local bitmap (one Arrow
    batch stream), and the driver ORs the per-partition bitmaps — a
    bounded collect of n_partitions × m/8 bytes, the same footprint
    class as building any broadcast side. At extreme partition counts,
    OR-reduce in a tree (treeAggregate) instead of at the driver."""
    positions = digests.select(
        F.explode(
            _digest_bit_positions(F.col(digest_col), m_bits, k, seed)
        ).alias("pos")
    )
    n_bytes = (m_bits + 7) // 8

    def to_bitmap(batches):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            pos = pdf["pos"].to_numpy()
            np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    parts = positions.mapInPandas(to_bitmap, "bitmap binary").collect()
    out = np.zeros(n_bytes, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(r["bitmap"], dtype=np.uint8)
    return out.tobytes()


def incremental_dedup_bloom(
    new: DataFrame,
    history: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 23,
    k: int = 5,
    seed: int = 101,
) -> DataFrame:
    """Rows of ``new`` whose text digest does NOT appear in ``history``
    — cross-batch incremental dedup, the nightly "what of today's crawl
    is actually new" step.

    Result is EXACTLY the plain digest anti-join (oracle-checkable):
    the bloom filter has no false negatives, so rows it rejects are
    definitely new and skip the join entirely; only might-contain
    candidates (true matches + ~1% false positives) enter the exact
    digest semi-verify. At 100 TB that is the difference between
    shuffling the whole incoming batch against the historical digest
    table and shuffling only the candidate slice; the bitmap itself
    broadcasts (spark.sparkContext.broadcast) instead of riding every
    task closure.

    Known cost shape: the two output branches (definitely-new filter,
    candidate anti-join) reference the staged plan twice, so the
    incoming batch is scanned twice and md5 + the bloom UDF recomputed
    on the second branch. Deliberate: the alternative persists the full
    staged batch (a second copy of the data in cache at 100 TB, plus
    eviction pressure), while the recompute is a columnar re-scan plus
    vectorized hashing with zero memory footprint — the same measured
    recompute-beats-cache trade as the MinHash shingle branches above.
    If a lakehouse table backs ``new``, localCheckpoint the slim
    (id, digest, maybe) projection instead and semi-join ids back."""
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    hist_digests = history.select(F.md5(F.col(text_col)).alias("_digest")).distinct()
    bitmap = digest_bloom_bitmap(hist_digests, "_digest", m_bits, k, seed)
    sc = SparkSession.getActiveSession().sparkContext
    bc = sc.broadcast(bitmap)

    @pandas_udf("boolean")
    def might_contain(pos: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        P = np.asarray([np.asarray(p) for p in pos])  # (n, k)
        hit = (bm[P >> 3] & (1 << (P & 7)).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    staged = new.withColumn("_digest", F.md5(F.col(text_col))).withColumn(
        "_maybe",
        might_contain(_digest_bit_positions(F.col("_digest"), m_bits, k, seed)),
    )
    definitely_new = staged.filter(~F.col("_maybe"))
    rescued = staged.filter(F.col("_maybe")).join(
        hist_digests, on="_digest", how="left_anti"
    )
    return definitely_new.unionByName(rescued).drop("_digest", "_maybe")


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Containment similarity C(A,B) = |A∩B| / min(|A|,|B|) over word
    sets — the asymmetric-overlap complement of ``jaccard_pairs``: a
    short document quoted inside a long one scores containment ≈ 1
    while its Jaccard stays low (the union is dominated by the long
    doc), so Jaccard-thresholded dedup never sees it. Same plan shape
    and cost class as jaccard_pairs (explode + token equi-join + pair
    aggregation — quadratic within token groups, use on samples or LSH
    candidates); at scale, run it on the SAME candidate pairs the
    MinHash banding emits, as a second verifier column.

    Output: (id_a, id_b, containment) with id_a < id_b, ≥ threshold.
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
    cont = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("_inter").cast("double")
                / F.least(F.col("_sza"), F.col("_szb")).cast("double")
            ).alias("containment"),
        )
    )
    return cont.filter(F.col("containment") >= threshold).select(
        "id_a", "id_b", F.round("containment", 4).alias("containment")
    )


def edit_distance_pairs(
    df: DataFrame,
    k: int = 3,
    q: int = 4,
    head_len: int = 120,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Scalable edit-distance similarity join (Ed-Join-shaped, Xiao et
    al. 2008): pairs of document heads within Levenshtein distance
    ``k``, WITHOUT the all-pairs cross join the brute-force form needs.

    Filter theory: k edits destroy at most k·q of a string's q-grams,
    so two strings within distance k share all but ~k·q grams — by the
    prefix-filtering argument, each string only needs to index its
    k·q+1 globally-RAREST grams (rarity = corpus gram frequency, total
    order (freq, gram)) and every qualifying pair must collide on at
    least one indexed gram. A length-difference > k pair can be
    discarded outright. Candidates from gram-bucket pair expansion
    (the shared _bucket_pairs machinery — one shuffle, no self-join),
    then EXACT Levenshtein verification, so false candidates cost time,
    never correctness; with heavily repeated grams inside one head the
    prefix bound thins (occurrence renumbering), which the planted-dup
    tests and the exact-all-pairs oracle twin check empirically — the
    verification-not-trust posture of the MinHash family.

    Scale shape: gram frequency is one vocabulary-sized aggregate; the
    prefix cut bounds index size at (k·q+1) rows per doc; buckets are
    keyed on rare grams (bounded width by construction). The exact
    verify touches candidates only."""
    heads = df.select(
        F.col(id_col).alias("_id"),
        F.substring(F.col(text_col), 1, head_len).alias("_h"),
    )
    grams = heads.select(
        "_id",
        F.length("_h").alias("_len"),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length("_h") - (q - 1), F.lit(1))),
                    lambda i: F.substring(F.col("_h"), i, F.lit(q)),
                )
            )
        ).alias("_g"),
    )
    freq = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_f"))
    w = Window.partitionBy("_id").orderBy("_f", "_g")
    prefix = (
        grams.join(freq, "_g")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k * q + 1)
        .select("_id", "_g", "_len")
    )
    # Short-head completeness (ADVICE r4): the prefix bound only holds
    # when BOTH strings have > k·q distinct grams — k edits can destroy
    # ALL grams of a head with ≤ k·q of them (e.g. 'ab' vs 'ac' at
    # q=4 share no gram at distance 1). Any distance-≤k neighbor of
    # such a head has ≤ 2·k·q distinct grams (each edit introduces at
    # most q new grams), so routing every ≤ 2·k·q-gram head through
    # shared buckets restores the guarantee. Buckets are length-banded
    # (width k+1, each head emitted to its band and band+1, so any
    # |len diff| ≤ k pair shares a bucket) to keep pair expansion
    # quadratic only within a 2(k+1)-char shortness window, not across
    # the whole short subpopulation.
    gram_counts = grams.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_ng"), F.first("_len").alias("_len")
    )
    # marker is q+1 NULs + "short:" + band: longer than q chars, so it
    # can never equal a real q-gram (grams are substrings of length <= q)
    short_marker = F.concat(
        F.lit("\x00" * (q + 1) + "short:"),
        ((F.col("_len") / (k + 1)).cast("long") + F.col("_bo")).cast("string"),
    )
    short = (
        gram_counts.filter(F.col("_ng") <= 2 * k * q)
        .select(
            "_id",
            "_len",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("_bo"),
        )
        .select("_id", short_marker.alias("_g"), "_len")
    )
    cand = (
        _bucket_pairs(prefix.unionByName(short), bucket_cols=("_g",), payload="_len")
        .filter(F.abs(F.col("_len_a") - F.col("_len_b")) <= k)
        .select("id_a", "id_b")
        .distinct()
    )
    ha = heads.select(F.col("_id").alias("id_a"), F.col("_h").alias("_ha"))
    hb = heads.select(F.col("_id").alias("id_b"), F.col("_h").alias("_hb"))
    # bounded Levenshtein: the 3-arg form early-exits past k (banded
    # O(k*n) DP instead of O(n^2), returns -1 when exceeded) — the
    # verify is the dominant cost and almost every candidate misses
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("edit_dist", F.levenshtein("_ha", "_hb", k))
        .filter(F.col("edit_dist") >= 0)
        .select("id_a", "id_b", "edit_dist")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    k: int = 3,
    window: int = 4,
    key_len: int = 24,
    head_len: int = 120,
    passes: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sorted-neighborhood dedup (Hernandez & Stolfo 1995): sort the
    corpus by a normalized blocking key (lowercased head prefix), slide
    a window of ``window`` positions, and exact-verify only pairs
    inside it — the classic record-linkage blocking family beside
    LSH/prefix-filter banding. Near-identical heads sort adjacent, so a
    small window catches them at linear candidate cost (corpus ×
    window), trading the prefix filter's completeness guarantee for
    radically fewer candidates; the standard remedy for sort-boundary
    misses is multi-pass with rotated keys, not a wider window.

    Output: (id_a, id_b, edit_dist) for in-window pairs within
    Levenshtein ``k`` of each other's heads.

    Scale shape: positions come from sampling.global_order_positions
    (range-bucketed rank + broadcast offsets — NO corpus-sized global
    window); the neighborhood join is a pure EQUI-join on position
    (each row explodes ``window`` offset probes), so Catalyst plans a
    hash join, never a range join; the Levenshtein verify touches only
    corpus × window × passes candidate rows.

    ``passes=2`` adds the standard multi-pass remedy for sort-boundary
    misses: a second pass sorted by the REVERSED head prefix, so pairs
    that diverge early but agree late (which the forward key scatters)
    sort adjacent in the rotated order; results union distinct. Each
    pass is an independent sort/window — recall compounds the way LSH
    tables do, and the cost stays linear.

    r14 (optimization): the per-pass BOUNDARY SAMPLING was the measured
    dominant cost — global_order_positions' internal sampler ran one
    distinct+sort collect job PER PASS, each computing the pass's key
    expression over the whole corpus (~2 s of the ~3 s sf0.1 total;
    the join tower itself collapses to broadcasts + reused exchanges at
    runtime). Both passes now share ONE boundary-sample job that
    hash-samples ROWS first (1/m of the corpus) and evaluates every
    pass's key on the sample only; the boundaries feed
    global_order_positions(boundaries=...) so its internal sampler is
    skipped. Boundary choice never affects results (any
    order-consistent bucketing yields exact positions — see
    global_order_positions); only bucket balance differs, and
    row-sampled quantiles balance buckets by row count, which is the
    axis that matters. A full lead-window restructure (in-bucket pairs
    via lead() + seam repair) was prototyped and measured SLOWER at
    sf0.1 (+0.2..1.1 s: its checkpoint barriers and extra corpus sorts
    cost more than the join tower it removed), so the equi-join
    structure stays.

    r15 (optimization, guide §2.2/§2.4): both passes run through ONE
    position tower instead of one tower per pass. The corpus explodes
    to (pass, key, id, head) rows — each rotation is just a value of
    the ``_p`` column — positions come from a single rank-with-offsets
    computation partitioned by (_p, bucket) with per-pass cumulative
    offsets, and the window probe join keys on (_p, position).
    Per-pass positions are identical to the per-pass towers by
    construction (the rank window never crosses passes, offsets
    accumulate within a pass), so the candidate sets and the verified
    output are unchanged (oracle re-proven). What changes is the plan:
    one counts aggregate, one rank shuffle, one probe join and one
    verify instead of two of each — half the Exchanges/stages carrying
    the same total bytes (guide §2.2: fewer, larger shuffles)."""
    from .sampling import bucket_chain

    if passes not in (1, 2):
        raise ValueError(
            f"sorted_neighborhood_pairs: passes must be 1 or 2 (only the "
            f"forward and reversed-head rotations are defined), got {passes}"
        )
    n_buckets = 32
    base = df.select(
        F.col(id_col).alias("_id"),
        F.substring(F.col(text_col), 1, head_len).alias("_h"),
    )
    key_exprs = [F.substring(F.lower(F.col("_h")), 1, key_len)]
    if passes >= 2:
        key_exprs.append(F.substring(F.reverse(F.lower(F.col("_h"))), 1, key_len))
    key_exprs = key_exprs[:passes]

    # ONE deterministic row-sample job yields boundary candidates for
    # EVERY pass (the per-pass sampler was the measured dominant cost —
    # two distinct+sort collect jobs, each computing its key on the
    # whole corpus): rows are sampled by id-hash BEFORE any key is
    # computed, keys evaluated on the sample only, both rotations
    # carried through one explode, ordered BY SPARK ITSELF per pass
    # (collation safety — a Python sort could disagree on non-ASCII and
    # break bucket monotonicity). Boundary CHOICE never affects results
    # (any order-consistent bucketing is exact); only balance differs,
    # and row-sampled quantiles balance buckets by row count, which is
    # the axis that matters. The modulus grows until the distinct
    # sample fits the cap, as in the value-sampled machinery.
    cap, m = 8192, 16
    while True:
        sampled = (
            base.filter(F.pmod(F.xxhash64(F.col("_id")), F.lit(m)) == 0)
            .select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(i).alias("_p"), key_exprs[i].alias("_v")
                            )
                            for i in range(passes)
                        ]
                    )
                ).alias("_e")
            )
            .select(F.col("_e._p").alias("_p"), F.col("_e._v").alias("_v"))
            .filter(F.col("_v").isNotNull())
            .distinct()
            .orderBy("_p", "_v")
            .limit(passes * cap + 1)
            .collect()
        )
        per_pass: dict[int, list] = {i: [] for i in range(passes)}
        for r in sampled:
            per_pass[r[0]].append(r[1])
        if len(sampled) <= passes * cap and all(
            len(v) <= cap for v in per_pass.values()
        ):
            break
        m *= 8
    boundaries: list[list] = []
    for i in range(passes):
        vals = per_pass[i]
        step = max(1, len(vals) // n_buckets)
        boundaries.append(vals[step - 1 :: step][: n_buckets - 1])

    # one (pass, key, id, head) frame for every rotation; per-pass
    # bucket assignment dispatches on _p over the pass's own sampled
    # boundaries (the when-chain per pass is the same bucket_chain the
    # per-pass towers used)
    rows = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("_p"), key_exprs[i].alias("_key")
                    )
                    for i in range(passes)
                ]
            )
        ).alias("_e"),
        "_id",
        "_h",
    ).select(
        F.col("_e._p").alias("_p"), F.col("_e._key").alias("_key"), "_id", "_h"
    )
    bucket = bucket_chain(F.col("_key"), boundaries[0])
    for i in range(1, passes):
        bucket = F.when(
            F.col("_p") == i, bucket_chain(F.col("_key"), boundaries[i])
        ).otherwise(bucket)
    bucketed = rows.withColumn("_b", bucket)
    counts = bucketed.groupBy("_p", "_b").agg(F.count(F.lit(1)).alias("_n"))
    woff = (
        Window.partitionBy("_p")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_p", "_b", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )  # ≤ passes·(n_buckets+1) rows: bounded windows, not corpus-sized
    wrank = Window.partitionBy("_p", "_b").orderBy(
        F.col("_key").asc(), F.col("_id").asc()
    )
    pos = (
        bucketed.join(F.broadcast(offsets), ["_p", "_b"])
        .withColumn("pos", F.col("_off") + F.row_number().over(wrank) - 1)
        .drop("_b", "_off", "_key")
    )
    a = pos.select(
        "_p",
        F.col("_id").alias("id_a"),
        F.col("_h").alias("_ha"),
        F.col("pos").alias("_pa"),
    )
    probes = a.select(
        "_p",
        "id_a",
        "_ha",
        "_pa",
        F.explode(F.array(*[F.lit(o) for o in range(1, window + 1)])).alias("_o"),
    ).select("_p", "id_a", "_ha", (F.col("_pa") + F.col("_o")).alias("_pb"))
    b = pos.select(
        "_p",
        F.col("_id").alias("id_b"),
        F.col("_h").alias("_hb"),
        F.col("pos").alias("_pb"),
    )
    cand = probes.join(b, ["_p", "_pb"])
    # bounded 3-arg Levenshtein: banded O(k*n) DP with early exit,
    # -1 when the distance exceeds k — the window produces corpus x
    # window candidates and nearly all miss, so the full O(n^2) DP
    # was the dominant cost (measured 3.5 s -> sub-second at sf0.1)
    out = (
        cand.withColumn("edit_dist", F.levenshtein("_ha", "_hb", k))
        .filter(F.col("edit_dist") >= 0)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "edit_dist",
        )
    )
    return out.distinct() if passes > 1 else out
