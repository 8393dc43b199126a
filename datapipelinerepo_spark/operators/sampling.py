"""Deterministic sampling / data-mix rebalancing.

Training-data pipelines control the MIX (per-language / per-source
shares), not just the volume. The operators here use content-hash
uniforms (md5 of the row id) instead of rand(): the decision for a row
is a pure function of the row, so results are identical across engines,
runs, partitionings, and cluster sizes — which makes the sampled mix
reproducible AND oracle-checkable.

Scale shape: the per-group counts are a tiny aggregate that broadcasts
back onto the corpus scan; the accept test is a map-side expression.
One shuffle for the counts, zero for the sampling itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^32 — the md5-prefix uniform below is 8 hex chars = 32 bits
_U32 = 4294967296.0


def hash_uniform_u32(id_col) -> "F.Column":
    """First 32 bits of md5(id) as a long in [0, 2^32) — the engine-
    portable uniform (DuckDB: CAST('0x' || substr(md5(id),1,8) AS
    BIGINT))."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")


def rebalance_mix(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Balanced downsampling: every group is sampled at rate
    min_group_count / group_count, so all groups land at the smallest
    group's size in expectation — the "flatten the language mix" step.

    Accept rule: h32 < floor(min_n * 2^32 / n_g), with the arithmetic
    in double (IEEE — identical in any engine, and immune to the int64
    overflow min_n * 2^32 hits at 10^10-row corpora) and an EXPLICIT
    floor: a bare double→int cast truncates in Spark but rounds
    half-away in DuckDB, which would shift the threshold by one on
    half-fraction boundaries and flip the boundary row. The per-group
    thresholds come from one small aggregate that broadcasts; the
    accept test itself is map-side — the corpus does not shuffle to be
    sampled."""
    # null-safe group join: a NULL group key is a real group — the
    # plain USING join dropped its rows while the count still skewed
    # every other group's rate (code-review r5)
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumnRenamed(group_col, "_g")
    )
    mn = counts.agg(F.min("_n").alias("_mn"))
    thr = F.floor(F.col("_mn") * F.lit(_U32) / F.col("_n")).cast("long")
    return (
        df.join(F.broadcast(counts), F.col(group_col).eqNullSafe(F.col("_g")))
        .crossJoin(F.broadcast(mn))
        .filter(hash_uniform_u32(id_col) < thr)
        .drop("_g", "_n", "_mn")
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.3,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mix reshaping: target group shares ∝ p_g^alpha
    (p_g = the group's natural share) — the standard multilingual /
    multi-source sampling rule (alpha=1 keeps the natural mix, alpha=0
    flattens to uniform like ``rebalance_mix``, alpha≈0.3 is the usual
    up-weight-the-tail compromise). Pure downsampling: each group keeps
    rate min(1, (target share / natural share) · s) with the global
    scale s chosen so the most-overshooting group caps at rate 1 — no
    row is ever duplicated, so the output is a subset and the decision
    per row stays the content-hash uniform (deterministic,
    engine-portable, oracle-checkable).

    Same scale shape as rebalance_mix: one tiny counts aggregate
    broadcasts back; the accept test is map-side."""
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumnRenamed(group_col, "_g")
    )
    # weight_g = n_g^alpha; keep-rate_g ∝ weight_g / n_g, scaled so the
    # max rate is exactly 1 (pure downsampling, no duplication)
    w = F.pow(F.col("_n").cast("double"), F.lit(alpha))
    rated = counts.select(
        "_g", "_n", (w / F.col("_n").cast("double")).alias("_r")
    )
    mx = rated.agg(F.max("_r").alias("_rmax"))
    thr = F.floor(F.col("_r") / F.col("_rmax") * F.lit(_U32)).cast("long")
    return (
        # null-safe for the same reason as rebalance_mix
        df.join(F.broadcast(rated), F.col(group_col).eqNullSafe(F.col("_g")))
        .crossJoin(F.broadcast(mx))
        .filter(hash_uniform_u32(id_col) < thr)
        .drop("_g", "_n", "_r", "_rmax")
    )


def sample_exact_per_group(
    df: DataFrame,
    n_per_group: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACTLY ``n_per_group`` rows per group (or the whole group when
    smaller), chosen deterministically: rank rows inside each group by
    their content-hash uniform (id tie-break) and keep the first n.
    The rate-based samplers above hit target sizes only in expectation;
    eval-set carving and per-class caps need exact counts. Cost: one
    shuffle on the group key for the ranking window — the rows that
    ride it are whatever columns the caller kept, so project first at
    scale. Same reproducibility contract as the rest of this module:
    the kept set is a pure function of row content, independent of
    partitioning, run, or engine."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_uniform_u32(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= n_per_group)
        .drop("_rnk")
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split",
    train_hi: str = "cc",
    valid_hi: str = "e6",
) -> DataFrame:
    """Deterministic train/valid/test assignment: the first md5 byte of
    the salted id picks the split by hex-prefix range — '00'..train_hi
    → train (default 'cc' ≈ 79.7%), ..valid_hi → valid (≈ 10.2%), rest
    → test. The assignment is a pure function of (salt, id): stable
    across runs, engines, partitionings, and corpus growth (a new row
    never moves an old row between splits, unlike rand() or
    randomSplit). Changing ``salt`` re-deals the whole corpus — the
    standard "fold" knob.

    Scale shape: map-only expression fused into the scan; zero
    shuffles. The split column is what a training pipeline partitions
    its output write by."""
    h = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 2
    )
    split = (
        F.when(h < F.lit(train_hi), F.lit("train"))
        .when(h < F.lit(valid_hi), F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def global_shuffle_positions(
    df: DataFrame, id_col: str = "doc_id", salt: str = "epoch0"
) -> DataFrame:
    """Deterministic global shuffle order: every row gets a unique
    position 0..n-1 in md5-of-salted-id order (id tie-break) — the
    "shuffle the corpus for this epoch" primitive, reproducible across
    engines and cluster sizes; a new ``salt`` is a new permutation.

    A naive ROW_NUMBER() OVER (ORDER BY hash) forces the whole corpus
    through ONE partition (Spark's empty-frame global window). This
    instead uses the classic sort-with-offsets shape: rows bucket by
    their first hash byte (256 buckets, which IS the hash order
    prefix), rank within the bucket, and add the broadcast cumulative
    bucket offsets — rank-within + offset = exact global position.
    Scale: one shuffle on the bucket key for the per-bucket window, a
    256-row aggregate for the offsets; at 100 TB widen the prefix to 2
    bytes (65536 buckets) to keep buckets executor-sized."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    bucketed = df.withColumn("_h", h).withColumn(
        "_b", F.conv(F.substring("_h", 1, 2), 16, 10).cast("int")
    )
    counts = bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )  # 256-row frame: the global window here is bounded, not corpus-sized
    wrank = Window.partitionBy("_b").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return (
        bucketed.join(F.broadcast(offsets), "_b")
        .withColumn("pos", F.col("_off") + F.row_number().over(wrank) - 1)
        .drop("_h", "_b", "_off")
    )


def global_order_positions(
    df: DataFrame,
    order_cols: tuple[str, ...],
    n_buckets: int = 32,
    boundaries: list | None = None,
) -> DataFrame:
    """Exact global position 0..n-1 of every row in ``order_cols``
    order, WITHOUT a corpus-sized global window — the value-ordered
    sibling of global_shuffle_positions (which buckets by a hash
    prefix; here the sort key is a data value, so buckets come from
    range boundaries instead).

    ``order_cols`` MUST form a total order (append a unique id as the
    last column, as every in-repo caller does): with ties the
    within-bucket row_number is partitioning-dependent and positions
    stop being reproducible (code-review r5).

    Shape: approx-percentile boundaries of the leading sort column
    (one pass, a ≤ n_buckets-scalar driver collect — bounded by
    construction), monotonic bucket assignment by boundary, rank
    within bucket by the FULL sort key, plus broadcast cumulative
    bucket offsets. Bucket balance only affects performance, never
    correctness: any order-consistent bucketing gives exact positions
    because ties on the leading column always land in one bucket and
    the within-bucket window breaks them on the remaining columns.
    This is what repartitionByRange + per-partition rank does
    internally, made explicit so the offsets join stays visible to the
    plan lint. At 100 TB raise n_buckets so each range bucket fits an
    executor (the same knob as the shuffle-positions byte-prefix).

    ``boundaries``: pre-sampled sorted boundary values for the leading
    column. Callers that already hold order-consistent boundaries (e.g.
    a multi-pass operator sampling all its sort rotations in ONE job)
    pass them here to skip the internal per-call sampling job; any
    order-consistent boundary list is exact (see above), so the choice
    of sampler never affects results."""
    from pyspark.sql import Window

    if boundaries is None:
        bucket = order_bucket_column(df, order_cols[0], n_buckets)
    else:
        bucket = bucket_chain(F.col(order_cols[0]), boundaries)
    bucketed = df.withColumn("_b", bucket)
    counts = bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )  # ≤ n_buckets+1 rows: bounded global window, not corpus-sized
    wrank = Window.partitionBy("_b").orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        bucketed.join(F.broadcast(offsets), "_b")
        .withColumn("pos", F.col("_off") + F.row_number().over(wrank) - 1)
        .drop("_b", "_off")
    )


def order_bucket_column(df: DataFrame, lead: str, n_buckets: int):
    """The range-bucket assignment expression global_order_positions is
    built on, exposed so order-local operators (sorted-neighborhood
    windows) can reuse the bucketing WITHOUT paying for global
    positions on every row: a monotonic ``when``-chain over sampled
    boundaries of ``lead`` (approx-percentile sketch for orderable
    numeric/temporal keys, deterministic hash-sample ordered by Spark
    itself otherwise), NULLs pinned to their own first bucket (-1).
    Any order-consistent bucketing is correct for every caller — ties
    on ``lead`` always land in ONE bucket; balance only affects
    performance."""
    from pyspark.sql.types import DateType, NumericType, TimestampType

    if isinstance(df.schema[lead].dataType, (NumericType, DateType, TimestampType)):
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = df.select(
            F.percentile_approx(
                F.col(lead), F.array(*[F.lit(p) for p in probs]), 10000
            )
        ).first()[0]
        uniq = sorted(set(b for b in (bounds or []) if b is not None))
    else:
        # non-numeric sort key (e.g. a string blocking key): no sketch
        # exists, so boundaries come from a deterministic hash-sample,
        # ORDERED BY SPARK ITSELF (collation must be the engine's own —
        # a Python sort could disagree on non-ASCII and break bucket
        # monotonicity). The sample cap keeps the collect bounded; the
        # modulus grows until the distinct sample fits, so at 100 TB
        # this is one or two cheap lead-column scans.
        cap, m = 8192, 16
        while True:
            vals = [
                r[0]
                for r in df.select(F.col(lead).alias("_lv"))
                .filter(F.col("_lv").isNotNull())
                .filter(F.pmod(F.xxhash64(F.col("_lv")), F.lit(m)) == 0)
                .distinct()
                .orderBy("_lv")
                .limit(cap + 1)
                .collect()
            ]
            if len(vals) <= cap:
                break
            m *= 8
        step = max(1, len(vals) // n_buckets)
        uniq = vals[step - 1 :: step][: n_buckets - 1]
    return bucket_chain(F.col(lead), uniq)


def bucket_chain(lead_col, uniq: list):
    """Monotonic range-bucket assignment over sorted boundary values:
    the ``when``-chain both order-bucketing entry points build. NULL
    lead keys: `NULL <= bound` is NULL and would fall through to the
    LAST bucket, ranking NULLs mid-order and boundary-dependent
    (code-review r5). Pin them to their own first bucket instead —
    positions then follow Spark's own ASC NULLS FIRST total order
    regardless of where the sampled boundaries land. (A DuckDB oracle
    over NULL-bearing keys must say NULLS FIRST explicitly; its
    default is NULLS LAST.)"""
    bucket = F.lit(len(uniq))
    for i in reversed(range(len(uniq))):
        bucket = F.when(lead_col <= F.lit(uniq[i]), F.lit(i)).otherwise(bucket)
    return F.when(lead_col.isNull(), F.lit(-1)).otherwise(bucket)


def global_desc_rank_cumsum(
    df: DataFrame,
    desc_col: str,
    tie_col: str,
    value_col: str,
    n_buckets: int = 32,
    cap: int = 8192,
) -> DataFrame:
    """Exact global 1-based rank (``_rn``) and inclusive running sum of
    ``value_col`` (``_cum``) in (``desc_col`` DESC, ``tie_col`` ASC)
    order — WITHOUT a corpus-sized global window. The generalization of
    global_order_positions to "rank + cumulative quantity", the shape
    behind coverage curves (top-K token coverage) and budgeted
    selection (take documents in quality order until a token budget).

    Mechanics (r6, the text_vocab_coverage treatment):
    - composite range boundaries from a bounded hash-sample of
      (desc_col, tie_col) ordered BY SPARK ITSELF (≤``cap``-row collect
      with a growth-modulus loop). Sampling the COMPOSITE key matters
      under skew: a Zipf-shaped desc_col has huge tie classes (half a
      vocabulary sits at count=1) that single-column boundaries would
      collapse into one task; composite boundaries split them on the
      tie column.
    - per-bucket row_number + running SUM windows (partitioned), plus
      per-bucket (rows, value-sum) offsets from a ≤n_buckets² triangular
      broadcast join (bounded by construction).
    Any order-consistent bucketing yields exact globals because the
    full (desc, tie) key is unique — (``tie_col`` MUST be unique and
    both key columns non-null, as for global_order_positions).

    The caller should pass an already-cheap frame (aggregate result or
    localCheckpoint'ed): boundary sampling runs one eager job over it.
    At 100 TB raise n_buckets so a bucket fits an executor."""
    from pyspark.sql import Window

    m = 16
    while True:
        vals = (
            df.filter(F.pmod(F.xxhash64(F.col(tie_col)), F.lit(m)) == 0)
            .select(desc_col, tie_col)
            .orderBy(F.col(desc_col).desc(), F.col(tie_col).asc())
            .limit(cap + 1)
            .collect()
        )
        if len(vals) <= cap:
            break
        m *= 8
    step = max(1, len(vals) // n_buckets)
    bounds = vals[step - 1 :: step][: n_buckets - 1]
    bucket = F.lit(len(bounds))
    for i in reversed(range(len(bounds))):
        at_or_before = (F.col(desc_col) > F.lit(bounds[i][desc_col])) | (
            (F.col(desc_col) == F.lit(bounds[i][desc_col]))
            & (F.col(tie_col) <= F.lit(bounds[i][tie_col]))
        )
        bucket = F.when(at_or_before, F.lit(i)).otherwise(bucket)
    bucketed = df.withColumn("_b", bucket)
    counts = bucketed.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_n"), F.sum(value_col).alias("_s")
    )
    prior = counts.select(
        F.col("_b").alias("_pb"), F.col("_n").alias("_pn"), F.col("_s").alias("_ps")
    )
    offsets = (
        counts.join(F.broadcast(prior), F.col("_pb") < F.col("_b"), "left")
        .groupBy("_b")
        .agg(
            F.coalesce(F.sum("_pn"), F.lit(0)).alias("_off_n"),
            F.coalesce(F.sum("_ps"), F.lit(0)).alias("_off_s"),
        )
    )
    wrank = Window.partitionBy("_b").orderBy(
        F.col(desc_col).desc(), F.col(tie_col).asc()
    )
    wsum = wrank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        bucketed.join(F.broadcast(offsets), "_b")
        .withColumn("_rn", F.col("_off_n") + F.row_number().over(wrank))
        .withColumn("_cum", F.col("_off_s") + F.sum(value_col).over(wsum))
        .drop("_b", "_off_n", "_off_s")
    )


def length_buckets(
    df: DataFrame,
    text_col: str = "text",
    caps: tuple[int, ...] = (64, 128, 256, 512, 1024),
) -> DataFrame:
    """Sequence-length bucketing report: assign each document to the
    smallest power-of-two token cap that fits it, then account for the
    padding a fixed-cap batcher would burn per bucket (cap·n − Σtok)
    and what dynamic per-batch padding would burn instead
    (max_in_bucket·n − Σtok). The table a training pipeline reads to
    pick bucket boundaries and to size packing (sequence_packing is
    the remedy when pad_ratio is high).

    All-integer aggregation over a map-side token count — one tiny
    groupBy, no payload shuffle; ratios are int/int divisions rounded
    6dp, engine-exact."""
    n_tok = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0)))
    cap = F.lit(None).cast("long")
    for c in reversed(caps):
        cap = F.when(n_tok <= c, F.lit(c)).otherwise(cap)
    cap = F.coalesce(cap, F.lit(-1))  # -1 = overflow bucket (> max cap)
    agg = (
        df.select(n_tok.alias("_nt"), cap.alias("bucket_cap"))
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("sum_tokens"),
            F.max("_nt").alias("max_tokens"),
        )
    )
    fixed_cap = F.when(F.col("bucket_cap") > 0, F.col("bucket_cap")).otherwise(
        F.col("max_tokens")
    )
    waste_fixed = fixed_cap * F.col("n_docs") - F.col("sum_tokens")
    waste_dyn = F.col("max_tokens") * F.col("n_docs") - F.col("sum_tokens")
    return agg.select(
        "bucket_cap",
        "n_docs",
        "sum_tokens",
        "max_tokens",
        waste_fixed.alias("pad_fixed"),
        waste_dyn.alias("pad_dynamic"),
        F.round(
            waste_fixed.cast("double") / (fixed_cap * F.col("n_docs")), 6
        ).alias("pad_ratio_fixed"),
    )
