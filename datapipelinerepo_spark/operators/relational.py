"""Core relational operators — SURVEY.md §2.2-§2.6 as composable
DataFrame functions. Everything stays declarative so Catalyst does
pushdown / pruning / join-strategy selection (SURVEY.md §4: zero custom
rules needed for parity).
"""

from __future__ import annotations

import functools
from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ---------------------------------------------------------------------------
# Projections / filters (P1-P9)
# ---------------------------------------------------------------------------


def point_lookup(df: DataFrame, col: str, value) -> DataFrame:
    """P1 equality filter (`WHERE TBL_NM='x'`, pipeline.py:28;
    `WHERE State='GA'`, datasources.py:171). Pushed to the parquet scan."""
    return df.filter(F.col(col) == F.lit(value))


def in_list(df: DataFrame, col: str, values: Iterable) -> DataFrame:
    """P2 IN-list (`WHERE YEAR IN ('2022','2023')`, datasources.py:548).
    Handles the reference's 1-element special case uniformly."""
    return df.filter(F.col(col).isin(list(values)))


def below_or_null(df: DataFrame, col: str, threshold) -> DataFrame:
    """P3 range+null disjunction (`cntcheck < 2 OR cntcheck IS NULL`,
    datasources.py:645-646)."""
    c = F.col(col)
    return df.filter((c < F.lit(threshold)) | c.isNull())


def month_filter(df: DataFrame, col: str, month: int) -> DataFrame:
    """P4 date-part predicate (`EXTRACT(MONTH FROM Date)={m}`,
    datasources.py:159)."""
    return df.filter(F.month(col) == month)


def keep_columns(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """P5 keep-list pruning (dict comprehension, datasources.py:270-271).
    Catalyst prunes the parquet ReadSchema to exactly these columns."""
    return df.select(*cols)


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P6 rename projection (scraped→canonical fieldmap,
    datasources.py:737-752)."""
    return df.withColumnsRenamed(dict(mapping))


def with_constants(df: DataFrame, **consts) -> DataFrame:
    """P7 computed-column append (ZIP_Code/Date consts datasources.py:268-269;
    Date_Pulled :358)."""
    return df.withColumns({k: F.lit(v) for k, v in consts.items()})


def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """P8 cast projection (pandas astype, datasources.py:274-275)."""
    return df.withColumns({k: F.col(k).cast(t) for k, t in casts.items()})


# ---------------------------------------------------------------------------
# Joins (J1-J4)
# ---------------------------------------------------------------------------


def left_join_using(left: DataFrame, right: DataFrame, key: str | list[str]) -> DataFrame:
    """J1 LEFT JOIN ... USING(key) (datasources.py:640-643). Catalyst/AQE
    picks broadcast vs sort-merge; at 100 TB the aggregated right side is
    per-key and typically still too large to broadcast — sort-merge on the
    key is the correct physical plan, and AQE demotes/promotes at runtime."""
    return left.join(right, on=key, how="left")


def coverage_gap(
    fact: DataFrame,
    coverage: DataFrame,
    key_fact: str,
    key_cov: str,
    count_col: str,
    expected: int,
    cnt_name: str = "cnt",
) -> DataFrame:
    """J3 (flagship work-list): rows of ``fact`` whose distinct
    ``count_col`` coverage in ``coverage`` is < expected or absent —
    the reference's games-missing-stats query (datasources.py:627-647):
    CTE GROUP BY key + COUNT(DISTINCT …) LEFT JOIN USING(key) then
    `cnt < expected OR cnt IS NULL`.

    Scale: the aggregate side shrinks to one row per key before the join
    (partial aggregation map-side), and both sides shuffle on the key —
    no narrower plan exists for this semantics.
    """
    agg = coverage.groupBy(key_cov).agg(F.countDistinct(count_col).alias(cnt_name))
    joined = fact.join(agg, on=fact[key_fact] == agg[key_cov], how="left")
    c = F.col(cnt_name)
    return joined.filter((c < F.lit(expected)) | c.isNull()).drop(key_cov)


def symmetric_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """J2/U2 exact semantics of `pd.concat([a,b]).drop_duplicates(keep=False)`
    (datasources.py:547-552): rows appearing exactly once across the
    concatenation — including rows duplicated within one input, which the
    pandas idiom also removes. One shuffle on all columns."""
    u = a.unionByName(b)
    return (
        u.groupBy(*u.columns)
        .count()
        .filter(F.col("count") == 1)
        .drop("count")
    )


def incremental_new(new: DataFrame, existing: DataFrame, key: str | list[str] | None = None) -> DataFrame:
    """J2 intended semantics ("rows not yet loaded"): anti-join of new
    against existing — on ``key`` if given, else on all columns.
    The reference's concat+drop_duplicates trick *approximates* this but
    also deletes already-loaded rows that re-appear; the anti-join is the
    correct incremental operator (SURVEY.md §7 hard part 1)."""
    on = key if key is not None else new.columns
    if isinstance(on, str):
        on = [on]
    cond = [new[c] == existing[c] for c in on]
    return new.join(existing, on=cond, how="left_anti")


def driving_cross_join(drivers: DataFrame, params: DataFrame) -> DataFrame:
    """J4 dependent-lookup work list (`teams × years` nested loop,
    datasources.py:514-516). Small×small; at scale broadcast the smaller
    side (Catalyst does, both being tiny relative to facts)."""
    return drivers.crossJoin(params)


# ---------------------------------------------------------------------------
# Aggregates (A1-A6)
# ---------------------------------------------------------------------------


def watermark(df: DataFrame, col: str) -> DataFrame:
    """A1 global MAX watermark (`SELECT MAX(Date)`, datasources.py:140)."""
    return df.agg(F.max(col).alias(f"max_{col}"))


def filtered_count(df: DataFrame, cond: Column) -> DataFrame:
    """A2 filtered COUNT(*) quota accounting (datasources.py:159)."""
    return df.filter(cond).agg(F.count(F.lit(1)).alias("cnt"))


def grouped_count_distinct(df: DataFrame, key: str, col: str, alias: str = "cnt") -> DataFrame:
    """A3 GROUP BY key, COUNT(DISTINCT col) (datasources.py:628-634)."""
    return df.groupBy(key).agg(F.countDistinct(col).alias(alias))


def distinct_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """A4 drop_duplicates (datasources.py:543)."""
    return df.select(*subset).distinct() if subset else df.distinct()


def has_rows(df: DataFrame) -> DataFrame:
    """A6 emptiness gate (`df.shape[0] > 0`, datasources.py:78, :756)."""
    return df.agg((F.count(F.lit(1)) > 0).alias("has_rows"))


# ---------------------------------------------------------------------------
# Set ops (U1-U3)
# ---------------------------------------------------------------------------


def union_accumulate(parts: Iterable[DataFrame]) -> DataFrame:
    """U1/U3 UNION ALL accumulation (`pd.concat` per page/state,
    datasources.py:276, :359). Name-resolved, no shuffle — partitions of
    the inputs are simply concatenated."""
    parts = list(parts)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge: apply ``updates`` (one
    row per key, with ``effective_col`` as the change date) to the
    ``current`` dimension snapshot. Keys whose ``tracked`` attributes
    actually changed get their open row CLOSED (valid_to = effective
    date, is_current = false) and a NEW open row appended; unchanged
    keys and absent keys pass through untouched. Brand-new keys insert
    as open rows, and so do updates targeting keys that exist only as
    closed history rows (the key is REOPENED — silently discarding
    those updates would lose data).

    Output schema = ``current``'s full column set: non-tracked extra
    columns ride through unchanged on existing rows, are copied from
    the closing open row onto its replacement version, and are NULL on
    inserted rows (no source row to copy from).

    The history-keeping merge every warehouse dimension load needs —
    expressed as one equi-join on the key plus a union (both sides
    shuffle once on the key; at scale the updates side is typically
    small and broadcasts). Null-safe attribute comparison via the
    NULL-tolerant equality (`eqNullSafe`), so NULL→value and
    value→NULL both count as changes."""
    upd = updates.select(
        F.col(key),
        *[F.col(c).alias(f"_u_{c}") for c in tracked],
        F.col(effective_col).alias("_eff"),
    )
    joined = current.join(upd, on=key, how="left")
    changed = F.col("_eff").isNotNull() & F.col(current_flag) & ~(
        F.lit(True)
        if not tracked
        else functools.reduce(
            lambda a, b: a & b,
            [F.col(c).eqNullSafe(F.col(f"_u_{c}")) for c in tracked],
        )
    )
    keep_cols = current.columns
    meta_cols = {key, valid_from, valid_to, current_flag, *tracked}
    extra = [c for c in keep_cols if c not in meta_cols]
    vt_type = current.schema[valid_to].dataType
    closed = joined.withColumn(
        valid_to, F.when(changed, F.col("_eff")).otherwise(F.col(valid_to))
    ).withColumn(
        current_flag,
        F.when(changed, F.lit(False)).otherwise(F.col(current_flag)),
    ).select(*keep_cols)
    fresh = (
        joined.filter(changed)
        .select(
            F.col(key),
            *[F.col(f"_u_{c}").alias(c) for c in tracked],
            *extra,  # carried from the open row this version replaces
            F.col("_eff").alias(valid_from),
        )
        .withColumn(valid_to, F.lit(None).cast(vt_type))
        .withColumn(current_flag, F.lit(True))
    )
    # Inserts: keys with NO open row — brand-new keys AND keys whose
    # only rows are closed history (reopen). Anti-join on open keys,
    # not all keys, so the latter are not dropped on the floor.
    open_keys = (
        current.filter(F.col(current_flag)).select(key).distinct()
    )
    inserts = (
        upd.join(open_keys, on=key, how="left_anti")
        .select(
            F.col(key),
            *[F.col(f"_u_{c}").alias(c) for c in tracked],
            *[
                F.lit(None).cast(current.schema[c].dataType).alias(c)
                for c in extra
            ],
            F.col("_eff").alias(valid_from),
        )
        .withColumn(valid_to, F.lit(None).cast(vt_type))
        .withColumn(current_flag, F.lit(True))
    )
    return (
        closed.select(*keep_cols)
        .unionByName(fresh.select(*keep_cols))
        .unionByName(inserts.select(*keep_cols))
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Change-data-capture merge, latest-wins: collapse ``changes`` to
    the newest row per ``key`` (ordered by ``seq_col``; ties broken by
    preferring deletes, the usual CDC convention for simultaneous
    ops), then apply it to ``base`` — 'D' removes the key, anything
    else upserts the change row's payload columns. The output schema
    is BASE's schema: change columns with no base counterpart are
    dropped (schema evolution is the append sink's job, io.TableStore
    mergeSchema), and base columns missing from the change payload
    pass through unchanged on upserts. This is the MERGE
    INTO semantics of a lakehouse sink expressed engine-neutrally
    (reference: the replace/append sink family, datasources.py:
    write_disposition handling), usable against plain parquet.

    Plan shape: one window shuffle on ``key`` over the (small) change
    stream, then ONE full-outer join against base on the same key —
    base is re-shuffled once and never re-scanned. At 100 TB the base
    side is the big one; AQE keeps the join shuffled-hash, and a
    bucketed base table co-locates it entirely. Deletes and upserts
    are applied in the same join projection, so the whole merge is two
    shuffles end to end.

    Determinism contract (ADVICE r4): the op column must be one of
    {'I','U','D'} — a NULL or unknown op fails fast (assert_true in the
    change-side projection) rather than silently upserting an all-NULL
    payload for unseen keys. Duplicate (key, seq, op-class) change rows
    with DIFFERENT payloads have no defined winner in any CDC log
    format; the window breaks that tie deterministically on the payload
    column values themselves, so reruns and partitioning changes always
    pick the same row."""
    payload = [c for c in changes.columns if c not in (key, seq_col, op_col)]
    # fail-fast lives in a FILTER condition (assert_true returns NULL on
    # success → isNull() is true) — a dropped withColumn would be pruned
    # by Catalyst and the check would never run
    checked = changes.filter(
        F.assert_true(
            F.col(op_col).isin("I", "U", "D"),
            F.concat(
                F.lit(f"cdc_apply: {op_col} must be one of I/U/D, got "),
                F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
            ),
        ).isNull()
    )
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _orderable(dt) -> bool:
        # a MapType ANYWHERE in the type tree makes a column
        # unorderable (array<map>, struct with a map field, ...) —
        # top-level-only checking regressed such payloads to an
        # AnalysisException (code-review r5)
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    sortable = [c for c in payload if _orderable(changes.schema[c].dataType)]
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col(seq_col).desc(),
            F.when(F.col(op_col) == "D", 0).otherwise(1).asc(),
            *[F.col(c).asc_nulls_last() for c in sortable],
        )
    )
    latest = (
        checked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", seq_col)
    )
    joined = base.alias("b").join(
        latest.alias("c"), on=F.col(f"b.{key}") == F.col(f"c.{key}"), how="full_outer"
    )
    keep = F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != "D")
    out_cols = [
        F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key)
    ] + [
        (
            F.when(F.col(f"c.{op_col}").isNotNull(), F.col(f"c.{c}"))
            .otherwise(F.col(f"b.{c}"))
            .alias(c)
            if c in payload
            else F.col(f"b.{c}").alias(c)
        )
        for c in base.columns
        if c != key
    ]
    return joined.filter(keep).select(*out_cols)
