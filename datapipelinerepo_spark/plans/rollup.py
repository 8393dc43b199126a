"""Continuous aggregate (hypertable-rollup) maintenance: a materialized
time-bucket rollup kept current by merging per-batch partial aggregates
— the TimescaleDB continuous-aggregate / Druid rollup pattern on plain
Spark tables.

Incremental contract: maintaining the rollup over any partitioning of
the input into delta batches yields EXACTLY the table a full recompute
would (counts and decimal sums are mergeable partials). Each batch
aggregates map-side to one row per (bucket, key) before touching the
rollup, so the merge cost scales with the rollup's cardinality — not
the event volume; at 100 TB/day the nightly merge touches only the
day's buckets via the upsert key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import TableStore

ROLLUP_KEYS = ["bucket_start", "event_type"]


def _partial(events: DataFrame, ts_col: str, key_col: str, value_col: str,
             bucket: str) -> DataFrame:
    return (
        events.groupBy(
            F.window(ts_col, bucket).alias("_w"), F.col(key_col).alias("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).alias("_sum"),
        )
        .select(
            F.date_format(F.col("_w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "event_type",
            "n_events",
            F.col("_sum").cast("decimal(28,4)").alias("sum_value"),
        )
    )


def rollup_maintain(
    store: TableStore,
    events_delta: DataFrame,
    table: str = "events_rollup_hourly",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "1 hour",
) -> None:
    """Merge one delta batch into the rollup table: aggregate the batch
    to (bucket, key) partials, add them to any existing bucket rows,
    upsert the result. Buckets untouched by the delta are not read or
    rewritten beyond the upsert's survivors pass (a real MERGE on a
    lakehouse format touches only matching files)."""
    delta = _partial(events_delta, ts_col, key_col, value_col, bucket)
    if store.exists(table):
        existing = store.read(table)
        touched = existing.join(
            delta.select(*ROLLUP_KEYS), on=ROLLUP_KEYS, how="left_semi"
        )
        merged = (
            touched.unionByName(delta)
            .groupBy(*ROLLUP_KEYS)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").cast("decimal(28,4)").alias("sum_value"),
            )
        )
    else:
        merged = delta
    store.upsert(merged, table, ROLLUP_KEYS)


def rollup_recompute(
    events_all: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "1 hour",
) -> DataFrame:
    """The full-recompute reference the incremental path must equal."""
    return _partial(events_all, ts_col, key_col, value_col, bucket)


def seed_rollup(
    store: TableStore,
    snapshot: DataFrame,
    table: str,
    group_cols: list[str],
    value_col: str,
    count_col: str = "n_rows",
    sum_col: str = "sum_val",
    n_buckets: int = 16,
    versioned: bool = False,
    txn: tuple | None = None,
) -> None:
    """Materialize the initial grouped COUNT/SUM aggregate of a
    snapshot as a keyed rollup table — the seed state
    apply_changes_to_rollup then maintains incrementally. Sums are
    DECIMAL so incremental maintenance is EXACT: decimal addition is
    associative, so any sequence of change feeds lands on precisely
    the value a full recompute would (double sums would drift with
    accumulation order)."""
    if txn is not None and not versioned:
        raise ValueError(
            "seed_rollup: txn= needs versioned=True — an unversioned "
            "rollup has no manifest to record the watermark, and "
            "silently dropping it would void the caller's replay "
            "protection (code-review r8 wave 3)"
        )
    agg = snapshot.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(count_col),
        # NULL measure values contribute 0 — and a group with ONLY
        # NULLs seeds 0, not NULL, because the incremental update
        # arithmetic (t.sum + s.sum) would otherwise poison every
        # later feed to NULL (code-review r8). The rollup's sum_col
        # is therefore "total of non-null values, 0 when none" —
        # coalesce SUM(x) to match when comparing against plain SQL.
        F.coalesce(
            F.sum(F.col(value_col).cast("decimal(18,4)")),
            F.lit(0).cast("decimal(18,4)"),
        )
        .cast("decimal(28,4)")
        .alias(sum_col),
    )
    store.overwrite_keyed(
        agg, table, group_cols, n_buckets=n_buckets, versioned=versioned,
        txn=txn,
    )


def apply_changes_to_rollup(
    store: TableStore,
    changes: DataFrame,
    table: str,
    group_cols: list[str],
    value_col: str,
    count_col: str = "n_rows",
    sum_col: str = "sum_val",
    txn: tuple | None = None,
    check_replay: bool = False,
    txn_expect: int | None = None,
) -> None:
    """INCREMENTAL VIEW MAINTENANCE from a change data feed: apply a
    ``TableStore.table_changes`` frame to a seeded grouped COUNT/SUM
    rollup, so the aggregate tracks the base table without ever
    re-scanning it — the downstream-consumer loop CDF exists for
    (Delta CDF -> MERGE into the materialized view).

    Each change row contributes a signed delta: inserts and update
    postimages add, deletes and update preimages subtract (an update
    thus nets to the value difference). The feed aggregates map-side
    to one row per touched group, then a conditional MERGE
    (io.merge_when) lands it: groups netting to zero rows DELETE their
    rollup row, existing groups get computed additive updates, new
    groups insert. Cost per application: one aggregate over the feed
    (churned buckets only, by table_changes' construction) + a
    bucket-pruned merge on the rollup — never a base-table scan.
    Decimal arithmetic end to end keeps the incremental result
    BIT-EQUAL to a full recompute (proven by the
    store_incremental_rollup oracle)."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = changes.groupBy(*group_cols).agg(
        F.sum(sign).cast("bigint").alias(count_col),
        # NULL measures contribute 0 (matching seed_rollup): without
        # the coalesce, a feed whose rows for a group are all
        # NULL-valued sums to NULL and t.sum + NULL poisons the
        # maintained value to NULL forever (code-review r8)
        F.coalesce(
            F.sum(
                F.coalesce(
                    F.col(value_col).cast("decimal(18,4)"),
                    F.lit(0).cast("decimal(18,4)"),
                )
                * sign
            ),
            F.lit(0).cast("decimal(18,4)"),
        )
        .cast("decimal(28,4)")
        .alias(sum_col),
    )
    store.merge_when(
        delta,
        table,
        group_cols,
        when_matched_delete=f"t.{count_col} + s.{count_col} = 0",
        when_matched_update={
            count_col: f"CAST(t.{count_col} + s.{count_col} AS BIGINT)",
            sum_col: f"CAST(t.{sum_col} + s.{sum_col} AS DECIMAL(28,4))",
        },
        when_not_matched_insert=True,
        txn=txn,
        check_replay=check_replay,
        txn_expect=txn_expect,
    )


def sync_rollup(
    store: TableStore,
    base_table: str,
    rollup_table: str,
    group_cols: list[str],
    value_col: str,
    count_col: str = "n_rows",
    sum_col: str = "sum_val",
    n_buckets: int = 16,
) -> int:
    """EXACTLY-ONCE catch-up of a maintained rollup to the base
    table's CURRENT version — the driver loop around seed_rollup /
    apply_changes_to_rollup that owns the version bookkeeping, so a
    scheduler can just call sync_rollup() on any cadence.

    The high-water mark ("base version this rollup reflects") is the
    ROLLUP table's own transactional watermark, committed ATOMICALLY
    with the merge that applies the feed, with COMPARE-AND-SWAP
    semantics (``txn_expect``): the commit only lands if the watermark
    still equals the window's STARTING version, so
    - a crash between merge and any separate stamp cannot exist
      (there is no separate stamp), and
    - two concurrent syncers that observed DIFFERENT current versions
      cannot both land overlapping windows — the second's
      (synced → current') window conflicts at the claim and is
      refused with its data unapplied (code-review r8 wave 3; the
      remaining gap is applied by the next call).

    The watermark's app id embeds the base table's INCARNATION
    (minted fresh by every overwrite_keyed), so an administrative
    reseed of the base — which restarts version numbering at 1 — is
    detected as a new table and the rollup RE-SEEDS instead of
    silently staying stale or diffing unrelated manifests.

    First call seeds from the current snapshot (seeding, like every
    overwrite_keyed, is single-writer — do not race two FIRST-TIME
    syncers; steady-state concurrent syncs are safe per the CAS
    above). A no-change call is one manifest read. Returns the base
    version the rollup now reflects; the base must be versioned+keyed
    (table_changes' requirement)."""
    from ..io import TxnAlreadyApplied

    current = store._ensure_latest(base_table)
    inc = store.table_incarnation(base_table) or "0"
    app_id = f"rollup_sync:{base_table}:{inc}"
    synced = (
        store.last_txn(rollup_table, app_id)
        if store.exists(rollup_table)
        else None
    )
    if synced is None:
        # first sync for THIS base incarnation: (re)seed wholesale —
        # covers both the genuinely-new rollup and a base reseed,
        # where the old incarnation's watermark must not be trusted
        seed_rollup(
            store,
            store.read(base_table, version=current),
            rollup_table,
            group_cols,
            value_col,
            count_col=count_col,
            sum_col=sum_col,
            n_buckets=n_buckets,
            versioned=True,
            txn=(app_id, current),
        )
        return current
    if synced >= current:
        return synced  # nothing new: one manifest-listing read
    try:
        apply_changes_to_rollup(
            store,
            store.table_changes(base_table, synced, current),
            rollup_table,
            group_cols,
            value_col,
            count_col=count_col,
            sum_col=sum_col,
            txn=(app_id, current),
            check_replay=True,
            txn_expect=synced,  # CAS: only if nobody advanced it
        )
    except TxnAlreadyApplied:
        # replay of the identical window, or a concurrent syncer's
        # conflicting one — either way nothing was applied here;
        # report the actual progress
        return int(store.last_txn(rollup_table, app_id) or current)
    return current
