"""Snapshot-consistent cross-table reads (plans/consistency.read_group
— VERDICT r10 item 6): the store commits per table, so a reader
joining a base with its maintained rollup/view between syncs can see
an inconsistent pair. read_group must resolve one consistent version
vector, including under concurrent writers (the raced test)."""

from __future__ import annotations

import threading


import pytest
from pyspark.sql import functions as F

from datapipelinerepo_spark.io import TableStore
from datapipelinerepo_spark.plans.consistency import (
    GroupConsistencyError,
    read_group,
    resolve_group_versions,
)
from datapipelinerepo_spark.plans.rollup import sync_rollup
from datapipelinerepo_spark.plans.viewmaint import sync_join_view

SCHEMA = "id long, val double, grp string"


def _mk(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 7.0, "A")], SCHEMA
    )
    store.overwrite_keyed(base, "t", "id", n_buckets=2, versioned=True)
    sync_rollup(store, "t", "r", ["grp"], "val")
    return store


def _recompute(store, version):
    return {
        r["grp"]: (r["n_rows"], r["sum_val"])
        for r in store.read("t", version=version)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("val").cast("decimal(18,4)"))
            .cast("decimal(28,4)")
            .alias("sum_val"),
        )
        .collect()
    }


def _rollup_rows(df):
    return {
        r["grp"]: (r["n_rows"], r["sum_val"]) for r in df.collect()
    }


def test_read_group_rewinds_base_to_the_views_cut(spark, tmp_path):
    """An unsynced base write must NOT surface in the group read: the
    cut pins the base at the rollup's watermark, and the pair is
    bit-consistent (rollup == recompute over the pinned base)."""
    store = _mk(spark, tmp_path)
    store.upsert(
        spark.createDataFrame([(4, 100.0, "B")], SCHEMA), "t", "id"
    )  # base v2, rollup still reflects v1
    vec = resolve_group_versions(store, ["t", "r"])
    assert vec["t"] == 1  # rewound behind latest
    assert vec["t"] < store.latest_version("t")
    frames = read_group(store, ["t", "r"])
    assert _rollup_rows(frames["r"]) == _recompute(store, vec["t"])
    # the unsynced row is invisible in BOTH frames of the group
    assert frames["t"].filter(F.col("id") == 4).count() == 0
    # after the sync, the cut advances to latest
    sync_rollup(store, "t", "r", ["grp"], "val")
    vec2 = resolve_group_versions(store, ["t", "r"])
    assert vec2["t"] == store.latest_version("t")
    frames2 = read_group(store, ["t", "r"])
    assert _rollup_rows(frames2["r"]) == _recompute(store, vec2["t"])
    assert frames2["t"].filter(F.col("id") == 4).count() == 1


def test_read_group_base_only_and_errors(spark, tmp_path):
    store = _mk(spark, tmp_path)
    # a group of just bases pins latest
    assert resolve_group_versions(store, ["t"]) == {
        "t": store.latest_version("t")
    }
    with pytest.raises(ValueError):
        resolve_group_versions(store, [])
    store.overwrite(
        spark.createDataFrame([(1, 1.0, "A")], SCHEMA), "plain"
    )
    with pytest.raises(ValueError):
        resolve_group_versions(store, ["plain"])


def test_read_group_stranded_view_raises(spark, tmp_path):
    """A base reseed (new incarnation) strands the view's watermarks:
    the group read must refuse loudly, not pair the new base with a
    view of the old one."""
    store = _mk(spark, tmp_path)
    store.overwrite_keyed(
        spark.createDataFrame([(9, 1.0, "Z")], SCHEMA),
        "t", "id", n_buckets=2, versioned=True,
    )  # reseed: new incarnation, version numbering restarts
    with pytest.raises(GroupConsistencyError, match="PRIOR incarnation"):
        resolve_group_versions(store, ["t", "r"])
    # sync re-seeds the rollup under the new incarnation → consistent
    sync_rollup(store, "t", "r", ["grp"], "val")
    vec = resolve_group_versions(store, ["t", "r"])
    frames = read_group(store, ["t", "r"])
    assert _rollup_rows(frames["r"]) == _recompute(store, vec["t"])


def test_read_group_vacuumed_cut_raises(spark, tmp_path):
    """When the only mutually-synced base version has been vacuumed
    away, the resolver raises instead of serving an inconsistent
    pair."""
    store = _mk(spark, tmp_path)  # rollup watermark = base v1
    store.upsert(
        spark.createDataFrame([(4, 100.0, "B")], SCHEMA), "t", "id"
    )
    store.upsert(
        spark.createDataFrame([(5, 2.0, "A")], SCHEMA), "t", "id"
    )
    store.vacuum(  # keep_watermarked=False: we WANT the footgun here
        "t", keep_last=1, grace_s=0.0, keep_watermarked=False
    )
    with pytest.raises(GroupConsistencyError, match="common readable cut"):
        resolve_group_versions(store, ["t", "r"])
    # (sync_rollup can't recover either — table_changes needs the
    # vacuumed watermark manifest; vacuum retention must cover every
    # dependent view's watermark, the same operational rule Delta's
    # CDF consumers live by. The group read's job is only to refuse
    # loudly, which it did.)


def test_read_group_join_view_two_bases(spark, tmp_path):
    """A join view pins BOTH bases at a co-occurring watermark pair —
    advancing only the dim between syncs rewinds the dim in the group
    read (the fact/dim pair must be one a single view version actually
    held)."""
    store = TableStore(spark, str(tmp_path))
    fact = spark.createDataFrame(
        [(1, 10, 100.0), (2, 20, 50.0)], "fk long, jk long, amt double"
    )
    dim = spark.createDataFrame(
        [(10, "x"), (20, "y")], "jk long, label string"
    )
    store.overwrite_keyed(fact, "f", "fk", n_buckets=2, versioned=True)
    store.overwrite_keyed(dim, "d", "jk", n_buckets=2, versioned=True)
    sync_join_view(store, "f", "d", "v", "fk", "jk", "jk", n_buckets=2)
    # advance the dim only — view still reflects (f@1, d@1)
    store.upsert(
        spark.createDataFrame([(10, "x2")], "jk long, label string"),
        "d", "jk",
    )
    vec = resolve_group_versions(store, ["f", "d", "v"])
    assert vec["d"] == 1 and vec["f"] == 1
    frames = read_group(store, ["f", "d", "v"])
    # the group's dim frame agrees with the view's materialized label
    joined = {
        r["fk"]: r["label"]
        for r in frames["v"].select("fk", "label").collect()
    }
    direct = {
        r["fk"]: r["label"]
        for r in frames["f"]
        .join(frames["d"], "jk", "left")
        .select("fk", "label")
        .collect()
    }
    assert joined == direct == {1: "x", 2: "y"}
    sync_join_view(store, "f", "d", "v", "fk", "jk", "jk", n_buckets=2)
    vec2 = resolve_group_versions(store, ["f", "d", "v"])
    assert vec2["d"] == store.latest_version("d")
    frames2 = read_group(store, ["f", "d", "v"])
    assert {
        r["fk"]: r["label"]
        for r in frames2["v"].select("fk", "label").collect()
    } == {1: "x2", 2: "y"}


def test_read_group_raced_against_writer(spark, tmp_path):
    """The raced proof (VERDICT r10 item 6): a writer loops
    upsert+sync while a reader loops read_group — EVERY group read
    must be internally consistent (rollup bit-equals a recompute over
    the group's pinned base frame), no matter where the writer is.
    Without group pinning, a read between the base write and its sync
    would mismatch."""
    store = _mk(spark, tmp_path)
    stop = threading.Event()
    errors: list[BaseException] = []

    def writer():
        try:
            i = 100
            while not stop.is_set():
                store.upsert(
                    spark.createDataFrame(
                        [(i, float(i), "A" if i % 2 else "B")], SCHEMA
                    ),
                    "t", "id",
                )
                sync_rollup(store, "t", "r", ["grp"], "val")
                i += 1
        except BaseException as e:  # surfaced below
            errors.append(e)

    wt = threading.Thread(target=writer)
    wt.start()
    try:
        checked = 0
        while checked < 8 and wt.is_alive():
            frames = read_group(store, ["t", "r"])
            got = _rollup_rows(frames["r"])
            want = {
                r["grp"]: (r["n_rows"], r["sum_val"])
                for r in frames["t"]
                .groupBy("grp")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(F.col("val").cast("decimal(18,4)"))
                    .cast("decimal(28,4)")
                    .alias("sum_val"),
                )
                .collect()
            }
            assert got == want, f"inconsistent group read: {got} vs {want}"
            checked += 1
    finally:
        stop.set()
        wt.join(timeout=120)
    assert not errors, errors
    assert checked >= 8


# -- write_group: the dual (multi-table transactional writes) ----------


def _wg_store(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))

    def mk_write(table, seq_to_val):
        def fn(app, seq):
            df = spark.createDataFrame(
                [(1, seq_to_val(seq))], "id long, v long"
            )
            store.upsert_txn(df, table, "id", app, seq, n_buckets=2)
        return fn

    return store, mk_write


def _vals(store, tables, frames=None):
    frames = frames or read_group(store, tables)
    return {t: frames[t].collect()[0]["v"] for t in tables}


def test_write_group_all_or_nothing(spark, tmp_path):
    from datapipelinerepo_spark.plans.consistency import write_group

    store, mk = _wg_store(spark, tmp_path)
    writes = {"a": mk("a", lambda s: s * 10), "b": mk("b", lambda s: s * 10)}
    assert write_group(store, "g", writes) == 1
    assert write_group(store, "g", writes) == 2
    assert _vals(store, ["a", "b"]) == {"a": 20, "b": 20}
    app = "group_txn:g"
    assert store.last_txn("a", app) == store.last_txn("b", app) == 2


def test_write_group_torn_is_invisible_and_resumable(spark, tmp_path):
    """A crash mid-group (one member stamped at seq 3, the other
    still at 2) must (a) never be visible through read_group — both
    members rewind to the seq-2 cut — and (b) resume: the next
    write_group completes only the laggard, never re-applies the
    finished member."""
    from datapipelinerepo_spark.plans.consistency import write_group

    store, mk = _wg_store(spark, tmp_path)
    writes = {"a": mk("a", lambda s: s * 10), "b": mk("b", lambda s: s * 10)}
    write_group(store, "g", writes)
    write_group(store, "g", writes)
    # simulate the crash: only member "a" gets the seq-3 write
    writes["a"]("group_txn:g", 3)
    assert store.last_txn("a", "group_txn:g") == 3
    assert store.last_txn("b", "group_txn:g") == 2
    # torn state invisible: both pinned at the seq-2 cut
    assert _vals(store, ["a", "b"]) == {"a": 20, "b": 20}
    # resume: b completes at seq 3; a's callable must NOT run again
    calls = []

    def poisoned_a(app, seq):
        calls.append(seq)
        raise AssertionError("resume must not re-write the finished member")

    assert write_group(
        store, "g", {"a": poisoned_a, "b": writes["b"]}
    ) == 3
    assert calls == []
    assert _vals(store, ["a", "b"]) == {"a": 30, "b": 30}


def test_write_group_raced_writers_serialize(spark, tmp_path):
    """Two concurrent write_group callers must serialize behind the
    group claim: sequences interleave cleanly (no two half-groups at
    one sequence), and a concurrent group reader never observes
    members disagreeing."""
    import threading

    from datapipelinerepo_spark.plans.consistency import write_group

    store, mk = _wg_store(spark, tmp_path)
    writes = {"a": mk("a", lambda s: s * 10), "b": mk("b", lambda s: s * 10)}
    write_group(store, "g", writes)  # seed both members (seq 1)
    errors: list[BaseException] = []
    seqs: list[int] = []

    def writer(n):
        try:
            for _ in range(n):
                seqs.append(write_group(store, "g", writes))
        except BaseException as e:
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(3,)) for _ in range(2)]
    for th in threads:
        th.start()
    # group reader racing the writers: members must always agree
    reads = 0
    while any(th.is_alive() for th in threads) and reads < 6:
        vals = _vals(store, ["a", "b"])
        assert vals["a"] == vals["b"], f"torn group served: {vals}"
        reads += 1
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    assert sorted(seqs) == [2, 3, 4, 5, 6, 7]  # serialized, no dupes
    assert _vals(store, ["a", "b"]) == {"a": 70, "b": 70}


# -- stacked views: a rollup maintained OVER a join view ----------------


def _stacked_store(spark, tmp_path):
    """f (fact) ⟕ d (dim) → view v; rollup r2 over v grouped by the
    dim label — a two-level IVM DAG (sync_rollup works on any
    versioned keyed table, including maintained views)."""
    store = TableStore(spark, str(tmp_path))
    fact = spark.createDataFrame(
        [(1, 10, 100.0), (2, 20, 50.0), (3, 10, 25.0)],
        "fk long, jk long, amt double",
    )
    dim = spark.createDataFrame(
        [(10, "x"), (20, "y")], "jk long, label string"
    )
    store.overwrite_keyed(fact, "f", "fk", n_buckets=2, versioned=True)
    store.overwrite_keyed(dim, "d", "jk", n_buckets=2, versioned=True)
    sync_join_view(store, "f", "d", "v", "fk", "jk", "jk", n_buckets=2)
    sync_rollup(store, "v", "r2", ["label"], "amt", n_buckets=2)
    return store


def _sync_stack(store):
    sync_join_view(store, "f", "d", "v", "fk", "jk", "jk", n_buckets=2)
    sync_rollup(store, "v", "r2", ["label"], "amt", n_buckets=2)


def _stack_consistent(store, frames):
    """The invariant every stacked group read must satisfy: the rollup
    equals a recompute over the group's view frame, and the view
    equals the join of the group's base frames."""
    got = {
        r["label"]: (r["n_rows"], r["sum_val"])
        for r in frames["r2"].collect()
    }
    want = {
        r["label"]: (r["n_rows"], r["sum_val"])
        for r in frames["v"]
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("amt").cast("decimal(18,4)"))
            .cast("decimal(28,4)")
            .alias("sum_val"),
        )
        .collect()
    }
    assert got == want, f"rollup vs view recompute: {got} != {want}"
    view_rows = {
        (r["fk"], r["label"]) for r in frames["v"].select("fk", "label").collect()
    }
    direct = {
        (r["fk"], r["label"])
        for r in frames["f"]
        .join(frames["d"], "jk", "left")
        .select("fk", "label")
        .collect()
    }
    assert view_rows == direct, f"view vs base join: {view_rows} != {direct}"


def test_read_group_stacked_dag_rewinds_transitively(spark, tmp_path):
    """Advancing the fact AND syncing only the mid-level view must
    rewind the WHOLE group (bases + view) to the top rollup's cut —
    the view is re-pinned at an older version of itself, and the
    bases at that version's own watermarks."""
    store = _stacked_store(spark, tmp_path)
    vec0 = resolve_group_versions(store, ["f", "d", "v", "r2"])
    frames0 = read_group(store, ["f", "d", "v", "r2"])
    _stack_consistent(store, frames0)

    # fact write + view sync, rollup NOT synced: r2 still reflects the
    # old v — the group must rewind v (and its bases) to vec0's cut
    store.upsert(
        spark.createDataFrame([(4, 20, 75.0)], "fk long, jk long, amt double"),
        "f", "fk",
    )
    sync_join_view(store, "f", "d", "v", "fk", "jk", "jk", n_buckets=2)
    vec1 = resolve_group_versions(store, ["f", "d", "v", "r2"])
    assert vec1["v"] == vec0["v"] < store.latest_version("v")
    assert vec1["f"] == vec0["f"] < store.latest_version("f")
    frames1 = read_group(store, ["f", "d", "v", "r2"])
    _stack_consistent(store, frames1)
    assert frames1["f"].filter(F.col("fk") == 4).count() == 0

    # rollup catch-up advances the whole cut to latest
    sync_rollup(store, "v", "r2", ["label"], "amt", n_buckets=2)
    vec2 = resolve_group_versions(store, ["f", "d", "v", "r2"])
    assert vec2["v"] == store.latest_version("v")
    assert vec2["f"] == store.latest_version("f")
    frames2 = read_group(store, ["f", "d", "v", "r2"])
    _stack_consistent(store, frames2)
    assert frames2["f"].filter(F.col("fk") == 4).count() == 1


def test_read_group_stacked_implied_tables(spark, tmp_path):
    """Requesting only the TOP of the DAG still resolves: the mid
    view and bases are loaded transitively, and the top pins on a
    consistent cut of the whole chain."""
    store = _stacked_store(spark, tmp_path)
    store.upsert(
        spark.createDataFrame([(5, 10, 10.0)], "fk long, jk long, amt double"),
        "f", "fk",
    )
    # nothing synced: the rollup alone must pin its (stale) cut fine
    vec = resolve_group_versions(store, ["r2"])
    assert set(vec) == {"r2"}
    _sync_stack(store)
    frames = read_group(store, ["v", "r2"])
    _stack_consistent(
        store, {**frames, **read_group(store, ["f", "d", "v"])}
    )


def test_read_group_stacked_raced(spark, tmp_path):
    """Raced proof for the DAG: a writer loops fact-write → view sync
    → rollup sync; a reader loops full-group reads — every read must
    satisfy BOTH stacked invariants regardless of where the writer
    is (between any two of the three steps)."""
    store = _stacked_store(spark, tmp_path)
    stop = threading.Event()
    errors: list[BaseException] = []

    def writer():
        try:
            i = 100
            while not stop.is_set():
                store.upsert(
                    spark.createDataFrame(
                        [(i, 10 if i % 2 else 20, float(i))],
                        "fk long, jk long, amt double",
                    ),
                    "f", "fk",
                )
                _sync_stack(store)
                i += 1
        except BaseException as e:
            errors.append(e)

    wt = threading.Thread(target=writer)
    wt.start()
    try:
        checked = 0
        while checked < 6 and wt.is_alive():
            frames = read_group(store, ["f", "d", "v", "r2"])
            _stack_consistent(store, frames)
            checked += 1
    finally:
        stop.set()
        wt.join(timeout=120)
    assert not errors, errors
    assert checked >= 6


def test_write_group_composes_with_lagging_view(spark, tmp_path):
    """A rollup over one member of a write group lags behind the
    group's newest sequence: the resolver must FALL BACK to the older
    sequence (the freshest fully consistent cut) instead of erroring,
    and advance once the rollup catches up."""
    from datapipelinerepo_spark.plans.consistency import write_group

    store, mk = _wg_store(spark, tmp_path)
    writes = {"a": mk("a", lambda s: s * 10), "b": mk("b", lambda s: s * 10)}
    write_group(store, "g", writes)           # seq 1: a@1, b@1
    sync_rollup(store, "a", "r", ["id"], "v")  # r reflects a@1
    write_group(store, "g", writes)           # seq 2 — r NOT synced

    vec = resolve_group_versions(store, ["a", "b", "r"])
    assert vec["a"] == 1 and vec["b"] == 1  # fell back to seq 1
    frames = read_group(store, ["a", "b", "r"])
    assert frames["a"].collect()[0]["v"] == 10  # seq-1 content
    got = {
        r["id"]: r["sum_val"] for r in frames["r"].collect()
    }
    want = {
        r["id"]: r["sum_val"]
        for r in frames["a"]
        .groupBy("id")
        .agg(
            F.sum(F.col("v").cast("decimal(18,4)"))
            .cast("decimal(28,4)")
            .alias("sum_val")
        )
        .collect()
    }
    assert got == want
    # the rollup catch-up restores the newest sequence
    sync_rollup(store, "a", "r", ["id"], "v")
    vec2 = resolve_group_versions(store, ["a", "b", "r"])
    assert vec2["a"] == store.latest_version("a")
    assert _vals(store, ["a", "b"]) == {"a": 20, "b": 20}


def test_read_group_as_of_ts(spark, tmp_path):
    """Group time travel: the cut resolved as of an earlier instant
    must use only versions published by then — the base AND its
    rollup rewind together to the historical pair."""
    import time

    store = _mk(spark, tmp_path)  # base v1 + rollup synced
    time.sleep(0.05)
    t_mid = int(time.time() * 1000)
    time.sleep(0.05)
    store.upsert(
        spark.createDataFrame([(4, 100.0, "B")], SCHEMA), "t", "id"
    )
    sync_rollup(store, "t", "r", ["grp"], "val")

    # now: latest pair
    vec_now = resolve_group_versions(store, ["t", "r"])
    assert vec_now["t"] == store.latest_version("t")
    # as of t_mid: the v1 pair, mutually consistent
    vec_then = resolve_group_versions(store, ["t", "r"], as_of_ts=t_mid)
    assert vec_then["t"] == 1
    frames = read_group(store, ["t", "r"], as_of_ts=t_mid)
    assert _rollup_rows(frames["r"]) == _recompute(store, 1)
    assert frames["t"].filter(F.col("id") == 4).count() == 0
    # before the table existed: loud per-table semantics
    with pytest.raises(ValueError, match="no retained version"):
        resolve_group_versions(store, ["t", "r"], as_of_ts=0)


def test_write_group_rejects_unstamped_write(spark, tmp_path):
    """A callable that writes WITHOUT the passed (app, seq) stamp must
    fail loudly — otherwise the group silently stops being a group."""
    from datapipelinerepo_spark.plans.consistency import write_group

    store, mk = _wg_store(spark, tmp_path)

    def unstamped(app, seq):  # plain upsert: ignores the stamp
        store.upsert_txn(
            spark.createDataFrame([(1, 1)], "id long, v long"),
            "a", "id", "some_other_app", seq, n_buckets=2,
        )

    with pytest.raises(GroupConsistencyError, match="did not commit"):
        write_group(
            store, "g",
            {"a": unstamped, "b": mk("b", lambda s: s)},
        )


# -- code-review r11 regression tests -----------------------------------


def test_read_group_partial_reseed_of_multi_input_view_raises(spark, tmp_path):
    """Finding 1: a join view whose FACT base was reseeded must not
    silently resolve as a view over the dim alone — the per-version
    watermark vector is invalid when any referenced base carries only
    stale-incarnation apps."""
    store = TableStore(spark, str(tmp_path))
    fact = spark.createDataFrame(
        [(1, 10, 100.0)], "fk long, jk long, amt double"
    )
    dim = spark.createDataFrame([(10, "x")], "jk long, label string")
    store.overwrite_keyed(fact, "f", "fk", n_buckets=2, versioned=True)
    store.overwrite_keyed(dim, "d", "jk", n_buckets=2, versioned=True)
    sync_join_view(store, "f", "d", "v", "fk", "jk", "jk", n_buckets=2)
    # reseed ONLY the fact: the view's fact edge is now stale while
    # its dim edge is still current
    store.overwrite_keyed(
        spark.createDataFrame([(9, 10, 1.0)], "fk long, jk long, amt double"),
        "f", "fk", n_buckets=2, versioned=True,
    )
    with pytest.raises(GroupConsistencyError, match="PRIOR incarnation"):
        resolve_group_versions(store, ["f", "v"])
    # even a dim-only request must refuse: the view cannot vouch for
    # ANY consistent cut while one of its edges is stale
    with pytest.raises(GroupConsistencyError, match="PRIOR incarnation"):
        resolve_group_versions(store, ["d", "v"])
    # re-sync reseeds the view under the new fact incarnation
    sync_join_view(store, "f", "d", "v", "fk", "jk", "jk", n_buckets=2)
    vec = resolve_group_versions(store, ["f", "d", "v"])
    assert vec["f"] == store.latest_version("f")


def test_read_group_transitively_stranded_mid_view_raises(spark, tmp_path):
    """Finding 2: a stacked DAG whose MID view is stranded (its base
    was reseeded) must refuse even when only the top is requested —
    the mid view must not be silently reclassified as a base."""
    store = _stacked_store(spark, tmp_path)
    store.overwrite_keyed(
        spark.createDataFrame(
            [(9, 10, 1.0)], "fk long, jk long, amt double"
        ),
        "f", "fk", n_buckets=2, versioned=True,
    )  # reseed the bottom: v (transitively loaded) is now stranded
    with pytest.raises(GroupConsistencyError, match="PRIOR incarnation"):
        resolve_group_versions(store, ["r2"])
    # bottom-up re-sync restores the whole chain
    _sync_stack(store)
    frames = read_group(store, ["f", "d", "v", "r2"])
    _stack_consistent(store, frames)


def test_read_group_fallback_to_vacuumed_version_raises(spark, tmp_path):
    """Finding 4: when the only consistent cut requires a base
    version that vacuum dropped, the resolver must raise
    GroupConsistencyError — not return an unreadable vector."""
    store = TableStore(spark, str(tmp_path))
    fact = spark.createDataFrame(
        [(1, 10, 100.0)], "fk long, jk long, amt double"
    )
    dim = spark.createDataFrame([(10, "x")], "jk long, label string")
    store.overwrite_keyed(fact, "a", "fk", n_buckets=2, versioned=True)
    store.overwrite_keyed(dim, "b", "jk", n_buckets=2, versioned=True)
    sync_join_view(store, "a", "b", "vv", "fk", "jk", "jk", n_buckets=2)
    sync_rollup(store, "a", "w", ["jk"], "amt", n_buckets=2)  # marks a@1
    store.upsert(
        spark.createDataFrame([(2, 10, 50.0)], "fk long, jk long, amt double"),
        "a", "fk",
    )
    store.upsert(
        spark.createDataFrame([(10, "x2")], "jk long, label string"),
        "b", "jk",
    )
    sync_join_view(store, "a", "b", "vv", "fk", "jk", "jk", n_buckets=2)
    # w is pinned at a@1, so the group must fall back to vv's (1, 1)
    # vector — but b@1 is vacuumed away
    store.vacuum("b", keep_last=1, grace_s=0.0, keep_watermarked=False)
    with pytest.raises(
        GroupConsistencyError, match="no longer retained|common readable"
    ):
        resolve_group_versions(store, ["a", "b", "vv", "w"])


def test_write_group_applies_in_insertion_order(spark, tmp_path):
    """Finding 3: member writes apply in the writes dict's insertion
    order, so a summary listed AFTER its detail derives from the
    detail's post-write state regardless of table names (the old
    sorted-by-name order silently required detail < summary
    alphabetically)."""
    from decimal import Decimal

    from datapipelinerepo_spark.plans.consistency import write_group

    store = TableStore(spark, str(tmp_path))

    def w_detail(app, seq):
        store.upsert_txn(
            spark.createDataFrame(
                [(seq, float(seq) * 10)], "id long, v double"
            ),
            "z_detail", "id", app, seq, n_buckets=2,
        )

    def w_summary(app, seq):  # derives from the detail's CURRENT state
        agg = store.read("z_detail").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,4)"))
            .cast("decimal(28,4)")
            .alias("s"),
        ).withColumn("id", F.lit(1))
        store.upsert_txn(agg, "a_summary", "id", app, seq, n_buckets=2)

    # detail FIRST despite sorting after the summary alphabetically
    writes = {"z_detail": w_detail, "a_summary": w_summary}
    write_group(store, "ord", writes)
    write_group(store, "ord", writes)
    row = store.read("a_summary").collect()[0]
    assert (row["n"], row["s"]) == (2, Decimal("30.0000"))
    vals = read_group(store, ["z_detail", "a_summary"])
    got = vals["z_detail"].agg(
        F.sum(F.col("v").cast("decimal(18,4)"))
        .cast("decimal(28,4)")
        .alias("s")
    ).collect()[0]["s"]
    assert got == row["s"]


def test_vacuum_protects_dependent_view_watermarks(spark, tmp_path):
    """r11: vacuum's default retains every version at or after the
    oldest watermark a maintained view still reflects — the
    sync-wedging / unreadable-cut footgun requires an explicit
    keep_watermarked=False. r12 (ADVICE r11): the floor scans the
    dependents' RETAINED HISTORIES, not just their latest manifests,
    so releasing base history is top-down — vacuum the view first,
    then the base."""
    store = _mk(spark, tmp_path)  # base v1 + rollup synced at v1
    store.upsert(
        spark.createDataFrame([(4, 100.0, "B")], SCHEMA), "t", "id"
    )
    store.upsert(
        spark.createDataFrame([(5, 2.0, "A")], SCHEMA), "t", "id"
    )
    store.vacuum("t", keep_last=1, grace_s=0.0)  # default: protected
    assert 1 in store.versions("t")  # the rollup's watermark survives
    # the group still resolves AND the lagging rollup can still sync
    vec = resolve_group_versions(store, ["t", "r"])
    assert vec["t"] == 1
    sync_rollup(store, "t", "r", ["grp"], "val")
    assert resolve_group_versions(store, ["t", "r"])["t"] == (
        store.latest_version("t")
    )
    # the rollup is current, but its RETAINED v1 manifest still pins
    # base v1 (group time travel / backtracking can serve that cut) —
    # the base stays protected until the view's history is vacuumed
    store.vacuum("t", keep_last=1, grace_s=0.0)
    assert 1 in store.versions("t")
    store.vacuum("r", keep_last=1, grace_s=0.0)  # top-down release
    store.vacuum("t", keep_last=1, grace_s=0.0)
    assert store.versions("t") == [store.latest_version("t")]


def test_vacuum_protects_lagging_stacked_cut(spark, tmp_path):
    """ADVICE r11 (io._dependent_watermark_floor): a stacked DAG whose
    top-level rollup lags pins a MID-LEVEL view's older version, whose
    watermark references a base version BELOW the latest-manifest
    floor. The r12 history-deep floor must keep that base version, so
    the group's only consistent cut stays readable after a default
    vacuum."""
    store = _mk(spark, tmp_path)       # t@1, mid view r synced (r@1)
    sync_rollup(store, "r", "rr", ["grp"], "sum_val")  # top: rr@1 ← r@1
    # advance the base twice and sync ONLY the mid view: rr still
    # pins r@1, which pins t@1 — the DAG's only consistent cut
    store.upsert(
        spark.createDataFrame([(4, 100.0, "B")], SCHEMA), "t", "id"
    )
    sync_rollup(store, "t", "r", ["grp"], "val")       # r@2 ← t@2
    store.upsert(
        spark.createDataFrame([(5, 2.0, "A")], SCHEMA), "t", "id"
    )
    sync_rollup(store, "t", "r", ["grp"], "val")       # r@3 ← t@3
    vec_before = resolve_group_versions(store, ["t", "r", "rr"])
    assert vec_before == {"t": 1, "r": 1, "rr": 1}
    # default vacuum of the BASE: r's latest watermark says t@3, but
    # r's retained v1 manifest says t@1 — the deep floor keeps t@1
    store.vacuum("t", keep_last=1, grace_s=0.0)
    assert 1 in store.versions("t")
    vec_after = resolve_group_versions(store, ["t", "r", "rr"])
    assert vec_after == vec_before
    frames = read_group(store, ["t", "r", "rr"])
    assert _rollup_rows(frames["r"]) == _recompute(store, 1)


def test_vacuum_retain_s_time_travel_contract(spark, tmp_path):
    """r12 (VERDICT r11 item 3): ``vacuum(retain_s=...)`` is the
    deletedFileRetentionDuration analog — every timestamp within the
    window stays servable (the newest pre-window version is retained
    because it was CURRENT at the window's start); older timestamps
    raise the existing loud not-retained error."""
    import time

    store = TableStore(spark, str(tmp_path))
    df = spark.createDataFrame([(1, 1.0, "A")], SCHEMA)
    store.overwrite_keyed(df, "t", "id", n_buckets=2, versioned=True)
    time.sleep(0.15)
    store.upsert(spark.createDataFrame([(2, 2.0, "B")], SCHEMA), "t", "id")
    time.sleep(0.15)
    store.upsert(spark.createDataFrame([(3, 3.0, "A")], SCHEMA), "t", "id")
    ts = {h["version"]: h["ts_millis"] for h in store.history("t")}
    # horizon strictly between v2's and v3's publish instants
    horizon_ms = (ts[2] + ts[3]) // 2
    retain_s = time.time() - horizon_ms / 1000.0
    store.vacuum("t", keep_last=1, grace_s=0.0, retain_s=retain_s)
    # v3 (window) and v2 (current at window start) retained; v1 gone
    assert store.versions("t") == [2, 3]
    # inside the horizon: any ts in the window resolves
    assert store.version_as_of("t", horizon_ms) == 2
    assert store.version_as_of("t", ts[3]) == 3
    assert store.read("t", version=2).count() == 2
    # outside the horizon: loud, not a silently-older snapshot
    with pytest.raises(ValueError, match="no retained version"):
        store.version_as_of("t", ts[2] - 1)


def test_read_group_asof_composes_with_retain_s(spark, tmp_path):
    """r12: the vacuum retention window is the GROUP time-travel
    contract too — an as-of group read inside the horizon keeps
    resolving after vacuum; once the horizon passes (views vacuumed,
    then bases), the same read raises the loud per-table not-retained
    error instead of silently serving a younger cut."""
    import time

    store = _mk(spark, tmp_path)  # t@1 + r@1 synced
    time.sleep(0.05)
    t_mid = int(time.time() * 1000)
    time.sleep(0.05)
    for i in (4, 5):
        store.upsert(
            spark.createDataFrame([(i, float(i), "B")], SCHEMA), "t", "id"
        )
        sync_rollup(store, "t", "r", ["grp"], "val")

    # inside the horizon: a retain_s window reaching past t_mid keeps
    # the v1 pair servable through default vacuum
    wide = time.time() - (t_mid / 1000.0) + 5.0
    store.vacuum("r", keep_last=1, grace_s=0.0, retain_s=wide)
    store.vacuum("t", keep_last=1, grace_s=0.0, retain_s=wide)
    vec = resolve_group_versions(store, ["t", "r"], as_of_ts=t_mid)
    assert vec == {"t": 1, "r": 1}
    frames = read_group(store, ["t", "r"], as_of_ts=t_mid)
    assert _rollup_rows(frames["r"]) == _recompute(store, 1)

    # horizon passed: top-down vacuum without the window reclaims the
    # old pair; the as-of group read must refuse loudly
    store.vacuum("r", keep_last=1, grace_s=0.0)
    store.vacuum("t", keep_last=1, grace_s=0.0)
    with pytest.raises(ValueError, match="no retained version"):
        read_group(store, ["t", "r"], as_of_ts=t_mid)
    # the current cut is untouched by the reclamation
    vec_now = resolve_group_versions(store, ["t", "r"])
    assert vec_now["t"] == store.latest_version("t")


def test_view_deps_conflicting_watermarks_take_max(spark, tmp_path):
    """ADVICE r11 (consistency._view_deps): two current-incarnation
    maintenance apps for the SAME base (a mechanism change carries the
    old app id forward) must resolve deterministically to the MAX —
    watermarks are monotone within an incarnation — never to whichever
    the dict yields last."""
    from datapipelinerepo_spark.plans.consistency import _view_deps

    store = _mk(spark, tmp_path)
    inc = store.table_incarnation("t") or "0"
    for txn in (
        {f"rollup_sync:t:{inc}": 1, f"viewsync_fact:t:{inc}": 3},
        {f"viewsync_fact:t:{inc}": 3, f"rollup_sync:t:{inc}": 1},
    ):
        deps, had = _view_deps(
            store, "r", 1, txn, lambda b: inc
        )
        assert had and deps == {"t": 3}


@pytest.mark.slow
def test_resolver_stress_deep_dag_metadata_only(spark, tmp_path):
    """VERDICT r11 item 4: resolution over a 3-level stacked DAG with
    ~100-version base history and interleaved PARTIAL syncs (the top
    rollup lags one mid-view version at the end) must stay
    metadata-only — zero Spark jobs, bounded wall-clock — and land on
    the exact manifest-proven cut: rr's newest watermark names
    vec['r'], whose manifest watermark names vec['t']."""
    import time

    store = _mk(spark, tmp_path)                       # t@1, r@1 ← t@1
    sync_rollup(store, "r", "rr", ["grp"], "sum_val")  # rr@1 ← r@1
    for i in range(20):
        for _ in range(5):  # metadata-only history inflation
            store.restore("t", store.latest_version("t"))
        sync_rollup(store, "t", "r", ["grp"], "val")
        if i % 2 == 0:  # partial: the top syncs every OTHER round
            sync_rollup(store, "r", "rr", ["grp"], "sum_val")
    assert len(store.versions("t")) >= 100

    sc = spark.sparkContext
    sc.setJobGroup("resolver_probe", "resolution must run zero jobs")
    try:
        t0 = time.monotonic()
        vec = resolve_group_versions(store, ["t", "r", "rr"])
        elapsed = time.monotonic() - t0
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert not sc.statusTracker().getJobIdsForGroup("resolver_probe"), (
        "group resolution triggered Spark jobs — it must read only "
        "kilobyte manifests"
    )
    assert elapsed < 2.0, (
        f"resolution took {elapsed:.2f}s on a ~130-manifest DAG — "
        "metadata-only cost should be tens of ms"
    )

    # the lagging top pins the DAG: rr at its newest version, r at
    # rr's watermark (one behind latest), t at THAT r version's
    # watermark (five base versions behind latest)
    wm = {
        name: {
            h["version"]: {
                app: int(v)
                for app, v in h["txn"].items()
                if app.startswith(("rollup_sync:", "viewsync_"))
            }
            for h in store.history(name)
        }
        for name in ("r", "rr")
    }
    inc_t = store.table_incarnation("t") or "0"
    inc_r = store.table_incarnation("r") or "0"
    assert vec["rr"] == store.latest_version("rr")
    assert vec["r"] == wm["rr"][vec["rr"]][f"rollup_sync:r:{inc_r}"]
    assert vec["r"] == store.latest_version("r") - 1  # top lags one
    assert vec["t"] == wm["r"][vec["r"]][f"rollup_sync:t:{inc_t}"]
    assert vec["t"] < store.latest_version("t")
    # and the cut is servable: the pinned frames exist and agree
    frames = read_group(store, ["t", "r", "rr"])
    assert _rollup_rows(frames["r"]) == _recompute(store, vec["t"])


def test_write_group_seq_enum_cap_truncation_is_loud(spark, tmp_path):
    """ADVICE r11 (consistency resolver): when the bounded write-group
    sequence search is TRUNCATED before finding a cut, the error must
    say so (and name the bound) — distinguishable from 'no cut
    exists'. Reproduced by capping the search at 1 in the lagging-view
    scenario whose consistent cut is the SECOND combination."""
    from datapipelinerepo_spark.plans import consistency as C
    from datapipelinerepo_spark.plans.consistency import write_group

    store, mk = _wg_store(spark, tmp_path)
    writes = {"a": mk("a", lambda s: s * 10), "b": mk("b", lambda s: s * 10)}
    write_group(store, "g", writes)            # seq 1
    sync_rollup(store, "a", "r", ["id"], "v")  # r reflects a@seq1
    write_group(store, "g", writes)            # seq 2 — r lags

    # uncapped: falls back to seq 1 (the lagging-view test's contract)
    assert resolve_group_versions(store, ["a", "b", "r"])["a"] == 1
    cap = C._SEQ_ENUM_CAP
    C._SEQ_ENUM_CAP = 1
    try:
        with pytest.raises(GroupConsistencyError, match="TRUNCATED"):
            resolve_group_versions(store, ["a", "b", "r"])
    finally:
        C._SEQ_ENUM_CAP = cap
