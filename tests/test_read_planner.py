"""Unified predicate-driven read planning (VERDICT r12 item 3/4):
``read(name, where=...)`` routes each conjunct to every applicable
file-skipping structure — manifest min/max stats AND per-column bloom
sidecars — intersects the kept sets, applies the exact predicate on
the pruned scan, and exposes the routing via ``plan_read``'s report.
Delta/Iceberg data-skipping parity: the caller states the predicate,
the engine picks the index. Composes with version pinning, and (item
4) with the consistency layer: ``read_group(..., where=)`` prunes a
member's scan at its pinned cut version."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipelinerepo_spark.io import TableStore
from datapipelinerepo_spark.plans.consistency import read_group
from datapipelinerepo_spark.plans.rollup import sync_rollup


def _mk(spark, tmp_path, n=2000, buckets=8):
    store = TableStore(spark, str(tmp_path))
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("cust"),
        (F.col("id") % 5).alias("status"),
        (F.col("id") * 1.5).alias("amt"),
    )
    # r14: store writes hash-cluster to one file per bucket, so a
    # single overwrite would leave `buckets` files each spanning the
    # whole k/cust domain — nothing for min/max or bloom pruning to
    # separate (the old fixture's skippable layout was an accident of
    # multi-task writes). Load the table the way skippable layout
    # actually accumulates at scale: an initial slab plus ranged
    # appends, so each write's files carry narrow k ranges and only a
    # slice of the cust values.
    slab = max(1, n // 5)
    store.overwrite_keyed(
        df.filter(F.col("k") < slab), "t", "k",
        n_buckets=buckets, versioned=True,
    )
    for lo in range(slab, n, slab):
        store.append(
            df.filter((F.col("k") >= lo) & (F.col("k") < lo + slab)), "t"
        )
    return store, df


def test_planner_routes_and_intersects_all_pruners(spark, tmp_path):
    """One where= with a bloom-prunable equality, a stats-prunable
    range (k is write-clustered by the range partitioning of
    spark.range), and an unindexed unclustered IN-list: each pruner
    fires where it applies, the kept set is the intersection, and the
    result equals the exact filter."""
    store, df = _mk(spark, tmp_path)
    store.build_bloom_index("t", "cust", m_bits=1 << 14)
    where = {"cust": 13, "k": slice(0, 400), "status": [1, 2]}
    keep, rep = store.plan_read("t", where)
    total = rep["total_files"]
    # equality routed to BOTH stats and bloom; bloom actually pruned
    eq = rep["columns"]["cust"]["pruners"]
    assert eq["bloom"] is not None and 0 < eq["bloom"]["kept"] < total
    # range routed to stats only (bloom cannot answer ranges)
    rg = rep["columns"]["k"]["pruners"]
    assert rg["bloom"] is None
    assert 0 < rg["stats"]["kept"] < total  # k is clustered: stats fire
    # unindexed unclustered IN-list: no pruner helps, all files kept
    il = rep["columns"]["status"]["pruners"]
    assert il["bloom"] is None and il["stats"]["kept"] == total
    # intersection is tighter than any single column's kept set
    assert rep["kept_files"] == len(keep)
    assert rep["kept_files"] <= min(
        c["kept"] for c in rep["columns"].values()
    )
    out = store.read("t", where=where)
    exact = df.filter(
        (F.col("cust") == 13)
        & F.col("k").between(0, 400)
        & F.col("status").isin([1, 2])
    )
    assert sorted(r["k"] for r in out.collect()) == sorted(
        r["k"] for r in exact.collect()
    )


def test_planner_correct_across_all_spec_shapes(spark, tmp_path):
    store, df = _mk(spark, tmp_path, n=800)
    store.build_bloom_index("t", "cust", m_bits=1 << 14)
    cases = [
        {"cust": 42},
        {"cust": [5, 13, 96]},
        {"k": slice(100, 250)},
        {"cust": 7, "amt": slice(0.0, 500.0)},
        {"cust": [1, 2], "k": slice(0, 700), "status": 3},
    ]
    for where in cases:
        got = store.read("t", where=where)
        exp = df
        for c, spec in where.items():
            if isinstance(spec, slice):
                exp = exp.filter(F.col(c).between(spec.start, spec.stop))
            elif isinstance(spec, list):
                exp = exp.filter(F.col(c).isin(spec))
            else:
                exp = exp.filter(F.col(c) == spec)
        assert sorted(r["k"] for r in got.collect()) == sorted(
            r["k"] for r in exp.collect()
        ), where


def test_planner_spec_validation(spark, tmp_path):
    store, _ = _mk(spark, tmp_path, n=100, buckets=2)
    for bad in (
        {"cust": None},
        {"cust": []},
        {"cust": [1, None]},
        {"k": slice(None, 5)},
        {"k": slice(0, 10, 2)},
        {},
    ):
        with pytest.raises(ValueError):
            store.plan_read("t", bad)
    # unversioned table: planning refused, ordinary read still works
    store.overwrite(
        spark.range(5).select(F.col("id").alias("x")), "plain"
    )
    with pytest.raises(ValueError):
        store.read("plain", where={"x": 1})


def test_planner_composes_with_time_travel(spark, tmp_path):
    """where= prunes WITHIN the pinned snapshot: rows upserted after
    the pinned version must not appear, rows deleted after must."""
    store, df = _mk(spark, tmp_path, n=600)
    store.build_bloom_index("t", "cust", m_bits=1 << 14)
    v1 = store.latest_version("t")
    inj = spark.range(600, 640).select(
        F.col("id").alias("k"), F.lit(13).cast("long").alias("cust"),
        F.lit(0).cast("long").alias("status"), F.lit(1.0).alias("amt"),
    )
    store.upsert(inj, "t", "k")
    old = store.read("t", version=v1, where={"cust": 13})
    new = store.read("t", where={"cust": 13})
    n_old = old.count()
    assert new.count() == n_old + 40
    assert max(r["k"] for r in old.collect()) < 600


def test_planner_correct_after_column_rename(spark, tmp_path):
    """Stats and bloom are keyed by PHYSICAL names; the planner must
    translate the logical where= column through the snapshot's
    colmap, same as read_where/read_point do."""
    store, df = _mk(spark, tmp_path, n=400)
    store.build_bloom_index("t", "cust", m_bits=1 << 14)
    store.rename_column("t", "cust", "customer")
    keep, rep = store.plan_read("t", {"customer": 13})
    pr = rep["columns"]["customer"]["pruners"]
    assert pr["bloom"] is not None and pr["bloom"]["kept"] < rep["total_files"]
    got = sorted(
        r["k"] for r in store.read("t", where={"customer": 13}).collect()
    )
    assert got == sorted(
        r["k"]
        for r in store.read("t").filter(F.col("customer") == 13).collect()
    )


def test_read_group_point_probe_at_pinned_cut(spark, tmp_path):
    """VERDICT r12 item 4: serving 'entity X from a maintained view at
    a consistent cut' — read_group(where=) must prune the member's
    scan AND honor the cut (a base write past the view's sync must not
    leak into the group read)."""
    store, df = _mk(spark, tmp_path, n=1000)
    sync_rollup(store, "t", "r", ["cust"], "amt")
    store.build_bloom_index("t", "cust", m_bits=1 << 14)
    # base moves ahead of the rollup: group cut must rewind the base
    inj = spark.range(1000, 1040).select(
        F.col("id").alias("k"), F.lit(13).cast("long").alias("cust"),
        F.lit(0).cast("long").alias("status"), F.lit(1.0).alias("amt"),
    )
    store.upsert(inj, "t", "k")
    g = read_group(store, ["t", "r"], where={"t": {"cust": 13}})
    rows = g["t"].collect()
    # pinned cut: pre-upsert snapshot only, exactly the cust=13 rows
    assert sorted(r["k"] for r in rows) == sorted(
        r["k"] for r in df.filter(F.col("cust") == 13).collect()
    )
    # and the probe actually pruned at that pinned version
    from datapipelinerepo_spark.plans.consistency import (
        resolve_group_versions,
    )

    vec = resolve_group_versions(store, ["t", "r"])
    keep, rep = store.plan_read("t", {"cust": 13}, version=vec["t"])
    assert 0 < rep["kept_files"] < rep["total_files"]
    # rollup member unlisted in where= reads whole and agrees with the
    # same-cut base aggregate
    agg = {
        r["cust"]: r["s"]
        for r in g["t"].groupBy("cust").agg(F.sum("amt").alias("s")).collect()
    }
    roll = {
        r["cust"]: r["sum_val"]
        for r in g["r"].filter(F.col("cust") == 13).collect()
    }
    assert roll[13] == pytest.approx(agg[13])


def test_planner_bucket_pruner_on_merge_key(spark, tmp_path):
    """The strongest pruner: an equality/IN-list on the single-column
    merge key routes to its hash bucket DRIVER-SIDE (lookup()'s
    mechanism, reached by stating the predicate). Type looseness must
    disable it, never false-negative: 777.0 probed against a BIGINT
    key matches row 777 under Spark's relaxed equality but can hash
    to a different bucket — the planner skips the pruner for any
    probe whose Python type is not exactly the key's."""
    store, df = _mk(spark, tmp_path, n=1500, buckets=16)
    keep, rep = store.plan_read("t", {"k": 777})
    bk = rep["columns"]["k"]["pruners"]["bucket"]
    assert bk is not None and 0 < bk["kept"] < rep["total_files"]
    assert [r["k"] for r in store.read("t", where={"k": 777}).collect()] \
        == [777]
    # IN-list routes each value; union of buckets
    keep, rep = store.plan_read("t", {"k": [5, 777, 1499, 10**7]})
    bk = rep["columns"]["k"]["pruners"]["bucket"]
    assert bk is not None and bk["kept"] < rep["total_files"]
    assert sorted(
        r["k"]
        for r in store.read("t", where={"k": [5, 777, 1499, 10**7]})
        .collect()
    ) == [5, 777, 1499]
    # loosely-typed probes: pruner OFF, exact filter still owns result
    for probe in (777.0, True):
        keep, rep = store.plan_read("t", {"k": probe})
        assert rep["columns"]["k"]["pruners"]["bucket"] is None
    assert [
        r["k"] for r in store.read("t", where={"k": 777.0}).collect()
    ] == [777]
    # composite keys: bucket routing needs full tuples — pruner off
    two = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b"),
        (F.col("id") * 2.0).alias("v"),
    )
    store.overwrite_keyed(two, "t2", ["a", "b"], n_buckets=4,
                          versioned=True)
    keep, rep = store.plan_read("t2", {"a": 5})
    assert rep["columns"]["a"]["pruners"]["bucket"] is None
    assert [r["b"] for r in store.read("t2", where={"a": 5}).collect()] \
        == [5]


def test_planner_bucket_pruner_string_key(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    df = spark.range(500).select(
        F.concat(F.lit("id-"), F.col("id")).alias("k"),
        (F.col("id") % 13).alias("g"),
    )
    store.overwrite_keyed(df, "s", "k", n_buckets=8, versioned=True)
    keep, rep = store.plan_read("s", {"k": "id-77"})
    bk = rep["columns"]["k"]["pruners"]["bucket"]
    assert bk is not None and bk["kept"] < rep["total_files"]
    assert [
        r["g"] for r in store.read("s", where={"k": "id-77"}).collect()
    ] == [77 % 13]


def test_planner_disjunction_unions_branches(spark, tmp_path):
    """DNF planning (r13): where=[b1, b2, ...] is OR-of-ANDs — kept
    sets union across branches, each branch still intersects its own
    conjuncts with every applicable pruner, and the exact filter is
    the OR of the branches' AND chains."""
    store, df = _mk(spark, tmp_path, n=2000, buckets=16)
    store.build_bloom_index("t", "cust", m_bits=1 << 14)
    where = [
        {"cust": 13},                      # bloom
        {"k": slice(0, 120)},              # stats (clustered)
        {"k": 1999},                       # bucket routing
        {"cust": 7, "k": slice(0, 900)},   # bloom ∩ stats
    ]
    keep, rep = store.plan_read("t", where)
    total = rep["total_files"]
    assert len(rep["branches"]) == 4
    for b in rep["branches"]:
        assert 0 < b["kept"] < total
    assert rep["kept_files"] <= sum(b["kept"] for b in rep["branches"])
    assert rep["kept_files"] >= max(b["kept"] for b in rep["branches"])
    got = sorted(r["k"] for r in store.read("t", where=where).collect())
    exp = sorted(
        r["k"]
        for r in df.filter(
            (F.col("cust") == 13)
            | F.col("k").between(0, 120)
            | (F.col("k") == 1999)
            | ((F.col("cust") == 7) & F.col("k").between(0, 900))
        ).collect()
    )
    assert got == exp and got
    # single-branch list ≡ plain dict; empty list is loud
    one = store.read("t", where=[{"cust": 13}])
    assert sorted(r["k"] for r in one.collect()) == sorted(
        r["k"] for r in store.read("t", where={"cust": 13}).collect()
    )
    with pytest.raises(ValueError, match="at least one branch"):
        store.plan_read("t", [])
    with pytest.raises(ValueError, match="at least one column"):
        store.plan_read("t", [{}])


def test_planner_composite_key_tuple_routing(spark, tmp_path):
    """r13 late: a branch pinning EVERY column of a composite merge
    key with equalities routes the full key tuples driver-side —
    the lookup() mechanism through read(where=). Partial key pins
    stay unrouted; loose types stay unrouted; IN-lists route their
    cartesian product."""
    store = TableStore(spark, str(tmp_path))
    two = spark.range(3000).select(
        (F.col("id") % 50).alias("a"), (F.col("id") % 61).alias("b"),
        (F.col("id") * 2.0).alias("v"),
    )
    store.overwrite_keyed(two, "t2", ["a", "b"], n_buckets=32,
                          versioned=True)
    keep, rep = store.plan_read("t2", {"a": 5, "b": 7})
    kt = rep["columns"].get("__key_tuple__")
    assert kt is not None
    assert 0 < kt["pruners"]["bucket"]["kept"] < rep["total_files"]
    got = sorted(
        r["v"] for r in store.read("t2", where={"a": 5, "b": 7}).collect()
    )
    exp = sorted(
        r["v"]
        for r in two.filter((F.col("a") == 5) & (F.col("b") == 7))
        .collect()
    )
    assert got == exp and got
    # IN-list on one key column: cartesian of tuples routes
    keep, rep = store.plan_read("t2", {"a": [5, 6], "b": 7})
    assert "__key_tuple__" in rep["columns"]
    got = sorted(
        r["v"]
        for r in store.read("t2", where={"a": [5, 6], "b": 7}).collect()
    )
    exp = sorted(
        r["v"]
        for r in two.filter(F.col("a").isin([5, 6]) & (F.col("b") == 7))
        .collect()
    )
    assert got == exp and got
    # partial pin: no tuple routing (still correct)
    keep, rep = store.plan_read("t2", {"a": 5})
    assert "__key_tuple__" not in rep["columns"]
    # loose type on one component: no routing, result still exact
    keep, rep = store.plan_read("t2", {"a": 5.0, "b": 7})
    assert "__key_tuple__" not in rep["columns"]
    got2 = sorted(
        r["v"] for r in store.read("t2", where={"a": 5.0, "b": 7}).collect()
    )
    exp2 = sorted(
        r["v"]
        for r in two.filter((F.col("a") == 5.0) & (F.col("b") == 7))
        .collect()
    )
    assert got2 == exp2


# --- r13 continuation: null-count stats + IS_NULL/NOT_NULL/Prefix -----


def _mk_nullable(spark, tmp_path, prefix="tn"):
    """A versioned keyed table loaded as TWO appended batches with
    opposite nullability of ``note``: the base write's rows all carry
    a value, the appended batch's rows are all NULL — so per-file
    null-count stats can separate the batches (appends never rewrite
    existing files)."""
    store = TableStore(spark, str(tmp_path / prefix))
    base = spark.range(500).select(
        F.col("id").alias("k"),
        F.format_string("w%05d", F.col("id")).alias("note"),
        (F.col("id") % 7).alias("g"),
    )
    extra = spark.range(500, 800).select(
        F.col("id").alias("k"),
        F.lit(None).cast("string").alias("note"),
        (F.col("id") % 7).alias("g"),
    )
    store.overwrite_keyed(base, "t", "k", n_buckets=4, versioned=True)
    store.append(extra, "t")
    return store, base.unionByName(extra)


def test_is_null_and_not_null_prune_and_match(spark, tmp_path):
    from datapipelinerepo_spark.io import IS_NULL, NOT_NULL

    store, df = _mk_nullable(spark, tmp_path)
    keep, rep = store.plan_read("t", {"note": IS_NULL})
    total = rep["total_files"]
    pr = rep["columns"]["note"]["pruners"]
    assert pr["bloom"] is None and pr["bucket"] is None
    assert 0 < pr["stats"]["kept"] < total  # base files pruned
    got = sorted(
        r["k"] for r in store.read("t", where={"note": IS_NULL}).collect()
    )
    assert got == list(range(500, 800))

    keep, rep = store.plan_read("t", {"note": NOT_NULL})
    assert 0 < rep["columns"]["note"]["pruners"]["stats"]["kept"] < total
    got = sorted(
        r["k"] for r in store.read("t", where={"note": NOT_NULL}).collect()
    )
    assert got == list(range(500))


def test_null_specs_compose_with_value_conjuncts_and_dnf(spark, tmp_path):
    from datapipelinerepo_spark.io import IS_NULL, NOT_NULL

    store, df = _mk_nullable(spark, tmp_path)
    got = sorted(
        r["k"]
        for r in store.read(
            "t", where={"note": NOT_NULL, "g": 3}
        ).collect()
    )
    exp = sorted(
        r["k"]
        for r in df.filter(
            F.col("note").isNotNull() & (F.col("g") == 3)
        ).collect()
    )
    assert got == exp and got
    # DNF: IS NULL on one branch OR a key range on the other
    got = sorted(
        r["k"]
        for r in store.read(
            "t", where=[{"note": IS_NULL}, {"k": slice(0, 9)}]
        ).collect()
    )
    exp = sorted(
        r["k"]
        for r in df.filter(
            F.col("note").isNull() | F.col("k").between(0, 9)
        ).collect()
    )
    assert got == exp and got


def test_value_probe_skips_all_null_files(spark, tmp_path):
    """An equality/range probe never matches NULL, so a file whose
    null-count stats prove the column is ALL NULL is skipped even
    though it has no [min, max] to compare (pre-r13 those files were
    always kept)."""
    store, df = _mk_nullable(spark, tmp_path)
    keep, rep = store.plan_read("t", {"note": "w00007"})
    total = rep["total_files"]
    # all-NULL appended files pruned via the stats route
    assert rep["columns"]["note"]["pruners"]["stats"]["kept"] < total
    got = [
        r["k"] for r in store.read("t", where={"note": "w00007"}).collect()
    ]
    assert got == [7]


def test_is_null_keeps_files_that_predate_the_column(spark, tmp_path):
    """Schema-evolution false-negative trap: files written BEFORE a
    column was added have no stats entry for it, but their rows read
    back as NULL under schema merge — an IS_NULL probe must keep
    them."""
    from datapipelinerepo_spark.io import IS_NULL, NOT_NULL

    store = TableStore(spark, str(tmp_path / "evo"))
    store.overwrite_keyed(
        spark.range(100).select(F.col("id").alias("k")),
        "t", "k", n_buckets=2, versioned=True,
    )
    store.append(
        spark.range(100, 150).select(
            F.col("id").alias("k"),
            F.format_string("x%d", F.col("id")).alias("late"),
        ),
        "t",
    )
    got = sorted(
        r["k"] for r in store.read("t", where={"late": IS_NULL}).collect()
    )
    assert got == list(range(100))
    got = sorted(
        r["k"] for r in store.read("t", where={"late": NOT_NULL}).collect()
    )
    assert got == list(range(100, 150))


def test_null_probe_on_legacy_stats_is_inert_and_warns(spark, tmp_path, monkeypatch):
    """Manifests carried forward from pre-null-count publishes hold
    2-element entries: null probes keep every file (correct, slower)
    and warn that the route is inert."""
    import warnings as _w

    from datapipelinerepo_spark import io as io_mod
    from datapipelinerepo_spark.io import IS_NULL

    orig = io_mod.TableStore._file_stats

    def legacy(self, name, rel):
        return {
            c: s[:2] for c, s in orig(self, name, rel).items()
            if s[0] is not None
        }

    monkeypatch.setattr(io_mod.TableStore, "_file_stats", legacy)
    store, df = _mk_nullable(spark, tmp_path, prefix="leg")
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        keep, rep = store.plan_read("t", {"note": IS_NULL})
    assert rep["columns"]["note"]["pruners"]["stats"]["kept"] == (
        rep["total_files"]
    )
    assert any("null-count stats" in str(w.message) for w in rec)
    got = sorted(
        r["k"] for r in store.read("t", where={"note": IS_NULL}).collect()
    )
    assert got == list(range(500, 800))


def test_prefix_spec_prunes_clustered_strings(spark, tmp_path):
    from datapipelinerepo_spark.io import Prefix

    store, df = _mk_nullable(spark, tmp_path)
    # note is formatted from k, and the appended all-NULL files are
    # prunable too — both routes feed the same stats pruner
    keep, rep = store.plan_read("t", {"note": Prefix("w0000")})
    total = rep["total_files"]
    pr = rep["columns"]["note"]["pruners"]
    assert pr["bloom"] is None and pr["bucket"] is None
    assert pr["stats"]["kept"] < total  # all-NULL appended files skip
    got = sorted(
        r["k"]
        for r in store.read("t", where={"note": Prefix("w0000")}).collect()
    )
    assert got == list(range(10))
    # a prefix matching nothing: exact filter returns empty
    assert (
        store.read("t", where={"note": Prefix("zz")}).count() == 0
    )


def test_prefix_spec_on_slab_layout_prunes_value_files(spark, tmp_path):
    """With the table loaded as note-slab APPENDS (each batch covers a
    narrow note range — the natural layout of a monotone ingest key),
    per-file [min, max] intervals are narrow and a prefix probe opens
    a strict subset of the VALUE-bearing files."""
    from datapipelinerepo_spark.io import Prefix

    store = TableStore(spark, str(tmp_path / "srt"))
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        F.format_string("w%05d", F.col("id")).alias("note"),
    )
    store.overwrite_keyed(
        df.filter(F.col("k") < 1000), "t", "k", n_buckets=8,
        versioned=True,
    )
    for lo in (1000, 2000, 3000):
        store.append(
            df.filter(F.col("k").between(lo, lo + 999)), "t"
        )
    keep, rep = store.plan_read("t", {"note": Prefix("w003")})
    # only the first slab's files can hold w003xx
    assert 0 < rep["kept_files"] <= rep["total_files"] // 4
    got = sorted(
        r["k"]
        for r in store.read("t", where={"note": Prefix("w003")}).collect()
    )
    assert got == list(range(300, 400))


def test_prefix_validation_and_next_prefix_edges(spark, tmp_path):
    from datapipelinerepo_spark.io import Prefix, TableStore as TS

    with pytest.raises(ValueError):
        Prefix("")
    with pytest.raises(ValueError):
        Prefix(5)
    assert TS._next_prefix("a") == "b"
    assert TS._next_prefix("az") == "a{"
    # carry over a maxed-out last code point
    assert TS._next_prefix("a" + chr(0x10FFFF)) == "b"
    # surrogate block skipped: U+D7FF increments to U+E000
    assert TS._next_prefix(chr(0xD7FF)) == chr(0xE000)
    # every code point maxed: no upper bound
    assert TS._next_prefix(chr(0x10FFFF) * 3) is None


def test_delete_where_planner_specs(spark, tmp_path):
    """delete_where(where=...) — the find phase rides the planner.
    Same end state as the condition= form; spec validation rejects
    ambiguous calls and unversioned tables."""
    from datapipelinerepo_spark.io import IS_NULL

    store = TableStore(spark, str(tmp_path / "dw"))
    df = spark.range(600).select(
        F.col("id").alias("k"),
        (F.col("id") % 37).alias("cust"),
        F.when(F.col("id") % 4 != 0, F.col("id") % 9).alias("opt"),
    )
    store.overwrite_keyed(df, "t", "k", n_buckets=8, versioned=True)
    store.build_bloom_index("t", "cust", m_bits=1 << 14)
    # delete by bloom-indexed equality
    affected = store.delete_where("t", where={"cust": 13})
    assert affected  # some buckets rewrote
    got = sorted(r["k"] for r in store.read("t").collect())
    assert got == [k for k in range(600) if k % 37 != 13]
    # delete NULL rows via the null route
    store.delete_where("t", where={"opt": IS_NULL})
    got = sorted(r["k"] for r in store.read("t").collect())
    assert got == [
        k for k in range(600) if k % 37 != 13 and k % 4 != 0
    ]
    # DNF form
    store.delete_where(
        "t", where=[{"cust": 1}, {"k": slice(500, 599)}]
    )
    got = sorted(r["k"] for r in store.read("t").collect())
    assert got == [
        k for k in range(600)
        if k % 37 not in (13, 1) and k % 4 != 0 and k < 500
    ]
    # empty match: no buckets touched
    assert store.delete_where("t", where={"cust": 999}) == []
    # validation
    with pytest.raises(ValueError, match="exactly one"):
        store.delete_where("t")
    with pytest.raises(ValueError, match="exactly one"):
        store.delete_where("t", F.col("cust") == 1, where={"cust": 1})
    store.overwrite(
        spark.range(5).select(F.col("id").alias("x")), "plain"
    )
    with pytest.raises(ValueError, match="versioned keyed"):
        store.delete_where("plain", where={"x": 1})


def test_stats_coverage_operability_verb(spark, tmp_path, monkeypatch):
    """stats_coverage: per-column minmax/null-count file coverage —
    the 'why is my probe inert' dashboard. Full coverage after engine
    writes; legacy entries show nulls=0 while minmax stays; renamed
    columns report under their LOGICAL name."""
    from datapipelinerepo_spark import io as io_mod

    store = TableStore(spark, str(tmp_path / "cov"))
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("amt"),
        F.format_string("s%d", F.col("id")).alias("name"),
    )
    store.overwrite_keyed(df, "t", "k", n_buckets=2, versioned=True)
    cov = store.stats_coverage("t")
    n = cov["k"]["total"]
    assert n > 0
    for c in ("k", "amt", "name"):
        assert cov[c]["minmax"] == n and cov[c]["nulls"] == n, cov
    # rename: the report keys by logical name
    store.rename_column("t", "amt", "amount")
    cov = store.stats_coverage("t")
    assert "amount" in cov and "amt" not in cov
    assert cov["amount"]["minmax"] == cov["amount"]["total"]
    # legacy (pre-extension) entries: minmax covered, nulls not
    orig = io_mod.TableStore._file_stats

    def legacy(self, name, rel):
        return {
            c: s[:2] for c, s in orig(self, name, rel).items()
            if s[0] is not None
        }

    monkeypatch.setattr(io_mod.TableStore, "_file_stats", legacy)
    store2 = TableStore(spark, str(tmp_path / "leg2"))
    store2.overwrite_keyed(
        spark.range(50).select(F.col("id").alias("k")),
        "t", "k", n_buckets=2, versioned=True,
    )
    cov2 = store2.stats_coverage("t")
    assert cov2["k"]["minmax"] == cov2["k"]["total"]
    assert cov2["k"]["nulls"] == 0


def test_count_where_partial_pushdown(spark, tmp_path):
    """count_where: slab-aligned predicates count from stats with
    ZERO jobs; partial overlaps scan only the boundary files; results
    are exact across spec shapes."""
    from datapipelinerepo_spark.io import IS_NULL, NOT_NULL

    store = TableStore(spark, str(tmp_path / "cw"))
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 53).alias("cust"),
        F.when(F.col("id") % 3 != 0, F.col("id")).alias("opt"),
    )
    # k-slab appends: files narrow in k
    store.overwrite_keyed(
        df.filter(F.col("k") < 250), "t", "k", n_buckets=4,
        versioned=True,
    )
    for lo in (250, 500, 750):
        store.append(df.filter(F.col("k").between(lo, lo + 249)), "t")

    sc = spark.sparkContext
    sc.setJobGroup("cw_probe", "aligned count must run zero jobs")
    try:
        n, rep = store.count_where(
            "t", {"k": slice(250, 499)}, with_report=True
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert n == 250
    assert rep["scanned"] == 0 and rep["rows_from_stats"] == 250
    assert rep["pruned"] > 0
    assert not sc.statusTracker().getJobIdsForGroup("cw_probe")

    # partial overlap: boundary files scan, count stays exact
    n, rep = store.count_where(
        "t", {"k": slice(100, 899)}, with_report=True
    )
    assert n == 800
    assert 0 < rep["scanned"] < rep["total_files"]
    assert rep["stats_counted"] > 0  # the fully-covered middle slabs

    # NULL specs: the extension proves whole files
    assert store.count_where("t", {"opt": NOT_NULL}) == sum(
        1 for k in range(1000) if k % 3 != 0
    )
    assert store.count_where("t", {"opt": IS_NULL}) == sum(
        1 for k in range(1000) if k % 3 == 0
    )
    # conjunction: value condition forces a scan, exactness holds
    assert store.count_where(
        "t", {"k": slice(0, 499), "cust": 7}
    ) == sum(1 for k in range(500) if k % 53 == 7)
    # validation
    import pytest as _pt

    with _pt.raises(ValueError, match="ONE conjunct"):
        store.count_where("t", [{"k": 1}])
    with _pt.raises(ValueError, match="ONE conjunct"):
        store.count_where("t", {})


def test_review_fixes_stats_verbs_dropped_and_schemaless(spark, tmp_path):
    """Review wave: stats verbs refuse dropped columns (retention
    artifacts must not answer queries the scan would raise on), and
    empty where= dicts raise the descriptive error on the mutating
    verbs instead of crashing."""
    store = TableStore(spark, str(tmp_path / "rf"))
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("amt"),
        (F.col("id") % 5).alias("grp"),
    )
    store.overwrite_keyed(df, "t", "k", n_buckets=2, versioned=True)
    store.drop_column("t", "amt")
    with pytest.raises(ValueError, match="dropped"):
        store.stats_scalar("t", "max", "amt")
    with pytest.raises(ValueError, match="dropped"):
        store.count_where("t", {"amt": slice(0.0, 10.0)})
    assert "amt" not in store.stats_coverage("t")
    # empty conjuncts on the mutating verbs: descriptive errors
    with pytest.raises(ValueError, match="at least one column"):
        store.delete_where("t", where={})
    with pytest.raises(ValueError, match="non-empty"):
        store.update_where("t", {"grp": 0}, where=[{}])


def test_review_fix_element_bloom_covers_empty_array_files(spark, tmp_path):
    """Review wave: a file whose rows all carry empty/NULL arrays gets
    a bitmap (outer explode) — update_bloom_index reaches the
    0-new-files steady state instead of rescanning it forever."""
    from datapipelinerepo_spark.io import Has

    store = TableStore(spark, str(tmp_path / "eb"))
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.array(F.lit("w")).alias("toks"),
    )
    store.overwrite_keyed(df, "t", "k", n_buckets=2, versioned=True)
    store.build_bloom_index("t", "toks", m_bits=1 << 12, elements=True)
    # append a batch of ONLY empty arrays
    store.append(
        spark.range(100, 140).select(
            F.col("id").alias("k"),
            F.array().cast("array<string>").alias("toks"),
        ),
        "t",
    )
    assert store.update_bloom_index("t", "toks") > 0
    cov = store.bloom_coverage("t", "toks")
    assert cov["uncovered"] == 0
    assert store.update_bloom_index("t", "toks") == 0  # steady state
    # membership still correct: empty-array rows never match
    got = sorted(
        r["k"] for r in store.read("t", where={"toks": Has("w")}).collect()
    )
    assert got == list(range(100))


def test_review_fix_inert_warning_not_silenced_by_null_entries(
    spark, tmp_path, monkeypatch
):
    """Review wave: [None, None, nulls, rows] entries (null counts
    without usable min/max) must not silence the stats-inert warning
    for range probes."""
    import warnings as _w

    from datapipelinerepo_spark import io as io_mod

    orig = io_mod.TableStore._file_stats

    def nulls_only(self, name, rel):
        return {
            c: [None, None, s[2], s[3]]
            for c, s in orig(self, name, rel).items()
            if len(s) >= 4 and s[2] is not None and s[2] < s[3]
        }

    monkeypatch.setattr(io_mod.TableStore, "_file_stats", nulls_only)
    store = TableStore(spark, str(tmp_path / "iw"))
    store.overwrite_keyed(
        spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("amt")
        ),
        "t", "k", n_buckets=2, versioned=True,
    )
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        keep, rep = store.plan_read("t", {"amt": slice(0.0, 10.0)})
    assert rep["columns"]["amt"]["pruners"]["stats"]["kept"] == (
        rep["total_files"]
    )
    assert any("INERT" in str(w.message) for w in rec)
