"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is materialized through the noop sink (full computation, no
driver collect) and timed over RUNS consecutive executions; the
reported per-query number is the MEDIAN (r4 showed a uniform ±10-15%
single-run drift that a median kills), with the max-min spread
reported beside it under "spread" so run variance is visible instead
of inferred. "value" is the sum of medians.

The warm-up set below is FROZEN as of round 5 (protocol note in
VERDICT r4): it may not grow new per-query warm-ups, so cross-round
totals stay comparable. It covers session/JIT/parquet-footer warm-up,
the shared operator families (hash agg, shuffle join, window, nested
array lambdas, bucket-collect pair expansion), the MinHash generated
class at 256 docs, and the first pandas-UDF worker fork.

One streaming entry (stream_curate_drain) times an availableNow
micro-batch drain of the documents table through the curation ingest
(gates + redact + in-batch and historical exact dedup + partitioned
parquet sink) — fresh checkpoint/store per run so every run does the
full work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datapipelinerepo_spark.registry import REGISTRY  # noqa: E402
import datapipelinerepo_spark.registry_ext  # noqa: E402,F401
from datapipelinerepo_spark.io import load_table  # noqa: E402
from datapipelinerepo_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM/codegen/parquet-footer caches. Beyond the raw scans,
    # exercise the operator classes the timed queries use (hash agg,
    # shuffle join, window, higher-order array functions) so per-query
    # numbers reflect steady-state latency, not first-touch JIT of
    # whole operator families.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tabs = {
        t: load_table(spark, sf_dir, t)
        for t in ("lineitem", "orders", "documents", "embeddings", "events")
    }
    for df in tabs.values():
        df.write.format("noop").mode("overwrite").save()
    warm_li = tabs["lineitem"].filter(F.col("l_quantity") > 0)
    (
        warm_li.join(tabs["orders"], warm_li.l_orderkey == tabs["orders"].o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice"))
        .write.format("noop").mode("overwrite").save()
    )
    (
        tabs["events"]
        .select(F.row_number().over(Window.partitionBy("user_id").orderBy("event_id")))
        .write.format("noop").mode("overwrite").save()
    )
    (
        tabs["documents"]
        .select(
            F.array_min(F.transform(F.split("text", " "), lambda s: F.xxhash64(s))),
            # the Carter-Wegman signature shape (pmod multiply-add over a
            # base-hash array) so the minhash query's first evaluation is
            # not also its JIT warm-up
            F.array_min(
                F.transform(
                    F.transform(
                        F.split("text", " "),
                        lambda s: F.pmod(F.xxhash64(s), F.lit(2147483647)),
                    ),
                    lambda h: F.pmod(h * F.lit(12345) + F.lit(67), F.lit(2147483647)),
                )
            ),
        )
        .write.format("noop").mode("overwrite").save()
    )
    # set-algebra + banded self-join shapes (minhash verify / LSH
    # candidate join operator families) on a tiny slice — first-touch
    # JIT of these operators otherwise lands in the first timed query
    # that uses them
    wdoc = tabs["documents"].limit(512).select(
        "doc_id",
        F.array_distinct(
            F.transform(F.split("text", " "), lambda s: F.xxhash64(s, F.lit(1)))
        ).alias("_sh"),
    )
    wa, wb = wdoc.alias("a"), wdoc.alias("b")
    (
        wa.join(wb, F.xxhash64(F.col("a.doc_id")) % 16 == F.xxhash64(F.col("b.doc_id")) % 16)
        .select(
            (
                F.size(F.array_intersect("a._sh", "b._sh"))
                / F.size(F.array_union("a._sh", "b._sh"))
            ).alias("j")
        )
        .write.format("noop").mode("overwrite").save()
    )
    # bucket-collect pair expansion (LSH candidate generation since
    # round 3: groupBy + collect_list + nested transform/slice) — the
    # nested-lambda codegen is the expensive first touch
    (
        wdoc.select(
            (F.xxhash64("doc_id") % 16).alias("bk"),
            F.struct(F.col("doc_id").alias("i")).alias("m"),
        )
        .groupBy("bk")
        .agg(F.collect_list("m").alias("_m"))
        .filter(F.size("_m") > 1)
        .withColumn("_ms", F.array_sort("_m"))
        .select(
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
            )
        )
        .write.format("noop").mode("overwrite").save()
    )

    # The exact banding + pair-expansion + verify codegen the MinHash
    # query compiles (32-signature transform chain, nested pair
    # lambdas, array set-algebra) — Janino compiles per generated
    # class, so only the REAL operator at tiny size pre-compiles it.
    from datapipelinerepo_spark.operators import dedup as _D

    _D.minhash_lsh_pairs(tabs["documents"].limit(256)).write.format(
        "noop"
    ).mode("overwrite").save()

    # Arrow / Python-worker first touch: the ANN queries run their
    # projections through pandas UDFs, and the very first pandas-UDF
    # call in a session pays worker fork + Arrow init (~2.3 s measured
    # at sf0.1, vs 0.4 s warm) — absorb it here, not in a timed query.
    from pyspark.sql.functions import pandas_udf

    _warm_pudf = pandas_udf(lambda s: s * 2, "long")

    (
        tabs["embeddings"].limit(64)
        .select(_warm_pudf(F.col("vec_id")))
        .write.format("noop").mode("overwrite").save()
    )

    RUNS = 3
    # store_keyed_merge is timed by a dedicated verb-boundary block
    # below (VERDICT r9 item 4): its registry form materializes the
    # ~75k-row sf0.1 read-back as driver-literal rows inside
    # _ephemeral_store.finish() — an oracle-harness requirement that
    # made the bench row time the HARNESS, not the merge
    names = [n for n, e in REGISTRY.items() if e.bench and n != "store_keyed_merge"]
    times: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        times[name] = round(samples[RUNS // 2], 3)
        spread[name] = round(samples[-1] - samples[0], 3)

    # streaming ingest drain: fresh store + checkpoint per run so each
    # run re-does the full gate/redact/dedup/write work
    import shutil
    import tempfile

    from datapipelinerepo_spark.io import TableStore
    from datapipelinerepo_spark.streaming.ingest import curate_ingest_stream

    doc_schema = tabs["documents"].schema
    samples = []
    for _ in range(RUNS):
        wdir = tempfile.mkdtemp(prefix="bench_stream_")
        try:
            # the file stream source wants a directory; symlink the
            # single-file table into one (no data copy)
            in_dir = os.path.join(wdir, "in")
            os.makedirs(in_dir)
            os.symlink(
                # absolutize: a relative SPARK_GRAFT_SF_DIR would make
                # the link resolve against the temp dir and dangle
                os.path.abspath(os.path.join(sf_dir, "documents.parquet")),
                os.path.join(in_dir, "documents.parquet"),
            )
            stream = spark.readStream.schema(doc_schema).parquet(in_dir)
            store = TableStore(spark, os.path.join(wdir, "store"))
            t0 = time.perf_counter()
            q = curate_ingest_stream(
                stream, store, os.path.join(wdir, "ckpt")
            )
            q.awaitTermination()
            samples.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(wdir, ignore_errors=True)
    samples.sort()
    times["stream_curate_drain"] = round(samples[RUNS // 2], 3)
    spread["stream_curate_drain"] = round(samples[-1] - samples[0], 3)

    # store_keyed_merge, verb-boundary form (VERDICT r9 item 4): the
    # IDENTICAL lifecycle the registry query runs — overwrite_keyed +
    # bucket-pruned upsert + read-back — but the read-back goes to the
    # noop sink instead of being collected and rebuilt as driver-
    # literal rows (finish() exists for the driver's oracle compare,
    # not for the verb). The registry query itself is unchanged.
    from datapipelinerepo_spark.registry_ext import keyed_merge_frames

    samples = []
    for _ in range(RUNS):
        wdir = tempfile.mkdtemp(prefix="bench_keyedmerge_")
        try:
            store = TableStore(spark, os.path.join(wdir, "store"))
            # ONE lifecycle definition shared with the hash-proven
            # registry query — the benched verb cannot de-sync from
            # what correctness proved (code-review r10 wave 3)
            base, inc = keyed_merge_frames(spark, sf_dir)
            t0 = time.perf_counter()
            store.overwrite_keyed(base, "t", "o_orderkey", n_buckets=16)
            store.upsert(inc, "t", "o_orderkey")
            store.read("t").select(
                "o_orderkey", "o_totalprice", "o_orderstatus"
            ).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(wdir, ignore_errors=True)
    samples.sort()
    times["store_keyed_merge"] = round(samples[RUNS // 2], 3)
    spread["store_keyed_merge"] = round(samples[-1] - samples[0], 3)

    # versioned-store lifecycle (VERDICT r6 item 4): overwrite → 3
    # bucket-pruned upserts → snapshot read → time-travel read →
    # compact → vacuum, on a fresh store per run — the full
    # snapshot-table maintenance cycle, which store_keyed_merge (the
    # unversioned MERGE path) does not cover. Timing includes manifest
    # publication overhead per write.
    samples = []
    for _ in range(RUNS):
        wdir = tempfile.mkdtemp(prefix="bench_vstore_")
        try:
            store = TableStore(spark, os.path.join(wdir, "store"))
            base = tabs["orders"].select(
                "o_orderkey", "o_totalprice", "o_orderstatus"
            )
            t0 = time.perf_counter()
            store.overwrite_keyed(
                base, "t", "o_orderkey", n_buckets=32, versioned=True
            )
            for k in range(3):
                changes = base.filter(
                    F.col("o_orderkey") % 100 == k
                ).withColumn("o_totalprice", F.col("o_totalprice") * 2)
                store.upsert(changes, "t", "o_orderkey")
            snap = store.read("t").count()
            tt = store.read("t", version=1).count()
            store.compact("t")
            store.vacuum("t", keep_last=1, grace_s=0.0)
            assert snap == tt  # upserts replace, never add, here
            samples.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(wdir, ignore_errors=True)
    samples.sort()
    times["store_versioned_lifecycle"] = round(samples[RUNS // 2], 3)
    spread["store_versioned_lifecycle"] = round(samples[-1] - samples[0], 3)

    # per-verb store benches (VERDICT r7 item 5): delete_where, restore,
    # lookup and constraint-gated upsert were timed only inside the
    # lifecycle aggregate — here each verb is timed ALONE against a
    # prebuilt (untimed) versioned orders table, so the serving-read
    # claim (lookup ≈ bucket-count-bounded) and the metadata-only
    # restore claim get their own numbers.
    verb_names = (
        "store_lookup_verb",
        "store_constrained_upsert_verb",
        "store_merge_when_verb",
        "store_delete_where_verb",
        "store_table_changes_verb",
        "store_restore_verb",
        # r9 column-mapping verbs: both must clock metadata-only
        # (same files, new kilobyte manifest) — like restore
        "store_rename_column_verb",
        "store_drop_column_verb",
    )
    verb_samples: dict[str, list[float]] = {v: [] for v in verb_names}
    for _ in range(RUNS):
        wdir = tempfile.mkdtemp(prefix="bench_verbs_")
        try:
            store = TableStore(spark, os.path.join(wdir, "store"))
            base = tabs["orders"].select(
                "o_orderkey", "o_totalprice", "o_orderstatus"
            )
            store.overwrite_keyed(
                base, "t", "o_orderkey", n_buckets=32, versioned=True
            )
            store.set_constraints("t", {"price_pos": "o_totalprice > 0"})

            t0 = time.perf_counter()
            store.lookup(
                "t", [1, 7, 34, 96, 4000, 9991, 130, 998]
            ).write.format("noop").mode("overwrite").save()
            verb_samples["store_lookup_verb"].append(time.perf_counter() - t0)

            batch = base.filter(F.col("o_orderkey") % 100 == 7).withColumn(
                "o_totalprice", F.col("o_totalprice") * 2
            )
            t0 = time.perf_counter()
            store.upsert(batch, "t", "o_orderkey")
            verb_samples["store_constrained_upsert_verb"].append(
                time.perf_counter() - t0
            )

            merge_src = base.filter(F.col("o_orderkey") % 100 == 9).select(
                "o_orderkey",
                (F.col("o_totalprice") / 10).alias("adj"),
                F.when(F.col("o_orderkey") % 200 == 9, F.lit("del"))
                .otherwise(F.lit("adj"))
                .alias("tag"),
            )
            t0 = time.perf_counter()
            store.merge_when(
                merge_src,
                "t",
                "o_orderkey",
                when_matched_update={
                    "o_totalprice": "t.o_totalprice + s.adj"
                },
                matched_condition="s.tag = 'adj'",
                when_matched_delete="s.tag = 'del'",
                when_not_matched_insert=False,
            )
            verb_samples["store_merge_when_verb"].append(
                time.perf_counter() - t0
            )

            t0 = time.perf_counter()
            store.delete_where("t", F.col("o_totalprice") > 400000)
            verb_samples["store_delete_where_verb"].append(
                time.perf_counter() - t0
            )

            # the change feed from the initial snapshot across the
            # upsert+merge+delete above — CDF derivation cost
            t0 = time.perf_counter()
            store.table_changes("t", 1).write.format("noop").mode(
                "overwrite"
            ).save()
            verb_samples["store_table_changes_verb"].append(
                time.perf_counter() - t0
            )

            t0 = time.perf_counter()
            store.restore("t", 1)
            verb_samples["store_restore_verb"].append(time.perf_counter() - t0)

            # untimed: the price constraint references the column and
            # would (correctly) refuse the rename
            store.set_constraints("t", {})
            t0 = time.perf_counter()
            store.rename_column("t", "o_totalprice", "amount")
            verb_samples["store_rename_column_verb"].append(
                time.perf_counter() - t0
            )

            t0 = time.perf_counter()
            store.drop_column("t", "o_orderstatus")
            verb_samples["store_drop_column_verb"].append(
                time.perf_counter() - t0
            )
        finally:
            shutil.rmtree(wdir, ignore_errors=True)
    for v, s in verb_samples.items():
        s.sort()
        times[v] = round(s[RUNS // 2], 3)
        spread[v] = round(s[-1] - s[0], 3)

    # group-read resolver (r11): the consistency layer's read-side
    # claim is METADATA-ONLY cost — time the version-vector resolution
    # over a base + maintained rollup with a 4-version history
    # (untimed setup). A regression here (e.g. accidental data I/O in
    # the resolver) would show as this row jumping from milliseconds
    # to scan time.
    from datapipelinerepo_spark.plans.consistency import (
        resolve_group_versions,
    )
    from datapipelinerepo_spark.plans.rollup import sync_rollup

    samples = []
    wdir = tempfile.mkdtemp(prefix="bench_group_")
    try:
        store = TableStore(spark, os.path.join(wdir, "store"))
        base = tabs["orders"].select(
            "o_orderkey", "o_totalprice", "o_orderstatus"
        )
        store.overwrite_keyed(
            base, "t", "o_orderkey", n_buckets=32, versioned=True
        )
        sync_rollup(store, "t", "r", ["o_orderstatus"], "o_totalprice")
        for k in range(3):
            store.upsert(
                base.filter(F.col("o_orderkey") % 100 == k).withColumn(
                    "o_totalprice", F.col("o_totalprice") * 2
                ),
                "t", "o_orderkey",
            )
            sync_rollup(store, "t", "r", ["o_orderstatus"], "o_totalprice")
        vec = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            vec = resolve_group_versions(store, ["t", "r"])
            samples.append(time.perf_counter() - t0)
        assert vec["t"] == store.latest_version("t")  # fully synced
    finally:
        shutil.rmtree(wdir, ignore_errors=True)
    samples.sort()
    times["store_read_group_verb"] = round(samples[RUNS // 2], 3)
    spread["store_read_group_verb"] = round(samples[-1] - samples[0], 3)

    # bloom point probe (r12): the per-file bloom index's serving-read
    # claim — an equality probe on the UNCLUSTERED o_custkey column
    # opens only might-contain files. Setup (table + index build) is
    # untimed; the timed verb is the full probe: index scan → file
    # pruning → pruned data scan → exact filter. A regression here
    # (e.g. the probe collecting bitmaps instead of file names) shows
    # as this row jumping toward full-scan time.
    samples = []
    planned_samples: list[float] = []
    key_samples: list[float] = []
    count_samples: list[float] = []
    wdir = tempfile.mkdtemp(prefix="bench_bloom_")
    try:
        store = TableStore(spark, os.path.join(wdir, "store"))
        base = tabs["orders"].select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        store.overwrite_keyed(
            base, "t", "o_orderkey", n_buckets=32, versioned=True
        )
        store.build_bloom_index("t", "o_custkey", m_bits=1 << 17)
        kept, total_files = store.bloom_kept_files("t", "o_custkey", 42)
        assert 0 < len(kept) < total_files  # pruning live, not inert
        for _ in range(RUNS):
            t0 = time.perf_counter()
            store.read_point("t", "o_custkey", 42).write.format(
                "noop"
            ).mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            # the r13 unified planner over the same probe: routing +
            # report + (here) bloom pruning — its delta over the raw
            # read_point row above IS the planning overhead, which
            # must stay index-scan-sized at any table size
            t0 = time.perf_counter()
            store.read("t", where={"o_custkey": 42}).write.format(
                "noop"
            ).mode("overwrite").save()
            planned_samples.append(time.perf_counter() - t0)
        # and the bucket-routed key probe: driver-side hash routing,
        # strongest pruner, zero index scans — the lookup() cost
        # profile reached by stating the predicate
        for _ in range(RUNS):
            t0 = time.perf_counter()
            store.read("t", where={"o_orderkey": 4217}).write.format(
                "noop"
            ).mode("overwrite").save()
            key_samples.append(time.perf_counter() - t0)
        # r13 continuation: the stats-proven COUNT — every file proves
        # ALL rows match a NOT_NULL conjunct (zero recorded nulls), so
        # the count is a pure manifest fold: ZERO Spark jobs. Timed so
        # a regression that silently demotes the proof to a scan shows
        # as this row jumping from milliseconds to scan time.
        from datapipelinerepo_spark.io import NOT_NULL

        n_expect = base.count()
        for _ in range(RUNS):
            t0 = time.perf_counter()
            n, rep = store.count_where(
                "t", {"o_totalprice": NOT_NULL}, with_report=True
            )
            count_samples.append(time.perf_counter() - t0)
        assert n == n_expect and rep["scanned"] == 0
    finally:
        shutil.rmtree(wdir, ignore_errors=True)
    samples.sort()
    times["store_bloom_probe_verb"] = round(samples[RUNS // 2], 3)
    spread["store_bloom_probe_verb"] = round(samples[-1] - samples[0], 3)
    planned_samples.sort()
    times["store_planned_probe_verb"] = round(
        planned_samples[RUNS // 2], 3
    )
    spread["store_planned_probe_verb"] = round(
        planned_samples[-1] - planned_samples[0], 3
    )
    key_samples.sort()
    times["store_planned_key_probe_verb"] = round(
        key_samples[RUNS // 2], 3
    )
    spread["store_planned_key_probe_verb"] = round(
        key_samples[-1] - key_samples[0], 3
    )
    count_samples.sort()
    times["store_planned_count_verb"] = round(
        count_samples[RUNS // 2], 3
    )
    spread["store_planned_count_verb"] = round(
        count_samples[-1] - count_samples[0], 3
    )

    # Machine calibration row (VERDICT r12 item 2): a FROZEN,
    # engine-independent workload — 20M-row range → hash agg into 100k
    # groups (one fixed-size shuffle), pinned constants, no table I/O,
    # no engine code. Its time measures THIS MACHINE TODAY, nothing
    # else; cross-round bench comparisons are read relative to it
    # (protocol note in SCALE.md). Three consecutive rounds burned
    # builder+judge cycles adjudicating ±25-35% machine-day drift by
    # ad-hoc A/B; this row makes the drift visible in the artifact
    # itself. Reported BESIDE the set total, never inside it, so
    # "value" stays comparable to prior rounds. The constants below
    # are frozen as of r13 — changing them breaks cross-round
    # calibration and requires a SCALE.md protocol note.
    def _calibration_df():
        return (
            spark.range(0, 20_000_000, 1, 32)
            .select(
                (F.col("id") % 100_000).alias("k"),
                (F.col("id") * 2654435761 % 1_000_003).alias("v"),
            )
            .groupBy("k")
            .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        )

    _calibration_df().write.format("noop").mode("overwrite").save()  # JIT
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        _calibration_df().write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    calibration = round(samples[RUNS // 2], 3)
    calibration_spread = round(samples[-1] - samples[0], 3)

    # I/O calibration row (VERDICT r13 item 3): the CPU row above
    # cannot see disk/page-cache volatility, which r13 showed is the
    # louder axis (calibration_spread 26% while untouched store
    # lifecycles swung 2-5x). This FROZEN workload exercises exactly
    # that axis: write a pinned 2M-row / 3-column parquet table to a
    # fresh temp dir, read it back with a count, median-of-RUNS.
    # Engine-free (plain spark.read/write), constants frozen as of
    # r14 — changing them breaks cross-round calibration and requires
    # a SCALE.md protocol note. Reported BESIDE the total like the
    # CPU row.
    import shutil as _shutil
    import tempfile as _tempfile

    def _calibration_io_once() -> float:
        d = _tempfile.mkdtemp(prefix="bench_iocal_")
        try:
            t0 = time.perf_counter()
            (
                spark.range(0, 2_000_000, 1, 8)
                .select(
                    F.col("id"),
                    (F.col("id") % 9973).alias("k"),
                    (F.col("id") * 2654435761 % 1_000_003).alias("v"),
                )
                .write.mode("overwrite")
                .parquet(os.path.join(d, "t"))
            )
            n = spark.read.parquet(os.path.join(d, "t")).count()
            el = time.perf_counter() - t0
            assert n == 2_000_000
            return el
        finally:
            _shutil.rmtree(d, ignore_errors=True)

    _calibration_io_once()  # JIT / committer warm-up
    io_samples = sorted(_calibration_io_once() for _ in range(RUNS))
    calibration_io = round(io_samples[RUNS // 2], 3)
    calibration_io_spread = round(io_samples[-1] - io_samples[0], 3)

    # compact volatility summary for the PARSED line (VERDICT r13
    # item 3): per-row spreads previously survived only in the
    # truncation-prone diagnostic line. Fraction over rows big enough
    # for a ratio to mean anything (>= 50 ms median).
    max_spread_frac = round(
        max(
            (spread[k] / times[k] for k in times
             if times[k] >= 0.05 and k in spread),
            default=0.0,
        ),
        3,
    )

    total = round(sum(times.values()), 3)
    # The driver records only the LAST ~2000 chars of stdout; r9's
    # single line (queries + spread) overflowed that window, cutting
    # the leading rows mid-stream and leaving the artifact unparseable
    # (VERDICT r9 "what's wrong" 3). Emit the full diagnostic line
    # FIRST (humans, greppable logs), then a compact spread-free line
    # LAST so the parseable record always fits the tail window.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
                "runs": RUNS,
                "spread": spread,
                "calibration_sec": calibration,
                "calibration_spread": calibration_spread,
                "calibration_io_sec": calibration_io,
                "calibration_io_spread": calibration_io_spread,
                "max_spread_frac": max_spread_frac,
            }
        )
    )
    compact = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": times,
            "sf": float(sf),
            "calibration_sec": calibration,
            "calibration_io_sec": calibration_io,
            "max_spread_frac": max_spread_frac,
        },
        separators=(",", ":"),
    )
    if len(compact) > 1900:  # tail-window guard as rows accumulate
        compact = json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": {
                    k: times[k]
                    for k in sorted(times, key=times.get, reverse=True)[:30]
                },
                "sf": float(sf),
                "calibration_sec": calibration,
                "calibration_io_sec": calibration_io,
                "max_spread_frac": max_spread_frac,
                "queries_truncated_to_top": 30,
            },
            separators=(",", ":"),
        )
    print(compact)


if __name__ == "__main__":
    main()
