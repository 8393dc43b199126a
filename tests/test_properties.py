"""Property-based tests (hypothesis) for the algebraic invariants the
oracle comparison can't state directly: set-op algebra, scalar parsing
totality, dedup idempotence. Example counts are kept small — each
example is a Spark job — and each property batches its cases into one
DataFrame where possible."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datapipelinerepo_spark.functions import scalars as S
from datapipelinerepo_spark.operators import relational as R

ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 2)), min_size=0, max_size=12
)


@settings(max_examples=5, deadline=None)
@given(a=ROWS, b=ROWS)
def test_symmetric_difference_matches_pandas_semantics(spark, a, b):
    """symmetric_difference == drop_duplicates(keep=False) over the
    concatenation: rows whose TOTAL multiplicity across both inputs is
    exactly 1 — internal duplicates are removed too (SURVEY.md §2.3 J2,
    the exact reference semantics)."""
    expected = {t for t, n in Counter(a + b).items() if n == 1}
    da = spark.createDataFrame(a, "x int, y int") if a else spark.createDataFrame([], "x int, y int")
    db = spark.createDataFrame(b, "x int, y int") if b else spark.createDataFrame([], "x int, y int")
    got = {(r["x"], r["y"]) for r in R.symmetric_difference(da, db).collect()}
    assert got == expected
    sym = {(r["x"], r["y"]) for r in R.symmetric_difference(db, da).collect()}
    assert sym == got  # Δ is symmetric


@settings(max_examples=5, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 99), st.integers(0, 99), st.integers(0, 59), st.integers(0, 59)),
        min_size=1,
        max_size=20,
    )
)
def test_compound_stat_and_clock_parse_total(spark, pairs):
    """'m-a' and 'mm:ss' STRING facts parse back exactly for every value
    in domain (§2.11 compound-stat shapes) — batched, one job."""
    rows = [(i, f"{m}-{a}", f"{mi}:{se:02d}") for i, (m, a, mi, se) in enumerate(pairs)]
    df = spark.createDataFrame(rows, ["i", "eff", "clock"])
    got = df.select(
        "i",
        S.compound_stat_made("eff").alias("m"),
        S.compound_stat_att("eff").alias("a"),
        S.mmss_to_seconds("clock").alias("s"),
    ).collect()
    by_i = {r["i"]: r for r in got}
    for i, (m, a, mi, se) in enumerate(pairs):
        r = by_i[i]
        assert (r["m"], r["a"], r["s"]) == (m, a, mi * 60 + se)


@settings(max_examples=4, deadline=None)
@given(
    texts=st.lists(
        st.sampled_from(["aa bb cc", "dd ee", "ff", "aa bb cc", "dd ee"]),
        min_size=1,
        max_size=10,
    )
)
def test_exact_dedup_idempotent(spark, texts):
    """dedup(dedup(X)) == dedup(X), output texts unique, count equals
    the number of distinct texts."""
    from datapipelinerepo_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    once = D.exact_dedup(df)
    twice = D.exact_dedup(once)
    assert once.count() == twice.count() == len(set(texts))
    assert once.select("text").distinct().count() == once.count()
    assert once.exceptAll(twice).isEmpty()


@settings(max_examples=4, deadline=None)
@given(
    texts=st.lists(
        st.sampled_from(
            [
                "write to a@b.co or c.d@e.org now",
                "server 10.0.0.1 and 192.168.1.255 up",
                "order 123456 ref 99 ok",
                "no pii in this sentence at all",
                "x1y2z3 a12b c999d",
            ]
        ),
        min_size=1,
        max_size=8,
    )
)
def test_redact_pii_idempotent_and_digestable(spark, texts):
    """redact(redact(x)) == redact(x): replacement tokens contain no
    redactable spans, so a second pass finds nothing — the property
    that makes the op safe to re-run over partially-processed data."""
    from datapipelinerepo_spark.operators.text import (
        EMAIL_RE,
        IPV4_RE,
        NUMRUN_RE,
        redact_pii,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    t0 = F.col("text")
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    redacted = df.withColumn("text", F.regexp_replace(t2, NUMRUN_RE, "<NUM>"))
    second = {r["doc_id"]: r for r in redact_pii(redacted).collect()}
    first = {r["doc_id"]: r for r in redact_pii(df).collect()}
    for i in first:
        assert second[i]["n_redacted"] == 0
        assert second[i]["red_md5"] == first[i]["red_md5"]


@settings(max_examples=4, deadline=None)
@given(
    toks=st.lists(st.integers(1, 40), min_size=1, max_size=15),
    budget=st.sampled_from([8, 16, 64]),
)
def test_sequence_packing_invariants(spark, toks, budget):
    """Pack spans tile the shard's token line: starts are monotone,
    each doc's span length is ceil-consistent with its token count, and
    consecutive docs meet at the same pack (concat-and-cut leaves no
    gaps)."""
    from datapipelinerepo_spark.operators.text import sequence_packing

    rows = [(i, " ".join(["w"] * n), "en") for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = sorted(
        (
            (r["doc_id"], r["n_tokens"], r["start_pack"], r["end_pack"])
            for r in sequence_packing(df, budget=budget).collect()
        )
    )
    cum = 0
    for (_i, n, sp, ep), n_true in zip(got, toks):
        assert n == n_true
        assert sp == cum // budget  # starts exactly where the line left off
        assert ep == (cum + n - 1) // budget
        assert sp <= ep
        cum += n


@settings(max_examples=5, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """The iterative min-label/pointer-jump operator equals a driver-side
    union-find on arbitrary (self-loop, duplicate, multi-component)
    edge sets — min node id per component."""
    from datapipelinerepo_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    # default path (r14: driver union-find under the bounded cap) AND
    # the forced distributed rounds must both match the reference
    got = {
        r.node: r.comp for r in connected_components(df).collect()
    }
    assert got == want
    got_dist = {
        r.node: r.comp
        for r in connected_components(df, driver_edge_cap=0).collect()
    }
    assert got_dist == want


@settings(max_examples=5, deadline=None)
@given(
    seg=st.lists(
        st.sampled_from(["A", "B", None]), min_size=1, max_size=6
    ),
    upd=st.lists(
        st.tuples(st.integers(0, 7), st.sampled_from(["A", "B", "C"])),
        min_size=0,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
)
def test_scd2_invariants(spark, seg, upd):
    """For ANY starting dimension and update batch: (1) every key keeps
    EXACTLY one open row, (2) closed history rows are never modified,
    (3) open rows carry the latest value (updated keys show the update,
    untouched keys keep their old value)."""
    import datetime as dt

    from datapipelinerepo_spark.operators.relational import scd2_apply

    d0, d1 = dt.date(2020, 1, 1), dt.date(2024, 6, 1)
    cur_rows = [(i, s, d0, None, True) for i, s in enumerate(seg)]
    cur = spark.createDataFrame(
        cur_rows,
        "k long, segment string, valid_from date, valid_to date, is_current boolean",
    )
    upd_df = (
        spark.createDataFrame(
            [(k, s, d1) for k, s in upd], "k long, segment string, eff date"
        )
        if upd
        else spark.createDataFrame([], "k long, segment string, eff date")
    )
    out = scd2_apply(cur, upd_df, "k", ["segment"], "eff").collect()
    upd_map = dict(upd)
    open_rows = [r for r in out if r["is_current"]]
    keys = {r["k"] for r in out}
    assert sorted(r["k"] for r in open_rows) == sorted(keys)  # one open/key
    for r in open_rows:
        k = r["k"]
        if k in upd_map:
            assert r["segment"] == upd_map[k]  # latest value wins
        elif k < len(seg):
            assert r["segment"] == seg[k]  # untouched keys unchanged
    for r in out:
        if not r["is_current"]:
            assert r["valid_to"] is not None  # closed rows are dated


@settings(max_examples=5, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)),
        min_size=1,
        max_size=10,
    ).filter(lambda es: any(u != v for u, v in es))
)
def test_pagerank_mass_conserved_on_random_graphs(spark, edges):
    """For ANY directed graph (self-loops dropped, dangling nodes
    allowed): ranks are positive and sum to 1 — the dangling
    redistribution branch conserves probability mass."""
    from datapipelinerepo_spark.operators.graph import pagerank

    es = [(u, v, 1.0) for u, v in edges if u != v]
    df = spark.createDataFrame(es, ["src", "dst", "w"])
    got = pagerank(df, weight="w", iters=4).collect()
    total = sum(r["rank"] for r in got)
    assert abs(total - 1.0) < 1e-9
    assert all(r["rank"] > 0 for r in got)


CDC_BASE = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 99)),
    min_size=0, max_size=8, unique_by=lambda t: t[0],
)
CDC_CHANGES = st.lists(
    st.tuples(
        st.integers(0, 9),              # key (may be unseen -> insert)
        st.integers(0, 5),              # seq
        st.sampled_from(["U", "D"]),    # op
        st.integers(0, 99),             # payload
    ),
    min_size=0, max_size=10,
    # a real CDC feed has at most one payload per (key, seq, op);
    # two same-seq updates with different payloads are genuinely
    # order-undefined in any latest-wins merge
    unique_by=lambda t: (t[0], t[1], t[2]),
)


@settings(max_examples=5, deadline=None)
@given(base=CDC_BASE, changes=CDC_CHANGES)
def test_cdc_apply_matches_reference_merge(spark, base, changes):
    """cdc_apply == a straightforward Python reference merge: sort each
    key's changes by (seq, delete-first-at-same-seq), apply the last
    one; 'D' removes, 'U' upserts; untouched keys pass through."""
    ref = {k: v for k, v in base}
    last: dict[int, tuple] = {}
    for k, seq, op, val in changes:
        # latest-wins: higher seq replaces; same seq prefers the delete
        cur = last.get(k)
        if cur is None or (seq, op == "D") >= (cur[0], cur[1] == "D"):
            last[k] = (seq, op, val)
    for k, (seq, op, val) in last.items():
        if op == "D":
            ref.pop(k, None)
        else:
            ref[k] = val
    db = (
        spark.createDataFrame(base, "k int, v int")
        if base else spark.createDataFrame([], "k int, v int")
    )
    dc = (
        spark.createDataFrame(changes, "k int, seq int, op string, v int")
        if changes else spark.createDataFrame([], "k int, seq int, op string, v int")
    )
    got = {
        r["k"]: r["v"]
        for r in R.cdc_apply(db, dc, key="k", seq_col="seq").collect()
    }
    assert got == ref


EDIT_TEXTS = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=24),
    min_size=0, max_size=10,
)


@settings(max_examples=5, deadline=None)
@given(texts=EDIT_TEXTS)
def test_edit_distance_pairs_complete_on_random_short_strings(spark, texts):
    """Candidate completeness under adversarially SHORT heads: over a
    tiny alphabet (so near pairs abound and many heads have <= k*q
    distinct q-grams, the regime the r4 prefix filter silently missed)
    the filtered join equals exhaustive all-pairs Levenshtein."""
    from datapipelinerepo_spark.operators.dedup import edit_distance_pairs

    rows = [(i, t) for i, t in enumerate(texts)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["edit_dist"])
        for r in edit_distance_pairs(df, k=3, q=4).collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    heads = [(i, t[:120]) for i, t in rows]
    expected = {
        (ia, ib, lev(ta, tb))
        for ia, ta in heads
        for ib, tb in heads
        if ia < ib and lev(ta, tb) <= 3
    }
    assert got == expected


ORDER_ROWS = st.lists(
    st.tuples(
        st.integers(0, 99),
        st.one_of(st.none(), st.floats(-5, 5, allow_nan=False, width=32)),
    ),
    min_size=0, max_size=40,
    unique_by=lambda t: t[0],
)


@settings(max_examples=5, deadline=None)
@given(rows=ORDER_ROWS)
def test_global_order_positions_match_sort(spark, rows):
    """Positions from the range-bucketed rank-with-offsets machinery
    equal ROW_NUMBER over Spark's own (value ASC NULLS FIRST, id ASC)
    total order — duplicates, NULLs, and tiny inputs included."""
    from datapipelinerepo_spark.operators.sampling import global_order_positions

    if not rows:
        return
    df = spark.createDataFrame(
        [(i, float(v) if v is not None else None) for i, v in rows],
        "id long, v double",
    )
    got = {
        r["id"]: r["pos"]
        for r in global_order_positions(df, ("v", "id"), n_buckets=4).collect()
    }
    ordered = sorted(rows, key=lambda t: (t[1] is not None, t[1] or 0.0, t[0]))
    expected = {rid: pos for pos, (rid, _) in enumerate(ordered)}
    assert got == expected


@settings(max_examples=5, deadline=None)
@given(rows=ORDER_ROWS)
def test_global_order_positions_explicit_boundaries_exact(spark, rows):
    """r14: caller-supplied ``boundaries=`` (sampled externally, e.g.
    sorted_neighborhood_pairs' shared one-job sampler) must yield the
    SAME exact positions as the internal sampler — including skewed,
    unsorted-duplicate, and deliberately terrible boundary lists,
    because any order-consistent bucketing is exact by construction."""
    from datapipelinerepo_spark.operators.sampling import global_order_positions

    if not rows:
        return
    df = spark.createDataFrame(
        [(i, float(v) if v is not None else None) for i, v in rows],
        "id long, v double",
    )
    ordered = sorted(rows, key=lambda t: (t[1] is not None, t[1] or 0.0, t[0]))
    expected = {rid: pos for pos, (rid, _) in enumerate(ordered)}
    vals = sorted(v for _, v in rows if v is not None)
    for bounds in ([], [0.0], vals[:3], [vals[len(vals) // 2]] if vals else []):
        got = {
            r["id"]: r["pos"]
            for r in global_order_positions(
                df, ("v", "id"), n_buckets=4, boundaries=bounds
            ).collect()
        }
        assert got == expected, f"boundaries={bounds}"


# --- versioned keyed store: model-based sequence test -----------------------

_BATCH = st.lists(
    st.tuples(st.integers(0, 30), st.floats(-100, 100, allow_nan=False)),
    min_size=1, max_size=5,
    unique_by=lambda t: t[0],  # unique keys per batch: upsert's
    # within-batch duplicate resolution is explicitly unspecified
)
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"), _BATCH),
        st.tuples(st.just("append"), _BATCH),
        st.tuples(st.just("compact"), st.just(None)),
        st.tuples(st.just("vacuum"), st.just(None)),
        # row-level DELETE on a value predicate (v > threshold)
        st.tuples(st.just("delete"), st.floats(-100, 100, allow_nan=False)),
        # transactional upsert with a SMALL txn-version space, so random
        # sequences naturally contain replays (exactly-once must skip)
        st.tuples(st.just("txn"), st.tuples(_BATCH, st.integers(0, 3))),
    ),
    min_size=1, max_size=6,
)


@settings(max_examples=5, deadline=None)
@given(ops=_OPS)
def test_versioned_store_matches_reference_model(spark, tmp_path_factory, ops):
    """Model-based check of the snapshot-versioned keyed table: a random
    sequence of upsert / append / compact / vacuum tracks a plain dict
    reference after EVERY operation, and every still-retained version
    replays exactly the rows it had when it was published (time travel
    survives arbitrary later maintenance)."""
    from datapipelinerepo_spark.io import TableStore

    tmp = tmp_path_factory.mktemp("vstore")
    store = TableStore(spark, str(tmp))
    base = [(k, float(k)) for k in range(0, 20, 2)]
    store.overwrite_keyed(
        spark.createDataFrame(base, "id long, v double"),
        "t", "id", n_buckets=4, versioned=True,
    )
    model = {k: [v] for k, v in base}  # key -> multiset of values
    snapshots = {store.latest_version("t"): {k: list(vs) for k, vs in model.items()}}

    def as_model(rows):
        out = {}
        for r in rows:
            out.setdefault(r["id"], []).append(r["v"])
        return {k: sorted(vs) for k, vs in out.items()}

    last_txn = -1  # reference watermark for the exactly-once verb
    for op, arg in ops:
        if op == "upsert":
            store.upsert(
                spark.createDataFrame(arg, "id long, v double"), "t", "id"
            )
            for k, v in arg:
                model[k] = [v]
        elif op == "append":
            store.append(
                spark.createDataFrame(arg, "id long, v double"), "t"
            )
            for k, v in arg:
                model.setdefault(k, []).append(v)
        elif op == "delete":
            store.delete_where("t", f"v > {arg!r}")
            model = {
                k: kept
                for k, vs in model.items()
                if (kept := [v for v in vs if not v > arg])
            }
        elif op == "txn":
            batch, tv = arg
            applied = store.upsert_txn(
                spark.createDataFrame(batch, "id long, v double"),
                "t", "id", "model-app", tv,
            )
            assert applied == (tv > last_txn), (tv, last_txn)
            if applied:
                last_txn = tv
                for k, v in batch:
                    model[k] = [v]
        elif op == "compact":
            store.compact("t")
        else:
            store.vacuum("t", keep_last=2, grace_s=0.0)
            snapshots = {
                v: s for v, s in snapshots.items() if v in set(store.versions("t"))
            }
        if op != "vacuum":
            snapshots[store.latest_version("t")] = {
                k: sorted(vs) for k, vs in model.items()
            }
        got = as_model(store.read("t").collect())
        want = {k: sorted(vs) for k, vs in model.items()}
        assert got == want, f"after {op}: {got} != {want}"

    for v, snap in snapshots.items():
        assert as_model(store.read("t", version=v).collect()) == snap, v


# --- BPE: priority merging ≡ sequential folds on learned lists --------------

_WORDS = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=10), min_size=1, max_size=30
)


@settings(max_examples=200, deadline=None)
@given(words=_WORDS, n_rules=st.integers(1, 40))
def test_bpe_priority_equals_sequential_on_learned_lists(words, n_rules):
    """The Arrow encode engine's core claim, property-tested: for any
    LEARNED rule list (py_bpe_learn output — well-formed by
    construction), priority merging tokenizes every word exactly like
    the definitional sequential per-rule folds, and the
    bpe_rules_sequential_safe gate accepts the list. Pure-Python (no
    Spark) so hypothesis can hammer hundreds of corpora."""
    from collections import Counter

    from datapipelinerepo_spark.operators.text import (
        _bpe_word_tokens_py,
        bpe_rules_sequential_safe,
        py_bpe_learn,
    )

    wc = dict(Counter(words))
    rules = [(l, r) for _, l, r, _, _ in py_bpe_learn(wc, n_rules)]
    assert bpe_rules_sequential_safe(rules)
    ranks = {p: i for i, p in enumerate(rules)}
    for w in set(words):
        fast = _bpe_word_tokens_py(w, rules, ranks, fast=True)
        seq = _bpe_word_tokens_py(w, rules, ranks, fast=False)
        assert fast == seq, (w, rules)
        assert "".join(fast) == w  # tokenization is always lossless


@settings(max_examples=100, deadline=None)
@given(words=_WORDS)
def test_bpe_gate_rejects_order_sensitive_lists(words):
    """The gate's necessity, property-tested: an ill-formed list (a
    component no earlier rule produces — the (ab,c)-before-(a,b)
    shape) is rejected, and the engine's fallback (sequential) is the
    semantics the fold engine pins, diverging from priority merging on
    at least SOME input when the divergence is real."""
    from datapipelinerepo_spark.operators.text import (
        _bpe_word_tokens_py,
        bpe_rules_sequential_safe,
    )

    rules = [("ab", "c"), ("a", "b")]
    assert not bpe_rules_sequential_safe(rules)
    ranks = {p: i for i, p in enumerate(rules)}
    for w in set(words):
        # the engine must use fast=False here; both paths stay lossless
        seq = _bpe_word_tokens_py(w, rules, ranks, fast=False)
        assert "".join(seq) == w
    # the canonical divergence witness: priority would re-apply rule 0
    # after rule 1 creates "ab"; sequential (the spec) cannot
    assert _bpe_word_tokens_py("abc", rules, ranks, fast=False) == ["ab", "c"]
    assert _bpe_word_tokens_py("abc", rules, ranks, fast=True) == ["abc"]


# --- CDF + incremental view maintenance: sync == recompute ------------------

_GRP_BATCH = st.lists(
    st.tuples(
        st.integers(0, 25),
        st.one_of(st.none(), st.floats(-50, 50, allow_nan=False)),
        st.sampled_from(["A", "B", "C"]),
    ),
    min_size=1, max_size=5,
    unique_by=lambda t: t[0],
)
_SYNC_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"), _GRP_BATCH),
        st.tuples(st.just("delete"), st.floats(-50, 50, allow_nan=False)),
        st.tuples(st.just("compact"), st.just(None)),
        st.tuples(st.just("sync"), st.just(None)),
    ),
    min_size=1, max_size=6,
)


@settings(max_examples=5, deadline=None)
@given(ops=_SYNC_OPS)
def test_cdf_sync_rollup_matches_recompute(spark, tmp_path_factory, ops):
    """Model-based check of the round-8 CDF→IVM pipeline, extended in
    r9 with MIN/MAX/AVG maintenance (VERDICT r8 item 3): a random
    sequence of upserts (with NULL measures), value-predicate deletes
    and compactions on a versioned base, with sync_rollup interleaved
    at random points — after EVERY sync the maintained aggregate must
    equal a direct grouped recompute of the current base (counts,
    decimal sums, native-type min/max, derived double avg), including
    groups that empty out and re-appear, extremum-removing deletes,
    and groups created and destroyed within a single window."""
    from pyspark.sql import functions as F

    from datapipelinerepo_spark.io import TableStore
    from datapipelinerepo_spark.plans.rollup import sync_rollup

    tmp = tmp_path_factory.mktemp("cdfsync")
    store = TableStore(spark, str(tmp))
    base = [(k, float(k), "A" if k % 2 else "B") for k in range(0, 10)]
    schema = "id long, val double, grp string"
    store.overwrite_keyed(
        spark.createDataFrame(base, schema), "t", "id", n_buckets=4,
        versioned=True,
    )
    kw = dict(min_col="min_val", max_col="max_val", avg_col="avg_val")

    def recompute():
        return {
            r["grp"]: (r["n"], r["s"], r["mn"], r["mx"], r["av"])
            for r in store.read("t")
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.sum(F.coalesce(
                        F.col("val").cast("decimal(18,4)"),
                        F.lit(0).cast("decimal(18,4)"),
                    )),
                    F.lit(0).cast("decimal(18,4)"),
                ).cast("decimal(28,4)").alias("s"),
                F.min("val").alias("mn"),
                F.max("val").alias("mx"),
            )
            .withColumn("av", F.col("s").cast("double") / F.col("n"))
            .collect()
        }

    def rollup():
        return {
            r["grp"]: (
                r["n_rows"], r["sum_val"], r["min_val"], r["max_val"],
                r["avg_val"],
            )
            for r in store.read("r").collect()
        }

    sync_rollup(store, "t", "r", ["grp"], "val", **kw)  # seed
    assert rollup() == recompute()
    for op, arg in ops:
        if op == "upsert":
            store.upsert(spark.createDataFrame(arg, schema), "t", "id")
        elif op == "delete":
            store.delete_where("t", f"val > {arg!r}")
        elif op == "compact":
            store.compact("t")
        else:
            sync_rollup(store, "t", "r", ["grp"], "val", **kw)
            assert rollup() == recompute(), f"after sync: ops={ops}"
    sync_rollup(store, "t", "r", ["grp"], "val", **kw)
    assert rollup() == recompute(), f"final: ops={ops}"
