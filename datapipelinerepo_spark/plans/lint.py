"""Plan lint — pre-flight anti-pattern scan of a query's physical plan.

At 100 TB a bad plan shape is the difference between minutes and days:
a cartesian product or BroadcastNestedLoopJoin is quadratic in the
inputs, a row-at-a-time Python UDF forces every row through pickle, a
global sort funnels the data through a range exchange. All of these are
visible in the executed plan BEFORE any task runs, so a pipeline can
(and should) refuse to submit them. This module turns the plan-audit
assertions the test suite applies to the engine's own queries
(tests/test_scale_ops.py) into a first-class, user-callable check.

Node-name notes (what we match and why):
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: the two physical
  strategies Spark falls back to when a join has no usable equi-keys.
  Always worth a human look; at scale usually a missing join condition.
- ``BatchEvalPython`` is the ROW-AT-A-TIME Python UDF operator (the
  10-100× slow path). ``ArrowEvalPython`` / ``MapInPandas`` /
  ``FlatMapGroupsInPandas`` are the Arrow-vectorized operators — the
  sanctioned escape hatch — and are NOT flagged.
- ``Exchange rangepartitioning``: a global sort (or sort-based window
  without a partition key) — legitimate for top-k output, a red flag in
  the middle of a pipeline.
- ``Exchange SinglePartition``: everything funnels through one task —
  fine for a final scalar/limit, fatal mid-plan at scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

# (code, physical-plan substring, what it means at scale)
ANTIPATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "cartesian_product",
        "CartesianProduct",
        "all-pairs join: |L|x|R| comparisons — add an equi-condition "
        "or a binned/bucketed prefilter (see operators/rangejoin.py)",
    ),
    (
        "broadcast_nested_loop",
        "BroadcastNestedLoopJoin",
        "non-equi join fallback: every row probes the whole broadcast "
        "side — rewrite as equi-join on a derived key",
    ),
    (
        "python_row_udf",
        "BatchEvalPython",
        "row-at-a-time Python UDF: pickle per row, no vectorization — "
        "use built-in expressions or a pandas_udf (ArrowEvalPython)",
    ),
    (
        "global_sort_exchange",
        "Exchange rangepartitioning",
        "global sort: all data through a range exchange — only the "
        "final ordered output should pay this",
    ),
    (
        "single_partition_exchange",
        "Exchange SinglePartition",
        "single-task funnel: one task processes everything downstream "
        "— fine for a final scalar, fatal mid-plan",
    ),
)


# Aggregate partials whose per-partition buffer is DATA-sized (every
# row, or every distinct value with counts) — a keys=[] aggregate over
# one of these funnels the corpus through the SinglePartition exchange
# despite looking like a scalar. Exact percentile/median/mode fall here;
# their *_approx sketch forms do not (bounded buffers) and the trailing
# "(" keeps "partial_percentile(" from matching "partial_percentile_approx(".
DATA_SIZED_PARTIALS: tuple[str, ...] = (
    "collect_list",
    "collect_set",
    "partial_percentile(",
    "partial_median(",
    "partial_mode(",
    "partial_listagg(",
    "partial_array_agg(",
    "partial_string_agg(",
)


@dataclass(frozen=True)
class Finding:
    code: str
    why: str
    evidence: str  # first plan line that matched


# plan-string tree parsing: a node line is tree-drawing prefix
# ("   +- ", ":     ", "|  ") + optional WholeStageCodegen star
# ("*(3) ") + the node name. The prefix END POSITION is the node's
# depth — children print strictly deeper, siblings at the same depth.
_TREE_PREFIX = re.compile(r"^[\s:+|-]*")
_CODEGEN_STAR = re.compile(r"^\*\(\d+\)\s*")

# Nodes that merely wrap/reorder their single child without changing
# what flows through the exchange — the walk below skips through them
# when looking for the exchange's producing aggregate. Matched on the
# node's full leading identifier (NOT a prefix: "Sort" must not
# swallow "SortAggregate"/"SortMergeJoin").
_PASS_THROUGH = frozenset(
    {
        "WholeStageCodegen",
        "InputAdapter",
        "ShuffleQueryStage",
        "AQEShuffleRead",
        "Project",
        "Sort",
        "CollectMetrics",
    }
)
_AGGREGATES = frozenset(
    {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}
)
_IDENT = re.compile(r"[A-Za-z]+")


def _node_at(ln: str) -> tuple[int, str]:
    """(depth, node text) of one plan line."""
    depth = _TREE_PREFIX.match(ln).end()
    return depth, _CODEGEN_STAR.sub("", ln[depth:])


def _scalar_partial_child(lines: list[str], i: int) -> bool:
    """Does the Exchange at ``lines[i]`` sit directly on a
    grouping-keyless partial aggregate with a bounded buffer?

    Walks the plan TREE by indentation (ADVICE r6: the previous fixed
    3-line window could mis-scope when project/sort lines sat between
    the exchange and its aggregate, or when an unrelated keys=[]
    partial landed in the window): descend the exchange's direct child
    chain, skipping pass-through wrappers, and judge the first real
    node reached. Exempt iff that node is a keys=[]/key=[] partial
    aggregate whose functions carry no data-sized buffer."""
    depth, _ = _node_at(lines[i])
    for j in range(i + 1, len(lines)):
        d, node = _node_at(lines[j])
        m = _IDENT.match(node)
        if not node or m is None:
            continue
        if d <= depth:
            return False  # left the exchange's subtree: no aggregate child
        name = m.group(0)
        if name in _PASS_THROUGH:
            depth = d  # descend through the wrapper's child chain
            continue
        if name not in _AGGREGATES:
            return False
        # the exchange's producing aggregate: judge it
        # (HashAggregate prints `keys=[]`, SortAggregate `key=[]`)
        return (
            ("keys=[]" in node or "key=[]" in node)
            and "partial_" in node
            and not any(n in node for n in DATA_SIZED_PARTIALS)
        )
    return False


def _executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_findings(
    df: DataFrame, allow: tuple[str, ...] = ()
) -> list[Finding]:
    """Scan ``df``'s executed physical plan for scale anti-patterns.

    ``allow``: finding codes that are expected for this query (e.g.
    ``("global_sort_exchange",)`` for an intentionally ordered report).
    Returns the (possibly empty) list of findings — no exceptions.
    """
    plan = _executed_plan(df)
    lines = plan.splitlines()
    out: list[Finding] = []
    for code, needle, why in ANTIPATTERNS:
        if code in allow:
            continue
        hit = None
        for i, ln in enumerate(lines):
            if needle not in ln:
                continue
            # Spark's runtime bloom-filter join pruning injects a scalar
            # subquery whose partial→final bloom aggregate necessarily
            # funnels through a SinglePartition exchange. That exchange
            # carries ~one bloom buffer per input partition — it is the
            # optimization working, not a data funnel. Don't flag it.
            if code == "single_partition_exchange" and any(
                "bloom_filter_agg" in ctx
                for ctx in lines[max(0, i - 2) : i + 3]
            ):
                continue
            # Scalar-aggregate funnel: an Exchange SinglePartition whose
            # CHILD is a grouping-keyless partial aggregate (the
            # `HashAggregate(keys=[], functions=[partial_…])` half of
            # Spark's two-phase global agg) moves exactly one
            # pre-aggregated buffer per input partition — constant bytes
            # per task, not data. That's the map-side combine working,
            # the shape every `SELECT max(x) FROM t` compiles to, and
            # the lint docstring's own "fine for a final scalar". The
            # exception deliberately EXCLUDES data-sized buffers —
            # collect_list/collect_set carry every row, and the EXACT
            # percentile/median/mode partials carry every distinct
            # value with counts — so a "scalar" aggregate that secretly
            # ships the corpus still flags. (partial_percentile_approx
            # is a bounded sketch and stays exempt: the trailing "(" in
            # each needle keeps it from matching the exact-percentile
            # entry.) The child is found by an indentation tree walk
            # (_scalar_partial_child), not a fixed line window.
            if code == "single_partition_exchange" and _scalar_partial_child(
                lines, i
            ):
                continue
            hit = ln.strip()
            break
        if hit is not None:
            out.append(Finding(code=code, why=why, evidence=hit[:200]))
    return out


def assert_clean(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Raise ``ValueError`` listing every anti-pattern found — the
    pre-submit gate form of :func:`plan_findings`."""
    findings = plan_findings(df, allow=allow)
    if findings:
        msg = "; ".join(f"{f.code}: {f.why} [{f.evidence}]" for f in findings)
        raise ValueError(f"plan lint failed: {msg}")


def pushed_filters(df: DataFrame) -> list[str]:
    """The ``PushedFilters`` entries of every scan in the plan — empty
    lists mean a filter the scan could not absorb. Assertion helper for
    pushdown tests and pre-flight sanity ('did my predicate reach the
    parquet reader?')."""
    plan = _executed_plan(df)
    out: list[str] = []
    for ln in plan.splitlines():
        if "PushedFilters:" in ln:
            frag = ln.split("PushedFilters:", 1)[1].strip()
            out.append(frag.rstrip(","))
    return out
