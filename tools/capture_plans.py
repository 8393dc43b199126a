"""Capture .explain("formatted") for registry queries into plans/r14/.

Optimization-round evidence tool (guide §1.4/§7.2): writes one
<query>_<tag>.txt per requested query so plan-shape claims (Exchange
count, join strategy, PushedFilters, Python eval nodes) are checkable
without running Spark.

Usage:
    python tools/capture_plans.py <tag> [query[,query...]]

With no query list, captures every bench=True registry entry. Note the
plan shown is the pre-execution plan (AdaptiveSparkPlan
isFinalPlan=false); AQE runtime rewrites are adjudicated in
OPTIMIZATION_r14.md from measured numbers, not from these files.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from datapipelinerepo_spark.registry import REGISTRY  # noqa: E402
import datapipelinerepo_spark.registry_ext  # noqa: E402,F401
from datapipelinerepo_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if len(sys.argv) > 2:
        names = sys.argv[2].split(",")
    else:
        names = [n for n, e in REGISTRY.items() if e.bench]
    out_dir = os.path.join(_ROOT, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            txt = explain_formatted(df)
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            txt = f"ERROR capturing plan: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"{name}: {len(txt)} chars -> {path}")


if __name__ == "__main__":
    main()
