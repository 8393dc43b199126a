"""Micro-bench for the BPE encode engine crossover (VERDICT r7 item 7):
time bpe_encode's 'fold' (chained JVM column folds) and 'arrow'
(priority-merge pandas UDF) engines at increasing rule-list sizes over
the documents table, to MEASURE the auto-engine switch point
(operators/text._BPE_AUTO_FOLD_MAX) instead of asserting it.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_bpe_crossover.py

Prints one JSON line: {"sf": ..., "runs": N,
  "points": [{"n_rules": 8, "fold_s": ..., "arrow_s": ...}, ...]}
(median of RUNS noop-sink materializations per cell; rule lists are the
real learned merges padded with the well-formed synthetic chain the
1k-rule bench uses — the testdata's 31-word vocabulary only supports
~89 real merges)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datapipelinerepo_spark.operators import text as T  # noqa: E402
from datapipelinerepo_spark.registry_ext import _padded_rule_list  # noqa: E402
from datapipelinerepo_spark.io import load_table  # noqa: E402
from datapipelinerepo_spark.session import get_spark  # noqa: E402

SIZES = (8, 32, 48, 64, 128)
RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench_bpe_crossover")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    docs.write.format("noop").mode("overwrite").save()
    wc = {
        r["_w"]: r["_n"]
        for r in docs.filter(F.col("doc_id") < 4096)
        .select(F.explode(T.ws_tokens(F.col("text"))).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }
    # warm both engines once (JIT / Arrow worker fork) outside timing
    warm = _padded_rule_list(wc, 8)
    for eng in ("fold", "arrow"):
        T.bpe_encode(docs.limit(64), warm, engine=eng).write.format(
            "noop"
        ).mode("overwrite").save()

    points = []
    for n in SIZES:
        rules = _padded_rule_list(wc, n)
        cell: dict = {"n_rules": n}
        for eng in ("fold", "arrow"):
            samples = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                T.bpe_encode(docs, rules, engine=eng).write.format(
                    "noop"
                ).mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            samples.sort()
            cell[f"{eng}_s"] = round(samples[RUNS // 2], 3)
        points.append(cell)
        print(f"# n_rules={n}: {cell}", file=sys.stderr)

    print(json.dumps({"sf": float(sf), "runs": RUNS, "points": points}))


if __name__ == "__main__":
    main()
