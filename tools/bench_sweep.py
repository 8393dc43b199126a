"""One-shot registry-wide bench sweep (VERDICT r8 item 10): time EVERY
registry query once (single run, noop sink — full computation, no
driver collect) so a pathological plan can't hide in the untimed tail
of the registry. This is a coverage sweep, not a benchmark: bench.py's
median-of-3 frozen-warmup protocol stays the comparable number;
single-run figures here carry ±10-15% drift and are only for spotting
order-of-magnitude outliers.

Usage:
    python tools/bench_sweep.py [--all] [--sf-dir DIR]

Default times only the UNTIMED entries (bench=False); --all sweeps the
whole registry. Prints one JSON line:
    {"sf": ..., "n": N, "total": sec, "rows": {name: sec, ...}}
with rows sorted slowest-first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelinerepo_spark.registry import REGISTRY  # noqa: E402
import datapipelinerepo_spark.registry_ext  # noqa: E402,F401
from datapipelinerepo_spark.io import load_table  # noqa: E402
from datapipelinerepo_spark.session import get_spark  # noqa: E402


def main() -> None:
    sweep_all = "--all" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    # light warm-up: session/JIT + parquet footers for every table
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()

    names = [
        n for n, e in REGISTRY.items() if sweep_all or not e.bench
    ]
    rows: dict[str, float] = {}
    for i, name in enumerate(names):
        t0 = time.monotonic()
        try:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            rows[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # a sweep should report, not die
            rows[name] = -1.0
            print(f"# {name} FAILED: {e}", file=sys.stderr)
        print(
            f"# [{i + 1}/{len(names)}] {name}: {rows[name]}s",
            file=sys.stderr,
        )
    ordered = dict(sorted(rows.items(), key=lambda kv: -kv[1]))
    print(
        json.dumps(
            {
                "sf": sf,
                "n": len(ordered),
                "total": round(sum(v for v in ordered.values() if v > 0), 3),
                "rows": ordered,
            }
        )
    )


if __name__ == "__main__":
    main()
