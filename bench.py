"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line with per-query and total wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fabrix_spark.queries import headline_queries  # noqa: E402
from fabrix_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("fabrix_bench")

    # Warm the JVM + whole-stage-codegen compile cache outside the
    # timed region by running every headline plan once at the smoke
    # scale factor: generated code is keyed by plan shape, so the
    # timed sf run measures steady-state execution, not javac.
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name, fn in headline_queries().items():
            try:
                fn(spark, warm_dir).count()
            except Exception as e:  # warmup must never fail the bench
                print(f"# warmup {name} failed: {e}", file=sys.stderr)

    # 3 runs per query: the headline numbers report the MEDIAN (robust
    # single-run estimate, reconcilable with the driver's one-shot
    # timing); best-of-3 is recorded alongside as steady-state capacity
    # (GC / page-cache noise on a shared box is ±40%)
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    per_query: dict[str, float] = {}
    per_query_best: dict[str, float] = {}
    total = total_best = 0.0
    for name, fn in headline_queries().items():
        times, n = [], -1
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count() if not df.isStreaming else -1
            times.append(time.perf_counter() - t0)
        times.sort()
        median = times[len(times) // 2]
        per_query[name] = round(median, 3)
        per_query_best[name] = round(times[0], 3)
        total += median
        total_best += times[0]
        print(f"# {name}: median {median:.3f}s best {times[0]:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "queries_best": per_query_best,
                "total_best": round(total_best, 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
