"""Spark-only wall-time sweep of every registry (and optionally
staged) query at a given sf dir — the breadth profiler the r17
optimization round uses to find triangle_counts-class outliers.

No DuckDB, no comparisons: each query's DataFrame is driven to the
noop sink (guide §1.4 — times the computation, not a collect), and
the wall time printed sorted descending at the end.

Usage: python tools/time_registry.py [sf_dir] [--staged] [--skip name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from fabrix_spark.session import get_spark  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    use_staged = "--staged" in argv
    argv = [a for a in argv if a != "--staged"]
    skip: set[str] = set()
    if "--skip" in argv:
        i = argv.index("--skip")
        skip = set(argv[i + 1 :])
        argv = argv[:i]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    if use_staged:
        from fabrix_spark.queries import STAGED as src
    else:
        from fabrix_spark.queries import REGISTRY as src

    spark = get_spark("time_registry")
    times: list[tuple[float, str]] = []
    for name, qd in src.items():
        if name in skip:
            continue
        spark.sparkContext.setJobDescription(f"time_registry:{name}")
        t0 = time.time()
        try:
            df = qd.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # keep sweeping; report at the end
            print(f"ERR  {name}: {type(e).__name__}: {e}", flush=True)
            times.append((float("nan"), name))
            continue
        dt = time.time() - t0
        times.append((dt, name))
        print(f"{dt:8.2f}s  {name}", flush=True)

    print("\n== slowest first ==")
    for dt, name in sorted(times, reverse=True):
        print(f"{dt:8.2f}s  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
