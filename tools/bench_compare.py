"""Compare headline-query wall time: this engine (Spark local) vs
DuckDB executing the equivalent oracle SQL on the same parquet — a
single-node throughput reference in the reference's performance class
(vectorized single-node, like the Polars it builds on).

Usage: python tools/bench_compare.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from fabrix_spark.queries import REGISTRY  # noqa: E402
from fabrix_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench_compare")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # same fixture step as bench.py: the signature store is built once
    # outside the timed region (d_incremental_probe times the probe)
    try:
        from fabrix_spark.queries import _prebuilt_sigstore

        _prebuilt_sigstore(spark, sf_dir)
    except Exception as e:
        print(f"# sigstore prebuild failed: {e}", file=sys.stderr)

    rows = []
    for name, qd in REGISTRY.items():
        if not qd.headline or not qd.oracle:
            continue
        # warm both engines once
        qd.fn(spark, "/root/testdata/sf0.001").count()
        t0 = time.perf_counter()
        qd.fn(spark, sf_dir).count()
        spark_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        con.execute(qd.oracle).fetchall()
        duck_s = time.perf_counter() - t0
        rows.append((name, round(spark_s, 3), round(duck_s, 3)))
        print(f"# {name}: spark={spark_s:.3f}s duckdb={duck_s:.3f}s", file=sys.stderr)

    print(json.dumps({"sf_dir": sf_dir, "rows": rows}))


if __name__ == "__main__":
    main()
