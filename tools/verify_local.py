"""Local stand-in for the driver's correctness gate: run every
registry query on Spark AND its DuckDB oracle at the given sf dir,
compare row-count, column names, and order-insensitive values.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from fabrix_spark.queries import REGISTRY  # noqa: E402
from fabrix_spark.session import get_spark  # noqa: E402

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def row_key(row, col_order):
    return tuple(norm(row[i]) for i in col_order)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_skip = 0
    for name, qd in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if qd.oracle is None:
            print(f"SKIP {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_skip += 1
            continue
        try:
            res = con.execute(qd.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue

        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={scols} duck={ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(orows)}")
            n_fail += 1
            continue
        s_order = [scols.index(c) for c in sorted(scols)]
        o_order = [ocols.index(c) for c in sorted(ocols)]
        s_set = sorted(row_key(r, s_order) for r in srows)
        o_set = sorted(row_key(r, o_order) for r in orows)
        if s_set != o_set:
            diffs = [(a, b) for a, b in zip(s_set, o_set) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
