"""Dump ``explain("formatted")`` for a set of registry queries to
``plans/r17/<query>_<tag>.txt`` — the optimization round's before/after
plan evidence. Usage:

    python tools/explain_dump.py before [query ...]   # default: headliners
    python tools/explain_dump.py after  q5_revenue_by_nation
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fabrix_spark.queries import REGISTRY  # noqa: E402
from fabrix_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parent.parent / "plans" / "r17"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n, qd in REGISTRY.items() if qd.headline]
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark("explain_dump")
    for name in names:
        fn = REGISTRY[name].fn
        try:
            df = fn(spark, SF_DIR)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            text = f"EXPLAIN FAILED: {e}"
        (OUT / f"{name}_{tag}.txt").write_text(text)
        print(f"wrote {name}_{tag}.txt ({len(text)} bytes)")


if __name__ == "__main__":
    main()
